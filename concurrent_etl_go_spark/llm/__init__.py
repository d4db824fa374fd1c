"""LLM-data-pipeline operators (SURVEY §2.B extensions).

Dedup (exact / normalized / MinHash-LSH / n-gram Jaccard / SimHash /
embedding-cosine), similarity search (brute-force + IVF-style), text
analysis (stats, quality, fingerprint, language-ID), and multimodal binary
columns. All Spark built-ins; the only Pandas-UDF surface is the multimodal
decode stubs (the image/audio libraries are not in this environment).
"""

from concurrent_etl_go_spark.llm import (  # noqa: F401
    calibration,
    corpus_diff,
    corpus_files,
    corpus_stats,
    curation,
    curation2,
    datasets,
    datasets2,
    dedup,
    dedup2,
    dedup3,
    ivfpq,
    ivfpq2,
    kmeans,
    kmeans2,
    matryoshka,
    multimodal,
    negatives,
    packing,
    pca,
    postprocess,
    quality_gates,
    quantize,
    retrieval_eval,
    retrieval_eval2,
    similarity,
    similarity2,
    text,
    text2,
    text3,
    text4,
    text5,
    text6,
    tokenizer_eval,
)

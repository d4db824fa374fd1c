"""Text analysis, part 5: shingle hapax-legomena profile and lexical
density — two corpus-health reads (hapax from quantitative-linguistics
practice alongside Zipf/Heaps; lexical density from Ure 1971) beside
``llm/text2-4.py``'s family.

Exactness: counts and floor basis points only — no float exists in
either query.  The stopword list is a FIXED literal shared by both
engines (a parameter of the metric, like the BPE merge table), never
derived from the data.

Scale: both queries are one documents scan -> explode -> bounded-key
hash agg (langs/sources x shingle types); the shingle explode is the
same map-side pass every dedup/text query rides.  Reference parity:
no text surface exists in the reference (etl/main.go); extends
SURVEY.md §2.B.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from concurrent_etl_go_spark.llm.text import tokens
from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.sources.readers import read_table

_K = 3  # shingle width (the dedup/novelty convention)


@query(
    "text_hapax_ratio",
    oracle="""
    WITH tokd AS MATERIALIZED (
      SELECT lang, string_split(text, ' ') AS w FROM documents
    ),
    sh AS MATERIALIZED (
      SELECT lang,
             unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                     for i in range(1, greatest(len(w) - 2, 0) + 1)])
               AS tok
      FROM tokd
    ),
    tf AS MATERIALIZED (
      SELECT lang, tok, COUNT(*) AS c FROM sh GROUP BY 1, 2
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_shingle_types,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hapax,
           CAST(SUM(c) AS BIGINT) AS total_shingles,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 10000
                // COUNT(*) AS BIGINT) AS hapax_bp
    FROM tf GROUP BY 1
    """,
)
def text_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax-legomena profile per language over 3-token shingles: how
    much of each language slice's shingle vocabulary occurs exactly
    once — the long-tail diversity companion to ``text_zipf_profile``
    (head) and ``text_vocab_growth`` (growth rate).  A collapsing
    hapax share flags template/boilerplate flooding; a high one, rich
    or noisy text.  Word-level hapax would be degenerate on this
    bounded-vocabulary corpus, so the metric runs on shingles — the
    same unit the dedup family keys on.

    Scale: one scan -> shingle explode -> (lang, shingle) hash agg
    (combiner-friendly) -> lang-keyed rollup."""
    docs = read_table(spark, sf_dir, "documents").select(
        "lang", tokens("text").alias("w")
    )
    idx = F.when(
        F.size("w") >= _K, F.sequence(F.lit(1), F.size("w") - (_K - 1))
    ).otherwise(F.array().cast("array<int>"))
    sh = docs.select(
        "lang",
        F.explode(
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    " ",
                    F.element_at("w", i),
                    F.element_at("w", i + 1),
                    F.element_at("w", i + 2),
                ),
            )
        ).alias("tok"),
    )
    tf = sh.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("c"))
    return tf.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_shingle_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_hapax"),
        F.sum("c").cast("long").alias("total_shingles"),
        F.expr(
            "CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 10000"
            " div COUNT(*) AS BIGINT)"
        ).alias("hapax_bp"),
    )


#: Fixed function-word list — a PARAMETER of the metric (not derived
#: from the corpus), shared verbatim by both engines.
_STOPWORDS = ("a", "the", "of", "and", "to", "in", "is")
_STOP_SQL = ", ".join(f"'{s}'" for s in _STOPWORDS)


@query(
    "text_lexical_density",
    oracle=f"""
    WITH tok AS MATERIALIZED (
      SELECT source, unnest(string_split(text, ' ')) AS t
      FROM documents
    ),
    cnt AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS total_tokens,
             CAST(SUM(CASE WHEN t IN ({_STOP_SQL}) THEN 1 ELSE 0 END)
                  AS BIGINT) AS stop_tokens
      FROM tok GROUP BY 1
    ),
    d AS (
      SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1
    )
    SELECT c.source, CAST(d.n_docs AS BIGINT) AS n_docs,
           c.total_tokens, c.stop_tokens,
           CAST((c.total_tokens - c.stop_tokens) * 10000
                // c.total_tokens AS BIGINT) AS density_bp
    FROM cnt c JOIN d ON d.source = c.source
    """,
)
def text_lexical_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical density per source: the share of content (non-function)
    words among all tokens, against a fixed literal stopword list —
    the prose-vs-boilerplate dial (natural prose sits near 50-60%;
    code/markup and keyword-stuffed spam run far higher).  The
    per-source table is the corpus-mix report form of the per-doc
    stopword gate ``dataset_quality_gate`` applies.

    Scale: one scan -> token explode -> source-keyed hash agg with a
    broadcast-sized IN list."""
    docs = read_table(spark, sf_dir, "documents").select("source", "text")
    tok = docs.select(
        "source", F.explode(tokens("text")).alias("t")
    )
    cnt = tok.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("total_tokens"),
        F.sum(F.when(F.col("t").isin(*_STOPWORDS), 1).otherwise(0))
        .cast("long")
        .alias("stop_tokens"),
    )
    d = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    return cnt.join(d, "source").select(
        "source",
        "n_docs",
        "total_tokens",
        "stop_tokens",
        F.expr(
            "CAST((total_tokens - stop_tokens) * 10000"
            " div total_tokens AS BIGINT)"
        ).alias("density_bp"),
    )

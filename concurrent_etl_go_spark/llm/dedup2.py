"""Containment dedup: the asymmetric near-duplicate signal.

Jaccard (``dedup_ngram_jaccard``) misses the most common real-world
duplication shape: document A embedded inside a larger B (quote +
commentary, article + boilerplate frame, v1 + v2-with-additions).
Jaccard(A, B) is small because B's extra content inflates the union,
but containment(A, B) = |shingles(A) ∩ shingles(B)| / |shingles(A)|
is ~1. Curation pipelines drop the CONTAINED side (A) and keep the
superset document.

This is the blocked-exact oracle twin (same role as
``dedup_ngram_jaccard`` -> ``dedup_minhash_lsh``): at 100 TB the
candidate pairs come from the same MinHash-LSH bucket join, and only
candidates get the exact containment verify — the MinHash estimator for
containment is the public "containment MinHash" construction (Broder's
resemblance/containment estimates from the same sketch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.llm.text import tokens
from concurrent_etl_go_spark.sources.readers import read_table

CONTAINMENT_THRESHOLD = 0.8
_K = 3  # shingle width


def _shingle_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, distinct 3-token shingles) per document."""
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", tokens("text").alias("w")
    )
    idx = F.when(
        F.size("w") >= _K, F.sequence(F.lit(1), F.size("w") - (_K - 1))
    ).otherwise(F.array().cast("array<int>"))
    sh = F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ",
                F.element_at("w", i),
                F.element_at("w", i + 1),
                F.element_at("w", i + 2),
            ),
        )
    )
    return docs.select("doc_id", "lang", sh.alias("shingles"))


@query(
    "dedup_containment",
    scale_class="oracle_twin",  # blocked all-pairs; LSH candidates scale
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, lang,
               list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                   for i in range(1, greatest(len(w) - 2, 0) + 1)]) AS shingles
        FROM (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents)
    )
    SELECT a.doc_id AS contained_id, b.doc_id AS container_id,
           ROUND(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
               / len(a.shingles), 4) AS containment
    FROM sh a JOIN sh b
      ON a.lang = b.lang AND a.doc_id <> b.doc_id
    WHERE len(a.shingles) > 0
      AND len(b.shingles) > len(a.shingles)
      AND CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
              / len(a.shingles) >= {CONTAINMENT_THRESHOLD}
    """,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment pairs: (contained, container) where the
    smaller document's shingles are >= {t} contained in a strictly
    larger document's set, lang-blocked.

    The size asymmetry (|B| > |A|) halves the pair space and encodes
    the drop-the-contained-side decision; strictly-larger (not >=)
    keeps equal-size near-identical pairs in the symmetric Jaccard
    query where they belong.
    """
    sh = _shingle_sets(spark, sf_dir)
    a = sh.select(
        F.col("doc_id").alias("contained_id"),
        "lang",
        F.col("shingles").alias("sh_a"),
    )
    b = sh.select(
        F.col("doc_id").alias("container_id"),
        "lang",
        F.col("shingles").alias("sh_b"),
    )
    pairs = a.join(b, "lang").where(
        (F.col("contained_id") != F.col("container_id"))
        & (F.size("sh_a") > 0)
        & (F.size("sh_b") > F.size("sh_a"))
    )
    containment = F.size(F.array_intersect("sh_a", "sh_b")) / F.size("sh_a")
    return (
        pairs.where(containment >= CONTAINMENT_THRESHOLD)
        .select(
            "contained_id",
            "container_id",
            F.round(containment, 4).alias("containment"),
        )
    )


@query(
    "dedup_url_canonical",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'HTTPS://Docs.Example.COM:443/' || source || '?utm_campaign='
                 || doc_id || '&lang=' || lang || '#sec' AS url
      FROM documents
    ),
    c AS (
      SELECT doc_id,
             lower(regexp_replace(regexp_extract(
                 regexp_replace(url, '#.*$', ''), '^[A-Za-z]+://[^/]+'),
                 ':443$', ''))
             || regexp_extract(regexp_replace(url, '#.*$', ''),
                 '^[A-Za-z]+://[^/]+(/[^?]*)', 1)
             || CASE WHEN len(list_sort(list_filter(string_split(
                      regexp_extract(regexp_replace(url, '#.*$', ''),
                          '\\?(.*)$', 1), '&'),
                      p -> NOT starts_with(p, 'utm_') AND p <> ''))) > 0
                 THEN '?' || array_to_string(list_sort(list_filter(
                      string_split(regexp_extract(
                          regexp_replace(url, '#.*$', ''), '\\?(.*)$', 1),
                          '&'),
                      p -> NOT starts_with(p, 'utm_') AND p <> '')), '&')
                 ELSE '' END AS canonical_url
      FROM u
    )
    SELECT canonical_url, MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_variants
    FROM c GROUP BY 1
    """,
)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup: collapse tracking-parameter variants of the same
    page onto one canonical URL and keep the lowest doc_id — the crawl
    frontier's first dedup gate (before any content is even fetched).
    The synthesized URLs differ per document ONLY in ``utm_campaign``
    and the fragment, so canonicalization (via the same
    ``canonicalize_url`` the normalizer query uses) genuinely merges
    them: one survivor per (source, lang) page.

    Scale: per-row string expressions + one hash aggregation on the
    canonical key — identical shape to ``dedup_exact``, applied to URLs.
    """
    from concurrent_etl_go_spark.operators.scalars2 import canonicalize_url

    docs = read_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("HTTPS://Docs.Example.COM:443/"),
        F.col("source"),
        F.lit("?utm_campaign="),
        F.col("doc_id").cast("string"),
        F.lit("&lang="),
        F.col("lang"),
        F.lit("#sec"),
    )
    c = docs.select(
        "doc_id", canonicalize_url(url).alias("canonical_url")
    )
    return c.groupBy("canonical_url").agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count(F.lit(1)).alias("n_variants"),
    )

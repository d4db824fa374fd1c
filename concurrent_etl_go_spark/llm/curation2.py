"""The composed pretraining-corpus funnel: quality gate -> exact dedup ->
decontamination, reported as per-stage surviving-document counts.

Every constituent stage ships as its own oracle-checked query
(``text_quality_filter``, ``corpus_clean``, ``corpus_decontaminate``);
this operator composes them the way a corpus build actually runs them
and emits the drop-funnel observability row set (stage, n_docs) that
pipeline owners watch. Thresholds and expressions are SHARED with the
component queries (same helpers), so the funnel can never drift from the
stages it reports on.

Plan shape (single wide pass, not one job per stage): per-document flags
(quality keep, dedup survivor, train-split membership, contamination)
are computed as columns — the survivor flag is a min-over-window on the
normalized text among quality-passing docs, the contamination flag a
left semi-ish join against the eval shingle set — then ONE conditional
aggregation produces every stage count and an in-row explode emits the
funnel rows. Counting each stage with separate jobs would rescan the
corpus per stage; at 100 TB that difference is the whole game.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.llm.datasets import hash_bucket
from concurrent_etl_go_spark.llm.dedup import normalize_text, shingles_from_tokens
from concurrent_etl_go_spark.llm.text import EN_STOPWORDS, tokenized_docs

_SQL_BUCKET = "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100)"
_SQL_NORM = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', "
    "'g'), ' +', ' ', 'g'))"
)
_SQL_STOPS = ",".join(f"'{s}'" for s in EN_STOPWORDS)


@query(
    "corpus_pretrain_funnel",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, text, string_split(text, ' ') AS w,
             {_SQL_BUCKET} AS bucket, {_SQL_NORM} AS norm_text
      FROM documents
    ),
    q AS (
      SELECT *,
             (len(w) >= 20
              AND CAST(len(list_filter(w, t -> lower(t) IN ({_SQL_STOPS})))
                  AS DOUBLE) / greatest(len(w), 1) >= 0.02
              AND CAST(length(text) AS DOUBLE) / greatest(len(w), 1) <= 5.7)
                 AS keep
      FROM d
    ),
    surv AS (
      SELECT *, CASE WHEN keep THEN
                  doc_id = MIN(CASE WHEN keep THEN doc_id END)
                             OVER (PARTITION BY norm_text)
                ELSE FALSE END AS survivor
      FROM q
    ),
    sh AS (
      SELECT doc_id, bucket,
             unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                 for i in range(1, greatest(len(w) - 2, 0) + 1)])) AS shingle
      FROM d
    ),
    contaminated AS (
      SELECT DISTINCT tr.doc_id
      FROM (SELECT doc_id, shingle FROM sh WHERE bucket < 95) tr
      JOIN (SELECT DISTINCT shingle FROM sh WHERE bucket >= 95) ev
        USING (shingle)
    ),
    flags AS (
      SELECT s.*, (c.doc_id IS NOT NULL) AS contam
      FROM surv s LEFT JOIN contaminated c USING (doc_id)
    )
    SELECT * FROM (
      SELECT CAST(0 AS BIGINT) AS stage, 'raw' AS stage_name,
             CAST(COUNT(*) AS BIGINT) AS n_docs FROM flags
      UNION ALL
      SELECT 1, 'quality_pass',
             CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
      FROM flags
      UNION ALL
      SELECT 2, 'dedup_survivor',
             CAST(SUM(CASE WHEN survivor THEN 1 ELSE 0 END) AS BIGINT)
      FROM flags
      UNION ALL
      SELECT 3, 'train_decontaminated',
             CAST(SUM(CASE WHEN survivor AND bucket < 95 AND NOT contam
                      THEN 1 ELSE 0 END) AS BIGINT)
      FROM flags
    )
    """,
)
def corpus_pretrain_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel counts for the composed corpus build: raw -> quality gate
    -> exact-dedup survivors -> decontaminated training split (stage 3
    also drops the eval split itself and docs sharing any 3-shingle with
    it).

    Shares the quality thresholds, normalizer, shingler, and hash split
    with the component queries — one source of truth for each stage.
    """
    docs = tokenized_docs(spark, sf_dir).select(
        "doc_id",
        "text",
        "toks",
        hash_bucket("doc_id").alias("bucket"),
        normalize_text("text").alias("norm_text"),
    )
    toks = F.col("toks")
    stops = F.filter(toks, lambda t: F.lower(t).isin(*EN_STOPWORDS))
    n_tokens = F.size(toks)
    keep = (
        (n_tokens >= 20)
        & (F.size(stops) / F.greatest(n_tokens, F.lit(1)) >= 0.02)
        & (F.length("text") / F.greatest(n_tokens, F.lit(1)) <= 5.7)
    )
    q = docs.withColumn("keep", keep)

    w = Window.partitionBy("norm_text")
    survivor = F.when(
        F.col("keep"),
        F.col("doc_id")
        == F.min(F.when(F.col("keep"), F.col("doc_id"))).over(w),
    ).otherwise(F.lit(False))
    surv = q.withColumn("survivor", survivor)

    sh = docs.select(
        "doc_id",
        "bucket",
        F.explode(shingles_from_tokens(F.col("toks"))).alias("shingle"),
    )
    ev = sh.where(F.col("bucket") >= 95).select("shingle").distinct()
    contaminated = (
        sh.where(F.col("bucket") < 95)
        .join(ev, "shingle")
        .select("doc_id")
        .distinct()
        .withColumn("contam", F.lit(True))
    )
    flags = surv.join(contaminated, "doc_id", "left").withColumn(
        "contam", F.coalesce(F.col("contam"), F.lit(False))
    )

    counts = flags.agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_quality"),
        F.sum(F.when(F.col("survivor"), 1).otherwise(0)).alias("n_dedup"),
        F.sum(
            F.when(
                F.col("survivor") & (F.col("bucket") < 95) & ~F.col("contam"),
                1,
            ).otherwise(0)
        ).alias("n_clean"),
    )
    stages = (
        (0, "raw", "n_raw"),
        (1, "quality_pass", "n_quality"),
        (2, "dedup_survivor", "n_dedup"),
        (3, "train_decontaminated", "n_clean"),
    )
    report = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("stage"),
                F.lit(name).alias("stage_name"),
                F.col(c).cast("long").alias("n_docs"),
            )
            for i, name, c in stages
        ]
    )
    return counts.select(F.explode(report).alias("r")).select(
        "r.stage", "r.stage_name", "r.n_docs"
    )

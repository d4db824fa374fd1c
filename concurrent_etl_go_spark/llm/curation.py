"""Corpus-curation operators: benchmark decontamination and
data-dependent mixture rebalancing.

These close the two remaining stages of a standard training-data funnel
(after quality filtering, dedup, and splitting — ``datasets.py``):

- **Decontamination**: training documents sharing verbatim k-gram
  shingles with an evaluation/benchmark set must be dropped, or eval
  numbers are inflated. Here the "benchmark" stand-in is the documents
  hash-split bucket >= 95 (5% of the corpus) so the operator is fully
  deterministic and oracle-checkable against DuckDB.
- **Mixture rebalancing**: derive per-source keep rates FROM the data
  (equalize source shares) instead of hard-coding them — the
  data-dependent twin of ``sample_stratified_hash``'s fixed rates.

Reference parity: generalizes the reference's validate-and-drop row
filtering (etl/main.go:134-138,214-218) into corpus-level set hygiene.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from concurrent_etl_go_spark.llm.datasets import _SQL_BUCKET, hash_bucket
from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.sources.readers import read_table


@query(
    "corpus_decontaminate",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_SQL_BUCKET} AS bucket, string_split(text, ' ') AS w
      FROM documents
    ),
    sh AS (
      SELECT doc_id, bucket,
             unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                 for i in range(1, greatest(len(w) - 2, 0) + 1)])) AS shingle
      FROM toks
    ),
    ev AS (SELECT DISTINCT shingle FROM sh WHERE bucket >= 95),
    tr AS (SELECT doc_id, shingle FROM sh WHERE bucket < 95)
    SELECT tr.doc_id, COUNT(*) AS n_shared
    FROM tr JOIN ev USING (shingle)
    GROUP BY 1
    """,
)
def corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs (hash bucket < 95)
    that share at least one distinct 3-token shingle with the eval split
    (bucket >= 95), with the count of shared shingles per doc. Dropping
    the flagged ids (anti join) yields the decontaminated corpus.

    Scale: the eval side of the join is a benchmark suite — tiny by
    construction relative to the corpus — so its distinct shingle set
    broadcasts and the contamination check is one scan over training
    shingles with NO shuffle of the corpus (the per-doc count shuffles
    only the matching (doc_id, shingle) pairs, a contamination-sized
    relation). The hint is NOT hard-coded: the eval shingle set is left
    unhinted, so AQE/Catalyst broadcasts it when its runtime size is
    under ``autoBroadcastJoinThreshold`` and falls back to a shuffled
    equi-join when the eval suite is genuinely large — a graceful
    degradation instead of a driver OOM.
    """
    from concurrent_etl_go_spark.llm.dedup import shingles_from_tokens
    from concurrent_etl_go_spark.llm.text import tokenized_docs

    docs = tokenized_docs(spark, sf_dir)
    sh = docs.select(
        "doc_id",
        hash_bucket("doc_id").alias("bucket"),
        F.explode(shingles_from_tokens(F.col("toks"))).alias("shingle"),
    )
    ev = (
        sh.where(F.col("bucket") >= 95).select("shingle").distinct()
    )
    tr = sh.where(F.col("bucket") < 95)
    return (
        tr.join(ev, "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


@query(
    "corpus_mix_rebalance",
    oracle=f"""
    WITH cnt AS (SELECT source, COUNT(*) AS c FROM documents GROUP BY 1),
    rate AS (
      SELECT source,
             CAST(FLOOR(100.0 * (SELECT MIN(c) FROM cnt) / c) AS BIGINT)
                 AS keep_pct
      FROM cnt
    )
    SELECT d.doc_id, d.source, r.keep_pct
    FROM (
      SELECT doc_id, source, {_SQL_BUCKET} AS bucket FROM documents
    ) d
    JOIN rate r USING (source)
    WHERE d.bucket < r.keep_pct
    """,
)
def corpus_mix_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equalize source shares: compute per-source keep percentages from
    the data (floor(100 * min_count / count)) and keep each document
    deterministically by hash bucket — downsampling every source to
    roughly the smallest source's volume.

    The data-DEPENDENT mixture twin of ``sample_stratified_hash``: a real
    pipeline derives its mixture weights from observed source volumes,
    not constants. Scale: one tiny per-source count agg, the rate table
    broadcasts back onto the scan, and the keep decision stays a per-row
    expression — no corpus shuffle, stable under reruns (pure function of
    doc_id and the per-source totals).
    """
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "source")
    cnt = docs.groupBy("source").agg(F.count(F.lit(1)).alias("c"))
    min_c = cnt.agg(F.min("c").alias("m"))
    rate = cnt.join(F.broadcast(min_c)).select(
        "source",
        F.floor(100.0 * F.col("m") / F.col("c")).cast("long").alias("keep_pct"),
    )
    return (
        docs.select("doc_id", "source", hash_bucket("doc_id").alias("bucket"))
        .join(F.broadcast(rate), "source")
        .where(F.col("bucket") < F.col("keep_pct"))
        .select("doc_id", "source", "keep_pct")
    )


@query(
    "sample_fixed_per_group",
    oracle="""
    SELECT doc_id, lang, CAST(rn AS BIGINT) AS sample_rank
    FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    )
    WHERE rn <= 50
    """,
)
def sample_fixed_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-n balanced subset: the 50 documents per language whose md5
    hash sorts first — a deterministic, rerun-stable stand-in for
    per-stratum reservoir sampling (same shape: fixed count per group,
    uniform over the hash order, no stored seed/state).

    Scale: per-group top-n runs in two phases — a per-input-partition
    row_number prunes to n rows per (lang, partition) BEFORE the shuffle,
    so the per-lang window receives at most n x partitions rows, never
    the corpus (few distinct langs would otherwise make one hot reducer
    per lang). Both phases share the (md5, doc_id) total order, so the
    prune can never evict a global top-n row. md5 hex strings compare
    identically in both engines (lowercase ASCII), keeping the oracle
    exact.
    """
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.md5(F.col("doc_id").cast("string")).alias("h")
    )
    order = [F.col("h"), F.col("doc_id")]
    partial = Window.partitionBy("lang", F.spark_partition_id()).orderBy(*order)
    pruned = (
        docs.withColumn("prn", F.row_number().over(partial))
        .where(F.col("prn") <= 50)
        .drop("prn")
    )
    final = Window.partitionBy("lang").orderBy(*order)
    return (
        pruned.withColumn("rn", F.row_number().over(final))
        .where(F.col("rn") <= 50)
        .select("doc_id", "lang", F.col("rn").cast("long").alias("sample_rank"))
    )

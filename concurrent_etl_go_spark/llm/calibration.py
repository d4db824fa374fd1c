"""Pipeline self-evaluation queries: sketch calibration, classifier
confusion, and loader-permutation audits — the measurements that tell
an operator whether the engine's OWN approximations and heuristics are
behaving, each chained onto an already-hash-proven kernel.

- ``dedup_minhash_calibration``: MinHash-estimated vs EXACT Jaccard
  over the banded LSH candidate pairs (the portable ``llm/dedup3.py``
  algebra), bucketed into an error histogram — the standard sketch
  calibration readout (estimate error concentrates near 0 when the
  permutation family is healthy; Broder 1997, public literature).
- ``text_langid_confusion``: the language-ID heuristic scored against
  the corpus's lang labels as a confusion matrix with per-cell rates.
- ``dataset_epoch_coverage``: the epoch-shuffle permutation audited
  across 3 epochs — every doc exactly once per epoch, shard-size
  balance, zero duplicates (the data-loader invariant training jobs
  silently depend on).

All-integer emissions (counts, floor e4 rates, buckets).  Scale: the
calibration pairs are the LSH CANDIDATE set (never all-pairs); the
confusion matrix is |langs|² rows after one scan; the coverage audit
is a map-side hash per (epoch, doc) and shard-grain aggs.  Reference
parity: extends SURVEY.md §2.B (no evaluation surface in the
reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from concurrent_etl_go_spark.llm.datasets2 import SHUFFLE_SHARDS
from concurrent_etl_go_spark.llm.dedup import shingles_from_tokens
from concurrent_etl_go_spark.llm.dedup3 import (
    _NUM_SIGS,
    _ORACLE_BANDS,
    _ORACLE_SIGS,
    _base_hashes,
    _candidate_pairs,
    _sig_cols,
)
from concurrent_etl_go_spark.llm.text import text_langid, tokenized_docs
from concurrent_etl_go_spark.operators.registry import (
    ORACLES,
    query,
    scoped_persist,
)
from concurrent_etl_go_spark.sources.readers import read_table

_MATCH_SQL = " + ".join(
    f"CASE WHEN a.sig_{i} = b.sig_{i} THEN 1 ELSE 0 END"
    for i in range(_NUM_SIGS)
)


@query(
    "dedup_minhash_calibration",
    oracle=_ORACLE_SIGS + _ORACLE_BANDS + f""",
    hsets AS MATERIALIZED (
      SELECT doc_id, list_distinct(hs) AS hset FROM h
    ),
    est AS MATERIALIZED (
      SELECT c.id_a, c.id_b,
             CAST(({_MATCH_SQL}) * 10000 // {_NUM_SIGS} AS BIGINT)
               AS est_e4
      FROM cand c
      JOIN sigs a ON a.doc_id = c.id_a
      JOIN sigs b ON b.doc_id = c.id_b
    ),
    ex AS MATERIALIZED (
      SELECT e.est_e4,
             CAST(len(list_intersect(ha.hset, hb.hset)) * 10000
                  // GREATEST(len(list_distinct(ha.hset || hb.hset)), 1)
                  AS BIGINT) AS jac_e4
      FROM est e
      JOIN hsets ha ON ha.doc_id = e.id_a
      JOIN hsets hb ON hb.doc_id = e.id_b
    )
    SELECT CAST((est_e4 - jac_e4 + 10000) // 1000 - 10 AS BIGINT)
             AS err_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(est_e4) // COUNT(*) AS BIGINT) AS avg_est_e4,
           CAST(SUM(jac_e4) // COUNT(*) AS BIGINT) AS avg_jac_e4,
           CAST(SUM(ABS(est_e4 - jac_e4)) // COUNT(*) AS BIGINT)
             AS mae_e4
    FROM ex GROUP BY 1
    """,
)
def dedup_minhash_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MinHash estimate vs exact Jaccard over the LSH candidate pairs:
    per 0.1-wide error bucket (``floor((est - exact)/0.1)`` on the e4
    lattice, computed via the always-non-negative shift so truncation
    equals floor), the pair count, floor-mean estimated and exact
    similarities, and the mean absolute error.  With 8 permutations the
    estimate is quantized to 1/8ths, so honest buckets spread around 0
    — a skewed histogram means a broken permutation family or banding
    bug before any recall test would catch it.

    Scale: candidate pairs only (banded equi-join — never all-pairs);
    the exact Jaccard joins fetch two shingle sets per CANDIDATE."""
    docs = tokenized_docs(spark, sf_dir)
    sh = shingles_from_tokens(F.col("toks"))
    hs = scoped_persist(
        docs.select("doc_id", _base_hashes(sh).alias("hs"))
    )
    sigs = scoped_persist(
        hs.select("doc_id", *_sig_cols(F.col("hs")))
    )
    hsets = hs.select("doc_id", F.array_distinct("hs").alias("hset"))
    cand = _candidate_pairs(spark, sf_dir, sigs=sigs).select(
        "id_a", "id_b"
    )
    a = sigs.select(
        F.col("doc_id").alias("id_a"),
        *[F.col(f"sig_{i}").alias(f"a_sig_{i}") for i in range(_NUM_SIGS)],
    )
    b = sigs.select(
        F.col("doc_id").alias("id_b"),
        *[F.col(f"sig_{i}").alias(f"b_sig_{i}") for i in range(_NUM_SIGS)],
    )
    match_sql = " + ".join(
        f"CASE WHEN a_sig_{i} = b_sig_{i} THEN 1 ELSE 0 END"
        for i in range(_NUM_SIGS)
    )
    est = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.expr(
                f"CAST(({match_sql}) * 10000 div {_NUM_SIGS} AS BIGINT)"
            ).alias("est_e4"),
        )
    )
    ha = hsets.select(
        F.col("doc_id").alias("id_a"), F.col("hset").alias("hset_a")
    )
    hb = hsets.select(
        F.col("doc_id").alias("id_b"), F.col("hset").alias("hset_b")
    )
    ex = (
        est.join(ha, "id_a")
        .join(hb, "id_b")
        .select(
            "est_e4",
            F.expr(
                "CAST(size(array_intersect(hset_a, hset_b)) * 10000"
                " div GREATEST(size(array_distinct("
                "concat(hset_a, hset_b))), 1) AS BIGINT)"
            ).alias("jac_e4"),
        )
    )
    return ex.groupBy(
        F.expr(
            "CAST((est_e4 - jac_e4 + 10000) div 1000 - 10 AS BIGINT)"
        ).alias("err_bucket")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.expr("CAST(SUM(est_e4) div COUNT(*) AS BIGINT)").alias(
            "avg_est_e4"
        ),
        F.expr("CAST(SUM(jac_e4) div COUNT(*) AS BIGINT)").alias(
            "avg_jac_e4"
        ),
        F.expr(
            "CAST(SUM(ABS(est_e4 - jac_e4)) div COUNT(*) AS BIGINT)"
        ).alias("mae_e4"),
    )


@query(
    "text_langid_confusion",
    oracle=f"""
    WITH pred AS ({ORACLES["text_langid"]}),
    cells AS (
      SELECT lang, predicted_lang, CAST(COUNT(*) AS BIGINT) AS n
      FROM pred GROUP BY 1, 2
    ),
    tot AS (
      SELECT lang, CAST(SUM(n) AS BIGINT) AS lang_total
      FROM cells GROUP BY lang
    )
    SELECT c.lang, c.predicted_lang, c.n, t.lang_total,
           CAST(c.n * 10000 // t.lang_total AS BIGINT) AS cell_e4,
           CASE WHEN c.lang = c.predicted_lang THEN 1 ELSE 0 END
             AS correct
    FROM cells c JOIN tot t ON t.lang = c.lang
    """,
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the language-ID heuristic against the
    corpus's lang labels: per (label, prediction) cell, the count, the
    label's row total, the row-normalized rate (e4), and the
    diagonal flag — the evaluation table that turns ``text_langid``
    from a heuristic into a measured classifier (per-language recall is
    the diagonal cell_e4).

    Scale: one corpus scan (the langid expressions) and a |langs|²
    aggregation."""
    pred = text_langid(spark, sf_dir)
    cells = scoped_persist(
        pred.groupBy("lang", "predicted_lang").agg(
            F.count(F.lit(1)).cast("long").alias("n")
        )
    )
    tot = cells.groupBy(F.col("lang").alias("t_lang")).agg(
        F.sum("n").cast("long").alias("lang_total")
    )
    return cells.join(
        F.broadcast(tot), cells["lang"] == tot["t_lang"]
    ).select(
        "lang",
        "predicted_lang",
        "n",
        "lang_total",
        F.expr("CAST(n * 10000 div lang_total AS BIGINT)").alias(
            "cell_e4"
        ),
        F.when(F.col("lang") == F.col("predicted_lang"), 1)
        .otherwise(0)
        .alias("correct"),
    )


_COVERAGE_EPOCHS = (0, 1, 2)


@query(
    "dataset_epoch_coverage",
    oracle=f"""
    WITH assign AS MATERIALIZED (
      {" UNION ALL ".join(
          f"SELECT doc_id, CAST({e} AS BIGINT) AS epoch, "
          f"(('0x' || substr(md5('{e}#' || CAST(doc_id AS VARCHAR)), 1, 8))"
          f"::BIGINT % {SHUFFLE_SHARDS}) AS shard FROM documents"
          for e in _COVERAGE_EPOCHS
      )}
    ),
    shards AS (
      SELECT epoch, shard, CAST(COUNT(*) AS BIGINT) AS rows_in_shard
      FROM assign GROUP BY 1, 2
    ),
    docs_per AS (
      SELECT epoch,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM assign GROUP BY epoch
    )
    SELECT d.epoch, d.n_rows, d.n_docs,
           CAST(d.n_rows - d.n_docs AS BIGINT) AS dup_rows,
           CAST(COUNT(*) AS BIGINT) AS n_shards,
           CAST(MIN(s.rows_in_shard) AS BIGINT) AS min_shard,
           CAST(MAX(s.rows_in_shard) AS BIGINT) AS max_shard,
           CAST((MAX(s.rows_in_shard) - MIN(s.rows_in_shard)) * 10000
                // GREATEST(MIN(s.rows_in_shard), 1) AS BIGINT)
             AS spread_e4
    FROM docs_per d JOIN shards s ON s.epoch = d.epoch
    GROUP BY d.epoch, d.n_rows, d.n_docs
    """,
)
def dataset_epoch_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loader-permutation audit over epochs 0-2 of the deterministic
    epoch shuffle: per epoch, row and distinct-doc counts (``dup_rows``
    must be 0 — every document exactly once per epoch), the shard
    count, and shard-size min/max/relative-spread (e4).  The audit a
    training job should run before trusting its data loader: a skewed
    spread starves accelerators, a nonzero dup_rows silently reweights
    the corpus.

    Scale: one md5 per (epoch, doc) map-side, shard-grain and
    epoch-grain hash aggs — no global sort, no driver participation."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    assign = docs.select(
        "doc_id",
        F.explode(
            F.array(*[F.lit(e).cast("long") for e in _COVERAGE_EPOCHS])
        ).alias("epoch"),
    ).select(
        "doc_id",
        "epoch",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "#",
                            F.col("epoch").cast("string"),
                            F.col("doc_id").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % SHUFFLE_SHARDS
        ).alias("shard"),
    )
    assign = scoped_persist(assign)
    shards = assign.groupBy("epoch", "shard").agg(
        F.count(F.lit(1)).cast("long").alias("rows_in_shard")
    )
    docs_per = assign.groupBy("epoch").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
    )
    return (
        docs_per.join(shards, "epoch")
        .groupBy("epoch", "n_rows", "n_docs")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shards"),
            F.min("rows_in_shard").cast("long").alias("min_shard"),
            F.max("rows_in_shard").cast("long").alias("max_shard"),
            F.expr(
                "CAST((MAX(rows_in_shard) - MIN(rows_in_shard)) * 10000"
                " div GREATEST(MIN(rows_in_shard), 1) AS BIGINT)"
            ).alias("spread_e4"),
        )
        .select(
            "epoch",
            "n_rows",
            "n_docs",
            (F.col("n_rows") - F.col("n_docs"))
            .cast("long")
            .alias("dup_rows"),
            "n_shards",
            "min_shard",
            "max_shard",
            "spread_e4",
        )
    )

"""Runtime-adaptivity (AQE) evidence: the session enables adaptive
execution, and these tests pin that it actually FIRES on this engine's
workload shapes — the behaviors the 100 TB design leans on:

- partition coalescing: a 32-partition shuffle of a small aggregate must
  execute with far fewer reducers (tiny-partition scheduling overhead is
  the death of short stages on big clusters);
- runtime join-strategy conversion: a join whose build side only becomes
  provably small AFTER a selective filter must execute as a broadcast
  hash join even when the static plan could not know;
- skew-join splitting: a 90%-hot-key join must split the hot partition
  instead of running one straggler task (the mitigation the salting
  operators exist for when AQE is unavailable).

These read the ADAPTIVE final plan (df after an action), not the static
explain — AQE decisions only exist post-execution.
"""

from __future__ import annotations

import pyspark.sql.functions as F


def _final_plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_aqe_coalesces_small_shuffle_partitions(spark):
    df = (
        spark.range(10_000)
        .groupBy((F.col("id") % 7).alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = _final_plan(df)
    assert "AQEShuffleRead coalesced" in plan, plan[:2000]


def test_aqe_converts_filtered_join_to_broadcast(spark):
    # static estimate of `dim` is 100k rows (no stats); after the filter
    # only ~10 rows survive — AQE must re-plan the SMJ into a BHJ
    fact = spark.range(200_000).select(
        F.col("id"), (F.col("id") % 10_000).alias("k")
    )
    dim = spark.range(100_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("payload")
    )
    joined = fact.join(dim.where(F.col("k") < 10), "k")
    plan = _final_plan(joined)
    assert "BroadcastHashJoin" in plan, plan[:2000]


def test_aqe_splits_skewed_join_partitions(spark):
    # 90% of the left side lands on one key; force the skew thresholds
    # low enough that local-mode data sizes trip them, and disable the
    # broadcast escape so the skewed SMJ path is actually exercised
    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        left = spark.range(300_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(F.col("id"))
            .alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        right = spark.range(50_000).select(
            F.col("id").alias("k"), F.lit("r").alias("tag")
        )
        joined = left.join(right, "k")
        plan = _final_plan(joined)
        assert "isSkew=true" in plan or "skewed" in plan.lower(), plan[:3000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

"""Statistical tests pack 3 — deterministic bootstrap confidence
intervals.

The bootstrap (Efron 1979, public literature) needs B resamples drawn
with replacement — normally a PRNG, which would break the driver's
cross-engine hash compare AND Spark's task-retry determinism.  The
engine's variant derives every draw from a PORTABLE COUNTER HASH
instead: draw j of replicate r picks element ``md5_int(r || '_' || j)
mod n`` — the same md5-prefix integer both engines already share for
split assignment (``llm/datasets.py::hash_bucket`` convention).  The
resampling distribution is exactly as exchangeable as a seeded PRNG's,
and every engine, every retry, every round reproduces it bit-for-bit.

Scale: the draw grid is B x n rows — for grain-first statistics (here
the DAILY revenue series) that is B x |days|, tiny; the join back to
values is an equi-join on the day index.  Bootstrapping a 100 TB raw
fact directly would instead use a Poisson(1) per-row weight sketch
(one scan for all B replicates); the counter-hash trick carries over
unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query, scoped_persist
from concurrent_etl_go_spark.sources.readers import read_table

_CENTS = "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"
BOOT_REPS = 200
#: Percentile-method CI ranks over the sorted replicate means: the 5th
#: and 196th of 200 (the floor(0.025*B) convention, documented not
#: interpolated).
_LO_RANK = 5
_HI_RANK = BOOT_REPS - _LO_RANK + 1
_MED_RANK = BOOT_REPS // 2  # lower median of an even count


@query(
    "agg_bootstrap_ci",
    oracle=f"""
    WITH daily AS (
      SELECT date_trunc('day', o_orderdate) AS day,
             CAST(SUM({_CENTS}) AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ),
    idx AS MATERIALIZED (
      SELECT cents,
             row_number() OVER (ORDER BY day) - 1 AS i,
             COUNT(*) OVER () AS n
      FROM daily
    ),
    draws AS (
      SELECT r.r, d.n,
             ('0x' || substr(md5(CAST(r.r AS VARCHAR) || '_'
                                 || CAST(d.i AS VARCHAR)), 1, 8))::BIGINT
               % d.n AS pick
      FROM (SELECT unnest(range({BOOT_REPS})) AS r) r
      CROSS JOIN idx d
    ),
    reps AS MATERIALIZED (
      SELECT dr.r,
             CAST(SUM(v.cents) // MAX(dr.n) AS BIGINT) AS boot_mean
      FROM draws dr JOIN idx v ON v.i = dr.pick
      GROUP BY dr.r
    ),
    ranked AS (
      SELECT boot_mean,
             row_number() OVER (ORDER BY boot_mean, r) AS rk
      FROM reps
    )
    SELECT (SELECT CAST(MAX(n) AS BIGINT) FROM idx) AS n_days,
           CAST({BOOT_REPS} AS BIGINT) AS n_reps,
           (SELECT CAST(SUM(cents) // MAX(n) AS BIGINT) FROM idx)
             AS plain_mean_cents,
           MAX(CASE WHEN rk = {_LO_RANK} THEN boot_mean END)
             AS boot_lo_cents,
           MAX(CASE WHEN rk = {_MED_RANK} THEN boot_mean END)
             AS boot_median_cents,
           MAX(CASE WHEN rk = {_HI_RANK} THEN boot_mean END)
             AS boot_hi_cents
    FROM ranked
    """,
)
def agg_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% percentile-bootstrap CI for mean daily revenue, 200
    replicates, fully deterministic: draw j of replicate r resamples
    day ``md5_int(r_j) mod n``; replicate means are floor-divided
    cents; the CI is the (5th, 196th) order statistics of the 200
    means, the median the 100th.  The plain mean rides along.

    Scale: grain-first (|days| rows), then a 200 x |days| counter grid
    joined back on the day index — see module note for the Poisson
    sketch at raw-fact scale."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    )
    daily = orders.groupBy(
        F.date_trunc("day", "o_orderdate").alias("day")
    ).agg(F.sum(F.expr(_CENTS)).cast("long").alias("cents"))
    wi = Window.orderBy("day")
    idx = scoped_persist(
        daily.select(
            "cents",
            (F.row_number().over(wi) - 1).alias("i"),
        ).crossJoin(
            F.broadcast(daily.agg(F.count(F.lit(1)).alias("n")))
        )
    )
    reps = spark.range(BOOT_REPS).select(F.col("id").alias("r"))
    draws = reps.crossJoin(idx.select("i", "n")).select(
        "r",
        "n",
        F.expr(
            "pmod(CAST(conv(substr(md5(concat(CAST(r AS STRING), '_',"
            " CAST(i AS STRING))), 1, 8), 16, 10) AS BIGINT), n)"
        ).alias("pick"),
    )
    rep_means = (
        draws.join(
            idx.select(F.col("i").alias("pick"), "cents"), "pick"
        )
        .groupBy("r")
        .agg(
            F.expr("CAST(SUM(cents) div MAX(n) AS BIGINT)").alias(
                "boot_mean"
            )
        )
    )
    wr = Window.orderBy("boot_mean", "r")
    ranked = rep_means.select(
        "boot_mean", F.row_number().over(wr).alias("rk")
    )
    stats = idx.agg(
        F.max("n").cast("long").alias("n_days"),
        F.expr("CAST(SUM(cents) div MAX(n) AS BIGINT)").alias(
            "plain_mean_cents"
        ),
    )
    ci = ranked.agg(
        F.max(
            F.when(F.col("rk") == _LO_RANK, F.col("boot_mean"))
        ).alias("boot_lo_cents"),
        F.max(
            F.when(F.col("rk") == _MED_RANK, F.col("boot_mean"))
        ).alias("boot_median_cents"),
        F.max(
            F.when(F.col("rk") == _HI_RANK, F.col("boot_mean"))
        ).alias("boot_hi_cents"),
    )
    return stats.crossJoin(ci).select(
        "n_days",
        F.lit(BOOT_REPS).cast("long").alias("n_reps"),
        "plain_mean_cents",
        "boot_lo_cents",
        "boot_median_cents",
        "boot_hi_cents",
    )

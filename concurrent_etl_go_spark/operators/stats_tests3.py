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


# --- round 14: changepoint + outlier tests on the exact lattice ----------

_DAILY_CENTS = "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"


@query(
    "agg_pettitt_changepoint",
    oracle=f"""
    WITH daily AS (
      SELECT date_trunc('day', o_orderdate) AS day,
             CAST(SUM({_DAILY_CENTS}) AS BIGINT) AS x
      FROM orders GROUP BY 1
    ),
    ranked AS (
      SELECT day, x,
             CAST(ROW_NUMBER() OVER (ORDER BY x, day) AS BIGINT) AS r,
             CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t,
             CAST(COUNT(*) OVER () AS BIGINT) AS n
      FROM daily
    ),
    u AS (
      SELECT day, t, n,
             2 * SUM(r) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - t * (n + 1) AS ut
      FROM ranked
    ),
    k AS (SELECT MAX(ABS(ut)) AS k_stat, MAX(n) AS n_days FROM u)
    SELECT k.n_days, CAST(k.k_stat AS BIGINT) AS k_stat,
           (SELECT MIN(day) FROM u WHERE ABS(ut) = k.k_stat) AS cp_day,
           CAST((SELECT MIN(ut) FROM u WHERE ABS(ut) = k.k_stat
                   AND day = (SELECT MIN(day) FROM u
                              WHERE ABS(ut) = k.k_stat))
                AS BIGINT) AS u_at_cp
    FROM k
    """,
)
def agg_pettitt_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt changepoint test (Pettitt 1979) over the daily revenue
    series: the rank-based statistic ``U_t = 2 * sum(r_1..r_t) -
    t*(n+1)`` (the Mann-Whitney cousin — ``agg_mann_whitney`` tests two
    GIVEN groups; Pettitt finds the split), maximized in absolute value
    over every prefix/suffix split.  Emits the statistic, the first day
    attaining it (the estimated changepoint), and the signed U there.
    Ranks use a deterministic total order (value, day) so ties resolve
    identically cross-engine; everything is an exact integer.

    Scale: one orders scan -> day-grain agg; the rank and the prefix
    cumsum are day-count-sized windows regardless of corpus size."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    )
    daily = orders.groupBy(
        F.date_trunc("day", "o_orderdate").alias("day")
    ).agg(F.sum(F.expr(_DAILY_CENTS)).cast("long").alias("x"))
    ranked = daily.select(
        "day",
        F.row_number().over(Window.orderBy("x", "day")).cast("long").alias("r"),
        F.row_number().over(Window.orderBy("day")).cast("long").alias("t"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("long").alias("n"),
    )
    cum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    u = ranked.select(
        "day",
        "n",
        (2 * F.sum("r").over(cum) - F.col("t") * (F.col("n") + 1)).alias(
            "ut"
        ),
    )
    from concurrent_etl_go_spark.operators.registry import scoped_persist

    u = scoped_persist(u)
    k = u.agg(
        F.max(F.abs(F.col("ut"))).alias("k_stat"),
        F.max("n").alias("n_days"),
    )
    cp = (
        u.join(k, F.abs(F.col("ut")) == F.col("k_stat"))
        .orderBy("day")
        .limit(1)
        .select(
            F.col("n_days"),
            F.col("k_stat").cast("long").alias("k_stat"),
            F.col("day").alias("cp_day"),
            F.col("ut").cast("long").alias("u_at_cp"),
        )
    )
    return cp


@query(
    "agg_grubbs_outlier",
    oracle=f"""
    WITH daily AS (
      SELECT o_orderpriority AS grp, date_trunc('day', o_orderdate) AS day,
             CAST(SUM({_DAILY_CENTS}) AS BIGINT) AS x
      FROM orders GROUP BY 1, 2
    ),
    sized AS (
      SELECT grp, day, x,
             CAST(SUM(x) OVER (PARTITION BY grp) AS BIGINT) AS s1,
             SUM(CAST(x AS HUGEINT) * x) OVER (PARTITION BY grp) AS s2,
             CAST(COUNT(*) OVER (PARTITION BY grp) AS BIGINT) AS n
      FROM daily
    ),
    dev AS (
      SELECT grp, day, n,
             ABS(n * x - s1) AS d,
             n * s2 - CAST(s1 AS HUGEINT) * s1 AS s2n
      FROM sized
    ),
    top AS (
      SELECT grp, day, n, d, s2n,
             ROW_NUMBER() OVER (PARTITION BY grp ORDER BY d DESC, day)
               AS rk
      FROM dev
    )
    SELECT grp, n AS n_days, day AS outlier_day,
           CAST(d AS BIGINT) AS dev_scaled,
           CAST(CASE WHEN s2n = 0 THEN NULL
                ELSE CAST(d AS HUGEINT) * d * 10000 // s2n END AS BIGINT)
             AS g_sq_e4
    FROM top WHERE rk = 1
    """,
)
def agg_grubbs_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs outlier test (Grubbs 1950) per order priority over daily
    revenue, emitted SQUARED on the cleared-denominator lattice:
    ``G^2 = (x* - mean)^2 / sigma^2 = (n*x* - s1)^2 / (n*s2 - s1^2)``
    exactly (both rescalings by n^2 cancel), where x* maximizes the
    absolute deviation (tie-broken by earliest day).  The emitted
    ``dev_scaled = |n*x* - s1|`` is n times the raw deviation; the e4
    statistic compares against the Grubbs critical value squared.
    Wide products run in DECIMAL(38,0)/HUGEINT.

    Scale: one day-grain hash agg per priority; the deviation scan and
    top-1 window are day-count-sized."""
    big = "DECIMAL(38,0)"
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderdate", "o_totalprice"
    )
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("grp"),
        F.date_trunc("day", "o_orderdate").alias("day"),
    ).agg(F.sum(F.expr(_DAILY_CENTS)).cast("long").alias("x"))
    wg = Window.partitionBy("grp")
    sized = daily.select(
        "grp",
        "day",
        "x",
        F.sum("x").over(wg).cast("long").alias("s1"),
        F.sum(F.expr(f"CAST(x AS {big}) * x")).over(wg).alias("s2"),
        F.count(F.lit(1)).over(wg).cast("long").alias("n"),
    )
    dev = sized.select(
        "grp",
        "day",
        "n",
        F.abs(F.col("n") * F.col("x") - F.col("s1")).alias("d"),
        F.expr(f"n * s2 - CAST(s1 AS {big}) * s1").alias("s2n"),
    )
    top = dev.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("grp").orderBy(F.desc("d"), "day")
        ),
    ).where(F.col("rk") == 1)
    return top.select(
        "grp",
        F.col("n").alias("n_days"),
        F.col("day").alias("outlier_day"),
        F.col("d").cast("long").alias("dev_scaled"),
        F.when(F.col("s2n") == 0, F.lit(None))
        .otherwise(F.expr(f"CAST(d AS {big}) * d * 10000 div s2n"))
        .cast("long")
        .alias("g_sq_e4"),
    )

"""Timeseries risk-statistics pack, part 5: omega ratio, Sortino
components, and the rescaled-range (Hurst R/S) statistic — the
downside-risk and long-memory diagnostics beside the Sharpe/beta/
drawdown family (Keating & Shadwick 2002 omega; Sortino & Price 1994;
Hurst 1951 / Mandelbrot & Wallis 1969 R/S — all public literature).

Cross-engine float discipline (SURVEY §7.6): every emitted column is an
exact integer.  Square roots never appear — Sortino and R/S are emitted
as SQUARED ratios on the e4/e6 lattice (the ``window_bollinger``
cancellation convention), with the wide intermediate products run in
DECIMAL(38,0) on Spark / HUGEINT on DuckDB so no 64-bit overflow exists
at any measured sf (the round-11 beta lesson).

Scale: all three collapse orders to the day grain first — one fact-sized
hash agg; the statistics run over day-count-sized frames.  Reference
parity: the reference (etl/main.go) has no analytics surface; extends
SURVEY.md §2.B's timeseries/finance family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from concurrent_etl_go_spark.llm.kmeans2 import _FDIV
from concurrent_etl_go_spark.operators.finance import _CENTS
from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.sources.readers import read_table


@query(
    "agg_omega_ratio",
    oracle=f"""
    WITH daily AS (
      SELECT o_orderpriority AS grp, date_trunc('day', o_orderdate) AS day,
             CAST(SUM({_CENTS}) AS BIGINT) AS cents
      FROM orders GROUP BY 1, 2
    ),
    rets AS (
      SELECT grp, cents - LAG(cents) OVER (PARTITION BY grp ORDER BY day)
               AS d
      FROM daily
    )
    SELECT grp,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(CASE WHEN d > 0 THEN d ELSE 0 END) AS BIGINT)
             AS gain_cents,
           CAST(SUM(CASE WHEN d < 0 THEN -d ELSE 0 END) AS BIGINT)
             AS loss_cents,
           CAST(CASE WHEN SUM(CASE WHEN d < 0 THEN -d ELSE 0 END) = 0
                THEN NULL
                ELSE SUM(CASE WHEN d > 0 THEN d ELSE 0 END) * 10000
                     // SUM(CASE WHEN d < 0 THEN -d ELSE 0 END)
                END AS BIGINT) AS omega_e4
    FROM rets WHERE d IS NOT NULL
    GROUP BY grp
    """,
)
def agg_omega_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Omega ratio (threshold 0) of daily revenue changes per order
    priority: the probability-weighted gains above the threshold over
    the losses below it — for a discrete series, simply
    ``sum(max(d,0)) / sum(max(-d,0))``.  Pure integer algebra: signed
    cent differences, two conditional sums, one e4-lattice floor
    quotient (NULL when the loss side is empty, matching the oracle).

    Scale: one orders scan -> (priority, day) hash agg; LAG and the
    group sums run per priority over day-count-sized partitions."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderdate", "o_totalprice"
    )
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("grp"),
        F.date_trunc("day", "o_orderdate").alias("day"),
    ).agg(F.sum(F.expr(_CENTS)).cast("long").alias("cents"))
    rets = daily.select(
        "grp",
        (
            F.col("cents")
            - F.lag("cents").over(Window.partitionBy("grp").orderBy("day"))
        ).alias("d"),
    ).where(F.col("d").isNotNull())
    gains = F.sum(F.when(F.col("d") > 0, F.col("d")).otherwise(F.lit(0)))
    losses = F.sum(F.when(F.col("d") < 0, -F.col("d")).otherwise(F.lit(0)))
    return rets.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        gains.cast("long").alias("gain_cents"),
        losses.cast("long").alias("loss_cents"),
        F.when(losses == 0, F.lit(None))
        .otherwise(F.expr(
            "SUM(CASE WHEN d > 0 THEN d ELSE 0 END) * 10000 div "
            "SUM(CASE WHEN d < 0 THEN -d ELSE 0 END)"
        ))
        .cast("long")
        .alias("omega_e4"),
    )


@query(
    "agg_sortino_sq",
    oracle=f"""
    WITH daily AS (
      SELECT o_orderpriority AS grp, date_trunc('day', o_orderdate) AS day,
             CAST(SUM({_CENTS}) AS BIGINT) AS cents
      FROM orders GROUP BY 1, 2
    ),
    rets AS (
      SELECT grp, cents - LAG(cents) OVER (PARTITION BY grp ORDER BY day)
               AS d
      FROM daily
    ),
    comp AS (
      SELECT grp,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(d) AS BIGINT) AS s1,
             SUM(CASE WHEN d < 0 THEN CAST(d AS HUGEINT) * d
                 ELSE 0 END) AS dd2
      FROM rets WHERE d IS NOT NULL GROUP BY grp
    )
    SELECT grp, n_days, s1,
           CAST(dd2 // n_days AS BIGINT) AS downside_msq,
           CAST(CASE WHEN dd2 = 0 THEN NULL
                ELSE CAST(s1 AS HUGEINT) * s1 * 1000000
                     // (n_days * dd2) END AS BIGINT) AS sortino_sq_e6
    FROM comp
    """,
)
def agg_sortino_sq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sortino-ratio components of daily revenue changes per priority,
    emitted SQUARED so no square root leaves the integer lattice:
    ``sortino^2 = mean^2 / (dd2 / n) = s1^2 / (n * dd2)`` on the e6
    lattice.  The sign lives in the emitted ``s1`` (mean excess
    return); the squared statistic is direction-blind by construction.
    The s1^2 and n*dd2 products run in DECIMAL(38,0)/HUGEINT — daily
    swings pass ~1e8 cents already at sf0.1, so sum-of-squares int64
    overflows (the round-11 beta lesson) — and the downside component
    is EMITTED per-day (``dd2 // n``, exact floor) because the raw
    sum-of-squares itself exceeds int64 at sf0.1.

    Scale: identical shape to agg_omega_ratio — one day-grain hash agg
    per priority."""
    big = "DECIMAL(38,0)"
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderdate", "o_totalprice"
    )
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("grp"),
        F.date_trunc("day", "o_orderdate").alias("day"),
    ).agg(F.sum(F.expr(_CENTS)).cast("long").alias("cents"))
    rets = daily.select(
        "grp",
        (
            F.col("cents")
            - F.lag("cents").over(Window.partitionBy("grp").orderBy("day"))
        ).alias("d"),
    ).where(F.col("d").isNotNull())
    comp = rets.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("d").cast("long").alias("s1"),
        F.sum(
            F.expr(f"CASE WHEN d < 0 THEN CAST(d AS {big}) * d ELSE 0 END")
        ).alias("dd2"),
    )
    return comp.select(
        "grp",
        "n_days",
        "s1",
        F.expr("dd2 div n_days").cast("long").alias("downside_msq"),
        F.when(F.col("dd2") == 0, F.lit(None))
        .otherwise(
            F.expr(f"CAST(s1 AS {big}) * s1 * 1000000 div (n_days * dd2)")
        )
        .cast("long")
        .alias("sortino_sq_e6"),
    )


#: Expected-shortfall tail fraction (worst 5% of days).
_ES_PCT = 5


@query(
    "agg_expected_shortfall",
    oracle=f"""
    WITH daily AS (
      SELECT o_orderpriority AS grp, date_trunc('day', o_orderdate) AS day,
             CAST(SUM({_CENTS}) AS BIGINT) AS cents
      FROM orders GROUP BY 1, 2
    ),
    rets AS (
      SELECT grp, day,
             cents - LAG(cents) OVER (PARTITION BY grp ORDER BY day) AS d
      FROM daily
    ),
    ranked AS (
      SELECT grp, d,
             ROW_NUMBER() OVER (PARTITION BY grp ORDER BY d, day) AS rk,
             COUNT(*) OVER (PARTITION BY grp) AS n
      FROM rets WHERE d IS NOT NULL
    ),
    tail AS (
      SELECT grp,
             CAST(MAX(n) AS BIGINT) AS n_days,
             CAST(GREATEST(MAX(n) * {_ES_PCT} // 100, 1) AS BIGINT)
               AS k_tail,
             CAST(SUM(d) AS BIGINT) AS s
      FROM ranked
      WHERE rk <= GREATEST(n * {_ES_PCT} // 100, 1)
      GROUP BY grp
    )
    SELECT grp, n_days, k_tail, s AS tail_sum_cents,
           CAST({_FDIV.format(s="s", n="k_tail", op="//")} AS BIGINT)
             AS es_cents
    FROM tail
    """,
)
def agg_expected_shortfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected shortfall (CVaR) of daily revenue changes per priority:
    the mean of the worst ``{pct}%`` of days, computed EXACTLY by rank —
    ``k = max(floor(n * {pct}/100), 1)`` smallest changes (ties broken
    by day for a total order), their sum, and the floored mean.  Pure
    integer algebra end to end; no quantile interpolation, no float.

    Scale: one day-grain hash agg per priority; the rank window runs
    over day-count-sized partitions and the tail sum is k-bounded."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderdate", "o_totalprice"
    )
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("grp"),
        F.date_trunc("day", "o_orderdate").alias("day"),
    ).agg(F.sum(F.expr(_CENTS)).cast("long").alias("cents"))
    rets = daily.select(
        "grp",
        "day",
        (
            F.col("cents")
            - F.lag("cents").over(Window.partitionBy("grp").orderBy("day"))
        ).alias("d"),
    ).where(F.col("d").isNotNull())
    w = Window.partitionBy("grp")
    ranked = rets.select(
        "grp",
        "d",
        F.row_number()
        .over(Window.partitionBy("grp").orderBy("d", "day"))
        .alias("rk"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    k = F.expr(f"GREATEST(n * {_ES_PCT} div 100, 1)")
    tail = (
        ranked.where(F.col("rk") <= k)
        .groupBy("grp")
        .agg(
            F.max("n").cast("long").alias("n_days"),
            F.greatest(
                F.expr(f"MAX(n) * {_ES_PCT} div 100"), F.lit(1)
            )
            .cast("long")
            .alias("k_tail"),
            F.sum("d").cast("long").alias("s"),
        )
    )
    # tail_sum is negative for a loss tail: the emitted mean uses the
    # portable SIGNED floor division (kmeans2._FDIV — Spark div
    # truncates toward zero, DuckDB // floors; subtracting the positive
    # modulus makes the division exact on both engines)
    return tail.select(
        "grp",
        "n_days",
        "k_tail",
        F.col("s").alias("tail_sum_cents"),
        F.expr(_FDIV.format(s="s", n="k_tail", op="div"))
        .cast("long")
        .alias("es_cents"),
    )


agg_expected_shortfall.__doc__ = agg_expected_shortfall.__doc__.format(
    pct=_ES_PCT
)


@query(
    "window_hurst_rs",
    oracle=f"""
    WITH daily AS (
      SELECT date_trunc('month', o_orderdate) AS month,
             date_trunc('day', o_orderdate) AS day,
             CAST(SUM({_CENTS}) AS BIGINT) AS x
      FROM orders GROUP BY 1, 2
    ),
    sized AS (
      SELECT month, day, x,
             CAST(SUM(x) OVER (PARTITION BY month) AS BIGINT) AS s1,
             CAST(COUNT(*) OVER (PARTITION BY month) AS BIGINT) AS n
      FROM daily
    ),
    cum AS (
      SELECT month, n, s1, x,
             SUM(n * x - s1) OVER (PARTITION BY month ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cumdev
      FROM sized
    ),
    comp AS (
      SELECT month, n, s1,
             CAST(MAX(cumdev) - MIN(cumdev) AS BIGINT) AS r_scaled,
             CAST(n * SUM(CAST(x AS HUGEINT) * x) - CAST(s1 AS HUGEINT)
                  * s1 AS HUGEINT) AS s2n
      FROM cum GROUP BY 1, 2, 3
    )
    SELECT month, n AS n_days, r_scaled,
           CAST(s2n // (n * n) AS BIGINT) AS var_cents2,
           CAST(CASE WHEN s2n = 0 THEN NULL
                ELSE CAST(r_scaled AS HUGEINT) * r_scaled * 10000 // s2n
                END AS BIGINT) AS rs_sq_e4
    FROM comp WHERE n >= 20
    """,
)
def window_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rescaled-range (Hurst R/S) statistic of daily revenue per
    calendar month, on the cleared-denominator integer lattice: with
    the mean cleared by scaling (``cumdev_j = sum(n*x_i - s1)``), the
    range ``R_scaled = max - min`` is ``n * R``; the population
    variance cancellation ``s2n = n*sum(x^2) - s1^2`` is ``n^2 *
    sigma^2`` — so ``(R/sigma)^2 = R_scaled^2 / s2n`` exactly, emitted
    on the e4 lattice.  A log-log regression of R/S against n is the
    Hurst exponent; this query hash-pins the per-window statistic both
    engines must agree on.  Wide products run in DECIMAL(38,0)/HUGEINT
    (x^2 passes 2^63 already at sf0.1's ~1e9-cent days), and the
    variance is EMITTED per-day^2 (``s2n // n^2`` = floor(sigma^2),
    exact) because the raw cancellation exceeds int64.  Months shorter
    than 20 trading days are dropped (ragged first/last month).

    Scale: one orders scan -> day-grain hash agg; the window functions
    run per month over day-count-sized partitions."""
    big = "DECIMAL(38,0)"
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    )
    daily = orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month"),
        F.date_trunc("day", "o_orderdate").alias("day"),
    ).agg(F.sum(F.expr(_CENTS)).cast("long").alias("x"))
    wm = Window.partitionBy("month")
    sized = daily.select(
        "month",
        "day",
        "x",
        F.sum("x").over(wm).cast("long").alias("s1"),
        F.count(F.lit(1)).over(wm).cast("long").alias("n"),
    )
    wcum = (
        Window.partitionBy("month")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = sized.select(
        "month",
        "n",
        "s1",
        "x",
        F.sum(F.col("n") * F.col("x") - F.col("s1"))
        .over(wcum)
        .alias("cumdev"),
    )
    comp = cum.groupBy("month", "n", "s1").agg(
        (F.max("cumdev") - F.min("cumdev")).cast("long").alias("r_scaled"),
        F.expr(
            f"CAST(n AS {big}) * SUM(CAST(x AS {big}) * x) "
            f"- CAST(s1 AS {big}) * s1"
        ).alias("s2n"),
    )
    return comp.where(F.col("n") >= 20).select(
        "month",
        F.col("n").alias("n_days"),
        "r_scaled",
        F.expr("s2n div (n * n)").cast("long").alias("var_cents2"),
        F.when(F.col("s2n") == 0, F.lit(None))
        .otherwise(
            F.expr(f"CAST(r_scaled AS {big}) * r_scaled * 10000 div s2n")
        )
        .cast("long")
        .alias("rs_sq_e4"),
    )

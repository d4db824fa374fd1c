"""Kaplan-Meier survival curve over customer lifetimes — the
right-censored churn analysis every retention team runs (Kaplan &
Meier 1958, public literature).

Lifetime = days between a customer's first and last order; customers
whose last order falls within ``_CENSOR_DAYS`` of the corpus' newest
order date are CENSORED (still active — their lifetime is a lower
bound, and dropping them would bias survival down, the classic
mistake KM exists to fix).  The estimator at event time t is

    S(t) = prod over event times t_i <= t of (1 - d_i / n_i)

with d_i = churns AT t_i and n_i = customers still at risk.

Exactness discipline (SURVEY §7.6): d_i and n_i are exact integers
from two hash aggregations; each factor is ONE division evaluated
identically; the running product folds LEFT-TO-RIGHT over the ordered
factor list via the ``agg_ewma``/``agg_holt_forecast`` prefix-fold
idiom (never ``exp(sum(ln ...))`` — unordered float sums jitter), and
emission is ROUND(6)+0.0.

Scale: grain-first — orders collapse to per-customer (first, last) in
one hash agg, then to per-duration counts (the event-time DIMENSION,
bounded by distinct lifetime lengths in days, never by customers);
the at-risk counts come from one descending cumulative sum over that
dimension and the prefix products cost O(T²) multiplies on the same
bounded T.  The curve itself is inherently a small ordered series —
the collect into one ordered list is the dimension collapse, not a
fact-table funnel.

Reference parity: no analytics surface exists in the reference
(etl/main.go); extends SURVEY.md §2.B's timeseries/retention family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.sources.readers import read_table

_CENSOR_DAYS = 90

#: The scalar product fold — identical text in both dialects.
_PROD_FOLD = "(acc, x) -> acc * x"


@query(
    "agg_survival_km",
    oracle=f"""
    WITH life AS MATERIALIZED (
      SELECT o_custkey,
             date_diff('day', MIN(o_orderdate), MAX(o_orderdate))
               AS dur,
             CASE WHEN date_diff('day', MAX(o_orderdate),
                                 (SELECT MAX(o_orderdate) FROM orders))
                       < {_CENSOR_DAYS}
                  THEN 0 ELSE 1 END AS churned
      FROM orders GROUP BY 1
    ),
    per_t AS MATERIALIZED (
      SELECT dur AS t_days,
             CAST(SUM(churned) AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM life GROUP BY 1
    ),
    risk AS MATERIALIZED (
      SELECT t_days, d,
             CAST(SUM(c) OVER (ORDER BY t_days DESC) AS BIGINT) AS n
      FROM per_t
    ),
    ev AS MATERIALIZED (
      SELECT t_days, d, n FROM risk WHERE d > 0
    ),
    packed AS (
      SELECT list(t_days ORDER BY t_days) AS ts,
             list(d ORDER BY t_days) AS ds,
             list(n ORDER BY t_days) AS ns,
             list(1.0 - CAST(d AS DOUBLE) / n ORDER BY t_days)
               AS factors
      FROM ev
    )
    SELECT CAST(ts[i] AS BIGINT) AS t_days,
           ns[i] AS n_risk,
           ds[i] AS n_events,
           ROUND(list_reduce(factors[1:i], {_PROD_FOLD}), 6) + 0.0
             AS survival
    FROM packed, (SELECT unnest(range(1, len(ts) + 1)) AS i) idx
    WHERE len(ts) > 0
    """,
)
def agg_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Kaplan-Meier curve: one row per churn event time with the
    at-risk count, the churn count, and the survival probability —
    "what fraction of customers are still active after t days",
    censoring-corrected.  ``n_risk`` descends, ``survival`` is
    non-increasing from just below 1.0; both invariants are
    pytest-pinned."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate"
    )
    anchor = orders.agg(F.max("o_orderdate").alias("mx"))
    life = (
        orders.groupBy("o_custkey")
        .agg(
            F.min("o_orderdate").alias("first"),
            F.max("o_orderdate").alias("last"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            F.datediff("last", "first").alias("dur"),
            F.when(
                F.datediff("mx", "last") < _CENSOR_DAYS, F.lit(0)
            )
            .otherwise(F.lit(1))
            .alias("churned"),
        )
    )
    per_t = life.groupBy(F.col("dur").alias("t_days")).agg(
        F.sum("churned").cast("long").alias("d"),
        F.count(F.lit(1)).cast("long").alias("c"),
    )
    from pyspark.sql import Window

    # at-risk = customers with duration >= t: one cumulative sum over
    # the DURATION dimension, descending (bounded by distinct lifetime
    # day counts — a dimension-sized window, the agg_revenue_lorenz
    # argument)
    w = Window.orderBy(F.desc("t_days")).rangeBetween(
        Window.unboundedPreceding, 0
    )
    risk = per_t.select(
        "t_days", "d", F.sum("c").over(w).cast("long").alias("n")
    )
    ev = risk.where(F.col("d") > 0)
    packed = ev.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("t_days", "d", "n"))),
            lambda s: s["t_days"],
        ).alias("ts"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("t_days", "d", "n"))),
            lambda s: s["d"],
        ).alias("ds"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("t_days", "d", "n"))),
            lambda s: s["n"],
        ).alias("ns"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("t_days", "d", "n"))),
            lambda s: F.lit(1.0) - s["d"].cast("double") / s["n"],
        ).alias("factors"),
    )
    exploded = packed.where(F.size("ts") > 0).select(
        F.explode(F.expr("sequence(1, size(ts))")).alias("i"),
        "ts",
        "ds",
        "ns",
        "factors",
    )
    return exploded.select(
        F.expr("element_at(ts, i)").cast("long").alias("t_days"),
        F.expr("element_at(ns, i)").alias("n_risk"),
        F.expr("element_at(ds, i)").alias("n_events"),
        F.expr(
            "ROUND(aggregate(slice(factors, 2, i - 1), "
            f"element_at(factors, 1), {_PROD_FOLD}), 6) + 0.0"
        ).alias("survival"),
    )


_BIG = "DECIMAL(38,0)"


@query(
    "agg_survival_na",
    oracle=f"""
    WITH life AS MATERIALIZED (
      SELECT o_custkey,
             date_diff('day', MIN(o_orderdate), MAX(o_orderdate))
               AS dur,
             CASE WHEN date_diff('day', MAX(o_orderdate),
                                 (SELECT MAX(o_orderdate) FROM orders))
                       < {_CENSOR_DAYS}
                  THEN 0 ELSE 1 END AS churned
      FROM orders GROUP BY 1
    ),
    per_t AS MATERIALIZED (
      SELECT dur AS t_days,
             CAST(SUM(churned) AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM life GROUP BY 1
    ),
    risk AS MATERIALIZED (
      SELECT t_days, d,
             CAST(SUM(c) OVER (ORDER BY t_days DESC) AS BIGINT) AS n
      FROM per_t
    ),
    steps AS (
      SELECT t_days, d, n,
             CAST(d AS HUGEINT) * 1000000000 // n AS h_step_e9
      FROM risk WHERE d > 0
    )
    SELECT t_days, n AS n_risk, d AS n_events,
           CAST(SUM(h_step_e9) OVER (
             ORDER BY t_days ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cum_hazard_e9
    FROM steps
    """,
)
def agg_survival_na(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard over the same censored customer
    lifetimes as ``agg_survival_km``: ``H(t) = sum over event times
    t_i <= t of d_i / n_i`` — the estimator of cumulative churn
    PRESSURE, preferred over KM when hazards are compared or fed into
    downstream models (Aalen 1978; Nelson 1972).  Unlike KM's float
    product fold, every step here is a ratio of integers, so the
    published convention applies: each step floor-divided in e9 fixed
    point, then an EXACT integer cumulative sum — bit-stable on both
    engines, no float discipline needed at all.

    Scale: identical shape to KM — customer-keyed agg, a
    duration-dimension descending cumulative window, then an
    event-times-only ascending cumsum."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate"
    )
    anchor = orders.agg(F.max("o_orderdate").alias("mx"))
    life = (
        orders.groupBy("o_custkey")
        .agg(
            F.min("o_orderdate").alias("first"),
            F.max("o_orderdate").alias("last"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            F.datediff("last", "first").alias("dur"),
            F.when(
                F.datediff("mx", "last") < _CENSOR_DAYS, F.lit(0)
            )
            .otherwise(F.lit(1))
            .alias("churned"),
        )
    )
    per_t = life.groupBy(F.col("dur").alias("t_days")).agg(
        F.sum("churned").cast("long").alias("d"),
        F.count(F.lit(1)).cast("long").alias("c"),
    )
    from pyspark.sql import Window

    w_risk = Window.orderBy(F.desc("t_days")).rangeBetween(
        Window.unboundedPreceding, 0
    )
    risk = per_t.select(
        "t_days", "d", F.sum("c").over(w_risk).cast("long").alias("n")
    )
    steps = risk.where(F.col("d") > 0).select(
        "t_days",
        "d",
        "n",
        # d*1e9 // n: non-negative, so (x - x % n)/n == floor == `//`
        F.expr(
            f"CAST((CAST(d AS {_BIG}) * 1000000000"
            f" - CAST(d AS {_BIG}) * 1000000000 % n) / n AS {_BIG})"
        ).alias("h_step_e9"),
    )
    w_cum = Window.orderBy("t_days").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return steps.select(
        # datediff is int32; the oracle's date_diff is BIGINT
        F.col("t_days").cast("long").alias("t_days"),
        F.col("n").alias("n_risk"),
        F.col("d").alias("n_events"),
        F.sum("h_step_e9").over(w_cum).cast("long").alias("cum_hazard_e9"),
    )


#: Log-rank group-1 definition: the BUILDING market segment vs rest.
_LOGRANK_SEGMENT = "BUILDING"


@query(
    "agg_logrank_test",
    oracle=f"""
    WITH life AS MATERIALIZED (
      SELECT o.o_custkey,
             CASE WHEN c.c_mktsegment = '{_LOGRANK_SEGMENT}'
                  THEN 1 ELSE 0 END AS g1,
             date_diff('day', MIN(o.o_orderdate), MAX(o.o_orderdate))
               AS dur,
             CASE WHEN date_diff('day', MAX(o.o_orderdate),
                                 (SELECT MAX(o_orderdate) FROM orders))
                       < {_CENSOR_DAYS}
                  THEN 0 ELSE 1 END AS churned
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    per_t AS MATERIALIZED (
      SELECT dur AS t_days,
             CAST(SUM(CASE WHEN g1 = 1 THEN churned ELSE 0 END)
               AS BIGINT) AS d1,
             CAST(SUM(churned) AS BIGINT) AS d,
             CAST(SUM(g1) AS BIGINT) AS c1,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM life GROUP BY 1
    ),
    risk AS MATERIALIZED (
      SELECT t_days, d1, d,
             CAST(SUM(c1) OVER (ORDER BY t_days DESC) AS BIGINT) AS n1,
             CAST(SUM(c) OVER (ORDER BY t_days DESC) AS BIGINT) AS n
      FROM per_t
    ),
    steps AS (
      SELECT d1, d, n1, n,
             CAST(d AS HUGEINT) * n1 * 1000000 // n AS e1_step_e6,
             CASE WHEN n > 1 THEN
               CAST(d AS HUGEINT) * n1 * (n - n1) * (n - d) * 1000000
                 // (CAST(n AS HUGEINT) * n * (n - 1))
             ELSE 0 END AS v_step_e6
      FROM risk WHERE d > 0
    ),
    tot AS (
      SELECT CAST(SUM(d1) AS HUGEINT) AS o1,
             CAST(SUM(e1_step_e6) AS HUGEINT) AS e1_e6,
             CAST(SUM(v_step_e6) AS HUGEINT) AS v_e6
      FROM steps
    )
    SELECT CAST(o1 AS BIGINT) AS o1,
           CAST(e1_e6 AS BIGINT) AS e1_e6,
           CAST(v_e6 AS BIGINT) AS var_e6,
           CAST(CASE WHEN v_e6 > 0 THEN
             (o1 * 1000000 - e1_e6) * (o1 * 1000000 - e1_e6) // v_e6
           ELSE 0 END AS BIGINT) AS chi2_e6
    FROM tot
    """,
)
def agg_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mantel-Haenszel log-rank test (Mantel 1966; Peto 1972): does the
    {_LOGRANK_SEGMENT} segment churn on a different survival curve than
    everyone else?  At each pooled event time the observed group-1
    events are compared against the hypergeometric expectation
    ``d*n1/n`` with variance ``d*n1*(n-n1)*(n-d) / (n^2*(n-1))``; the
    statistic ``(O1-E1)^2/V`` is chi-square(1) under the null.  Every
    step ratio uses the documented e6 floor-divide convention, summed
    exactly, so the result hashes bit-stable; the final division
    happens once, on the totals.

    Scale: one orders⋈customer equi-join, a customer-keyed agg, the
    duration-dimension descending risk window, and a single-row
    total."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate"
    )
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    anchor = orders.agg(F.max("o_orderdate").alias("mx"))
    life = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy(
            "o_custkey",
            F.when(
                F.col("c_mktsegment") == _LOGRANK_SEGMENT, F.lit(1)
            )
            .otherwise(F.lit(0))
            .alias("g1"),
        )
        .agg(
            F.min("o_orderdate").alias("first"),
            F.max("o_orderdate").alias("last"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "g1",
            F.datediff("last", "first").alias("dur"),
            F.when(
                F.datediff("mx", "last") < _CENSOR_DAYS, F.lit(0)
            )
            .otherwise(F.lit(1))
            .alias("churned"),
        )
    )
    per_t = life.groupBy(F.col("dur").alias("t_days")).agg(
        F.sum(
            F.when(F.col("g1") == 1, F.col("churned")).otherwise(0)
        ).cast("long").alias("d1"),
        F.sum("churned").cast("long").alias("d"),
        F.sum("g1").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("c"),
    )
    from pyspark.sql import Window

    w_risk = Window.orderBy(F.desc("t_days")).rangeBetween(
        Window.unboundedPreceding, 0
    )
    risk = per_t.select(
        "t_days",
        "d1",
        "d",
        F.sum("c1").over(w_risk).cast("long").alias("n1"),
        F.sum("c").over(w_risk).cast("long").alias("n"),
    )
    steps = risk.where(F.col("d") > 0).select(
        "d1",
        # d*n1*1e6 // n  (non-negative -> truncation == floor)
        F.expr(
            f"CAST((CAST(d AS {_BIG}) * n1 * 1000000"
            f" - CAST(d AS {_BIG}) * n1 * 1000000 % n) / n AS {_BIG})"
        ).alias("e1_step_e6"),
        F.expr(
            f"""CASE WHEN n > 1 THEN CAST((
                 CAST(d AS {_BIG}) * n1 * (n - n1) * (n - d) * 1000000
                 - CAST(d AS {_BIG}) * n1 * (n - n1) * (n - d) * 1000000
                   % (CAST(n AS {_BIG}) * n * (n - 1))
               ) / (CAST(n AS {_BIG}) * n * (n - 1)) AS {_BIG})
               ELSE CAST(0 AS {_BIG}) END"""
        ).alias("v_step_e6"),
    )
    tot = steps.agg(
        F.sum("d1").cast(_BIG).alias("o1"),
        F.sum("e1_step_e6").alias("e1_e6"),
        F.sum("v_step_e6").alias("v_e6"),
    )
    return tot.select(
        F.col("o1").cast("long").alias("o1"),
        F.col("e1_e6").cast("long").alias("e1_e6"),
        F.col("v_e6").cast("long").alias("var_e6"),
        F.expr(
            """CAST(CASE WHEN v_e6 > 0 THEN (
                 (o1 * 1000000 - e1_e6) * (o1 * 1000000 - e1_e6)
                 - (o1 * 1000000 - e1_e6) * (o1 * 1000000 - e1_e6)
                   % v_e6
               ) / v_e6 ELSE 0 END AS BIGINT)"""
        ).alias("chi2_e6"),
    )

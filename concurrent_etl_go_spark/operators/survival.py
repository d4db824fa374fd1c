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

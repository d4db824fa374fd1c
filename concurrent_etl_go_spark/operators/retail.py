"""TPC-DS-style retail analytics shapes — market-basket affinity and a
cross-channel rollup (SURVEY §2.B extension surface; the reference engine
has no analytics, these generalize its data model the way the TPC-H
queries in ``operators/relational*.py`` do).

Both are fully oracle-backed: pure relational algebra over the shared
tables, with the registry's float conventions (ROUND on both sides,
``+ 0.0`` signed-zero canonicalization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators import lib
from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.sources.readers import read_table

#: Market-basket window: one calendar year of orders (TPC-DS's
#: "store_sales in a date window" shape).
_BASKET_YEAR = 1995
_BASKET_TOP = 20


@query(
    "agg_market_basket",
    oracle=f"""
    WITH w AS (
      SELECT o_orderkey FROM orders
      WHERE year(o_orderdate) = {_BASKET_YEAR}
    ),
    li AS (
      SELECT DISTINCT l_orderkey, l_partkey
      FROM lineitem JOIN w ON l_orderkey = o_orderkey
    )
    SELECT a.l_partkey AS part_a,
           b.l_partkey AS part_b,
           COUNT(*) AS n_orders
    FROM li a
    JOIN li b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING COUNT(*) >= 2
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT {_BASKET_TOP}
    """,
)
def agg_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed market-basket affinity: the top part PAIRS co-ordered in
    the same order within one year, by basket count (TPC-DS's
    frequently-bought-together shape).

    Scale: the year filter prunes at the orders scan. No self-join:
    the order-key join, the per-basket ``collect_set`` (which IS the
    distinct), and the pair expansion share ONE order-key exchange —
    pairs are generated in-row from the sorted basket array (an
    index-and-slice double transform), then one pair-key aggregation.
    Pair blowup is quadratic in BASKET size, not table size, and the
    basket lives in one aggregation buffer — TPC-H baskets are <= 7
    items (max 21 pairs); for unbounded carts the standard guard is a
    per-basket item cap before pairing (``operators/graph2.py``'s
    group-cap precedent). Deterministic LIMIT: total order with
    explicit pair tie-breaks.
    """
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")
    w = orders.where(F.year("o_orderdate") == _BASKET_YEAR).select(
        F.col("o_orderkey").alias("l_orderkey")
    )
    baskets = (
        lineitem.select("l_orderkey", "l_partkey")
        .join(w, "l_orderkey")
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("parts"))
    )
    # all (a < b) pairs from the sorted basket, in-row: element i pairs
    # with every element after it (slice is 1-based, so start = i + 2)
    pairs = baskets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("parts"),
                    lambda x, i: F.transform(
                        F.slice(F.col("parts"), i + 2, F.size("parts")),
                        lambda y: F.struct(
                            x.alias("part_a"), y.alias("part_b")
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.part_a", "p.part_b")
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .where(F.col("n_orders") >= 2)
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(_BASKET_TOP)
    )


@query(
    "agg_cross_channel_rollup",
    oracle="""
    WITH unioned AS (
      SELECT 'orders' AS channel,
             strftime(o_orderdate, '%Y-%m') AS month,
             o_totalprice AS val
      FROM orders
      UNION ALL
      SELECT 'events' AS channel,
             strftime(ts, '%Y-%m') AS month,
             value AS val
      FROM events
    )
    SELECT channel, month,
           {total_sql} AS total,
           COUNT(*) AS n_rows
    FROM unioned
    GROUP BY ROLLUP (channel, month)
    """.format(total_sql=lib.exact_money_sum_sql("val")),
)
def agg_cross_channel_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-channel monthly rollup: union two revenue/activity channels
    (order totals, event values) on a conformed (channel, month) key and
    ROLLUP — per-channel-month, per-channel, and grand-total rows in one
    pass (the TPC-DS web/catalog/store union template).

    Scale: the union is free (no shuffle); the rollup is one hash
    aggregation with map-side partials over <= channels x months + 1
    grouping keys. The total accumulates via ``lib.exact_money_sum``
    (exact smallest-unit integers): the grand-total row sums EVERY
    order in the table, and by the repo's own error model a
    ROUND(SUM(double), 2) there sits inside cross-engine
    summation-order variance at sf1+ (~sqrt(n)*ulp(S) ~ 0.04 vs the
    0.005 rounding granularity) — the exact flake exact_money_sum
    eliminates for the ten converted TPC-H money queries.
    """
    orders = read_table(spark, sf_dir, "orders").select(
        F.lit("orders").alias("channel"),
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.col("o_totalprice").alias("val"),
    )
    events = read_table(spark, sf_dir, "events").select(
        F.lit("events").alias("channel"),
        F.date_format("ts", "yyyy-MM").alias("month"),
        F.col("value").alias("val"),
    )
    return (
        orders.unionByName(events)
        .rollup("channel", "month")
        .agg(
            lib.exact_money_sum(F.col("val")).alias("total"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


#: RFM anchor: the day after the TPC-H data's last order date — fixed so
#: recency is deterministic (never wall-clock).
_RFM_ANCHOR = "1998-08-03"


@query(
    "agg_customer_rfm",
    oracle=f"""
    WITH rfm AS (
      SELECT o_custkey AS custkey,
             date_diff('day', CAST(max(o_orderdate) AS DATE),
                       DATE '{_RFM_ANCHOR}') AS recency_days,
             COUNT(*) AS frequency,
             ROUND(SUM(o_totalprice), 2) + 0.0 AS monetary
      FROM orders GROUP BY 1
    )
    SELECT custkey, recency_days, frequency, monetary,
           (CASE WHEN recency_days <= 180 THEN 3
                 WHEN recency_days <= 720 THEN 2 ELSE 1 END) * 100
           + (CASE WHEN frequency >= 20 THEN 3
                   WHEN frequency >= 10 THEN 2 ELSE 1 END) * 10
           + (CASE WHEN monetary >= 2000000 THEN 3
                   WHEN monetary >= 1000000 THEN 2 ELSE 1 END)
               AS rfm_code
    FROM rfm
    """,
)
def agg_customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency/Frequency/Monetary customer segmentation (the classic
    retail scoring shape): days since last order against a FIXED anchor
    date, order count, and lifetime spend, combined into a 3-digit RFM
    code via fixed thresholds.

    Scale: one hash aggregation on ``o_custkey`` plus per-row CASE
    scoring — no window, no sort. Fixed-threshold scoring (not NTILE)
    is deliberate: quantile-based scores need a global rank, and the
    distributed-rank machinery (``operators/quantiles.py``) is overkill
    when the business thresholds are stable; the fixed form also keeps
    every row's score independent of corpus growth, like
    ``split_train_val_test``'s leakage argument.
    """
    orders = read_table(spark, sf_dir, "orders")
    rfm = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.datediff(
            F.lit(_RFM_ANCHOR).cast("date"),
            F.max("o_orderdate").cast("date"),
        )
        .cast("long")  # DuckDB date_diff is BIGINT; match it exactly
        .alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        (F.round(F.sum("o_totalprice"), 2) + F.lit(0.0)).alias("monetary"),
    )
    r_score = (
        F.when(F.col("recency_days") <= 180, 3)
        .when(F.col("recency_days") <= 720, 2)
        .otherwise(1)
    )
    f_score = (
        F.when(F.col("frequency") >= 20, 3)
        .when(F.col("frequency") >= 10, 2)
        .otherwise(1)
    )
    m_score = (
        F.when(F.col("monetary") >= 2_000_000, 3)
        .when(F.col("monetary") >= 1_000_000, 2)
        .otherwise(1)
    )
    return rfm.select(
        "custkey",
        "recency_days",
        "frequency",
        "monetary",
        (r_score * 100 + f_score * 10 + m_score).alias("rfm_code"),
    )


_MOVERS_TOP = 20


@query(
    "window_top_movers",
    oracle=f"""
    WITH monthly AS (
      SELECT p_brand AS brand,
             strftime(l_shipdate, '%Y-%m') AS month,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) + 0.0
                 AS revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1, 2
    ),
    lagged AS (
      SELECT brand, month, revenue,
             lag(revenue) OVER (PARTITION BY brand ORDER BY month)
                 AS prev_revenue
      FROM monthly
    )
    SELECT brand, month, revenue, prev_revenue,
           ROUND((revenue - prev_revenue) / prev_revenue, 6) + 0.0
               AS pct_change
    FROM lagged
    WHERE prev_revenue IS NOT NULL AND prev_revenue > 0
    ORDER BY pct_change DESC, brand, month
    LIMIT {_MOVERS_TOP}
    """,
)
def window_top_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue movers by part brand (the TPC-DS
    "which segment spiked" template): monthly brand revenue, LAG within
    each brand's month series, and the top month-over-month percentage
    gains.

    Scale: the part dimension broadcasts into the lineitem scan; the
    monthly rollup is one hash agg on (brand, month); the LAG window
    partitions by brand (25 TPC-H brands x ~84 months = tiny, evenly
    spread — never a global single-partition sort); the final top-N is
    a TakeOrdered over brand-months, not rows. Deterministic LIMIT:
    ordered by the ROUNDED pct with (brand, month) tie-breaks.
    """
    from pyspark.sql import Window

    lineitem = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    monthly = (
        lineitem.join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            lineitem.l_partkey == part.p_partkey,
        )
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.date_format("l_shipdate", "yyyy-MM").alias("month"),
        )
        .agg(
            (
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                    2,
                )
                + F.lit(0.0)
            ).alias("revenue")
        )
    )
    w = Window.partitionBy("brand").orderBy("month")
    lagged = monthly.withColumn("prev_revenue", F.lag("revenue").over(w))
    return (
        lagged.where(
            F.col("prev_revenue").isNotNull() & (F.col("prev_revenue") > 0)
        )
        .select(
            "brand",
            "month",
            "revenue",
            "prev_revenue",
            (
                F.round(
                    (F.col("revenue") - F.col("prev_revenue"))
                    / F.col("prev_revenue"),
                    6,
                )
                + F.lit(0.0)
            ).alias("pct_change"),
        )
        .orderBy(F.col("pct_change").desc(), "brand", "month")
        .limit(_MOVERS_TOP)
    )


@query(
    "agg_pareto_share",
    oracle="""
    WITH rev AS (
      SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS rev
      FROM orders GROUP BY 1
    ),
    thresh AS (SELECT quantile_cont(rev, 0.8) AS p80 FROM rev)
    SELECT ROUND(p80, 2) + 0.0 AS p80_revenue,
           COUNT(*) FILTER (WHERE rev >= p80) AS n_top_customers,
           COUNT(*) AS n_customers,
           ROUND(SUM(rev) FILTER (WHERE rev >= p80) / SUM(rev), 6) + 0.0
               AS top_revenue_share
    FROM rev CROSS JOIN thresh
    GROUP BY p80
    """,
)
def agg_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration (the 80/20 report): which share of total
    revenue the top-quintile customers carry. Per-customer revenue is
    ROUNDED to cents BEFORE the percentile so both engines rank the
    identical multiset (raw float sums differ in the last ulp and a
    boundary customer could flip sides of the threshold); the exact
    interpolated percentile then matches bit-for-bit (the
    ``agg_percentiles`` precedent).

    Scale: one customer-key hash agg, then a single-row threshold
    broadcast back over the small per-customer frame — the raw fact
    table is scanned once. The exact percentile buffers per-customer
    values (not raw rows); ``approx_percentile`` is the documented
    at-scale twin, as with ``agg_percentiles`` -> ``agg_approx``.
    """
    orders = read_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("rev")
    )
    thresh = rev.agg(F.expr("percentile(rev, 0.8)").alias("p80"))
    return (
        rev.crossJoin(F.broadcast(thresh))
        .groupBy("p80")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.count_if(F.col("rev") >= F.col("p80")).alias(
                "n_top_customers"
            ),
            (
                F.round(
                    F.sum(F.when(F.col("rev") >= F.col("p80"), F.col("rev")))
                    / F.sum("rev"),
                    6,
                )
                + F.lit(0.0)
            ).alias("top_revenue_share"),
        )
        .select(
            (F.round("p80", 2) + F.lit(0.0)).alias("p80_revenue"),
            "n_top_customers",
            "n_customers",
            "top_revenue_share",
        )
    )


@query(
    "agg_revenue_lorenz",
    oracle="""
    WITH rev AS (
      SELECT p_brand AS brand,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1
    ),
    tot AS (SELECT SUM(revenue) AS total FROM rev)
    SELECT brand, revenue,
           ROW_NUMBER() OVER (ORDER BY revenue DESC, brand) AS rank,
           ROUND(SUM(revenue) OVER (ORDER BY revenue DESC, brand)
                 / total, 6) + 0.0 AS cum_share
    FROM rev CROSS JOIN tot
    """,
)
def agg_revenue_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz-curve points over brand revenue: rank brands by revenue and
    report each rank's cumulative share of the total — the
    concentration curve behind ``agg_pareto_share``'s single 80/20
    number. Ranking keys on the cents-ROUNDED revenue (the multiset
    both engines agree on bit-for-bit) with a brand tie-break.

    Scale: the global window runs over the PRE-AGGREGATED brand frame —
    |brands| rows (25 in TPC-H), not facts — so the single-partition
    stage is bounded by dimension cardinality regardless of table size;
    the fact table contributes one broadcast-dim join + one hash agg.
    For high-cardinality keys (customers), the histogram/threshold
    machinery of ``operators/quantiles.py`` is the scalable form.
    """
    from pyspark.sql import Window

    lineitem = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    rev = (
        lineitem.join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            lineitem.l_partkey == part.p_partkey,
        )
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                2,
            ).alias("revenue")
        )
    )
    tot = rev.agg(F.sum("revenue").alias("total"))
    w = Window.orderBy(F.col("revenue").desc(), "brand")
    cum = Window.orderBy(F.col("revenue").desc(), "brand").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return rev.crossJoin(F.broadcast(tot)).select(
        "brand",
        "revenue",
        F.row_number().over(w).cast("long").alias("rank"),
        (
            F.round(F.sum("revenue").over(cum) / F.col("total"), 6)
            + F.lit(0.0)
        ).alias("cum_share"),
    )


@query(
    "agg_new_vs_returning",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, date_trunc('week', min(ts)) AS first_week
      FROM events GROUP BY 1
    ),
    weekly AS (
      SELECT DISTINCT date_trunc('week', ts) AS week, user_id FROM events
    )
    SELECT w.week,
           COUNT(*) FILTER (WHERE f.first_week = w.week) AS new_users,
           COUNT(*) FILTER (WHERE f.first_week <> w.week)
               AS returning_users
    FROM weekly w JOIN first_seen f USING (user_id)
    GROUP BY 1
    """,
)
def agg_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly new-vs-returning user mix — the growth-accounting split
    every product dashboard leads with: a user is "new" in the week of
    their first event and "returning" in any later active week
    (week grain because the shared events table spans ~one month;
    ``date_trunc('week')`` agrees across both engines — the graph2
    precedent).

    Scale: first-seen is one hash agg on the user key; the weekly
    active set dedups to (week, user) grain before joining (so the
    join carries user-weeks, not raw events); both sides shuffle on
    ``user_id`` once and the final rollup is |weeks| rows.
    """
    ev = read_table(spark, sf_dir, "events")
    week = F.date_trunc("week", "ts")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("first_week")
    )
    weekly = ev.select(week.alias("week"), "user_id").distinct()
    return (
        weekly.join(first_seen, "user_id")
        .groupBy("week")
        .agg(
            F.count_if(F.col("first_week") == F.col("week")).alias(
                "new_users"
            ),
            F.count_if(F.col("first_week") != F.col("week")).alias(
                "returning_users"
            ),
        )
    )

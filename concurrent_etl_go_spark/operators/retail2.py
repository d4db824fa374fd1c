"""Retail analytics pack 2: ROLLUP x window hybrid and repeat-purchase
interval distribution (round-7 TPC-DS-adjacent shapes, per the
``operators/retail.py`` pattern: each query is a classic retail template
with a full DuckDB oracle and a docstring scale argument).

Reference parity: the reference engine (etl/main.go) has no analytics
surface; these extend SURVEY.md §2.B.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators import lib
from concurrent_etl_go_spark.operators.registry import query, scoped_persist
from concurrent_etl_go_spark.sources.readers import read_table


@query(
    "agg_rollup_revenue_rank",
    oracle="""
    WITH src AS (
      SELECT o_orderpriority AS pri,
             strftime(o_orderdate, '%Y-%m') AS month,
             o_totalprice AS val
      FROM orders
    ),
    r AS (
      SELECT pri, month,
             CAST(GROUPING(pri) AS BIGINT) AS g_pri,
             CAST(GROUPING(month) AS BIGINT) AS g_month,
             {total_sql} AS revenue,
             COUNT(*) AS n_orders
      FROM src GROUP BY ROLLUP (pri, month)
    )
    SELECT pri, month, g_pri, g_month, revenue, n_orders,
           CAST(row_number() OVER (
               PARTITION BY g_pri, g_month
               ORDER BY revenue DESC, coalesce(pri, '~'),
                        coalesce(month, '~')
           ) AS BIGINT) AS rev_rank
    FROM r
    """.format(total_sql=lib.exact_money_sum_sql("val")),
)
def agg_rollup_revenue_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP x window hybrid: revenue by (priority, month) with subtotal
    and grand-total rows, then a revenue rank WITHIN each grouping level
    (leaf rows rank against leaves, per-priority subtotals against each
    other, the grand total trivially rank 1) — the "rank inside each
    rollup group" report shape TPC-DS writes with GROUPING() + RANK.

    Scale: the rollup is one hash aggregation (map-side partials) over
    <= priorities x months + priorities + 1 keys; the window then runs
    over the AGGREGATED output — bounded by dimension cardinality, never
    by fact rows, the same argument as ``agg_revenue_lorenz``.  Grouping
    flags + the '~' coalesce make the rank ordering total and null-free
    on both engines; revenue is exact (``lib.exact_money_sum``), so the
    DESC ordering cannot flip under summation-order variance.
    """
    src = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("pri"),
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.col("o_totalprice").alias("val"),
    )
    r = src.rollup("pri", "month").agg(
        F.grouping("pri").cast("long").alias("g_pri"),
        F.grouping("month").cast("long").alias("g_month"),
        lib.exact_money_sum(F.col("val")).alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = Window.partitionBy("g_pri", "g_month").orderBy(
        F.desc("revenue"),
        F.coalesce("pri", F.lit("~")),
        F.coalesce("month", F.lit("~")),
    )
    return r.select(
        "pri", "month", "g_pri", "g_month", "revenue", "n_orders",
        F.row_number().over(w).cast("long").alias("rev_rank"),
    )


#: Repeat-purchase gap buckets (days, upper-inclusive edges).
_GAP_EDGES = (30, 90, 180, 365)


def _gap_bucket_sql(col: str) -> str:
    """Shared CASE bucketing — valid in both dialects."""
    arms = []
    lo = 0
    for hi in _GAP_EDGES:
        arms.append(
            f"WHEN {col} <= {hi} THEN '{lo:03d}-{hi:03d}'"
        )
        lo = hi + 1
    return (
        "CASE " + " ".join(arms) + f" ELSE '{lo:03d}+' END"
    )


@query(
    "agg_repeat_purchase_intervals",
    oracle=f"""
    WITH g AS (
      SELECT o_custkey,
             date_diff('day',
                 CAST(lag(o_orderdate) OVER (
                     PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey) AS DATE),
                 CAST(o_orderdate AS DATE)) AS gap_days
      FROM orders
    )
    SELECT {_gap_bucket_sql('gap_days')} AS gap_bucket,
           COUNT(*) AS n_gaps,
           CAST(MIN(gap_days) AS BIGINT) AS min_gap,
           CAST(MAX(gap_days) AS BIGINT) AS max_gap,
           ROUND(AVG(gap_days), 4) + 0.0 AS avg_gap
    FROM g WHERE gap_days IS NOT NULL
    GROUP BY 1
    """,
)
def agg_repeat_purchase_intervals(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Repeat-purchase interval distribution: days between each
    customer's consecutive orders, bucketed into retention bands
    (0-30 / 31-90 / 91-180 / 181-365 / 366+) — the re-order cadence
    profile behind replenishment and churn models.

    Scale: one window pass partitioned by customer (the shuffle key is
    the natural per-entity key, same as ``sessionize_events``), then a
    5-bucket hash agg.  The lag ordering carries the o_orderkey
    tie-break so same-day orders produce a deterministic gap sequence
    on both engines.  Gaps are integers (day diffs), so min/max hash
    exactly; avg is an exact-int ratio (identical division on both
    engines) under the uniform ROUND + 0.0 idiom.
    """
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    g = orders.select(
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).alias("gap_days")
    ).where(F.col("gap_days").isNotNull())
    return g.groupBy(
        F.expr(_gap_bucket_sql("gap_days")).alias("gap_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.min("gap_days").cast("long").alias("min_gap"),
        F.max("gap_days").cast("long").alias("max_gap"),
        (F.round(F.avg("gap_days"), 4) + F.lit(0.0)).alias("avg_gap"),
    )


@query(
    "agg_cohort_ltv_curve",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey, MIN(CAST(o_orderdate AS DATE)) AS first_day
      FROM orders GROUP BY 1
    ),
    x AS (
      SELECT strftime(f.first_day, '%Y-%m') AS cohort_month,
             (year(CAST(o.o_orderdate AS DATE)) - year(f.first_day)) * 12
             + (month(CAST(o.o_orderdate AS DATE)) - month(f.first_day))
               AS age_months,
             CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS units
      FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
    ),
    cell AS (
      SELECT cohort_month, age_months,
             SUM(units) AS u, COUNT(*) AS n_orders
      FROM x GROUP BY 1, 2
    )
    SELECT cohort_month,
           CAST(age_months AS BIGINT) AS age_months,
           n_orders,
           (CAST(u AS DOUBLE) / 100.0) AS revenue,
           (CAST(SUM(u) OVER (PARTITION BY cohort_month
                              ORDER BY age_months) AS DOUBLE) / 100.0)
             AS cum_revenue
    FROM cell
    """,
)
def agg_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: revenue by (first-order-month cohort,
    months since first order), with the running cumulative per cohort —
    the LTV payback table next to ``agg_retention_cohort``'s count
    retention.

    Float discipline: revenue stays in exact smallest-unit INTEGERS all
    the way through BOTH aggregations (per-cell sum AND the cumulative
    window), dividing to dollars only at the edge — a double cumulative
    over rounded cell values would re-introduce the summation-order
    flake ``lib.exact_money_sum`` exists to kill, because 0.01 is not
    representable in binary.  Month age is pure date-part integer
    arithmetic (no months_between float).

    Scale: first-order derivation is one customer-keyed hash agg; the
    cell agg groups by (cohort, age) <= calendar^2 keys; the cumulative
    window partitions by cohort over <= ~80 age rows each — dimension-
    sized, never fact-sized."""
    orders = read_table(spark, sf_dir, "orders")
    firsts = orders.groupBy("o_custkey").agg(
        F.min(F.col("o_orderdate").cast("date")).alias("first_day")
    )
    od = F.col("o_orderdate").cast("date")
    x = orders.join(firsts, "o_custkey").select(
        F.date_format("first_day", "yyyy-MM").alias("cohort_month"),
        (
            (F.year(od) - F.year("first_day")) * 12
            + (F.month(od) - F.month("first_day"))
        ).cast("long").alias("age_months"),
        (F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("units"),
    )
    cell = x.groupBy("cohort_month", "age_months").agg(
        F.sum("units").alias("u"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = Window.partitionBy("cohort_month").orderBy("age_months")
    return cell.select(
        "cohort_month",
        "age_months",
        "n_orders",
        (F.col("u").cast("double") / 100.0).alias("revenue"),
        (F.sum("u").over(w).cast("double") / 100.0).alias("cum_revenue"),
    )


@query(
    "agg_shipping_delay_histogram",
    oracle=f"""
    WITH g AS (
      SELECT o.o_orderpriority AS pri,
             date_diff('day', CAST(o.o_orderdate AS DATE),
                       CAST(l.l_shipdate AS DATE)) AS delay_days
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT pri,
           {_gap_bucket_sql('delay_days')} AS delay_bucket,
           COUNT(*) AS n_items,
           CAST(MIN(delay_days) AS BIGINT) AS min_delay,
           CAST(MAX(delay_days) AS BIGINT) AS max_delay
    FROM g GROUP BY 1, 2
    """,
)
def agg_shipping_delay_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Order-to-ship delay distribution per order priority: days from
    order placement to each line item's ship date, bucketed into the
    shared retention bands — the fulfillment-SLA profile (does URGENT
    actually ship faster?).

    Scale: one fact-to-fact equi-join on the order key (orders side
    pruned to two columns; at 100 TB both sides pre-bucket on
    l_orderkey/o_orderkey, the ``write_bucketed`` co-location pattern)
    into a priorities x 5-bucket hash agg.  Integer day diffs — exact
    min/max/count hashing, no float discipline."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    ).select("o_orderkey", "o_orderdate", F.col("o_orderpriority").alias("pri"))
    g = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).select(
        "pri",
        F.datediff(
            F.col("l_shipdate").cast("date"),
            F.col("o_orderdate").cast("date"),
        ).alias("delay_days"),
    )
    return g.groupBy(
        "pri",
        F.expr(_gap_bucket_sql("delay_days")).alias("delay_bucket"),
    ).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.min("delay_days").cast("long").alias("min_delay"),
        F.max("delay_days").cast("long").alias("max_delay"),
    )


#: Association-rule parameters: minimum co-order support for a pair to
#: score, and the deterministic result cap.
_LIFT_MIN_SUPPORT = 2
_LIFT_TOP = 20


@query(
    "agg_basket_lift",
    oracle=f"""
    WITH li AS MATERIALIZED (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n AS MATERIALIZED (
      SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM li
    ),
    item AS MATERIALIZED (
      SELECT l_partkey AS pk, COUNT(*) AS c FROM li GROUP BY 1
    ),
    pairs AS MATERIALIZED (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             COUNT(*) AS n_ab
      FROM li a
      JOIN li b ON a.l_orderkey = b.l_orderkey
              AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= {_LIFT_MIN_SUPPORT}
    )
    SELECT part_a, part_b, CAST(n_ab AS BIGINT) AS n_ab,
           CAST(n_ab * 10000 // n.n_orders AS BIGINT) AS support_bp,
           CAST(n_ab * 10000 // ca.c AS BIGINT) AS conf_a_to_b_bp,
           CAST(n_ab * 10000 // cb.c AS BIGINT) AS conf_b_to_a_bp,
           CAST((n_ab * n.n_orders * 10000) // (ca.c * cb.c) AS BIGINT)
             AS lift_bp
    FROM pairs
    JOIN item ca ON ca.pk = part_a
    JOIN item cb ON cb.pk = part_b
    CROSS JOIN n
    ORDER BY lift_bp DESC, part_a, part_b
    LIMIT {_LIFT_TOP}
    """,
)
def agg_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule scoring (Agrawal & Srikant 1994, public
    literature) for co-ordered part pairs: support, both directional
    confidences, and lift, each as an INTEGER basis-point value via
    portable floor division — `(n_ab * N * 10000) div (c_a * c_b)` in
    DECIMAL(38,0), so the arithmetic neither overflows at 100 TB basket
    counts (n_ab * N * 10^4 ~ 1e22 for billion-basket tables — past
    int64, far inside decimal(38,0)/HUGEINT) nor touches a float (no
    cross-engine division representation to reconcile).  Top pairs by
    (lift DESC, part_a, part_b) — a fully deterministic order.

    Scale: the distinct pair table, the per-item counts, and the
    per-basket pair expansion (the ``agg_market_basket`` in-row
    basket-array idiom — blowup quadratic in BASKET size, not table
    size) all key on order/part hash partitions; item counts are a
    dimension-sized table joined back to pairs (broadcast under AQE at
    dim scale); the basket count rides along as a broadcast one-row
    frame.  TakeOrdered for the top-20, never a global sort."""
    # PERSISTED (scoped): the distinct pair table feeds the basket
    # count, the item counts, AND the basket arrays — three consumers,
    # one derivation (the _copurchase_edges precedent)
    li = scoped_persist(
        read_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n = li.agg(
        F.countDistinct("l_orderkey").alias("n_orders")
    )
    item = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.count(F.lit(1)).alias("c")
    )
    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )
    pairs = (
        baskets.select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("parts"),
                        lambda x, i: F.transform(
                            F.slice(
                                F.col("parts"), i + 2, F.size("parts")
                            ),
                            lambda y: F.struct(
                                x.alias("part_a"), y.alias("part_b")
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.part_a", "p.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= _LIFT_MIN_SUPPORT)
    )
    ca = item.select(F.col("pk").alias("part_a"), F.col("c").alias("c_a"))
    cb = item.select(F.col("pk").alias("part_b"), F.col("c").alias("c_b"))
    scored = (
        pairs.join(ca, "part_a")
        .join(cb, "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "n_ab",
            F.expr("n_ab * 10000 div n_orders").alias("support_bp"),
            F.expr("n_ab * 10000 div c_a").alias("conf_a_to_b_bp"),
            F.expr("n_ab * 10000 div c_b").alias("conf_b_to_a_bp"),
            F.expr(
                "CAST((CAST(n_ab AS DECIMAL(38,0)) * n_orders * 10000)"
                " div (CAST(c_a AS DECIMAL(38,0)) * c_b) AS BIGINT)"
            ).alias("lift_bp"),
        )
    )
    return scored.orderBy(
        F.desc("lift_bp"), "part_a", "part_b"
    ).limit(_LIFT_TOP)

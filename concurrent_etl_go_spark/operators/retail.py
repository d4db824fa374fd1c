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

    Scale: the year filter prunes at the orders scan; the distinct and
    the self-join both key on ``l_orderkey``, so one exchange
    co-partitions everything — the join is per-basket-local. Pair
    blowup is quadratic in BASKET size, not table size, and TPC-H
    baskets are <= 7 items (max 21 pairs/order); for unbounded carts
    the standard guard is a per-basket item cap before pairing (see
    ``operators/graph2.py``'s group-cap precedent). Deterministic
    LIMIT: total order with explicit pair tie-breaks.
    """
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")
    w = orders.where(F.year("o_orderdate") == _BASKET_YEAR).select(
        F.col("o_orderkey").alias("l_orderkey")
    )
    li = (
        lineitem.select("l_orderkey", "l_partkey")
        .join(w, "l_orderkey")
        .distinct()
    )
    a = li.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    pairs = a.join(b, "l_orderkey").where(F.col("part_a") < F.col("part_b"))
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
           ROUND(SUM(val), 2) + 0.0 AS total,
           COUNT(*) AS n_rows
    FROM unioned
    GROUP BY ROLLUP (channel, month)
    """,
)
def agg_cross_channel_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-channel monthly rollup: union two revenue/activity channels
    (order totals, event values) on a conformed (channel, month) key and
    ROLLUP — per-channel-month, per-channel, and grand-total rows in one
    pass (the TPC-DS web/catalog/store union template).

    Scale: the union is free (no shuffle); the rollup is one hash
    aggregation with map-side partials over <= channels x months + 1
    grouping keys. ROUND(sum, 2) keeps the hash stable across engine
    summation orders (the grand total sums every order in the table —
    at 4 decimals the float error envelope of a ~1e10 sum would sit too
    close to the rounding granularity); ``+ 0.0`` is the signed-zero
    canonicalization every oracle float column carries.
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
            (F.round(F.sum("val"), 2) + F.lit(0.0)).alias("total"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )

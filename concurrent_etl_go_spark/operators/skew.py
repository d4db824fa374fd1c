"""Skew-mitigation operators: salted two-phase aggregation.

At 100 TB real event streams are Zipfian — a handful of event types carry
most rows, so a plain ``groupBy(event_type)`` funnels the hot keys through
single reducers while the rest of the cluster idles. The standard fix is
salting: append a random-ish salt to the hot key, aggregate
(key, salt) partials in a first shuffle where every hot key fans out over
``SALT_BUCKETS`` reducers, then combine the partials in a second shuffle
whose input is only ``|keys| x SALT_BUCKETS`` rows — negligible.

AQE's skew handling (``spark.sql.adaptive.skewJoin``) only covers JOINS;
salting is the groupBy-side analogue and must be expressed in the plan.
The final result is bitwise the same aggregation a direct groupBy
computes (counts/sums are associative-commutative), which is exactly what
the DuckDB oracle checks.

Reference parity: generalizes the per-worker-lane partial counting of
reference etl/main.go:244-262 (each lane tallies its own slice, the run
report sums the lanes) into a shuffle-level technique.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators import lib
from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.sources.readers import read_table

#: Fan-out factor for hot keys. Sized to the executor count at scale
#: (spreading a hot key over more reducers than there are cores buys
#: nothing); 16 is plenty for local[32] while keeping the combine tiny.
SALT_BUCKETS = 16


@query(
    "agg_salted_skew",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS sum_value,
           ROUND(MAX(value), 4) AS max_value
    FROM events
    GROUP BY event_type
    """,
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type totals via SALTED two-phase aggregation.

    Phase 1 groups by (event_type, salt) — the salt is derived from the
    row's unique id, so each hot event_type spreads evenly over
    ``SALT_BUCKETS`` partial groups. Phase 2 re-groups the tiny partial
    relation by event_type alone. count/sum/max re-aggregate losslessly
    (count -> sum of partial counts, max -> max of partial maxes), so the
    result is identical to the direct groupBy the oracle runs.

    Spark's own map-side partial aggregation attacks the same problem
    per-partition; explicit salting additionally splits the REDUCER-side
    hot key, which partial aggregation alone cannot (every partial for a
    key still lands on one reducer). That distinction only matters when
    per-partition group cardinality is high enough that map-side combine
    degrades — precisely the skewed-fact-table regime this operator is
    for.
    """
    ev = read_table(spark, sf_dir, "events")
    salted = ev.withColumn(
        "_salt", F.pmod(F.xxhash64("event_id"), F.lit(SALT_BUCKETS))
    )
    partials = salted.groupBy("event_type", "_salt").agg(
        F.count(F.lit(1)).alias("p_cnt"),
        F.sum("value").alias("p_sum"),
        F.max("value").alias("p_max"),
    )
    return partials.groupBy("event_type").agg(
        F.sum("p_cnt").alias("n_events"),
        F.round(F.sum("p_sum"), 4).alias("sum_value"),
        F.round(F.max("p_max"), 4).alias("max_value"),
    )


@query(
    "join_salted_skew",
    oracle=f"""
    SELECT o.o_orderpriority AS priority,
           COUNT(*) AS n_items,
           {lib.exact_money_sum_sql(
               "l.l_extendedprice * (1 - l.l_discount)", scale=4
           )} AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by order priority through the SALTED fact-to-dimension
    join (``lib.salted_join``): the big side picks a per-row salt, the
    small side replicates once per salt, and the equi-join runs on
    (key, salt) so a pathological hot key spreads over ``n_salts``
    reducers. Row-identical to the plain join — which is exactly what
    the oracle runs.

    When to reach for it at 100 TB: AQE's skew-join splitter handles
    moderate skew by splitting oversized partitions, but it cannot split
    ONE key's rows across reducers mid-join when a single key exceeds an
    executor (the celebrity-user / null-key case). Explicit salting is
    the plan-level fix; its price — replicating the small side n_salts
    times — is why it is an opt-in operator, not the default join.
    """
    from concurrent_etl_go_spark.operators.lib import salted_join

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    joined = salted_join(li, orders, "l_orderkey", "o_orderkey")
    return joined.groupBy(
        F.col("o_orderpriority").alias("priority")
    ).agg(
        F.count(F.lit(1)).alias("n_items"),
        lib.exact_money_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=4
        ).alias("revenue"),
    )


@query(
    "join_null_skew_outer",
    oracle="""
    WITH ev AS (
      SELECT CASE WHEN user_id % 5 = 0 THEN NULL ELSE user_id END AS cust_key
      FROM events
    )
    SELECT c.c_mktsegment AS segment, COUNT(*) AS n_events
    FROM ev LEFT JOIN customer c ON ev.cust_key = c.c_custkey
    GROUP BY 1
    """,
)
def join_null_skew_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events per customer segment through a NULL-ROUTED outer join: rows
    whose join key is NULL (here every fifth user, mimicking anonymous /
    unattributed traffic) bypass the join entirely and re-enter via a
    union, instead of shuffling.

    The third classic skew shape after hot-key agg and hot-key join:
    NULL equi-join keys can never match, yet a plain outer join still
    hashes every NULL row into ONE reducer partition — at 100 TB an
    unattributed-traffic share of 20% means one task receives 20 TB. AQE
    cannot help (it splits matching work, not never-matching work).
    Routing NULLs around the join costs a predicate and a union of
    identically-shaped halves; the joined half carries only matchable
    keys, so its shuffle is skew-free. Result is row-identical to the
    plain LEFT JOIN the oracle runs.
    """
    ev = read_table(spark, sf_dir, "events").select(
        F.when(F.col("user_id") % 5 != 0, F.col("user_id")).alias("cust_key")
    )
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    matched = (
        ev.where(F.col("cust_key").isNotNull())
        .join(cust, F.col("cust_key") == F.col("c_custkey"), "left")
        .select(F.col("c_mktsegment").alias("segment"))
    )
    null_half = ev.where(F.col("cust_key").isNull()).select(
        F.lit(None).cast("string").alias("segment")
    )
    return (
        matched.unionByName(null_half)
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )

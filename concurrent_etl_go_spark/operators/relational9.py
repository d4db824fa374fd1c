"""Ninth coverage batch: the remaining classic TPC-H query shapes, adapted
to the test-data star schema (no partsupp table; no commit/receipt dates —
"late" is defined as shipping >60 days after the order date; no shipmode —
``l_linestatus`` stands in as the class column where Q12 needs one).

Reference parity: these generalize the single scan->filter->aggregate
dataflow of etl/main.go:188-222 into the full decision-support shapes a
user of the reference would expect an analytics engine to run.

Scale themes (see each docstring): dimension sides broadcast, fact-side
aggregations are single hash-aggs with map-side partials, EXISTS / NOT
EXISTS become semi / anti joins (never row-expanding inner joins),
correlated scalar aggregates become one grouped aggregate + an equi-join
(Catalyst's own decorrelation shape), and "argmax within group" is a
window over the already-aggregated (small) relation, not the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.sources.readers import read_table


@query(
    "agg_q6_forecast",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 4) AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def agg_q6_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): pure scan->filter->global agg.

    Scale: the three predicates all push to the parquet scan
    (PushedFilters), the projection prunes to two columns, and the global
    sum is a map-side partial + single-row final — the cheapest possible
    plan at any scale factor.
    """
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4)
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "join_q4_priority",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY 1
    """,
)
def join_q4_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order-priority checking), adapted: an order counts when
    some line item shipped more than 30 days after the order date.

    Scale: EXISTS is a LEFT SEMI join on the order key (one shuffle, no
    row expansion however many line items match), then a 5-group hash-agg.
    The date filter pushes to the orders scan and bounds the semi join's
    left side before the shuffle.
    """
    orders = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "agg_q13_custdist",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY 1
    )
    GROUP BY 1
    """,
)
def agg_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution): left join so
    zero-order customers survive with c_count = 0, then a histogram of
    customers per order count.

    Scale: first agg shuffles on the customer key (the join's own key, so
    AQE coalesces join+agg into one exchange); the second agg's domain is
    tiny (distinct order counts) — a broadcast-size reduction.
    """
    customer = read_table(spark, sf_dir, "customer").select("c_custkey")
    orders = read_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "agg_q14_promo",
    oracle="""
    SELECT ROUND(
             100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
             / SUM(l.l_extendedprice * (1 - l.l_discount)), 4
           ) AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
      AND l.l_shipdate < TIMESTAMP '1996-10-01'
    """,
)
def agg_q14_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): share of one month's revenue from
    PROMO-type parts.

    Scale: part is the dimension — broadcast, so the month of lineitem
    never shuffles; both sums fold into one hash-agg pass (a single
    conditional projection, not two scans).
    """
    li = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "join_q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def join_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): the supplier(s) whose quarter revenue
    equals the maximum quarter revenue.

    The revenue is rounded BEFORE the max comparison on both sides so the
    float argmax is deterministic across engines. Scale: the fact scan
    aggregates down to one row per supplier first; the global max is a
    one-row aggregate of that tiny relation broadcast back in (no
    single-partition window over it), and the supplier join broadcasts.
    """
    li = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
        .alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_rev"))
    top = revenue.join(F.broadcast(max_rev)).where(
        F.col("total_revenue") == F.col("max_rev")
    )
    supplier = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        top.join(F.broadcast(supplier), top.supplier_no == supplier.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "agg_q17_small_qty",
    oracle="""
    WITH brand_parts AS (
      SELECT p_partkey FROM part WHERE p_brand = 'Brand#3'
    ),
    li AS (
      SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
      FROM lineitem l JOIN brand_parts b ON b.p_partkey = l.l_partkey
    )
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 4) AS avg_yearly
    FROM li l
    WHERE l.l_quantity < (
      SELECT 0.5 * AVG(l2.l_quantity) FROM li l2
      WHERE l2.l_partkey = l.l_partkey
    )
    """,
)
def agg_q17_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): revenue from line items
    below half the part's average quantity, for one brand.

    Scale: the correlated AVG subquery decorrelates into one grouped
    aggregate over the brand-restricted line items plus an equi-join back
    — the same plan Catalyst produces for the SQL form, written
    explicitly. The brand part list broadcasts, so the only shuffle is
    the per-part average (and AQE broadcasts that small agg back too).
    """
    brand_parts = (
        read_table(spark, sf_dir, "part")
        .where(F.col("p_brand") == "Brand#3")
        .select("p_partkey")
    )
    li = (
        read_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey"))
    )
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg_qty")
    )
    return (
        li.join(avg_qty, li.l_partkey == avg_qty.ap_partkey)
        .where(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


@query(
    "join_q21_late_supplier",
    oracle="""
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN late l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM late l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      )
    GROUP BY 1
    ORDER BY numwait DESC, s.s_name
    LIMIT 10
    """,
)
def join_q21_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting), adapted: a supplier
    "waits" an order when it shipped >60 days after the order date on a
    finished multi-supplier order where no OTHER supplier shipped late.

    Scale: both quantifiers stay semi/anti — EXISTS(other supplier) is a
    LEFT SEMI against the narrow (orderkey, suppkey) projection and NOT
    EXISTS(other late supplier) is a LEFT ANTI against the late set; both
    shuffle on the order key they already share, so AQE reuses one
    exchange layout. No row expansion anywhere, and the top-10 is
    TakeOrderedAndProject.
    """
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderstatus"
    )
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    )
    finished = (
        orders.where(F.col("o_orderstatus") == "F").select("o_orderkey")
    )
    l1 = late.join(
        finished, late.l_orderkey == finished.o_orderkey, "left_semi"
    )
    l2 = li.select(
        F.col("l_orderkey").alias("x_orderkey"),
        F.col("l_suppkey").alias("x_suppkey"),
    )
    other = (F.col("x_orderkey") == F.col("l_orderkey")) & (
        F.col("x_suppkey") != F.col("l_suppkey")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("x_orderkey"),
        F.col("l_suppkey").alias("x_suppkey"),
    )
    waiting = l1.join(l2, other, "left_semi").join(l3, other, "left_anti")
    supplier = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    return (
        waiting.join(F.broadcast(supplier), waiting.l_suppkey == supplier.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(10)
    )


@query(
    "agg_q22_idle_customers",
    oracle="""
    SELECT c.c_nationkey, COUNT(*) AS numcust,
           ROUND(SUM(c.c_acctbal), 4) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (
        SELECT AVG(c2.c_acctbal) FROM customer c2 WHERE c2.c_acctbal > 0.0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY 1
    """,
)
def agg_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity), adapted to churn: well-funded
    customers (above the average positive balance) with no order since
    2000-01-01, counted per nation. (In this synthetic data every
    customer has SOME order, so the classic never-ordered predicate is
    vacuous; the recency cutoff keeps the quantifier shape meaningful.)

    Scale: the scalar AVG is a one-row aggregate cross-joined (broadcast
    of literally one row) into the filter; NOT EXISTS is a LEFT ANTI join
    on the customer key against the date-pruned orders projection; the
    final agg has a 25-key domain.
    """
    customer = read_table(spark, sf_dir, "customer")
    avg_pos = customer.where(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    orders = (
        read_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        customer.join(F.broadcast(avg_pos))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 4).alias("totacctbal"),
        )
    )


@query(
    "agg_q8_market_share",
    oracle="""
    WITH allrows AS (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n1.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
    )
    SELECT o_year,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_2' THEN volume ELSE 0 END)
                 / SUM(volume), 4) AS mkt_share
    FROM allrows GROUP BY 1
    """,
)
def agg_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): NATION_2's share of PROMO-part
    revenue sold to ASIA-region customers, by order year.

    Scale: the widest join in the suite — 8 relations — but only two are
    facts (lineitem, orders); part, customer, supplier, nation x2 and
    region all broadcast (customer at TPC-H scale would instead shuffle —
    the explicit broadcasts here mark which sides are dimension-shaped in
    THIS schema). Both the numerator and denominator fold into one
    conditional hash-agg keyed by the ~7 distinct years.
    """
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    part = (
        read_table(spark, sf_dir, "part")
        .where(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    customer = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    cust_nation = nation.select("n_nationkey", "n_regionkey")
    supp_nation = nation.select(
        F.col("n_nationkey").alias("sn_nationkey"),
        F.col("n_name").alias("supp_nation"),
    )
    supplier = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(
            F.broadcast(cust_nation),
            customer.c_nationkey == cust_nation.n_nationkey,
        )
        .join(F.broadcast(region), cust_nation.n_regionkey == region.r_regionkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(
            F.broadcast(supp_nation),
            supplier.s_nationkey == supp_nation.sn_nationkey,
        )
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        joined.select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_2", F.col("volume"))
                    .otherwise(0.0)
                )
                / F.sum("volume"),
                4,
            ).alias("mkt_share")
        )
    )


@query(
    "agg_q11_balance_share",
    oracle="""
    WITH nb AS (
      SELECT s_nationkey, ROUND(SUM(s_acctbal), 4) AS nation_bal
      FROM supplier GROUP BY 1
    )
    SELECT s_nationkey, nation_bal FROM nb
    WHERE nation_bal > (SELECT 0.05 * SUM(s_acctbal) FROM supplier)
    """,
)
def agg_q11_balance_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock), adapted to supplier balances:
    nations holding more than 5% of total supplier account balance —
    a grouped aggregate HAVING-filtered against a global scalar aggregate.

    Scale: one grouped agg + one single-row agg over the same scan
    (Spark reuses the exchange); the scalar threshold broadcasts as a
    one-row cross join. The group-side sum is rounded on both engines
    before the comparison.
    """
    supplier = read_table(spark, sf_dir, "supplier").select(
        "s_nationkey", "s_acctbal"
    )
    nb = supplier.groupBy("s_nationkey").agg(
        F.round(F.sum("s_acctbal"), 4).alias("nation_bal")
    )
    total = supplier.agg((0.05 * F.sum("s_acctbal")).alias("threshold"))
    return (
        nb.join(F.broadcast(total))
        .where(F.col("nation_bal") > F.col("threshold"))
        .select("s_nationkey", "nation_bal")
    )


@query(
    "agg_q12_priority_class",
    oracle="""
    SELECT l.l_linestatus AS ship_class,
           COUNT(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS high_line_count,
           COUNT(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS low_line_count
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
)
def agg_q12_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-priority split); ``l_linestatus`` stands
    in for the missing shipmode column as the class axis.

    Scale: the one shuffle is the orderkey join (AQE broadcast-izes the
    year-filtered side when small enough); both conditional counts fold
    into a single 2-group hash-agg.
    """
    li = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("l_linestatus").alias("ship_class"))
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


@query(
    "join_q2_min_supplier",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    cost AS (
      SELECT ps.l_partkey, s.s_suppkey, s.s_name, s.s_acctbal
      FROM ps JOIN supplier s ON s.s_suppkey = ps.l_suppkey
    )
    SELECT p.p_partkey, p.p_brand, c.s_suppkey, c.s_name, c.s_acctbal
    FROM part p JOIN cost c ON c.l_partkey = p.p_partkey
    WHERE p.p_size <= 10 AND p.p_type = 'SMALL'
      AND c.s_acctbal = (
        SELECT MIN(c2.s_acctbal) FROM cost c2
        WHERE c2.l_partkey = p.p_partkey
      )
    """,
)
def join_q2_min_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier), adapted: the part-supplier
    relation is derived from lineitem history (no partsupp table), and the
    "cost" being minimized is the supplier's account balance.

    Scale: the correlated MIN becomes a window-min over the part key on
    the cost relation — computed AFTER the part filter broadcasts in, so
    the window only ever sees the few surviving parts' rows, never the
    full part-supplier history. Ties (equal min balance) emit all
    minimal suppliers on both engines.
    """
    ps = (
        read_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    supplier = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal"
    )
    part = (
        read_table(spark, sf_dir, "part")
        .where((F.col("p_size") <= 10) & (F.col("p_type") == "SMALL"))
        .select("p_partkey", "p_brand")
    )
    cost = ps.join(F.broadcast(supplier), ps.l_suppkey == supplier.s_suppkey)
    filtered = cost.join(F.broadcast(part), cost.l_partkey == part.p_partkey)
    w = Window.partitionBy("p_partkey")
    return (
        filtered.withColumn("min_bal", F.min("s_acctbal").over(w))
        .where(F.col("s_acctbal") == F.col("min_bal"))
        .select("p_partkey", "p_brand", "s_suppkey", "s_name", "s_acctbal")
    )

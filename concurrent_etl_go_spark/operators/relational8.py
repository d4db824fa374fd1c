"""Eighth coverage batch: multi-join TPC-H shapes (Q7 / Q10), robust
central-tendency aggregates, percent_rank, gap-based sessionization, and
a token-length histogram.

Scale notes are per-query; the common themes: dimension joins broadcast,
fact-side aggregations are single hash-aggs with map-side partials, and
sessionization is one window shuffle on the user key (the same layout a
100 TB event store would already be bucketed by).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators import lib
from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.sources.readers import read_table


@query(
    "join_q10_returns",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def join_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item revenue per customer, top 20).

    Reference parity: generalizes the scan->join->aggregate dataflow of
    etl/main.go:188-222 to a 4-table star. Scale: the returnflag filter
    pushes to the lineitem scan; nation broadcasts; customer/orders/
    lineitem join on their natural keys (AQE picks broadcast for orders'
    filtered side when small); the top-20 is TakeOrderedAndProject, never
    a full sort.
    """
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    )
    nation = read_table(spark, sf_dir, "nation")
    joined = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
    )
    return (
        joined.groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "join_q7_volume",
    oracle="""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS volume
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation ns ON ns.n_nationkey = s.s_nationkey
    JOIN nation nc ON nc.n_nationkey = c.c_nationkey
    WHERE ns.n_nationkey <> nc.n_nationkey
    GROUP BY 1, 2, 3
    """,
)
def join_q7_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-nation shipping volume by (supplier nation,
    customer nation, year), excluding domestic flows.

    Scale: both nation joins broadcast (tiny dims, aliased independently);
    the fact chain shuffles once per equi-join key and the final rollup is
    a 3-key hash agg with map-side partials. The year is derived pre-agg
    so the aggregation key is narrow.
    """
    lineitem = read_table(spark, sf_dir, "lineitem")
    supplier = read_table(spark, sf_dir, "supplier")
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    ns = nation.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    nc = nation.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        lineitem.join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .where(F.col("ns_key") != F.col("nc_key"))
    )
    return joined.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("long").alias("l_year"),
    ).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("volume")
    )


@query(
    "agg_median_mode",
    oracle="""
    WITH freq AS (
        SELECT l_returnflag, l_quantity, COUNT(*) AS cnt
        FROM lineitem GROUP BY 1, 2
    ),
    ranked AS (
        SELECT l_returnflag, l_quantity,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                  ORDER BY cnt DESC, l_quantity) AS rn
        FROM freq
    ),
    med AS (
        SELECT l_returnflag, median(l_quantity) AS med
        FROM lineitem GROUP BY 1
    )
    SELECT med.l_returnflag,
           ROUND(med.med, 4) AS median_qty,
           ranked.l_quantity AS mode_qty
    FROM med JOIN ranked ON ranked.l_returnflag = med.l_returnflag
    WHERE ranked.rn = 1
    """,
)
def agg_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median and mode of quantity per return flag.

    The mode uses an EXPLICIT deterministic rule — highest count, smallest
    value on ties — via a count+row_number pipeline expressed identically
    in both engines, because builtin ``mode()`` tie-breaking is
    engine-defined. Scale: the frequency table is a narrow two-key agg;
    the per-group argmax is a window over groups (group cardinality, not
    row cardinality). Exact median is a full per-group sort at scale —
    ``agg_approx``'s percentile_approx is the documented 100 TB
    substitute.
    """
    li = read_table(spark, sf_dir, "lineitem")
    freq = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("cnt").desc(), F.col("l_quantity")
    )
    mode = (
        freq.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("l_returnflag", F.col("l_quantity").alias("mode_qty"))
    )
    med = li.groupBy("l_returnflag").agg(
        F.round(F.median("l_quantity"), 4).alias("median_qty")
    )
    return med.join(mode, "l_returnflag").select(
        "l_returnflag", "median_qty", "mode_qty"
    )


@query(
    "window_percent_rank",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           ROUND(percent_rank() OVER (PARTITION BY c_mktsegment
                                      ORDER BY c_acctbal), 4) AS acctbal_pr
    FROM customer
    """,
)
def window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank of account balance within each market segment —
    the rank-normalization primitive (e.g. per-domain quality-score
    normalization in a training-data pipeline). One window shuffle on the
    segment key; ties rank identically in both engines by definition of
    percent_rank."""
    customer = read_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal")
    return customer.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.percent_rank().over(w), 4).alias("acctbal_pr"),
    )


@query(
    "sessionize_events",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_id, ts,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                            > 30 * 60 * 1000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    tagged AS (
        SELECT user_id, ts,
               SUM(is_new) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM ordered
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           COUNT(*) AS n_events,
           MIN(ts) AS session_start,
           CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT) AS dur_us
    FROM tagged
    GROUP BY user_id, session_seq
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch gap-based sessionization (30-minute inactivity): the batch
    twin of the streaming session window (``window_session``), and the
    canonical behavioral-analytics primitive.

    A lag-vs-threshold flag plus a running sum assigns session sequence
    numbers per user, then one hash-agg rolls up per-session stats. Scale:
    both windows and the final agg share the user-id partitioning — ONE
    shuffle total; an event store bucketed by user_id would need none.
    Ordering is (ts, event_id) so same-timestamp events sessionize
    deterministically in both engines.
    """
    ev = read_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000

    # The events parquet stores ts as tz-naive timestamp[us], which Spark
    # reads as TIMESTAMP_NTZ — unix_micros only accepts TIMESTAMP (ltz).
    # The session timezone is pinned to UTC (read_table), so this cast is
    # a deterministic reinterpretation, and a no-op if ts is already ltz.
    def epoch_us(col):
        return F.unix_micros(col.cast("timestamp"))

    prev_us = epoch_us(F.lag("ts").over(w))
    is_new = F.when(
        prev_us.isNull() | (epoch_us(F.col("ts")) - prev_us > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    tagged = ev.withColumn(
        "session_seq",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return tagged.groupBy(
        "user_id", F.col("session_seq").cast("long").alias("session_seq")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        (F.unix_micros(F.max("ts").cast("timestamp"))
         - F.unix_micros(F.min("ts").cast("timestamp")))
        .cast("long")
        .alias("dur_us"),
    )


@query(
    "text_token_histogram",
    oracle="""
    SELECT CAST(len(string_split(text, ' ')) // 10 * 10 AS BIGINT)
               AS token_bucket,
           COUNT(*) AS n_docs,
           MIN(len(string_split(text, ' '))) AS min_tokens,
           MAX(len(string_split(text, ' '))) AS max_tokens
    FROM documents
    GROUP BY 1
    """,
)
def text_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length histogram in 10-token buckets — the corpus-shape
    profile a sequence-packing/curriculum stage reads first. Single scan,
    single narrow-key hash agg; the token count is computed once and
    reused (materialized column, not re-split per aggregate)."""
    docs = read_table(spark, sf_dir, "documents")
    with_tokens = docs.select(
        # cast: Spark size() is int32, the oracle's len() is int64
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens")
    )
    return (
        with_tokens.select(
            (F.floor(F.col("n_tokens") / 10) * 10)
            .cast("long")
            .alias("token_bucket"),
            "n_tokens",
        )
        .groupBy("token_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
    )


@query(
    "join_q18_large_orders",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice,
           ROUND(SUM(l.l_quantity), 4) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
    )
    GROUP BY 1, 2, 3, 4
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
)
def join_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers with very large orders — an
    aggregation-defined IN-subquery (HAVING) feeding a semi join, then a
    re-aggregation over the joined star.

    Scale: the HAVING subquery is a map-side-combined agg producing a
    SMALL key set, which semi-joins the fact chain before the expensive
    star join (Catalyst rewrites IN to LeftSemi and pushes it below); the
    top-20 is TakeOrderedAndProject on o_totalprice.
    """
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 250)
        .select("l_orderkey")
    )
    joined = (
        orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
        .join(customer, F.col("o_custkey") == customer.c_custkey)
        .join(lineitem, F.col("o_orderkey") == lineitem.l_orderkey)
    )
    return (
        joined.groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 4).alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


@query(
    "filter_q19_disjunctive",
    oracle=f"""
    SELECT {lib.exact_money_sum_sql(
               "l.l_extendedprice * (1 - l.l_discount)", scale=4
           )} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 10)
       OR (p.p_brand = 'Brand#17' AND p.p_size BETWEEN 10 AND 40
           AND l.l_quantity >= 20)
       OR (p.p_type = 'ECONOMY' AND l.l_quantity < 5)
    """,
)
def filter_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR-of-ANDs predicate mixing
    columns from BOTH join sides — the classic test of disjunctive
    predicate handling.

    Scale: Catalyst extracts the common join key (equi-join, not a
    cartesian with a residual filter) and pushes the single-side
    conjuncts it can factor out to the scans; the mixed-side disjunction
    evaluates post-join inside whole-stage codegen. One broadcast-able
    part dim, one agg row out.
    """
    lineitem = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    joined = lineitem.join(
        F.broadcast(part), lineitem.l_partkey == part.p_partkey
    )
    cond = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 15)
        & (F.col("l_quantity") >= 10)
    ) | (
        (F.col("p_brand") == "Brand#17")
        & F.col("p_size").between(10, 40)
        & (F.col("l_quantity") >= 20)
    ) | (
        (F.col("p_type") == "ECONOMY") & (F.col("l_quantity") < 5)
    )
    return joined.where(cond).agg(
        lib.exact_money_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=4
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "window_nth_value",
    oracle="""
    SELECT o_custkey, o_orderkey,
           nth_value(o_totalprice, 2) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS second_order_price
    FROM orders
    """,
)
def window_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value over the full partition frame: each order row carries the
    customer's second-ever order price (null for single-order customers).
    Deterministic (orderdate, orderkey) ordering; one window shuffle."""
    orders = read_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.nth_value("o_totalprice", 2).over(w).alias("second_order_price"),
    )


@query(
    "agg_bool_and_or",
    oracle="""
    SELECT l_returnflag,
           bool_and(l_quantity > 5) AS all_qty_gt5,
           bool_or(l_discount > 0.09) AS any_deep_discount,
           COUNT(CASE WHEN l_tax > 0.05 THEN 1 END) AS n_high_tax
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_bool_and_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (universal/existential per group) plus a
    conditional count — single hash agg with map-side partials."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bool_and(F.col("l_quantity") > 5).alias("all_qty_gt5"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_deep_discount"),
        F.count(F.when(F.col("l_tax") > 0.05, 1)).alias("n_high_tax"),
    )


@query(
    "agg_session_conversion",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                            > 30 * 60 * 1000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    tagged AS (
        SELECT user_id, ts, event_type,
               SUM(is_new) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM ordered
    ),
    sess AS (
        SELECT user_id, session_seq,
               MIN(ts) AS session_start,
               MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
               MAX(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purch
        FROM tagged GROUP BY 1, 2
    )
    SELECT date_trunc('day', session_start) AS day,
           COUNT(*) AS n_sessions,
           CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_purch > t_view
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
           ROUND(CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_purch > t_view
                          THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 4)
               AS conversion_rate
    FROM sess
    GROUP BY 1
    """,
)
def agg_session_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day session conversion rate: a session converts when it saw a
    view AND a purchase after that view, inside the SAME 30-minute-gap
    session — the within-visit twin of ``agg_window_funnel``'s
    cross-visit chain, built on the identical sessionization as
    ``sessionize_events`` (same lag+cumsum, same (ts, event_id) order).

    Scale: one shuffle on user_id covers the sessionizing windows and
    the per-session rollup; the daily rate is a second tiny aggregation
    over |sessions| rows.
    """
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000

    def epoch_us(col):
        return F.unix_micros(col.cast("timestamp"))

    prev_us = epoch_us(F.lag("ts").over(w))
    is_new = F.when(
        prev_us.isNull() | (epoch_us(F.col("ts")) - prev_us > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    tagged = ev.withColumn(
        "session_seq",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    sess = tagged.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "t_view"
        ),
        F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purch"
        ),
    )
    converted = F.when(
        F.col("t_view").isNotNull() & (F.col("t_purch") > F.col("t_view")), 1
    ).otherwise(0)
    return sess.groupBy(
        F.date_trunc("day", "session_start").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(converted).cast("long").alias("n_converted"),
        F.round(
            F.sum(converted).cast("double") / F.count(F.lit(1)), 4
        ).alias("conversion_rate"),
    )

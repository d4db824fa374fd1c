"""Tenth coverage batch: the last three classic TPC-H query shapes (Q9,
Q16, Q20), adapted to the test-data star schema. The schema has no
partsupp table, so — as in ``relational9.join_q2_min_supplier`` — the
part-supplier relation is derived from lineitem shipping history, and
partsupp-only attributes are re-expressed over the columns that exist
(``p_retailprice`` stands in for supply cost; "availability" becomes
shipped-quantity share).

Reference parity: generalizes the scan->filter->aggregate dataflow of
etl/main.go:188-233 into the profit/rollup/exclusion shapes a reference
user would expect from a full analytics engine.

Scale themes: every dimension side (part, supplier, nation) broadcasts;
the fact table is scanned once per query with pushed filters; NOT IN
becomes a null-safe anti join (never a row-expanding join); correlated
"share of group total" becomes one grouped aggregate joined back on the
group key — the decorrelated plan Catalyst itself would pick.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.sources.readers import read_table


@query(
    "agg_q9_profit",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)
                     - 0.6 * p.p_retailprice * l.l_quantity), 4) AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%widget%'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY 1, 2
    """,
)
def agg_q9_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit), adapted: profit per supplier
    nation per order year for widget parts, with 60% of ``p_retailprice``
    standing in for the missing ``ps_supplycost``.

    Scale: part (filtered to ~1/3 of 200 rows), supplier, and nation all
    broadcast, so the only shuffle is the lineitem->orders equi-join on
    the order key, followed by a (25 nations x ~7 years) hash-agg with
    map-side partials. The LIKE filter prunes fact rows at the first
    broadcast join, before the orders shuffle — join order matters and is
    stated explicitly here rather than left to cost guesses.
    """
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    part = (
        read_table(spark, sf_dir, "part")
        .where(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    supplier = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - (
        0.6 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 4).alias("sum_profit"))
    )


@query(
    "agg_q16_supplier_cnt",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT ps.l_suppkey) AS supplier_cnt
    FROM ps JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> 'Brand#13'
      AND p.p_type NOT LIKE 'PROMO%'
      AND p.p_size IN (5, 10, 15, 20, 25, 30, 35, 40)
      AND ps.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000
      )
    GROUP BY 1, 2, 3
    """,
)
def agg_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): distinct supplier
    count per (brand, type, size) over the lineitem-derived part-supplier
    relation, excluding low-balance suppliers via NOT IN.

    Scale: the part-supplier relation is a distinct over two narrow fact
    columns (one shuffle); the part attribute filter broadcasts in; the
    NOT IN exclusion is a broadcast LEFT ANTI join against the (tiny)
    excluded-supplier set — never a per-row subquery. ``s_suppkey`` is
    non-nullable here so the anti join and SQL NOT IN agree; with nullable
    keys NOT IN needs the null-safe form (documented trap, SURVEY §7.4).
    """
    ps = (
        read_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    part = (
        read_table(spark, sf_dir, "part")
        .where(
            (F.col("p_brand") != "Brand#13")
            & ~F.col("p_type").like("PROMO%")
            & F.col("p_size").isin(5, 10, 15, 20, 25, 30, 35, 40)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    excluded = (
        read_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 1000)
        .select("s_suppkey")
    )
    return (
        ps.join(
            F.broadcast(excluded),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "scalar_regexp_extract_all",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, 'b[a-z]+')) AS BIGINT)
               AS n_matches,
           regexp_extract_all(text, 'b[a-z]+')[1] AS first_match
    FROM documents
    """,
)
def scalar_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-match regex extraction (`regexp_extract_all`): all
    'b'-initial words per document, summarized as match count + first
    match. The pattern stays in the RE2-compatible subset both engines
    execute identically (no backrefs/lookaround — the same discipline as
    ``text_pii_scrub``). ``F.get`` (0-based, null on empty) mirrors
    DuckDB's out-of-range list index under ANSI mode, where
    ``element_at`` would throw instead.
    """
    docs = read_table(spark, sf_dir, "documents")
    # group 0 = whole match: Spark's default group is 1 (and throws on a
    # group-free pattern), DuckDB's is 0 — state it explicitly
    matches = F.regexp_extract_all(F.col("text"), F.lit("b[a-z]+"), F.lit(0))
    return docs.select(
        "doc_id",
        F.size(matches).cast("long").alias("n_matches"),
        F.get(matches, 0).alias("first_match"),
    )


@query(
    "agg_trailing_distinct",
    oracle="""
    WITH du AS (
      SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
    )
    SELECT g.day, COUNT(DISTINCT du.user_id) AS trailing_7d_users
    FROM (SELECT DISTINCT day FROM du) g
    JOIN du ON du.day BETWEEN g.day - INTERVAL 6 DAY AND g.day
    GROUP BY g.day
    """,
)
def agg_trailing_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day distinct active users per day — the rolling-DAU
    metric. COUNT(DISTINCT) over a sliding frame is not expressible as a
    Spark window function (distinct aggregates are unsupported in window
    frames), so this is the scale shape instead: dedup to the (day, user)
    grain FIRST (the only pass over raw events), then a bounded 7x
    day-range join on the tiny daily-actives relation feeds one
    count-distinct agg.

    Scale: raw events collapse to days x daily-actives before any
    expansion; the range join multiplies that small relation by at most
    the window length, never the event count. The approximate variant at
    extreme cardinality swaps count_distinct for the mergeable HLL
    (``agg_hll_mergeable``) unioned over the frame.
    """
    ev = read_table(spark, sf_dir, "events")
    du = ev.select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    ).distinct()
    grid = du.select("day").distinct().withColumnRenamed("day", "g_day")
    cond = (F.col("day") <= F.col("g_day")) & (
        F.col("day") >= F.col("g_day") - F.expr("INTERVAL 6 DAYS")
    )
    return (
        grid.join(du, cond)
        .groupBy(F.col("g_day").alias("day"))
        .agg(F.count_distinct("user_id").alias("trailing_7d_users"))
    )


@query(
    "agg_equidepth_histogram",
    oracle="""
    WITH b AS (
      SELECT quantile_cont(l_extendedprice,
          [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qs
      FROM lineitem
    )
    SELECT CAST(len(list_filter(b.qs, q -> q <= l.l_extendedprice))
               AS BIGINT) AS bucket,
           COUNT(*) AS n_rows,
           ROUND(MIN(l.l_extendedprice), 4) AS lo,
           ROUND(MAX(l.l_extendedprice), 4) AS hi
    FROM lineitem l, b
    GROUP BY 1
    """,
)
def agg_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram (10 quantile buckets) of lineitem prices —
    the column-profile statistic planners and data-quality monitors keep,
    complementing the equi-width ``agg_histogram``.

    Scale: the naive form is NTILE over a global sort — one reducer owns
    the whole table. This is the two-pass shape instead: an exact decile
    aggregate (partial-merge, no sort), then the 9 boundaries broadcast
    back and bucket assignment is a per-row expression on a second scan.
    Exact interpolated percentiles are engine-portable (the same pair of
    functions already hash-matches in ``agg_percentiles``), so boundary
    comparisons agree bit-for-bit.
    """
    li = read_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    bounds = li.agg(
        F.percentile(
            "l_extendedprice",
            F.array(*[F.lit(i / 10) for i in range(1, 10)]),
        ).alias("qs")
    )
    price = F.col("l_extendedprice")
    return (
        li.join(F.broadcast(bounds))
        .select(
            F.size(F.filter("qs", lambda q: q <= price))
            .cast("long")
            .alias("bucket"),
            price,
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.min(price), 4).alias("lo"),
            F.round(F.max(price), 4).alias("hi"),
        )
    )


@query(
    "dedup_time_window",
    oracle="""
    SELECT user_id, event_type, window_start, event_id, ts
    FROM (
      SELECT user_id, event_type,
             date_trunc('hour', ts) AS window_start, event_id, ts,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type, date_trunc('hour', ts)
               ORDER BY ts, event_id
             ) AS rn
      FROM events
    )
    WHERE rn = 1
    """,
)
def dedup_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed deduplication: the FIRST event per (user, type) within
    each clock hour — the batch twin of streaming
    ``dropDuplicatesWithinWatermark`` (``stream_dedup``), anchoring the
    same keep-first-within-horizon semantics to a SQL oracle.

    Scale: one shuffle on the (user, type, hour) composite key; the
    window sees only same-key rows and emits row 1. Streaming gets the
    identical answer with bounded state because the hour bucket ages out
    with the watermark.
    """
    ev = read_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = (
        Window.partitionBy(
            "user_id", "event_type", F.date_trunc("hour", "ts")
        ).orderBy("ts", "event_id")
    )
    return (
        ev.select(
            "user_id",
            "event_type",
            F.date_trunc("hour", "ts").alias("window_start"),
            "event_id",
            "ts",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") == 1)
        .drop("rn")
    )


@query(
    "join_interval_bucketed",
    oracle="""
    WITH inc AS (
      SELECT event_id AS inc_id,
             ts - INTERVAL 30 MINUTE AS ws,
             ts + INTERVAL 30 MINUTE AS we
      FROM events WHERE event_type = 'error'
    )
    SELECT inc.inc_id, COUNT(e.event_id) AS n_nearby_clicks
    FROM inc LEFT JOIN events e
      ON e.event_type = 'click' AND e.ts >= inc.ws AND e.ts < inc.we
    GROUP BY inc.inc_id
    """,
)
def join_interval_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PURE interval join (no equi key): clicks within +-30 minutes of
    each error event — the shape that degenerates to a nested-loop
    O(n x m) join if written as a theta join, and the companion to
    ``join_interval_overlap`` (which stays a hash join only because it
    HAS an equi key).

    Scale: discretize-to-equi-join — each incident window explodes into
    the 1-2 hour buckets covering it, each click carries its single
    bucket, and the join becomes a HASH equi-join on the bucket with the
    exact range as a residual filter. A (incident, click) pair can meet
    in at most one bucket (the click's own hour), so no dedup pass is
    needed. Linear in rows + true matches at any scale — the same
    discretization idea LSH applies to similarity. The oracle states the
    plain theta join; results are identical.
    """
    ev = read_table(spark, sf_dir, "events")
    inc = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("inc_id"),
        (F.col("ts") - F.expr("INTERVAL 30 MINUTES")).alias("ws"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("we"),
    )
    # covering hour buckets; `we` is end-exclusive, so a window ending
    # exactly on the hour must not cover that hour — step back 1 microsecond
    inc_b = inc.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.date_trunc("hour", F.col("ws")),
                F.date_trunc(
                    "hour", F.col("we") - F.expr("INTERVAL 1 MICROSECOND")
                ),
                F.expr("INTERVAL 1 HOUR"),
            )
        ),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "ts", F.date_trunc("hour", "ts").alias("bucket")
    )
    matched = (
        inc_b.join(clicks, "bucket")
        .where((F.col("ts") >= F.col("ws")) & (F.col("ts") < F.col("we")))
        .groupBy("inc_id")
        .agg(F.count("event_id").alias("n_nearby_clicks"))
    )
    # left-join back so zero-click incidents keep a row, like the oracle's
    # LEFT JOIN + COUNT(column)
    return inc.select("inc_id").join(matched, "inc_id", "left").select(
        "inc_id", F.coalesce("n_nearby_clicks", F.lit(0)).alias("n_nearby_clicks")
    )


@query(
    "join_q20_dominant_supplier",
    oracle="""
    WITH shipped AS (
      SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY 1, 2
    ), tot AS (
      SELECT l_partkey, SUM(qty) AS total_qty FROM shipped GROUP BY 1
    )
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM shipped sh
    JOIN tot ON tot.l_partkey = sh.l_partkey
    JOIN part p ON p.p_partkey = sh.l_partkey AND p.p_name LIKE '%rod%'
    JOIN supplier s ON s.s_suppkey = sh.l_suppkey
    WHERE sh.qty > 0.5 * tot.total_qty
    """,
)
def join_q20_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion), adapted: suppliers who
    shipped more than half of a rod part's 1996 volume ("availability
    exceeds half the demand" re-expressed over shipping history).

    Scale: ONE pushed-filter fact scan feeds a (partkey, suppkey) partial
    agg; the per-part total is a window-sum over that already-aggregated
    (part x supplier cardinality) relation rather than a self-join —
    re-deriving ``tot`` from the DataFrame would duplicate the lineage
    and scan lineitem twice. The part filter broadcasts and the final
    DISTINCT is over the tiny supplier survivor set.
    """
    from pyspark.sql import Window

    shipped = (
        read_table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    total = F.sum("qty").over(Window.partitionBy("l_partkey"))
    part = (
        read_table(spark, sf_dir, "part")
        .where(F.col("p_name").like("%rod%"))
        .select("p_partkey")
    )
    supplier = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    return (
        shipped.withColumn("total_qty", total)
        .where(F.col("qty") > 0.5 * F.col("total_qty"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name")
        .distinct()
    )

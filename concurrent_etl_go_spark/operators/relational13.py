"""Relational pack 13 (round 10): negative-association substitutes,
ABC inventory classification, rolling 7-day retention, and categorical
distribution drift.

All four are pure-integer queries (counts, exact cents, basis points
via portable floor division) — no float discipline needed anywhere.

Reference parity: the reference engine (etl/main.go) has no analytics
surface; these extend SURVEY.md §2.B.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query, scoped_persist
from concurrent_etl_go_spark.sources.readers import read_table

_SUB_HEAD = 30  # head items considered for substitution pairs
_SUB_TOP = 20  # substitute pairs emitted
_BIG = "DECIMAL(38,0)"


@query(
    "join_basket_substitutes",
    oracle=f"""
    WITH li AS MATERIALIZED (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM li),
    item AS MATERIALIZED (
      SELECT l_partkey AS pk, COUNT(*) AS c FROM li GROUP BY 1
    ),
    head AS MATERIALIZED (
      SELECT pk, c FROM item ORDER BY c DESC, pk LIMIT {_SUB_HEAD}
    ),
    cand AS MATERIALIZED (
      SELECT a.pk AS part_a, b.pk AS part_b, a.c AS c_a, b.c AS c_b
      FROM head a JOIN head b ON a.pk < b.pk
    ),
    co AS MATERIALIZED (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             COUNT(*) AS n_ab
      FROM li a
      JOIN li b ON a.l_orderkey = b.l_orderkey
              AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ),
    scored AS MATERIALIZED (
      SELECT c.part_a, c.part_b,
             CAST(c.c_a AS BIGINT) AS c_a, CAST(c.c_b AS BIGINT) AS c_b,
             CAST(COALESCE(co.n_ab, 0) AS BIGINT) AS n_ab,
             CAST(CAST(c.c_a AS HUGEINT) * c.c_b * 1000 // n.n_orders
                  AS BIGINT) AS expected_milli,
             CAST(CAST(COALESCE(co.n_ab, 0) AS HUGEINT) * n.n_orders
                  * 10000 // (CAST(c.c_a AS HUGEINT) * c.c_b) AS BIGINT)
               AS lift_bp
      FROM cand c
      CROSS JOIN n
      LEFT JOIN co ON co.part_a = c.part_a AND co.part_b = c.part_b
    )
    SELECT part_a, part_b, c_a, c_b, n_ab, expected_milli, lift_bp,
           CAST(row_number() OVER (ORDER BY lift_bp, part_a, part_b)
                AS BIGINT) AS sub_rank
    FROM scored
    WHERE expected_milli >= 1000
    ORDER BY lift_bp, part_a, part_b LIMIT {_SUB_TOP}
    """,
)
def join_basket_substitutes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substitute-product candidates — the NEGATIVE-association side of
    ``agg_basket_lift``: pairs of individually-popular parts that
    co-occur far LESS than independence predicts (lift << 1).  True
    substitutes may co-occur ZERO times and so never enter a pair
    table; candidates therefore come from the head-item cross
    (``_SUB_HEAD`` most-ordered parts — a bounded block), LEFT-joined
    to the co-occurrence counts so missing pairs score lift 0.  Pairs
    must expect ≥1 co-basket under independence (integer milli
    expectation) so a zero co-count is evidence, not sparsity.  Ranked
    by (lift ASC, ids) — "bought instead of", where the lift query's
    head is "bought together".

    All integer basis-point arithmetic in 128-bit (the basket-lift
    overflow envelope).  Scale: the candidate block is head², bounded;
    the co-count table reuses the capped per-basket pair expansion."""
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
    head = item.orderBy(F.desc("c"), "pk").limit(_SUB_HEAD)
    a = head.select(F.col("pk").alias("part_a"), F.col("c").alias("c_a"))
    b = head.select(F.col("pk").alias("part_b"), F.col("c").alias("c_b"))
    cand = a.join(b, F.col("part_a") < F.col("part_b"))
    co = (
        li.alias("x")
        .join(
            li.alias("y"),
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_partkey") < F.col("y.l_partkey")),
        )
        .groupBy(
            F.col("x.l_partkey").alias("part_a"),
            F.col("y.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    scored = (
        cand.crossJoin(F.broadcast(n))
        .join(co, ["part_a", "part_b"], "left")
        .select(
            "part_a",
            "part_b",
            F.col("c_a").cast("long").alias("c_a"),
            F.col("c_b").cast("long").alias("c_b"),
            F.coalesce(F.col("n_ab"), F.lit(0))
            .cast("long")
            .alias("n_ab"),
            F.expr(
                f"CAST(CAST(c_a AS {_BIG}) * c_b * 1000 div n_orders"
                " AS BIGINT)"
            ).alias("expected_milli"),
            F.expr(
                f"CAST(CAST(COALESCE(n_ab, 0) AS {_BIG}) * n_orders"
                f" * 10000 div (CAST(c_a AS {_BIG}) * c_b) AS BIGINT)"
            ).alias("lift_bp"),
        )
    )
    w = Window.orderBy("lift_bp", "part_a", "part_b")
    return (
        scored.where(F.col("expected_milli") >= 1000)
        .withColumn("sub_rank", F.row_number().over(w).cast("long"))
        .orderBy("lift_bp", "part_a", "part_b")
        .limit(_SUB_TOP)
    )


#: ABC cumulative-share thresholds (x10 to stay integer: A ≤ 70%,
#: B ≤ 90% — the classic 70/20/10 inventory split).
_ABC_A, _ABC_B = 7, 9


@query(
    "agg_abc_classification",
    oracle=f"""
    WITH prt AS MATERIALIZED (
      SELECT l_partkey AS pk,
             SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
               AS cents
      FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT SUM(cents) AS total FROM prt),
    ranked AS MATERIALIZED (
      SELECT pk, cents,
             SUM(cents) OVER (ORDER BY cents DESC, pk) AS cum
      FROM prt
    ),
    classed AS (
      SELECT CASE WHEN cum * 10 <= t.total * {_ABC_A} THEN 'A'
                  WHEN cum * 10 <= t.total * {_ABC_B} THEN 'B'
                  ELSE 'C' END AS abc_class,
             cents
      FROM ranked CROSS JOIN tot t
    )
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(cents) AS BIGINT) AS rev_cents,
           CAST(SUM(CAST(cents AS HUGEINT)) * 10000
                // (SELECT total FROM tot) AS BIGINT) AS share_bp
    FROM classed GROUP BY 1
    """,
)
def agg_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification: parts sorted by lifetime revenue,
    class A = the head covering 70% of cumulative revenue, B the next
    20%, C the tail — per class the part count, exact revenue cents,
    and share.  The class boundary test is an integer cross-multiply
    (``cum·10 ≤ total·7``), so no division ever happens on the
    per-part path.

    Scale: one fact-table hash agg to the PART DIMENSION, then a
    cumulative window over that dimension (range-partitioned global
    sort of dimension-sized data — the documented exception the
    Lorenz/Pareto family already makes; at 100 TB the fact scan
    dominates and the dimension sort is noise)."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice"
    )
    prt = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(
            F.expr("CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)")
        ).alias("cents")
    )
    tot = prt.agg(F.sum("cents").alias("total"))
    w = Window.orderBy(F.desc("cents"), "pk").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = prt.select("pk", "cents", F.sum("cents").over(w).alias("cum"))
    classed = ranked.crossJoin(F.broadcast(tot)).select(
        F.when(
            F.col("cum") * 10 <= F.col("total") * _ABC_A, F.lit("A")
        )
        .when(F.col("cum") * 10 <= F.col("total") * _ABC_B, F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("abc_class"),
        "cents",
        "total",
    )
    return classed.groupBy("abc_class", "total").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum("cents").cast("long").alias("rev_cents"),
    ).select(
        "abc_class",
        "n_parts",
        "rev_cents",
        F.expr(
            f"CAST(CAST(rev_cents AS {_BIG}) * 10000 div total AS BIGINT)"
        ).alias("share_bp"),
    )


_RET_LAG_DAYS = 7


@query(
    "agg_rolling_retention",
    oracle=f"""
    WITH du AS MATERIALIZED (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
    ),
    joined AS MATERIALIZED (
      SELECT a.day, COUNT(*) AS dau,
             COUNT(b.user_id) AS retained
      FROM du a
      LEFT JOIN du b ON b.user_id = a.user_id
                    AND b.day = a.day + INTERVAL {_RET_LAG_DAYS} DAY
      GROUP BY 1
    )
    SELECT day, CAST(dau AS BIGINT) AS dau,
           CAST(retained AS BIGINT) AS retained,
           CAST(retained * 10000 // dau AS BIGINT) AS retention_bp
    FROM joined
    """,
)
def agg_rolling_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day retention curve: for every active day, how many of
    that day's users were also active exactly 7 days later — the
    day-grain signal the weekly ``agg_retention_cohort`` smooths over.
    Pure integers; days with no 7-day-later activity report 0.

    Scale: the (user, day) distinct grain collapse is the one heavy
    shuffle; the self-join keys on (user, day+7) — same hash partitioning
    both sides, co-located under AQE; output is day-dimension sized."""
    du = scoped_persist(
        read_table(spark, sf_dir, "events")
        .select("user_id", F.date_trunc("day", "ts").alias("day"))
        .distinct()
    )
    b = du.select(
        "user_id",
        (F.col("day") - F.expr(f"INTERVAL {_RET_LAG_DAYS} DAY")).alias(
            "day"
        ),
        F.lit(1).alias("hit"),
    )
    joined = (
        du.join(b, ["user_id", "day"], "left")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("dau"),
            F.count("hit").alias("retained"),
        )
    )
    return joined.select(
        "day",
        F.col("dau").cast("long").alias("dau"),
        F.col("retained").cast("long").alias("retained"),
        F.expr("CAST(retained * 10000 div dau AS BIGINT)").alias(
            "retention_bp"
        ),
    )


@query(
    "profile_category_drift",
    oracle="""
    WITH b AS (
      SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS bound
      FROM events
    ),
    halves AS MATERIALIZED (
      SELECT event_type AS val,
             CASE WHEN epoch_us(ts) < b.bound THEN 0 ELSE 1 END AS half
      FROM events CROSS JOIN b
    ),
    counts AS MATERIALIZED (
      SELECT val,
             SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS c0,
             SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS c1
      FROM halves GROUP BY 1
    ),
    tot AS (SELECT SUM(c0) AS n0, SUM(c1) AS n1 FROM counts)
    SELECT val,
           CAST(c0 AS BIGINT) AS n_first,
           CAST(c1 AS BIGINT) AS n_second,
           CAST(c0 * 10000 // t.n0 AS BIGINT) AS share_first_bp,
           CAST(c1 * 10000 // t.n1 AS BIGINT) AS share_second_bp,
           CAST(ABS(c0 * 10000 // t.n0 - c1 * 10000 // t.n1) AS BIGINT)
             AS drift_bp
    FROM counts CROSS JOIN tot t
    """,
)
def profile_category_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical-distribution drift monitor: the event-type share in
    the first half of the time span vs the second (the derived
    integer-microsecond midpoint boundary of the CUPED family), with
    the per-value absolute share drift in basis points — the "did my
    event mix silently change" DQ check beside null-rate and entropy
    profiling.  A pipeline gates on ``max(drift_bp)``.

    Pure integers (conditional counts, floor-divided shares).  Scale:
    one events scan, one value-keyed hash agg with two conditional
    sums, a broadcast totals row."""
    ev = read_table(spark, sf_dir, "events").select("event_type", "ts")
    bound = ev.agg(
        F.expr(
            "(MIN(unix_micros(ts)) + MAX(unix_micros(ts))) div 2"
        ).alias("bound")
    )
    halves = ev.crossJoin(F.broadcast(bound)).select(
        F.col("event_type").alias("val"),
        F.when(F.expr("unix_micros(ts)") < F.col("bound"), 0)
        .otherwise(1)
        .alias("half"),
    )
    counts = halves.groupBy("val").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("c1"),
    )
    tot = counts.agg(F.sum("c0").alias("n0"), F.sum("c1").alias("n1"))
    return counts.crossJoin(F.broadcast(tot)).select(
        "val",
        F.col("c0").cast("long").alias("n_first"),
        F.col("c1").cast("long").alias("n_second"),
        F.expr("CAST(c0 * 10000 div n0 AS BIGINT)").alias(
            "share_first_bp"
        ),
        F.expr("CAST(c1 * 10000 div n1 AS BIGINT)").alias(
            "share_second_bp"
        ),
        F.expr(
            "CAST(ABS(c0 * 10000 div n0 - c1 * 10000 div n1) AS BIGINT)"
        ).alias("drift_bp"),
    )


@query(
    "agg_price_elasticity",
    oracle="""
    WITH monthly AS MATERIALIZED (
      SELECT p.p_brand AS brand, strftime(l.l_shipdate, '%Y-%m') AS mon,
             SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT))
               AS rev_cents,
             SUM(CAST(l.l_quantity AS BIGINT)) AS qty
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    ),
    pts AS MATERIALIZED (
      SELECT brand,
             ln(CAST(rev_cents // qty AS DOUBLE)) AS x,
             ln(CAST(qty AS DOUBLE)) AS y
      FROM monthly WHERE qty > 0
    ),
    s AS (
      SELECT brand, COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(x * y) AS sxy
      FROM pts GROUP BY 1
    )
    SELECT brand, CAST(n AS BIGINT) AS n_months,
           CASE WHEN n * sxx - sx * sx = 0.0 THEN 0.0
                ELSE ROUND((n * sxy - sx * sy)
                           / (n * sxx - sx * sx), 4) + 0.0 END
             AS elasticity
    FROM s
    """,
)
def agg_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-log price elasticity of demand per brand: the OLS slope of
    ln(monthly quantity) on ln(monthly realized unit price) — the
    classic demand-curve readout over the ``window_vwap`` grain.  The
    per-month unit price is the INTEGER floor quotient (cents), so each
    (x, y) point is a deterministic ln of an exact integer; the five
    OLS sums carry only ~1e-14 summation-order jitter, five orders
    below the slope's ROUND(4) grain (the denominator is a
    dimension-scale variance, not a near-cancellation).  Flat-price
    brands pin slope 0 via an identical CASE guard.

    Scale: one fact scan + broadcast part dim -> (brand, month) hash
    agg -> a brand-keyed 5-accumulator fold; the slope is per-row
    scalar math on a 25-brand dimension."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_quantity", "l_extendedprice"
    )
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    monthly = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.date_format("l_shipdate", "yyyy-MM").alias("mon"),
        )
        .agg(
            F.sum(
                F.expr("CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)")
            ).alias("rev_cents"),
            F.sum(F.col("l_quantity").cast("long")).alias("qty"),
        )
    )
    pts = monthly.where(F.col("qty") > 0).select(
        "brand",
        F.expr("ln(CAST(rev_cents div qty AS DOUBLE))").alias("x"),
        F.expr("ln(CAST(qty AS DOUBLE))").alias("y"),
    )
    s = pts.groupBy("brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    return s.select(
        "brand",
        F.col("n").cast("long").alias("n_months"),
        F.expr(
            "CASE WHEN n * sxx - sx * sx = 0.0 THEN 0.0"
            " ELSE ROUND((n * sxy - sx * sy)"
            " / (n * sxx - sx * sx), 4) + 0.0 END"
        ).alias("elasticity"),
    )


_QUINTILE_BP = 2000  # top 20% of customers


@query(
    "agg_top_quintile_share",
    oracle=f"""
    WITH cust AS MATERIALIZED (
      SELECT o_custkey AS ck,
             SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS cents
      FROM orders GROUP BY 1
    ),
    tot AS (SELECT COUNT(*) AS n_cust, SUM(cents) AS total FROM cust),
    ranked AS MATERIALIZED (
      SELECT cents,
             row_number() OVER (ORDER BY cents DESC, ck) AS rnk
      FROM cust
    ),
    head AS (
      SELECT SUM(cents) AS head_cents, COUNT(*) AS head_n
      FROM ranked CROSS JOIN tot
      WHERE rnk * 10000 <= n_cust * {_QUINTILE_BP}
    )
    SELECT CAST(t.n_cust AS BIGINT) AS n_cust,
           CAST(h.head_n AS BIGINT) AS head_n,
           CAST(t.total AS BIGINT) AS total_cents,
           CAST(COALESCE(h.head_cents, 0) AS BIGINT) AS head_cents,
           CAST(CAST(COALESCE(h.head_cents, 0) AS HUGEINT) * 10000
                // t.total AS BIGINT) AS head_share_bp
    FROM head h CROSS JOIN tot t
    """,
)
def agg_top_quintile_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 80/20 readout: what share of revenue the top 20% of
    customers carry — one number beside the full Lorenz curve
    (``agg_revenue_lorenz``), with the membership boundary decided by
    the integer cross-multiply ``rank·10000 <= n·2000`` (no division on
    the per-customer path) and (cents DESC, custkey) tie-breaks.

    Pure integers.  Scale: one orders hash agg to the customer
    dimension, a rank window over that dimension (the Lorenz family's
    documented range-partitioned sort), one global fold; driver traffic
    is a single row."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    cust = orders.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.sum(
            F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)")
        ).alias("cents")
    )
    tot = cust.agg(
        F.count(F.lit(1)).alias("n_cust"), F.sum("cents").alias("total")
    )
    w = Window.orderBy(F.desc("cents"), "ck")
    ranked = cust.select("cents", F.row_number().over(w).alias("rnk"))
    head = (
        ranked.crossJoin(F.broadcast(tot))
        .where(F.col("rnk") * 10000 <= F.col("n_cust") * _QUINTILE_BP)
        .agg(
            F.sum("cents").alias("head_cents"),
            F.count(F.lit(1)).alias("head_n"),
        )
    )
    return head.crossJoin(F.broadcast(tot)).select(
        F.col("n_cust").cast("long").alias("n_cust"),
        F.col("head_n").cast("long").alias("head_n"),
        F.col("total").cast("long").alias("total_cents"),
        F.coalesce(F.col("head_cents"), F.lit(0))
        .cast("long")
        .alias("head_cents"),
        F.expr(
            f"CAST(CAST(COALESCE(head_cents, 0) AS {_BIG}) * 10000"
            " div total AS BIGINT)"
        ).alias("head_share_bp"),
    )

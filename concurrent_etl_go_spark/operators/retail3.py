"""Retail analytics, part 3: sequential purchase patterns.

``agg_brand_transitions`` mines the customer-level brand-to-brand
order sequence: each order is represented by the brand of its
smallest part key (a deterministic representative), consecutive orders
of the same customer form a transition, and every (from, to) pair is
scored by count and LIFT — observed transitions over the
independence expectation — the sequential-pattern readout (Agrawal &
Srikant 1995 framing, public literature) behind "customers who buy X
next buy Y" merchandising.

Exactness: counts are integers; lift is an exact integer in millionths
via 128-bit floor division (cnt * N * 1e6 // (from_cnt * to_cnt)).

Scale: the representative-part reduction is an order-keyed hash agg;
the consecutive pairing is a LAG window partitioned per customer
(bounded rows per group); the transition count is a 25^2-bounded hash
agg.  Reference parity: no retail surface exists in the reference
(etl/main.go); extends SURVEY.md §2.B beside ``operators/retail2.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query, scoped_persist
from concurrent_etl_go_spark.sources.readers import read_table

_TRANS_TOP = 20


@query(
    "agg_brand_transitions",
    oracle=f"""
    WITH rep AS MATERIALIZED (
      SELECT l_orderkey, MIN(l_partkey) AS rep_part
      FROM lineitem GROUP BY 1
    ),
    labeled AS MATERIALIZED (
      SELECT o.o_custkey AS ck, o.o_orderdate AS d, o.o_orderkey AS ok,
             p.p_brand AS brand
      FROM orders o
      JOIN rep r ON r.l_orderkey = o.o_orderkey
      JOIN part p ON p.p_partkey = r.rep_part
    ),
    seq AS MATERIALIZED (
      SELECT ck, brand,
             LAG(brand) OVER (PARTITION BY ck ORDER BY d, ok) AS prev
      FROM labeled
    ),
    trans AS MATERIALIZED (
      SELECT prev AS brand_from, brand AS brand_to,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM seq WHERE prev IS NOT NULL
      GROUP BY 1, 2
    ),
    marg AS MATERIALIZED (
      SELECT brand_from, brand_to, cnt,
             SUM(cnt) OVER (PARTITION BY brand_from) AS from_cnt,
             SUM(cnt) OVER (PARTITION BY brand_to) AS to_cnt,
             SUM(cnt) OVER () AS n
      FROM trans
    )
    SELECT brand_from, brand_to, cnt,
           CAST(from_cnt AS BIGINT) AS from_cnt,
           CAST(to_cnt AS BIGINT) AS to_cnt,
           CAST(CAST(cnt AS HUGEINT) * n * 1000000
                // (CAST(from_cnt AS HUGEINT) * to_cnt) AS BIGINT)
             AS lift_e6
    FROM marg
    ORDER BY cnt DESC, brand_from, brand_to LIMIT {_TRANS_TOP}
    """,
)
def agg_brand_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top brand-to-brand transitions across each customer's
    consecutive orders (ordered by date, order key tie-break), with
    exact-integer lift in millionths: lift > 1e6 marks a follow-on
    purchase pattern stronger than brand popularity alone explains."""
    big = "DECIMAL(38,0)"
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    rep = li.groupBy("l_orderkey").agg(
        F.min("l_partkey").alias("rep_part")
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    labeled = (
        orders.join(rep, orders.o_orderkey == rep.l_orderkey)
        .join(part, rep.rep_part == part.p_partkey)
        .select(
            F.col("o_custkey").alias("ck"),
            F.col("o_orderdate").alias("d"),
            F.col("o_orderkey").alias("ok"),
            F.col("p_brand").alias("brand"),
        )
    )
    w = Window.partitionBy("ck").orderBy("d", "ok")
    seq = labeled.select(
        "ck", "brand", F.lag("brand").over(w).alias("prev")
    )
    trans = scoped_persist(
        seq.where(F.col("prev").isNotNull())
        .groupBy(
            F.col("prev").alias("brand_from"),
            F.col("brand").alias("brand_to"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    marg = trans.select(
        "brand_from",
        "brand_to",
        "cnt",
        F.sum("cnt").over(Window.partitionBy("brand_from")).alias(
            "from_cnt"
        ),
        F.sum("cnt").over(Window.partitionBy("brand_to")).alias("to_cnt"),
        F.sum("cnt").over(Window.partitionBy()).alias("n"),
    )
    return (
        marg.select(
            "brand_from",
            "brand_to",
            "cnt",
            F.col("from_cnt").cast("long").alias("from_cnt"),
            F.col("to_cnt").cast("long").alias("to_cnt"),
            F.expr(
                f"CAST(CAST(cnt AS {big}) * n * 1000000"
                f" div (CAST(from_cnt AS {big}) * to_cnt) AS BIGINT)"
            ).alias("lift_e6"),
        )
        .orderBy(F.desc("cnt"), "brand_from", "brand_to")
        .limit(_TRANS_TOP)
    )

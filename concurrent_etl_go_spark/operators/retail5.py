"""Retail economics pack: Laspeyres price index, basket-size
distribution, Herfindahl-Hirschman supplier concentration, and the
Gini coefficient over brand revenue (Laspeyres 1871; Herfindahl 1950 /
Hirschman 1945; Gini 1912 — all public literature), extending the
concentration family (``concentration.py``'s Lorenz/Pareto/Theil) and
the retail packs.

Exactness: all four queries are exact-integer end to end — unit
prices enter as the floor cents-per-unit of ``window_vwap``'s
convention (a DEFINED statistic, not a float average), shares and
indices emit as floor basis points / micro-units via 128-bit DECIMAL
cross-multiplication, and the Gini numerator ``2*sum(i*x) -
(n+1)*sum(x)`` is provably non-negative so one floor division
suffices.  No float exists anywhere.

Scale: every query is fact scan -> bounded-key hash agg (brand x
year, lines-per-order, nation x supplier, |brands|); rank windows run
on dimension-sized frames only.  Reference parity: extends SURVEY.md
§2.B.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query, scoped_persist
from concurrent_etl_go_spark.sources.readers import read_table

_L_CENTS = "CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)"


@query(
    "agg_price_index_laspeyres",
    oracle=f"""
    WITH by AS MATERIALIZED (
      SELECT p.p_brand AS brand, year(l.l_shipdate) AS yr,
             CAST(SUM({_L_CENTS}) AS BIGINT) AS rev,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    ),
    priced AS MATERIALIZED (
      SELECT brand, yr, qty, rev // qty AS vwap FROM by
    ),
    base AS MATERIALIZED (
      SELECT brand, qty AS q0, vwap AS p0
      FROM priced WHERE yr = (SELECT MIN(yr) FROM priced)
    )
    SELECT c.yr AS year, CAST(COUNT(*) AS BIGINT) AS n_brands,
           CAST(SUM(CAST(c.vwap AS HUGEINT) * b.q0) * 10000
                // SUM(CAST(b.p0 AS HUGEINT) * b.q0) AS BIGINT)
             AS index_bp
    FROM priced c JOIN base b ON b.brand = c.brand
    GROUP BY 1
    """,
)
def agg_price_index_laspeyres(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Laspeyres price index per ship year: each year's brand unit
    prices weighted by the BASE year's (the data-derived minimum
    year's) quantities, as exact floor basis points — base year reads
    10000 by construction.  Unit prices are the integer cents-per-unit
    of ``window_vwap``'s floor convention, so the whole index is a
    ratio of two 128-bit integer basket costs; brands absent from the
    base year drop out of every year's basket (the fixed-basket
    definition).

    Scale: one fact scan -> (brand, year) hash agg with the part dim
    broadcast; the basket join runs on |brands| x |years| rows."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_quantity", "l_extendedprice"
    )
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    by = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.year("l_shipdate").alias("yr"),
        )
        .agg(
            F.sum(F.expr(_L_CENTS)).cast("long").alias("rev"),
            F.sum(F.col("l_quantity").cast("long"))
            .cast("long")
            .alias("qty"),
        )
    )
    priced = scoped_persist(
        by.select("brand", "yr", "qty", F.expr("rev div qty").alias("vwap"))
    )
    base_yr = priced.agg(F.min("yr").alias("y0"))
    base = (
        priced.crossJoin(F.broadcast(base_yr))
        .where(F.col("yr") == F.col("y0"))
        .select(
            "brand",
            F.col("qty").alias("q0"),
            F.col("vwap").alias("p0"),
        )
    )
    big = "DECIMAL(38,0)"
    return (
        priced.join(F.broadcast(base), "brand")
        .groupBy(F.col("yr").cast("long").alias("year"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_brands"),
            F.expr(
                f"CAST(SUM(CAST(vwap AS {big}) * q0) * 10000"
                f" div SUM(CAST(p0 AS {big}) * q0) AS BIGINT)"
            ).alias("index_bp"),
        )
    )


@query(
    "agg_basket_size_distribution",
    oracle="""
    WITH per_order AS MATERIALIZED (
      SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_lines
      FROM lineitem GROUP BY 1
    )
    SELECT n_lines, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(*) * 10000 // SUM(COUNT(*)) OVER () AS BIGINT)
             AS share_bp
    FROM per_order GROUP BY 1
    """,
)
def agg_basket_size_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Basket-size distribution: how many orders carry 1, 2, ... line
    items, with floor basis-point shares — the order-composition
    profile (pricing, picking-cost, and bundle analyses all start
    here).  Orders with zero line items cannot appear (the grain is
    the lineitem fact).

    Scale: one fact scan -> order hash agg -> bounded (max 7 lines)
    histogram."""
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey")
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines")
    )
    g = per_order.groupBy("n_lines").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )
    return g.select(
        "n_lines",
        "n_orders",
        F.expr("n_orders * 10000 div SUM(n_orders) OVER ()")
        .cast("long")
        .alias("share_bp"),
    )


@query(
    "agg_hhi_concentration",
    oracle=f"""
    WITH sup AS MATERIALIZED (
      SELECT n.n_name AS nation, l.l_suppkey AS sk,
             CAST(SUM({_L_CENTS}) AS BIGINT) AS rev
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      GROUP BY 1, 2
    )
    SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           CAST(SUM(rev) AS BIGINT) AS total_cents,
           CAST(SUM(CAST(rev AS HUGEINT) * rev) * 1000000
                // (CAST(SUM(rev) AS HUGEINT) * SUM(rev)) AS BIGINT)
             AS hhi_e6
    FROM sup GROUP BY 1
    """,
)
def agg_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman supplier concentration per nation: the sum
    of squared revenue shares in exact integer millionths (1e6 = one
    supplier owns the market; antitrust reads >2,500 HHI points =
    0.25e6 as concentrated).  Shares never materialize — the index is
    the single 128-bit ratio sum(rev^2) / total^2.

    Scale: one fact scan with broadcast supplier/nation dims ->
    (nation, supplier) hash agg -> 25-key rollup."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice"
    )
    sup = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nat = read_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    big = "DECIMAL(38,0)"
    g = (
        li.join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("l_suppkey").alias("sk"),
        )
        .agg(F.sum(F.expr(_L_CENTS)).cast("long").alias("rev"))
    )
    return g.groupBy("nation").agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
        F.sum("rev").cast("long").alias("total_cents"),
        F.expr(
            f"CAST(SUM(CAST(rev AS {big}) * rev) * 1000000"
            f" div (CAST(SUM(rev) AS {big}) * SUM(rev)) AS BIGINT)"
        ).alias("hhi_e6"),
    )


@query(
    "agg_gini_coefficient",
    oracle=f"""
    WITH b AS MATERIALIZED (
      SELECT p.p_brand AS brand, CAST(SUM({_L_CENTS}) AS BIGINT) AS rev
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1
    ),
    r AS (
      SELECT rev, ROW_NUMBER() OVER (ORDER BY rev, brand) AS i,
             COUNT(*) OVER () AS n
      FROM b
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_brands,
           CAST(SUM(rev) AS BIGINT) AS total_cents,
           CAST((2 * SUM(CAST(i AS HUGEINT) * rev)
                 - (MAX(n) + 1) * CAST(SUM(rev) AS HUGEINT)) * 1000000
                // (CAST(MAX(n) AS HUGEINT) * SUM(rev)) AS BIGINT)
             AS gini_e6
    FROM r
    """,
)
def agg_gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of brand revenue concentration, in exact
    integer millionths: the scalar the ``agg_revenue_lorenz`` curve
    integrates to, via the rank formula
    ``(2*sum(i*x) - (n+1)*sum(x)) / (n*sum(x))`` over revenues ranked
    ascending with a deterministic (rev, brand) tie-break.  The
    numerator is non-negative by the rearrangement inequality, so one
    floor division suffices — no float, no re-sign.

    Scale: fact scan -> |brands| hash agg; the rank window runs on the
    25-row brand frame."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice"
    )
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    b = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(F.sum(F.expr(_L_CENTS)).cast("long").alias("rev"))
    )
    w = Window.orderBy("rev", "brand")
    wall = Window.orderBy("rev", "brand").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r = b.select(
        "rev",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    big = "DECIMAL(38,0)"
    return r.agg(
        F.max("n").cast("long").alias("n_brands"),
        F.sum("rev").cast("long").alias("total_cents"),
        F.expr(
            f"CAST((2 * SUM(CAST(i AS {big}) * rev)"
            f" - (MAX(n) + 1) * CAST(SUM(rev) AS {big})) * 1000000"
            f" div (CAST(MAX(n) AS {big}) * SUM(rev)) AS BIGINT)"
        ).alias("gini_e6"),
    )

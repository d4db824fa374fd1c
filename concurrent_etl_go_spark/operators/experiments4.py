"""Experimentation analytics, part 4: uplift modeling's Qini/gains
curve (Radcliffe 2007, public literature) — the targeting readout that
ranks customers by a pre-treatment score and asks, decile by decile,
how many INCREMENTAL conversions treatment produced over control.

The assignment is the engine's deterministic md5 split (the
``split_train_val_test`` idiom), conversion is "placed at least one
1-URGENT order", and the targeting score is the pre-treatment account
balance — so the whole curve is reproducible, oracle-checked integer
arithmetic: counts, floor-divided e4 rates, and the Qini statistic
``cum_conv_t * 1e4 - cum_conv_c * cum_n_t * 1e4 div cum_n_c`` (the
incremental-conversion count, e4 lattice) shared verbatim by both
dialects.

Scale: customer-grain collapse (one orders shuffle), a global rank
over |customers| for the decile cut (swap in
``quantiles.grouped_rank`` at 100 TB — same recipe as
``agg_decile_lift_table``), then a 10-row curve.  Reference parity:
the reference (etl/main.go) has no experimentation surface; extends
SURVEY.md §2.B beside ``operators/experiments3.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.sources.readers import read_table

_BAL_CENTS = "CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)"
_TREAT_SQL = (
    "(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 4))"
    "::BIGINT % 100) < 50"
)


@query(
    "agg_uplift_qini",
    oracle=f"""
    WITH conv AS MATERIALIZED (
      SELECT o_custkey,
             CAST(MAX(CASE WHEN o_orderpriority = '1-URGENT'
                           THEN 1 ELSE 0 END) AS BIGINT) AS converted
      FROM orders GROUP BY o_custkey
    ),
    cust AS MATERIALIZED (
      SELECT c.c_custkey,
             CASE WHEN {_TREAT_SQL} THEN 1 ELSE 0 END AS treated,
             COALESCE(v.converted, 0) AS converted,
             {_BAL_CENTS} AS score
      FROM customer c LEFT JOIN conv v ON v.o_custkey = c.c_custkey
    ),
    ranked AS MATERIALIZED (
      SELECT treated, converted,
             ROW_NUMBER() OVER (ORDER BY score DESC, c_custkey) AS rn,
             COUNT(*) OVER () AS n
      FROM cust
    ),
    per AS MATERIALIZED (
      SELECT CAST(((rn - 1) * 10) // n + 1 AS BIGINT) AS decile,
             CAST(SUM(treated) AS BIGINT) AS n_t,
             CAST(COUNT(*) - SUM(treated) AS BIGINT) AS n_c,
             CAST(SUM(treated * converted) AS BIGINT) AS conv_t,
             CAST(SUM((1 - treated) * converted) AS BIGINT) AS conv_c
      FROM ranked GROUP BY 1
    ),
    cum AS (
      SELECT decile, n_t, n_c, conv_t, conv_c,
             SUM(n_t) OVER w AS cum_n_t,
             SUM(n_c) OVER w AS cum_n_c,
             SUM(conv_t) OVER w AS cum_conv_t,
             SUM(conv_c) OVER w AS cum_conv_c
      FROM per WINDOW w AS (ORDER BY decile)
    )
    SELECT decile, n_t, n_c, conv_t, conv_c,
           CAST(conv_t * 10000 // GREATEST(n_t, 1) AS BIGINT)
             AS rate_t_e4,
           CAST(conv_c * 10000 // GREATEST(n_c, 1) AS BIGINT)
             AS rate_c_e4,
           CAST(cum_conv_t * 10000
                - cum_conv_c * cum_n_t * 10000 // GREATEST(cum_n_c, 1)
                AS BIGINT) AS qini_e4
    FROM cum
    """,
)
def agg_uplift_qini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qini curve over score deciles: customers ranked by pre-treatment
    balance, cut into 10 equal-count bins; each row reports arm sizes,
    conversions, per-arm conversion rates (e4), and the cumulative Qini
    value — estimated incremental conversions from targeting the top k
    deciles (x1e4).  Under the null (the md5 split is independent of
    everything), the curve hovers near zero — which is itself the
    correctness-meaningful readout: the pipeline measures uplift
    without manufacturing it.

    Scale: see module note — decile rank swaps to grouped_rank at
    100 TB; everything after is a 10-row curve."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    )
    conv = orders.groupBy("o_custkey").agg(
        F.max(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
        )
        .cast("long")
        .alias("converted")
    )
    cust = (
        read_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_acctbal")
        .join(conv, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(
            "c_custkey",
            F.when(
                F.conv(
                    F.substring(
                        F.md5(F.col("c_custkey").cast("string")), 1, 4
                    ),
                    16,
                    10,
                ).cast("long")
                % 100
                < 50,
                1,
            )
            .otherwise(0)
            .alias("treated"),
            F.coalesce("converted", F.lit(0)).alias("converted"),
            F.expr(_BAL_CENTS).alias("score"),
        )
    )
    w = Window.orderBy(F.desc("score"), "c_custkey")
    wn = Window.partitionBy()
    ranked = cust.select(
        "treated",
        "converted",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    per = ranked.groupBy(
        F.expr("CAST(((rn - 1) * 10) div n + 1 AS BIGINT)").alias("decile")
    ).agg(
        F.sum("treated").cast("long").alias("n_t"),
        (F.count(F.lit(1)) - F.sum("treated")).cast("long").alias("n_c"),
        F.sum(F.col("treated") * F.col("converted"))
        .cast("long")
        .alias("conv_t"),
        F.sum((1 - F.col("treated")) * F.col("converted"))
        .cast("long")
        .alias("conv_c"),
    )
    wc = Window.orderBy("decile")
    cum = per.select(
        "decile",
        "n_t",
        "n_c",
        "conv_t",
        "conv_c",
        F.sum("n_t").over(wc).alias("cum_n_t"),
        F.sum("n_c").over(wc).alias("cum_n_c"),
        F.sum("conv_t").over(wc).alias("cum_conv_t"),
        F.sum("conv_c").over(wc).alias("cum_conv_c"),
    )
    return cum.select(
        "decile",
        "n_t",
        "n_c",
        "conv_t",
        "conv_c",
        F.expr(
            "CAST(conv_t * 10000 div GREATEST(n_t, 1) AS BIGINT)"
        ).alias("rate_t_e4"),
        F.expr(
            "CAST(conv_c * 10000 div GREATEST(n_c, 1) AS BIGINT)"
        ).alias("rate_c_e4"),
        F.expr(
            "CAST(cum_conv_t * 10000"
            " - cum_conv_c * cum_n_t * 10000 div GREATEST(cum_n_c, 1)"
            " AS BIGINT)"
        ).alias("qini_e4"),
    )

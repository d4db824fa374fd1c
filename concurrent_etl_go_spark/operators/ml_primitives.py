"""Distributed ML primitives: the decision-stump split search.

``agg_gini_split`` finds the best single threshold split of a numeric
feature for predicting a categorical target — the inner loop of every
tree learner (CART, Breiman et al. 1984, public literature) and the
standard univariate feature-importance probe a feature store runs per
column.  Feature: order total price in $10k buckets; target: order
status.

The scalable encoding: bucketize the feature (bounded domain), build
the bucket x class contingency grid, and evaluate EVERY candidate
threshold from cumulative class counts over the ~60-row grid — one
event-sized hash agg, then grid-sized windows.  No per-row sort, no
per-threshold rescan.

Exactness: weighted Gini impurity for a split is
``[(nL^2 - sum cL^2)/nL + (nR^2 - sum cR^2)/nR] / N`` — evaluated as
128-bit integer arithmetic with per-side floor division to integer
nano-units (the DEFINED statistic, deterministic on both engines);
the parent impurity uses the same form.  No float appears anywhere.

Reference parity: the reference engine (etl/main.go) has no ML
surface; extends SURVEY.md §2.B beside ``llm/kmeans2.py``'s
hash-proven Lloyd iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query, scoped_persist
from concurrent_etl_go_spark.sources.readers import read_table

#: $10k feature buckets from exact cents.
_BUCKET = (
    "CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) div 1000000"
    " AS BIGINT)"
)
_BUCKET_DUCK = _BUCKET.replace(" div ", " // ")


def _gini_sql() -> str:
    return f"""
    WITH cells AS MATERIALIZED (
      SELECT {_BUCKET_DUCK} AS bucket, o_orderstatus AS cls,
             COUNT(*) AS cnt
      FROM orders GROUP BY 1, 2
    ),
    grid AS MATERIALIZED (
      SELECT b.bucket, c.cls, COALESCE(x.cnt, 0) AS cnt
      FROM (SELECT DISTINCT bucket FROM cells) b
      CROSS JOIN (SELECT DISTINCT cls FROM cells) c
      LEFT JOIN cells x ON x.bucket = b.bucket AND x.cls = c.cls
    ),
    cum AS MATERIALIZED (
      SELECT bucket, cls,
             CAST(SUM(cnt) OVER (PARTITION BY cls ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cl,
             CAST(SUM(cnt) OVER (PARTITION BY cls) AS BIGINT) AS tot_c
      FROM grid
    ),
    sides AS MATERIALIZED (
      SELECT bucket,
             CAST(SUM(cl) AS BIGINT) AS n_l,
             SUM(CAST(cl AS HUGEINT) * cl) AS sl2,
             CAST(SUM(tot_c - cl) AS BIGINT) AS n_r,
             SUM(CAST(tot_c - cl AS HUGEINT) * (tot_c - cl)) AS sr2
      FROM cum GROUP BY 1
    ),
    scored AS MATERIALIZED (
      SELECT bucket AS split_bucket, n_l, n_r,
             CAST((CASE WHEN n_l = 0 THEN 0 ELSE
                     (CAST(n_l AS HUGEINT) * n_l - sl2) * 1000000000
                       // n_l END
                 + CASE WHEN n_r = 0 THEN 0 ELSE
                     (CAST(n_r AS HUGEINT) * n_r - sr2) * 1000000000
                       // n_r END) // (n_l + n_r) AS BIGINT)
               AS weighted_gini_e9
      FROM sides WHERE n_r > 0
    ),
    parent AS (
      SELECT CAST((CAST(n AS HUGEINT) * n - s2) * 1000000000
                  // (CAST(n AS HUGEINT) * n) AS BIGINT) AS parent_e9
      FROM (
        SELECT CAST(SUM(tot_c) AS BIGINT) AS n,
               SUM(CAST(tot_c AS HUGEINT) * tot_c) AS s2
        FROM (SELECT DISTINCT cls, tot_c FROM cum)
      )
    )
    SELECT split_bucket, n_l AS n_left, n_r AS n_right,
           weighted_gini_e9, parent_e9,
           parent_e9 - weighted_gini_e9 AS gain_e9
    FROM scored CROSS JOIN parent
    ORDER BY weighted_gini_e9 ASC, split_bucket ASC LIMIT 1
    """


@query("agg_gini_split", oracle=_gini_sql())
def agg_gini_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best decision-stump split of order total price (in $10k
    buckets) for predicting order status: every candidate threshold is
    scored by weighted Gini impurity computed from cumulative class
    counts over the bucket x class grid, all in exact 128-bit integer
    nano-units; the winner is (lowest impurity, lowest bucket).

    Scale: one orders scan -> ~60x3-cell hash agg; thresholds are
    evaluated with grid-sized windows, so adding rows never adds
    candidate-evaluation work."""
    big = "DECIMAL(38,0)"
    orders = read_table(spark, sf_dir, "orders").select(
        "o_totalprice", "o_orderstatus"
    )
    cells = scoped_persist(
        orders.groupBy(
            F.expr(_BUCKET).alias("bucket"),
            F.col("o_orderstatus").alias("cls"),
        ).agg(F.count(F.lit(1)).alias("cnt"))
    )
    # broadcast the 3-row class dim: broadcast nested-loop, never a
    # CartesianProduct (plan-shape rule)
    grid = (
        cells.select("bucket")
        .distinct()
        .crossJoin(F.broadcast(cells.select("cls").distinct()))
        .join(cells, ["bucket", "cls"], "left")
        .select("bucket", "cls", F.coalesce("cnt", F.lit(0)).alias("cnt"))
    )
    wcum = (
        Window.partitionBy("cls")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.select(
        "bucket",
        "cls",
        F.sum("cnt").over(wcum).cast("long").alias("cl"),
        F.sum("cnt").over(Window.partitionBy("cls")).cast("long").alias(
            "tot_c"
        ),
    )
    sides = cum.groupBy("bucket").agg(
        F.sum("cl").cast("long").alias("n_l"),
        F.sum(F.expr(f"CAST(cl AS {big}) * cl")).alias("sl2"),
        F.sum(F.expr("tot_c - cl")).cast("long").alias("n_r"),
        F.sum(
            F.expr(f"CAST(tot_c - cl AS {big}) * (tot_c - cl)")
        ).alias("sr2"),
    )
    scored = sides.where(F.col("n_r") > 0).select(
        F.col("bucket").alias("split_bucket"),
        "n_l",
        "n_r",
        F.expr(
            f"CAST((CASE WHEN n_l = 0 THEN 0 ELSE"
            f" (CAST(n_l AS {big}) * n_l - sl2) * 1000000000"
            f" div n_l END"
            f" + CASE WHEN n_r = 0 THEN 0 ELSE"
            f" (CAST(n_r AS {big}) * n_r - sr2) * 1000000000"
            f" div n_r END) div (n_l + n_r) AS BIGINT)"
        ).alias("weighted_gini_e9"),
    )
    parent = (
        cum.select("cls", "tot_c")
        .distinct()
        .agg(
            F.sum("tot_c").cast("long").alias("n"),
            F.sum(F.expr(f"CAST(tot_c AS {big}) * tot_c")).alias("s2"),
        )
        .select(
            F.expr(
                f"CAST((CAST(n AS {big}) * n - s2) * 1000000000"
                f" div (CAST(n AS {big}) * n) AS BIGINT)"
            ).alias("parent_e9")
        )
    )
    return (
        scored.crossJoin(F.broadcast(parent))
        .select(
            "split_bucket",
            F.col("n_l").alias("n_left"),
            F.col("n_r").alias("n_right"),
            "weighted_gini_e9",
            "parent_e9",
            (F.col("parent_e9") - F.col("weighted_gini_e9")).alias(
                "gain_e9"
            ),
        )
        .orderBy(F.asc("weighted_gini_e9"), F.asc("split_bucket"))
        .limit(1)
    )

"""Sketch operators: re-aggregatable approximate structures — the
petabyte-scale substitutes for exact distinct counts and exact frequency
tables.

Two flavors:
- ``agg_hll_mergeable``: Spark's built-in Apache DataSketches HLL
  (``hll_sketch_agg`` / ``hll_union_agg``) — sketches built per group are
  UNIONED across groups without rescanning data, the property that makes
  distinct-count rollups feasible at 100 TB (exact count-distinct cannot
  re-aggregate).
- ``text_countmin_sketch``: a hand-rolled count-min sketch materialized
  as a narrow (row, bucket, count) DataFrame — d hash rows built in ONE
  pass with map-side combine; merging two corpora's sketches is a
  SUM-by-key join, and point estimates read d rows. Demonstrates the
  custom-sketch-as-table pattern where no builtin exists.

Both are rows-only driver checks (hash/seed-dependent internals are not
SQL-portable); pytest pins the one-sided CMS error bound and the HLL
estimate accuracy against exact counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.sources.readers import read_table

CMS_DEPTH = 4
CMS_WIDTH = 256


@query("agg_hll_mergeable")  # DataSketches binary internals — rows-only
def agg_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via mergeable HLL sketches, plus the
    UNION row ('__all__') computed by merging the per-group sketches —
    not by rescanning events.

    At 100 TB this is the only viable distinct-count rollup shape: the
    per-dimension sketches are kilobytes, union is associative, and any
    rollup cell (day -> week -> all) derives from child sketches. The
    lgConfigK=12 sketch bounds the error near 1.6%.
    """
    events = read_table(spark, sf_dir, "events")
    per_type = events.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sketch")
    )
    with_estimates = per_type.select(
        "event_type",
        F.hll_sketch_estimate("sketch").alias("approx_users"),
        "sketch",
    )
    total = with_estimates.agg(
        F.hll_union_agg("sketch").alias("sketch")
    ).select(
        F.lit("__all__").alias("event_type"),
        F.hll_sketch_estimate("sketch").alias("approx_users"),
    )
    return with_estimates.select("event_type", "approx_users").unionByName(
        total
    )


def countmin_build(
    items: DataFrame,
    item_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build a count-min sketch TABLE (row_id, bucket, n) from an item
    column: one explode over ``depth`` seeded xxhash64 buckets, one
    map-side-combined aggregation. The sketch for a 100 TB corpus is
    depth x width rows regardless of input size; two sketches merge by
    summing counts on (row_id, bucket)."""
    rows = F.transform(
        F.sequence(F.lit(0), F.lit(depth - 1)),
        lambda d: F.struct(
            d.alias("row_id"),
            F.pmod(F.xxhash64(F.col(item_col), d), F.lit(width)).alias(
                "bucket"
            ),
        ),
    )
    return (
        items.select(F.explode(rows).alias("rb"))
        .select("rb.row_id", "rb.bucket")
        .groupBy("row_id", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def countmin_estimate(
    sketch: DataFrame, items: DataFrame, item_col: str, width: int = CMS_WIDTH
) -> DataFrame:
    """Point-estimate item frequencies from a count-min sketch table:
    join each item's d (row, bucket) coordinates against the sketch and
    take the MIN count — the classic one-sided estimator (never
    underestimates; overestimates bounded by collisions e*N/width)."""
    coords = items.select(
        F.col(item_col).alias("item"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1)),
                lambda d: F.struct(
                    d.alias("row_id"),
                    F.pmod(F.xxhash64(F.col(item_col), d), F.lit(width)).alias(
                        "bucket"
                    ),
                ),
            )
        ).alias("rb"),
    ).select("item", "rb.row_id", "rb.bucket")
    return (
        coords.join(F.broadcast(sketch), ["row_id", "bucket"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce("n", F.lit(0))).alias("approx_count"))
    )


@query("text_countmin_sketch")  # seeded-hash internals — rows-only
def text_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min estimates of language frequencies in documents: build
    the sketch table from the lang column, then point-estimate each
    distinct language from the sketch alone. Output is (item,
    approx_count) where approx >= true count (one-sided CMS error, bound
    pinned by pytest)."""
    docs = read_table(spark, sf_dir, "documents")
    sketch = countmin_build(docs, "lang")
    langs = docs.select("lang").distinct()
    return countmin_estimate(sketch, langs, "lang").orderBy("item")


@query("agg_trailing_distinct_hll")  # sketch internals — rows-only
def agg_trailing_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day distinct actives via MERGEABLE per-day HLL sketches
    — the 100 TB shape of ``agg_trailing_distinct`` (relational10.py),
    which is its exact oracle-checked twin.

    The exact form re-counts distinct users over every 7-day frame, so
    each day of raw (day, user) pairs is shuffled into seven frames. Here
    raw events collapse ONCE into one kilobyte-sized sketch per day; the
    bounded day-range join then replicates only sketches (days x 7 rows
    total), and each frame's count is a union of seven sketches — no
    (day, user) pair is ever re-shuffled. This is the only rolling-
    distinct shape that stays flat as user cardinality grows: frame cost
    is O(days) regardless of whether a day has 1e3 or 1e9 actives.

    Accuracy: lgConfigK=12 bounds the standard error near 1.6%; the
    pytest pins every day's estimate within 5% of the exact twin.
    """
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sketch")
    )
    grid = daily.select(F.col("day").alias("g_day"))
    cond = (F.col("day") <= F.col("g_day")) & (
        F.col("day") >= F.col("g_day") - F.expr("INTERVAL 6 DAYS")
    )
    return (
        grid.join(daily, cond)
        .groupBy(F.col("g_day").alias("day"))
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(
                "approx_trailing_7d_users"
            )
        )
    )

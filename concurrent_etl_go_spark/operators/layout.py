"""Z-order (Morton-curve) layout keys — multi-dimensional data skipping.

Single-column range layout (``repartitionByRange(col)``) makes file-level
min/max stats tight on ONE column; a predicate on any other column skips
nothing. Interleaving the bits of two bucketed dimensions into one sort
key (the z-value) keeps files tight on BOTH dimensions at once — the
technique behind Delta/Iceberg ``ZORDER BY`` and the reason a 100 TB
table can serve point-ish lookups on (user, time) without a secondary
index. The versioned table's manifest stats (``write_table_with_stats`` /
``read_table_pruned``) turn those tight ranges into skipped file opens;
``tests/test_layout_zorder.py`` asserts the skip actually happens.

The z-value is a pure per-row bit expression (no UDF, no shuffle); the
layout write is one ``repartitionByRange`` on it. Both engines build the
identical integer, so the registry query is fully oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.sources.readers import read_table

#: Bits kept per dimension (z-value spans 2*Z_BITS bits). 8 bits/dim =
#: 256 buckets/dim — enough for file-level skipping granularity; raise it
#: for finer curves (cost is only expression length).
Z_BITS = 8
_MASK = (1 << Z_BITS) - 1


def zvalue(x: Column, y: Column, bits: int = Z_BITS) -> Column:
    """Interleave the low ``bits`` of two non-negative longs: bit i of x
    lands at position 2i, bit i of y at 2i+1. Disjoint targets, so the
    combination is a plain sum."""
    x, y = x.bitwiseAND(_MASK), y.bitwiseAND(_MASK)
    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(1), 2 * i))
        parts.append(F.shiftleft(F.shiftright(y, i).bitwiseAND(1), 2 * i + 1))
    z = parts[0]
    for p in parts[1:]:
        z = z + p
    return z


def zvalue_sql(x: str, y: str, bits: int = Z_BITS) -> str:
    """The identical interleave as portable SQL text (DuckDB oracle)."""
    xm, ym = f"(({x}) & {_MASK})", f"(({y}) & {_MASK})"
    parts = []
    for i in range(bits):
        parts.append(f"((({xm} >> {i}) & 1) << {2 * i})")
        parts.append(f"((({ym} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(parts)


#: Time dimension of the registry query: epoch-hour low bits (DuckDB
#: form; the Spark twin builds the identical long in-plan).
_HB_SQL = "CAST(floor(epoch(ts) / 3600) AS BIGINT)"


@query(
    "layout_zorder",
    oracle=f"""
    WITH b AS (
      SELECT (user_id & {_MASK}) AS ub,
             ({_HB_SQL} & {_MASK}) AS hb
      FROM events
    ),
    z AS (
      SELECT ub, hb, {zvalue_sql("ub", "hb")} AS zv FROM b
    )
    SELECT CAST(zv // 64 AS BIGINT) AS zbucket,
           COUNT(*) AS n_rows,
           MIN(ub) AS min_ub, MAX(ub) AS max_ub,
           MIN(hb) AS min_hb, MAX(hb) AS max_hb
    FROM z
    GROUP BY 1
    ORDER BY zbucket
    """,
)
def layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-value layout diagnostics over ``events``: bucket rows by the top
    bits of their Morton key and report each bucket's (user, hour)
    bounding box. Tight per-bucket boxes on BOTH dimensions are exactly
    what makes the layout skippable — this query is the "would z-order
    help" profile a table owner runs before rewriting 100 TB.

    Scale: the z-value is a per-row bit expression; the profile is one
    groupBy over 2^(2*Z_BITS)/64 buckets (map-side combined). The actual
    rewrite is ``repartitionByRange(z)`` + ``write_table_with_stats``,
    exercised in tests/test_layout_zorder.py.
    """
    ev = read_table(spark, sf_dir, "events")
    hb = F.floor(F.unix_timestamp("ts") / 3600).cast("long")
    b = ev.select(
        F.col("user_id").bitwiseAND(_MASK).alias("ub"),
        hb.bitwiseAND(_MASK).alias("hb"),
    )
    z = b.withColumn("zv", zvalue(F.col("ub"), F.col("hb")))
    return (
        z.groupBy(F.floor(F.col("zv") / 64).cast("long").alias("zbucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("ub").alias("min_ub"),
            F.max("ub").alias("max_ub"),
            F.min("hb").alias("min_hb"),
            F.max("hb").alias("max_hb"),
        )
        .orderBy("zbucket")
    )


def zorder_layout(df: DataFrame, x: str, y: str, n_files: int) -> DataFrame:
    """Re-layout ``df`` along the z-curve of (x, y): adds bucketed ``ub``/
    ``hb``/``zv`` columns and range-partitions into ``n_files`` output
    partitions so each written file covers a contiguous z-range (a small
    rectangle-ish region of the (x, y) plane)."""
    out = df.withColumn("ub", F.col(x).bitwiseAND(_MASK)).withColumn(
        "hb", F.col(y).bitwiseAND(_MASK)
    )
    out = out.withColumn("zv", zvalue(F.col("ub"), F.col("hb")))
    return out.repartitionByRange(n_files, "zv")

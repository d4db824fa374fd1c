"""Nest/unnest helpers for the indicator array-of-struct column.

The reference packs 5 named metrics into an ordered ``[]Indicator`` slice
(reference etl/main.go:220-226). The engine builds the same shape with
``F.array(F.struct(...))`` — order-preserving, fully JVM-side — and provides
the inverse (explode) for the relational surface.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pack_indicators(pairs: Sequence[tuple[str, Column]]) -> Column:
    """Build an ordered array<struct<name string, value double>> column.

    ``pairs`` is an ordered sequence of (indicator_name, value_column) —
    order is preserved exactly as the reference preserves slice order.
    """
    return F.array(
        *[
            F.struct(F.lit(name).alias("name"), value.cast("double").alias("value"))
            for name, value in pairs
        ]
    )


def explode_indicators(df: DataFrame, indicators_col: str = "indicators") -> DataFrame:
    """Inverse of pack: one row per (parent-row, indicator)."""
    exploded = df.withColumn("indicator", F.explode(F.col(indicators_col))).drop(
        indicators_col
    )
    return exploded.withColumns(
        {
            "indicator_name": F.col("indicator.name"),
            "indicator_value": F.col("indicator.value"),
        }
    ).drop("indicator")

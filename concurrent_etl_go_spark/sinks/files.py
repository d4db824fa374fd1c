"""File sinks: partitioned parquet / csv / gzip-JSON writers.

The reference's only file output is the gzip-JSON DLQ spill (S19). The
engine generalizes to the standard lake formats with explicit partitioning
— at scale, partition columns are the pruning key for every downstream
read."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(
    df: DataFrame, path: str, header: bool = True, mode: str = "overwrite"
) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json_gzip(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """gzip-JSON lines — the DLQ spill format as a general sink (S19/S21)."""
    df.write.mode(mode).option("compression", "gzip").json(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """ORC writer (built into Spark — no external jar): the other columnar
    lake format, with the same pushdown/pruning behavior as parquet."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: pre-shuffles data into ``n_buckets`` by
    ``bucket_col`` at write time so later joins/aggregations on that key
    read co-located buckets with NO exchange — the pay-once-shuffle-never
    pattern for repeatedly-joined fact tables."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table)
    )

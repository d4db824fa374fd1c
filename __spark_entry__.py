"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship parity pipeline on sf0.001.
``queries()`` / ``oracle_sql()`` expose the engine's operator registry —
one named entry per implemented operator from SURVEY.md §2, each with a
DuckDB oracle where SQL-expressible (rows-only otherwise).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference ETL pipeline (scan -> validate -> cast
    -> derive -> pack indicators -> hash route) on the sf0.001 events table."""
    from concurrent_etl_go_spark.plans import flagship

    return flagship(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    import concurrent_etl_go_spark.operators as ops

    return dict(ops.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    import concurrent_etl_go_spark.operators as ops

    return dict(ops.ORACLES)

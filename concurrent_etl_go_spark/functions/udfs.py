"""User extension surface: UDF registration.

The reference has no user extension point — its transforms are compiled in
(SURVEY §2.A.1). The engine exposes the standard Spark extension surface
with guard rails: Pandas (Arrow-vectorized) UDFs are the supported path;
row-at-a-time Python UDFs are allowed but explicitly marked as the slow
path.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def register_pandas_udf(
    spark: SparkSession, name: str, fn: Callable, return_type: str
):
    """Register an Arrow-vectorized UDF for use in both the DataFrame API
    and ``spark.sql``. ``fn`` takes/returns pandas Series — executed
    batch-at-a-time, never per-row."""
    udf = F.pandas_udf(fn, returnType=return_type)
    spark.udf.register(name, udf)
    return udf


def register_python_udf(
    spark: SparkSession, name: str, fn: Callable, return_type: str
):
    """Row-at-a-time Python UDF — the SLOW path (per-row serde, no
    vectorization). Prefer ``register_pandas_udf``; this exists for
    API completeness and non-vectorizable logic."""
    udf = F.udf(fn, returnType=return_type)
    spark.udf.register(name, udf)
    return udf

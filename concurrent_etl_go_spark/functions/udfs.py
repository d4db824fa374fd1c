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


def register_pandas_udaf(
    spark: SparkSession, name: str, fn: Callable, return_type: str
):
    """Register an Arrow-vectorized grouped AGGREGATE (UDAF): ``fn`` must
    carry a ``(pd.Series, ...) -> scalar`` type-hinted signature, which is
    how pandas_udf infers the grouped-agg evaluation type. Usable in both
    ``groupBy().agg()`` and SQL aggregate position; executes once per
    group over Arrow batches — the supported custom-aggregation path
    (never a row-at-a-time accumulator)."""
    udaf = F.pandas_udf(fn, returnType=return_type)
    spark.udf.register(name, udaf)
    return udaf


def register_udtf(spark: SparkSession, name: str, cls, return_type: str):
    """Register a user-defined TABLE function (UDTF): ``cls`` implements
    ``eval(...)`` yielding output tuples; each input row may produce any
    number of output rows. Completes the UDF/UDAF/UDTF extension triple
    (SURVEY §2.A.1 — the reference has no extension point at all).
    Callable from SQL as a table source: ``SELECT * FROM name(...)``."""
    from pyspark.sql.functions import udtf

    tf = udtf(cls, returnType=return_type)
    spark.udtf.register(name, tf)
    return tf

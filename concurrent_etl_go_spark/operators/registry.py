"""Query registry backing the driver contract.

Every implemented operator gets a named entry: a PySpark callable
``(spark, sf_dir) -> DataFrame`` and, when SQL-expressible, a DuckDB oracle
SQL string computing the same result (same column NAMES — the driver's
compare sorts columns by name and value-hashes order-insensitively).

Convention for oracle safety (see SURVEY §7.4.6):
- no query depends on implicit row order (LIMIT queries use total
  deterministic ORDER BY with explicit tie-breaks),
- every computed double column is ROUND(x, 4) on BOTH sides so engine
  summation-order differences cannot flip the hash,
- timestamps compare under the session timezone pinned to UTC.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle`` is the DuckDB-equivalent SQL.

    Queries without an oracle get the driver's weaker rows-only check
    (reserved for genuinely non-SQL-expressible ops such as MinHash-LSH).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco

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
SCALE_CLASS: dict[str, str] = {}

#: scale_class values:
#: - "production": the at-scale path; safe on the full corpus.
#: - "oracle_twin": correctness twin of a production operator with a
#:   deliberately simpler (often O(n^2)-blocked) plan — run it only on
#:   bounded/sampled inputs; its production counterpart is named in the
#:   registering module's docstring (e.g. dedup_ngram_jaccard ->
#:   dedup_minhash_lsh, similarity_pairs -> dedup via LSH / IVF).
SCALE_CLASSES = ("production", "oracle_twin")


def query(
    name: str, oracle: str | None = None, scale_class: str = "production"
) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle`` is the DuckDB-equivalent SQL.

    Queries without an oracle get the driver's weaker rows-only check
    (reserved for genuinely non-SQL-expressible ops such as MinHash-LSH).
    ``scale_class`` marks bounded oracle-twin variants so a user cannot
    mistake them for the at-scale path (surfaced via ``Engine.queries()``).
    """
    if scale_class not in SCALE_CLASSES:
        raise ValueError(f"unknown scale_class: {scale_class}")

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        SCALE_CLASS[name] = scale_class
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco

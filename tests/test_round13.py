"""Round-13 invariant tests: ADVICE r12 fix verification.

- The PCA rescale's portable floor-division must agree with
  mathematical floor semantics on SIGNED, non-exact-multiple inputs
  (Spark ``div`` truncates toward zero, DuckDB ``//`` floors; the
  _FDIV mod-subtraction makes both see an exact multiple).
- The RBO oracle must be placeholder-free through every lookup path.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


@pytest.mark.parametrize(
    ("raw", "m"),
    [(-7, 3), (-1, 7), (7, 3), (-1_000_001, 999_983), (5, 5), (-10, 5)],
)
def test_pca_rescale_portable_on_signed_raw(spark, raw, m):
    """The exact rescale expression from llm/pca.py, on signed raw:
    both the Spark form and the DuckDB oracle form must equal Python's
    floor division (Python // floors, like DuckDB)."""
    scale = 1_000_000
    expected = (raw * scale) // m  # Python floors — the target semantics
    got_spark = (
        spark.createDataFrame([(raw, m)], "raw long, m long")
        .select(
            F.expr(f"CAST(raw AS DECIMAL(38,0)) * {scale}").alias("s"),
            "m",
        )
        .select(
            F.expr(
                "CAST((s - ((s % m + m) % m)) div m AS BIGINT)"
            ).alias("w")
        )
        .collect()[0][0]
    )
    got_duck = duckdb.sql(
        f"""SELECT CAST((s - ((s % m + m) % m)) // m AS BIGINT)
            FROM (SELECT CAST({raw} AS HUGEINT) * {scale} AS s,
                         CAST({m} AS BIGINT) AS m)"""
    ).fetchone()[0]
    assert got_spark == expected, f"Spark div diverged: {got_spark}"
    assert got_duck == expected, f"DuckDB // diverged: {got_duck}"


def test_rbo_oracle_no_placeholder_via_lazy_lookup():
    """ADVICE r12 (low): fetching the RBO oracle must never return
    literal '{bm25}'/'{xe}' placeholders, on any import path."""
    from concurrent_etl_go_spark.operators.registry import ORACLES

    sql = ORACLES["search_eval_rbo"]
    assert "{bm25}" not in sql and "{xe}" not in sql
    assert "{bm25}" not in ORACLES.get("search_eval_rbo", "")
    assert all(
        "{bm25}" not in v for k, v in ORACLES.items()
        if k == "search_eval_rbo"
    )

"""Property-based tests (hypothesis) for parity-critical pure functions:
zero-default cast vs Go ParseFloat semantics, sink chunker invariants,
Jaccard bounds."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from concurrent_etl_go_spark.sinks.http_sink import chunked

# -- chunker (S14/S15) -------------------------------------------------------


@given(
    rows=st.lists(st.integers(), max_size=2000),
    size=st.integers(min_value=1, max_value=500),
)
@settings(max_examples=200, deadline=None)
def test_chunked_partitions_without_loss_or_reorder(rows, size):
    dicts = [{"v": r} for r in rows]
    batches = list(chunked(iter(dicts), size))
    # no loss, no reorder
    assert [d for b in batches for d in b] == dicts
    # threshold flush: all full except at most the last (S14/S15)
    if batches:
        assert all(len(b) == size for b in batches[:-1])
        assert 1 <= len(batches[-1]) <= size


# -- zero-default cast (S7) --------------------------------------------------


@given(st.floats(allow_nan=False, allow_infinity=False, width=64))
@settings(max_examples=25, deadline=None)
def test_cast_zero_default_parses_all_valid_floats(spark_cast, x):
    assert spark_cast(repr(x)) == x


@given(st.text(max_size=20))
@settings(max_examples=40, deadline=None)
def test_cast_zero_default_never_nulls(spark_cast, s):
    """Any string — parseable or garbage — must produce a float, never null
    (reference etl/main.go:214-218 discards parse errors into zero values)."""
    out = spark_cast(s)
    assert out is not None
    try:
        expected = float(s)
        import math

        if math.isnan(expected):
            assert out == 0.0 or math.isnan(out)
        else:
            assert out == expected
    except (ValueError, OverflowError):
        # Spark may accept formats Python rejects (e.g. '1d', trailing junk
        # rules differ) — the invariant here is non-null, and zero for
        # everything both parsers reject.
        pass


# spark_cast fixture: evaluate cast_zero_default through a real local
# session once per test run (the property loop reuses the session).
import pytest  # noqa: E402


@pytest.fixture(scope="module")
def spark_cast(spark):
    from pyspark.sql import functions as F

    from concurrent_etl_go_spark.functions.casts import cast_zero_default

    def run(s: str) -> float:
        df = spark.createDataFrame([(s,)], "s string")
        return df.select(cast_zero_default("s").alias("v")).collect()[0].v

    return run


def test_agg_approx_within_bounds_of_exact(spark, sf_dir):
    """The sketch query is rows-only for the driver, so pin its meaning
    here: HLL distinct within 5% of exact per group, and approx-p50 within
    the 1-percentile band [p49, p51] of the exact distribution."""
    from pyspark.sql import functions as F

    from concurrent_etl_go_spark.operators.relational2 import agg_approx
    from concurrent_etl_go_spark.sources.readers import read_table

    approx = {r.l_returnflag: r for r in agg_approx(spark, sf_dir).collect()}
    li = read_table(spark, sf_dir, "lineitem")
    exact = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.percentile(
                "l_extendedprice", F.array(F.lit(0.49), F.lit(0.50), F.lit(0.51))
            ).alias("band"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for flag, e in exact.items():
        a = approx[flag]
        assert abs(a.approx_parts - e.n_parts) / e.n_parts <= 0.05, (
            flag, a.approx_parts, e.n_parts,
        )
        p49, _p50, p51 = e.band
        assert p49 <= a.approx_p50 <= p51, (flag, a.approx_p50, e.band)

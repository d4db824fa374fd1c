"""Invariants + independent recomputes for timeseries part 2:
autocorrelation, stochastic oscillator, Croston."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.timeseries2 import (
    _CR_ALPHA,
    _OSC_SMOOTH,
    agg_croston,
    window_autocorr,
    window_stochastic_osc,
)
from concurrent_etl_go_spark.sources.readers import read_table


def test_autocorr_matches_numpy(spark, sf_dir):
    import numpy as np

    rows = window_autocorr(spark, sf_dir).collect()
    assert {r.lag for r in rows} == set(range(1, 8))
    by_key = {(r.priority, r.lag): r for r in rows}
    # independent recompute for one priority
    pri = rows[0].priority
    daily = (
        read_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == pri)
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(
            F.sum(
                F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)")
            ).alias("cents")
        )
        .orderBy("day")
        .toPandas()
    )
    x = daily.cents.to_numpy(dtype=float)
    xc = x - x.mean()
    denom = float((xc * xc).sum())
    for k in (1, 3, 7):
        r = by_key[(pri, k)]
        acf = float((xc[:-k] * xc[k:]).sum()) / denom
        assert math.isclose(r.acf, acf, abs_tol=5e-4)
        assert r.n_pairs == len(x) - k
        assert -1.000001 <= r.acf <= 1.000001


def test_stochastic_osc_bounds_and_smoothing(spark, sf_dir):
    rows = window_stochastic_osc(spark, sf_dir).collect()
    assert rows, "full-window rows must exist"
    for r in rows:
        assert r.lo <= r.cents <= r.hi
        assert 0 <= r.k_e6 <= 1_000_000
        assert 0 <= r.d_e6 <= 1_000_000
    # %D is the floor-mean of the last _OSC_SMOOTH %K values: recompute
    # per priority from the ordered rows
    from collections import defaultdict

    by_pri = defaultdict(list)
    for r in sorted(rows, key=lambda r: (r.priority, r.day)):
        by_pri[r.priority].append(r)
    for series in by_pri.values():
        for i in range(_OSC_SMOOTH - 1, len(series)):
            ks = [series[j].k_e6 for j in range(i - _OSC_SMOOTH + 1, i + 1)]
            assert series[i].d_e6 == sum(ks) // _OSC_SMOOTH


def test_croston_states_match_python_fold(spark, sf_dir):
    rows = agg_croston(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    # recompute one part's fold in plain python
    pk = rows[0].partkey
    daily = (
        read_table(spark, sf_dir, "lineitem")
        .where(F.col("l_partkey") == pk)
        .groupBy(F.date_trunc("day", "l_shipdate").alias("day"))
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
        .orderBy("day")
        .collect()
    )
    sizes = [float(r.qty) for r in daily]
    days = [r.day for r in daily]
    gaps = [
        float((days[i] - days[i - 1]).days) for i in range(1, len(days))
    ]

    def fold(vals):
        acc = vals[0]
        for v in vals[1:]:
            acc = _CR_ALPHA * v + (1.0 - _CR_ALPHA) * acc
        return acc

    r = rows[0]
    assert math.isclose(r.size_state, fold(sizes), abs_tol=1e-3)
    assert math.isclose(r.interval_state, fold(gaps), abs_tol=1e-3)
    assert math.isclose(
        r.rate_per_day, fold(sizes) / fold(gaps), abs_tol=1e-3
    )
    assert r.n_demands == len(sizes)

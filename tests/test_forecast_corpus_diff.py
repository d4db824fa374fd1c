"""Invariants for Brown double-exponential smoothing
(operators/forecast.py) and the log-odds distinctive-terms corpus diff
(llm/corpus_diff.py)."""

from __future__ import annotations

import math

from concurrent_etl_go_spark.llm.corpus_diff import (
    _TOP,
    text_distinctive_terms,
)
from concurrent_etl_go_spark.operators.forecast import (
    _ALPHA,
    agg_holt_forecast,
)
from concurrent_etl_go_spark.sources.readers import read_table


def test_holt_matches_reference_recurrence(spark, sf_dir):
    """The query's prefix-fold form must equal the textbook sequential
    recurrence computed in plain Python over the same daily series."""
    from pyspark.sql import functions as F

    ev = read_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
        .orderBy("event_type", "day")
        .collect()
    )
    series: dict[str, list[float]] = {}
    for r in daily:
        series.setdefault(r.event_type, []).append(r.n)

    got = {r.event_type: r for r in agg_holt_forecast(spark, sf_dir).collect()}
    assert set(got) == set(series)
    for et, xs in series.items():
        s1 = s2 = xs[0]
        for x in xs[1:]:
            s1 = _ALPHA * x + (1 - _ALPHA) * s1
            s2 = _ALPHA * s1 + (1 - _ALPHA) * s2
        r = got[et]
        assert math.isclose(r.s1_smooth, round(s1, 4), abs_tol=1e-9)
        assert math.isclose(r.s2_smooth, round(s2, 4), abs_tol=1e-9)
        level = 2.0 * s1 - s2
        trend = _ALPHA * (s1 - s2) / (1 - _ALPHA)
        assert math.isclose(r.level, round(level, 4), abs_tol=1e-9)
        assert math.isclose(r.trend, round(trend, 4), abs_tol=1e-9)
        # forecasts extrapolate linearly from (level, trend)
        assert math.isclose(
            r.forecast_1, round(level + trend, 4), abs_tol=1e-9
        )
        assert math.isclose(
            r.forecast_3, round(level + 3.0 * trend, 4), abs_tol=1e-9
        )


def test_distinctive_terms_shape_and_direction(spark, sf_dir):
    rows = text_distinctive_terms(spark, sf_dir).collect()
    a = [r for r in rows if r.side == "a"]
    b = [r for r in rows if r.side == "b"]
    assert len(a) == _TOP and len(b) == _TOP
    assert not {r.term for r in a} & {r.term for r in b}
    # side-a terms skew toward half A and vice versa; the z-score sign
    # must agree with the direction
    for r in a:
        assert r.z_score > 0
    for r in b:
        assert r.z_score < 0
    # ranks are 1.._TOP and ordered by the emitted rounded score
    for side_rows, sign in ((a, -1), (b, 1)):
        side_rows.sort(key=lambda r: r.drank)
        assert [r.drank for r in side_rows] == list(range(1, _TOP + 1))
        zs = [sign * r.z_score for r in side_rows]
        assert zs == sorted(zs)


def test_time_decay_score_favors_recency(spark, sf_dir):
    from pyspark.sql import functions as F

    from concurrent_etl_go_spark.operators.forecast import (
        _DECAY_TOP,
        agg_time_decay_score,
    )

    rows = agg_time_decay_score(spark, sf_dir).collect()
    assert 0 < len(rows) <= _DECAY_TOP
    scores = [r.decay_score for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        # every order contributes at most cents*1000 (age 0) and more
        # than 0 (hyperbolic decay never hits zero in-range)
        assert 0 < r.decay_score <= r.total_cents * 1000
        assert r.n_orders >= 1


def test_forecast_backtest_consistency(spark, sf_dir):
    from concurrent_etl_go_spark.operators.forecast import (
        _BT_HOLDOUT,
        agg_forecast_backtest,
    )

    rows = agg_forecast_backtest(spark, sf_dir).collect()
    assert rows
    by_type: dict[str, list] = {}
    for r in rows:
        assert 1 <= r.h <= _BT_HOLDOUT
        assert r.actual >= 0 and r.naive_abs_err >= 0
        assert abs(abs(r.forecast - r.actual) - r.abs_err) < 2e-4
        by_type.setdefault(r.event_type, []).append(r)
    for rs in by_type.values():
        assert len(rs) == _BT_HOLDOUT


def test_survival_km_monotone(spark, sf_dir):
    from concurrent_etl_go_spark.operators.survival import agg_survival_km

    rows = agg_survival_km(spark, sf_dir).orderBy("t_days").collect()
    assert rows
    last_s, last_n = 1.0 + 1e-9, None
    for r in rows:
        assert r.n_events >= 1
        assert r.n_risk >= r.n_events
        # survival never increases; at-risk never increases with t
        assert r.survival <= last_s + 1e-9
        assert 0.0 <= r.survival < 1.0 + 1e-9
        if last_n is not None:
            assert r.n_risk <= last_n
        last_s, last_n = r.survival, r.n_risk


def test_weighted_sample_tracks_intended_mass(spark, sf_dir):
    from concurrent_etl_go_spark.llm.datasets2 import (
        dataset_weighted_sample,
    )

    rows = dataset_weighted_sample(spark, sf_dir).collect()
    assert rows
    n = sum(r.n_docs for r in rows)
    kept = sum(r.n_kept for r in rows)
    intended = sum(r.sum_w_bp for r in rows) / 10000.0
    # corpus-level realized mass tracks intended mass (md5 buckets are
    # uniform; tolerance ~4 sigma of a Bernoulli sum)
    sigma = (intended * 0.25) ** 0.5 + 1.0
    assert abs(kept - intended) < 4 * sigma + 0.05 * n
    for r in rows:
        assert 0 <= r.n_kept <= r.n_docs
        assert r.kept_bp == r.n_kept * 10000 // r.n_docs


def test_survival_km_matches_python_replication(spark, sf_dir):
    """Beyond cross-engine equality (the oracle) and monotonicity: the
    query's output must equal a from-scratch Python Kaplan-Meier over
    the same lifetimes."""
    import duckdb

    from concurrent_etl_go_spark.operators.survival import (
        _CENSOR_DAYS,
        agg_survival_km,
    )

    con = duckdb.connect()
    life = con.execute(
        f"""
        SELECT date_diff('day', MIN(o_orderdate), MAX(o_orderdate)) AS dur,
               date_diff('day', MAX(o_orderdate),
                         (SELECT MAX(o_orderdate)
                          FROM '{sf_dir}/orders.parquet')) AS recency
        FROM '{sf_dir}/orders.parquet' GROUP BY o_custkey
        """
    ).fetchall()
    durs = [(d, 0 if r < _CENSOR_DAYS else 1) for d, r in life]
    event_times = sorted({d for d, ch in durs if ch == 1})
    s, expected = 1.0, {}
    for t in event_times:
        n = sum(1 for d, _ in durs if d >= t)
        d_t = sum(1 for d, ch in durs if d == t and ch == 1)
        s = s * (1.0 - d_t / n)
        expected[t] = (n, d_t, round(s, 6))
    got = {
        r.t_days: (r.n_risk, r.n_events, r.survival)
        for r in agg_survival_km(spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for t, (n, d_t, s_t) in expected.items():
        gn, gd, gs = got[t]
        assert (gn, gd) == (n, d_t)
        assert abs(gs - s_t) < 1e-9


def test_burstiness_matches_python_vmr(spark, sf_dir):
    import duckdb

    from concurrent_etl_go_spark.llm.text2 import text_term_burstiness

    rows = text_term_burstiness(spark, sf_dir).collect()
    assert rows
    con = duckdb.connect()
    n_docs = con.execute(
        f"SELECT COUNT(*) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    for r in rows[:5]:
        counts = dict(con.execute(
            f"""SELECT doc_id, COUNT(*) FROM (
                  SELECT doc_id, unnest(string_split(text, ' ')) AS term
                  FROM '{sf_dir}/documents.parquet') WHERE term = ?
                GROUP BY doc_id""",
            [r.term],
        ).fetchall())
        t = sum(counts.values())
        sq = sum(c * c for c in counts.values())
        assert r.t == t and r.df == len(counts)
        assert r.vmr_bp == (n_docs * sq - t * t) * 10000 // (n_docs * t)

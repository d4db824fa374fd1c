"""Invariants for round-10 batch 5: range search, SPRT, weekday
seasonality."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from concurrent_etl_go_spark.llm.similarity2 import (
    _RANGE_TAU2_E6,
    similarity_range_search,
)
from concurrent_etl_go_spark.operators.experiments3 import (
    _LOWER_E6,
    _UPPER_E6,
    agg_sprt_ab,
)
from concurrent_etl_go_spark.operators.timeseries2 import (
    agg_weekday_seasonality,
)
from concurrent_etl_go_spark.sources.readers import read_table


def test_range_search_matches_float_cosine(spark, sf_dir):
    rows = similarity_range_search(spark, sf_dir).collect()
    assert rows, "the panel should find at least one in-radius vector"
    for r in rows:
        assert r.dot > 0
        assert r.cos2_e6 >= _RANGE_TAU2_E6
        assert r.query_id != r.vec_id
    # spot-check one pair against float cosine of the RAW embeddings:
    # int8 quantization distorts cosine by well under 0.05 at 64 dims
    import numpy as np

    r = rows[0]
    emb = {
        row.vec_id: np.array(row.embedding, dtype=float)
        for row in read_table(spark, sf_dir, "embeddings")
        .where(F.col("vec_id").isin(int(r.query_id), int(r.vec_id)))
        .collect()
    }
    q, v = emb[r.query_id], emb[r.vec_id]
    cos = float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v)))
    assert math.isclose(
        math.sqrt(r.cos2_e6 / 1e6), cos, abs_tol=0.05
    )


def test_sprt_trace_consistency(spark, sf_dir):
    rows = sorted(agg_sprt_ab(spark, sf_dir).collect(), key=lambda r: r.day)
    assert rows
    run = 0
    for r in rows:
        assert 0 <= r.n_converted <= r.n_exposed
        run += r.term_e6
        assert r.llr_e6 == run
        want = (
            "accept_h1"
            if r.llr_e6 >= _UPPER_E6
            else "accept_h0"
            if r.llr_e6 <= _LOWER_E6
            else "continue"
        )
        assert r.decision == want
        assert math.isclose(r.llr_cum, r.llr_e6 / 1e6, rel_tol=1e-12)


def test_weekday_index_averages_to_one(spark, sf_dir):
    rows = agg_weekday_seasonality(spark, sf_dir).collect()
    assert {r.dow for r in rows} <= set(range(7))
    st = sum(r.sum_cents for r in rows)
    nt = sum(r.n_days for r in rows)
    for r in rows:
        assert math.isclose(
            r.mean_cents, r.sum_cents / r.n_days, rel_tol=1e-12
        )
        want = r.sum_cents * nt * 1_000_000 // (r.n_days * st)
        assert r.index_e6 == want
    # day-count-weighted mean index is 1.0 by construction
    wavg = sum(r.index_e6 * r.n_days for r in rows) / (nt * 1e6)
    assert math.isclose(wavg, 1.0, abs_tol=1e-4)


def test_retrieval_auc_brute_is_perfect(spark, sf_dir):
    from concurrent_etl_go_spark.llm.retrieval_eval import search_eval_auc

    rows = search_eval_auc(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.auc_bp <= 10000
        assert r.u_stat <= r.n_rel * r.n_irr or r.n_irr == 0
        if r.arm == "brute":
            # the brute arm's retrieved list IS the truth top-k
            assert r.auc_bp == 10000
    arms = {r.arm for r in rows}
    assert "brute" in arms and len(arms) >= 3


def test_capture_recapture_estimate_bounds(spark, sf_dir):
    from concurrent_etl_go_spark.operators.experiments3 import (
        agg_capture_recapture,
    )

    r = agg_capture_recapture(spark, sf_dir).collect()[0]
    assert r.recaptured <= min(r.first_half_users, r.second_half_users)
    # the estimate can never be below what was directly observed
    # (Chapman is >= n1 + n2 - m, and observed = n1 + n2 - m)
    assert r.chapman_estimate >= r.observed - 1
    assert 0 < r.coverage_e6 <= 1_050_000


def test_effect_size_matches_numpy(spark, sf_dir):
    import numpy as np
    from pyspark.sql import functions as F2

    from concurrent_etl_go_spark.operators.experiments3 import (
        agg_effect_size,
    )

    r = agg_effect_size(spark, sf_dir).collect()[0]
    ev = (
        read_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .toPandas()
    )
    ev["y"] = (ev.event_type == "purchase").astype(int)
    per_user = ev.groupby("user_id").y.sum()
    import hashlib

    arms = per_user.index.map(
        lambda u: int(hashlib.md5(str(u).encode()).hexdigest()[:4], 16) % 2
    )
    y0 = per_user[arms == 0].to_numpy(dtype=int)
    y1 = per_user[arms == 1].to_numpy(dtype=int)
    # recompute the DEFINED statistic: per-arm (n*ss - s^2) // n floors
    # (visible at sf0.001's tiny user panel; negligible at scale)
    def ss_floor(y):
        n, s, ss = len(y), int(y.sum()), int((y * y).sum())
        return (n * ss - s * s) // n

    ssw = ss_floor(y0) + ss_floor(y1)
    assert r.ssw_s == ssw
    d = (y1.mean() - y0.mean()) / math.sqrt(
        ssw / (len(y0) + len(y1) - 2)
    )
    assert (r.n_control, r.n_treatment) == (len(y0), len(y1))
    assert math.isclose(r.cohens_d, d, abs_tol=1e-9)
    # and the floor-defined d sits near the raw-float d
    ssw_f = ((y0 - y0.mean()) ** 2).sum() + ((y1 - y1.mean()) ** 2).sum()
    d_f = (y1.mean() - y0.mean()) / math.sqrt(
        ssw_f / (len(y0) + len(y1) - 2)
    )
    assert math.isclose(r.cohens_d, d_f, rel_tol=2e-2)


def test_seasonal_strength_bounds(spark, sf_dir):
    from concurrent_etl_go_spark.operators.timeseries2 import (
        agg_seasonal_strength,
    )

    r = agg_seasonal_strength(spark, sf_dir).collect()[0]
    assert r.n_days_used > 0
    assert 0 <= r.seasonal_strength_e6 <= 1_000_000
    assert 0 <= r.ssb_s <= r.sst_s


def test_rich_club_monotone_density(spark, sf_dir):
    from concurrent_etl_go_spark.operators.graph4 import graph_rich_club

    rows = sorted(graph_rich_club(spark, sf_dir).collect(),
                  key=lambda r: r.k)
    assert [r.k for r in rows] == [2, 4, 8]
    for r in rows:
        assert 0 <= r.phi_e6 <= 1_000_000
        assert 2 * r.e_k <= r.n_k * (r.n_k - 1)

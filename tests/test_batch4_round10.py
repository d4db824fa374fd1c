"""Invariants for round-10 batch 4: global transitivity, SRM check,
Gini stump split, brand transitions, recommendation coverage."""

from __future__ import annotations

import math

from concurrent_etl_go_spark.operators.experiments2 import agg_srm_check
from concurrent_etl_go_spark.operators.graph4 import graph_transitivity
from concurrent_etl_go_spark.operators.ml_primitives import agg_gini_split
from concurrent_etl_go_spark.operators.recommender import (
    _REC_CUSTS,
    _REC_TOP,
    rec_coverage,
)
from concurrent_etl_go_spark.operators.retail3 import agg_brand_transitions


def test_transitivity_bounds(spark, sf_dir):
    r = graph_transitivity(spark, sf_dir).collect()[0]
    assert r.n_nodes > 0 and r.n_edges > 0
    # every triangle contributes 3 wedges, so 3T <= W and C in [0, 1]
    assert 0 <= 3 * r.triangles <= r.wedges
    assert 0 <= r.transitivity_e6 <= 1_000_000
    assert math.isclose(
        r.transitivity, 3 * r.triangles / r.wedges, rel_tol=1e-12
    )


def test_srm_is_chi_square_of_the_split(spark, sf_dir):
    r = agg_srm_check(spark, sf_dir).collect()[0]
    assert r.arm0 + r.arm1 == r.n_users
    assert r.chi2_e6 == (r.arm0 - r.arm1) ** 2 * 1_000_000 // r.n_users
    assert math.isclose(
        r.z_score, (r.arm0 - r.arm1) / math.sqrt(r.n_users), rel_tol=1e-12
    )
    # a healthy md5 split stays within ~5 sigma at any sf
    assert abs(r.z_score) < 5


def test_gini_split_beats_parent(spark, sf_dir):
    r = agg_gini_split(spark, sf_dir).collect()[0]
    assert r.n_left > 0 and r.n_right > 0
    # Gini of a <=3-class distribution is in [0, 2/3]
    assert 0 <= r.weighted_gini_e9 <= 667_000_000
    assert 0 <= r.parent_e9 <= 667_000_000
    # splitting never increases impurity (up to integer floor bias)
    assert r.gain_e9 >= -10


def test_brand_transitions_lift(spark, sf_dir):
    rows = agg_brand_transitions(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert r.cnt > 0
        assert r.cnt <= r.from_cnt and r.cnt <= r.to_cnt
        assert r.lift_e6 >= 0
    # descending count order with deterministic tie-breaks
    counts = [r.cnt for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_rec_coverage_consistency(spark, sf_dir):
    r = rec_coverage(spark, sf_dir).collect()[0]
    assert 0 < r.n_users <= _REC_CUSTS
    assert r.n_slots <= r.n_users * _REC_TOP
    assert 0 < r.n_items <= r.n_slots
    assert r.coverage_e6 == r.n_items * 1_000_000 // r.catalog_parts
    assert 0 < r.top_decile_share_e6 <= 1_000_000

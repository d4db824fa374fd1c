"""Invariant tests for the round-15 additions: privacy analytics
(operators/privacy.py), drift detection (operators/stats_tests4.py),
quota sampling (llm/datasets2.py) and the survival additions
(operators/survival.py).  The driver hash proofs pin cross-engine
equality; these pin the MATH."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from concurrent_etl_go_spark.llm.datasets2 import (
    _QUOTA_PER_SOURCE,
    dataset_quota_sample,
)
from concurrent_etl_go_spark.operators.privacy import (
    _K_MIN,
    _LADDER_CENTS,
    privacy_generalization_ladder,
    privacy_k_anonymity,
    privacy_l_diversity,
    privacy_pii_density,
)
from concurrent_etl_go_spark.operators.stats_tests4 import (
    _PH_LAMBDA_CENTS,
    agg_cvm_test,
    profile_chi2_drift,
    window_page_hinkley,
)
from concurrent_etl_go_spark.operators.survival import (
    agg_logrank_test,
    agg_survival_km,
    agg_survival_na,
)
from concurrent_etl_go_spark.sources.readers import read_table


def test_k_anonymity_partitions_every_customer(spark, sf_dir):
    rows = privacy_k_anonymity(spark, sf_dir).collect()
    assert rows
    total = read_table(spark, sf_dir, "customer").count()
    assert sum(r.n_rows for r in rows) == total
    for r in rows:
        assert r.n_rows == r.class_size * r.n_classes
        assert r.class_size >= 1


def test_l_diversity_bounded_by_class_size(spark, sf_dir):
    rows = privacy_l_diversity(spark, sf_dir).collect()
    assert rows
    # l distinct sensitive values need at least l members per class
    for r in rows:
        assert 1 <= r.l_diversity
        assert r.n_rows >= r.l_diversity * r.n_classes


def test_generalization_monotone_in_width(spark, sf_dir):
    rows = {
        r.width_dollars: r
        for r in privacy_generalization_ladder(spark, sf_dir).collect()
    }
    assert set(rows) == {w // 100 for w in _LADDER_CENTS}
    widths = sorted(rows)
    total = read_table(spark, sf_dir, "customer").count()
    for w in widths:
        r = rows[w]
        assert 1 <= r.min_k
        assert 0 <= r.rows_suppressed <= total
        assert r.k_after_suppression == 0 or r.k_after_suppression >= _K_MIN
    # coarser buckets can only merge classes
    for lo, hi in zip(widths, widths[1:]):
        assert rows[hi].n_classes <= rows[lo].n_classes


def test_pii_density_rate_math(spark, sf_dir):
    rows = privacy_pii_density(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.docs > 0 and r.chars > 0
        # every 3rd doc gets exactly one email, every 5th one phone
        assert r.email_hits >= r.docs // 3 - 1
        assert r.hits_per_10k_chars == (
            (r.email_hits + r.phone_hits) * 10000 // r.chars
        )


def test_page_hinkley_nonnegative_and_alarm_consistent(spark, sf_dir):
    rows = window_page_hinkley(spark, sf_dir).orderBy("day").collect()
    assert rows
    for r in rows:
        assert r.ph_cents >= 0
        assert r.alarm == (1 if r.ph_cents > _PH_LAMBDA_CENTS else 0)


def test_cvm_statistic_bounds(spark, sf_dir):
    (row,) = agg_cvm_test(spark, sf_dir).collect()
    assert row.n_accepted > 0 and row.n_returned > 0
    # T = (nm/N^2) * integral of (F-G)^2 <= nm/N^2 * N = nm/N <= N/4
    n = row.n_accepted + row.n_returned
    assert 0 <= row.t_e6 <= n * 1_000_000 // 4


def test_chi2_drift_cells_cover_orders(spark, sf_dir):
    rows = profile_chi2_drift(spark, sf_dir).collect()
    assert rows
    total = read_table(spark, sf_dir, "orders").count()
    assert sum(r.n_before + r.n_after for r in rows) == total
    for r in rows:
        assert r.chi2_contrib_e6 >= 0


def test_quota_sample_respects_quota_and_determinism(spark, sf_dir):
    df = dataset_quota_sample(spark, sf_dir)
    rows = df.collect()
    assert rows
    per_source: dict[str, int] = {}
    for r in rows:
        per_source[r.source] = max(per_source.get(r.source, 0), r.pick_rank)
        assert 1 <= r.pick_rank <= _QUOTA_PER_SOURCE
    counts = (
        read_table(spark, sf_dir, "documents")
        .groupBy("source")
        .count()
        .collect()
    )
    for c in counts:
        assert per_source.get(c.source, 0) == min(
            c["count"], _QUOTA_PER_SOURCE
        )
    # deterministic: a second run picks the identical membership
    again = {(r.source, r.doc_id, r.pick_rank) for r in df.collect()}
    assert again == {(r.source, r.doc_id, r.pick_rank) for r in rows}


def test_nelson_aalen_vs_km_consistency(spark, sf_dir):
    """H(t) is non-decreasing, and -ln(KM survival) <= H(t) pointwise
    (the classical NA >= -ln(KM) inequality, loose by the e9 floor)."""
    na = {r.t_days: r for r in agg_survival_na(spark, sf_dir).collect()}
    km = {r.t_days: r for r in agg_survival_km(spark, sf_dir).collect()}
    assert na and set(na) == set(km)
    prev = -1
    for t in sorted(na):
        assert na[t].cum_hazard_e9 > prev  # strictly increasing at events
        prev = na[t].cum_hazard_e9
        assert na[t].n_risk == km[t].n_risk
        assert na[t].n_events == km[t].n_events
        if km[t].survival and km[t].survival > 0:
            neg_log_km = -math.log(km[t].survival)
            # e9 fixed point; each step's floor loses < 1e-9, and
            # -ln(1-x) >= x gives the direction
            assert na[t].cum_hazard_e9 <= neg_log_km * 1e9 + len(na)


def test_logrank_structure(spark, sf_dir):
    (row,) = agg_logrank_test(spark, sf_dir).collect()
    assert row.o1 >= 0 and row.var_e6 >= 0
    assert row.chi2_e6 >= 0
    if row.var_e6 > 0:
        expect = (row.o1 * 1_000_000 - row.e1_e6) ** 2 // row.var_e6
        assert row.chi2_e6 == expect
    # group-1 events cannot exceed total observed events
    orders = read_table(spark, sf_dir, "orders")
    assert row.o1 <= orders.select("o_custkey").distinct().count()


def test_rec_novelty_bounds(spark, sf_dir):
    from concurrent_etl_go_spark.operators.recommender import (
        _REC_CUSTS,
        _REC_TOP,
        rec_novelty_epc,
    )

    rows = rec_novelty_epc(spark, sf_dir).collect()
    assert 0 < len(rows) <= _REC_CUSTS
    for r in rows:
        assert 1 <= r.n_recs <= _REC_TOP
        assert 0 <= r.mean_novelty_e6 <= 1_000_000


def test_rec_ild_bounds_and_pair_count(spark, sf_dir):
    from concurrent_etl_go_spark.operators.recommender import (
        _REC_TOP,
        rec_intra_list_diversity,
    )

    rows = rec_intra_list_diversity(spark, sf_dir).collect()
    assert rows
    max_pairs = _REC_TOP * (_REC_TOP - 1) // 2
    for r in rows:
        assert 1 <= r.n_pairs <= max_pairs
        assert 0 <= r.ild_e4 <= 10_000

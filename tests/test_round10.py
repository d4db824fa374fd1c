"""Invariants for the round-10 additions: CUPED / DiD experiment
readouts, the Theil inequality decomposition, the RFM next-best-action
composition, and the per-source funnel split."""

from __future__ import annotations

import math

from concurrent_etl_go_spark.operators.concentration import (
    agg_theil_decomposition,
)
from concurrent_etl_go_spark.operators.experiments2 import (
    agg_ab_cuped,
    agg_ab_did,
)
from concurrent_etl_go_spark.operators.recommender import (
    _NBA_TOP,
    rec_rfm_next_action,
)
from concurrent_etl_go_spark.operators.relational12 import (
    agg_funnel_source_split,
)


def test_cuped_shape_and_variance_reduction(spark, sf_dir):
    rows = {r.arm: r for r in agg_ab_cuped(spark, sf_dir).collect()}
    assert set(rows) == {0, 1}
    for r in rows.values():
        assert r.n_users > 0
        assert 0 <= r.rho2_bp <= 10000  # squared correlation
        assert math.isclose(
            r.mean_y, r.exp_purchases / r.n_users, abs_tol=1e-4
        )
    # pooled theta is shared: both rows carry the same slope
    assert rows[0].theta == rows[1].theta
    # CUPED preserves the overall (weighted) mean up to rounding: the
    # adjustment is a zero-sum reallocation around the pooled X mean
    n0, n1 = rows[0].n_users, rows[1].n_users
    raw = (rows[0].mean_y * n0 + rows[1].mean_y * n1) / (n0 + n1)
    adj = (rows[0].adj_mean_y * n0 + rows[1].adj_mean_y * n1) / (n0 + n1)
    assert math.isclose(raw, adj, abs_tol=2e-4)


def test_cuped_theta_matches_numpy(spark, sf_dir):
    """The pooled OLS slope against an independent float recompute."""
    import numpy as np
    from pyspark.sql import functions as F

    from concurrent_etl_go_spark.sources.readers import read_table

    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    b = ev.agg(
        F.expr("(MIN(unix_micros(ts)) + MAX(unix_micros(ts))) div 2").alias(
            "bound"
        )
    ).collect()[0].bound
    pdf = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            (F.expr("unix_micros(ts)") < F.lit(b)).alias("pre"),
        )
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("pre"), 1).otherwise(0)).alias("x"),
            F.sum(F.when(~F.col("pre"), 1).otherwise(0)).alias("y"),
        )
        .toPandas()
    )
    # users with zero purchases in both halves still count as units; the
    # purchase-only frame omits them, so pad x/y with zeros
    n_units = ev.select("user_id").distinct().count()
    pad = n_units - len(pdf)
    x = np.concatenate([pdf["x"].to_numpy(float), np.zeros(pad)])
    y = np.concatenate([pdf["y"].to_numpy(float), np.zeros(pad)])
    theta_np = np.cov(x, y, bias=True)[0, 1] / np.var(x)
    got = agg_ab_cuped(spark, sf_dir).collect()[0].theta
    assert math.isclose(got, theta_np, rel_tol=1e-3)


def test_did_control_row_is_zero(spark, sf_dir):
    rows = {r.arm: r for r in agg_ab_did(spark, sf_dir).collect()}
    assert set(rows) == {0, 1}
    assert rows[0].did == 0.0  # control minus itself
    r1 = rows[1]
    expect = (r1.mean_exp - r1.mean_pre) - (
        rows[0].mean_exp - rows[0].mean_pre
    )
    assert math.isclose(r1.did, expect, abs_tol=3e-4)


def test_theil_decomposition_identity(spark, sf_dir):
    """within + between recompose to the directly-computed global index."""
    import numpy as np
    from pyspark.sql import functions as F

    from concurrent_etl_go_spark.sources.readers import read_table

    rows = agg_theil_decomposition(spark, sf_dir).collect()
    assert rows
    assert all(r.t_within >= -1e-9 for r in rows)  # Theil is non-negative
    assert sum(r.n_cust for r in rows) > 0
    share = sum(r.share_bp for r in rows)
    assert 10000 - len(rows) < share <= 10000
    # independent global Theil from the raw customer cents
    cents = np.array(
        read_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)")
            ).alias("c")
        )
        .toPandas()["c"],
        dtype=float,
    )
    ratio = cents / cents.mean()
    t_global = float(np.mean(ratio * np.log(ratio)))
    recomposed = sum(
        (r.share_bp / 10000.0) * r.t_within + r.between_term for r in rows
    )
    # share_bp floor-division and ROUND(4) emissions bound the error
    assert math.isclose(t_global, recomposed, abs_tol=5e-3)


def test_rfm_next_action_ranked_and_integer(spark, sf_dir):
    rows = rec_rfm_next_action(spark, sf_dir).collect()
    assert rows
    by_seg: dict[int, list] = {}
    for r in rows:
        assert 1 <= r.rec_rank <= _NBA_TOP
        assert r.score > 0 and r.n_src > 0
        # valid 3-digit RFM code: each digit in 1..3
        d = (r.rfm_code // 100, (r.rfm_code // 10) % 10, r.rfm_code % 10)
        assert all(1 <= x <= 3 for x in d)
        by_seg.setdefault(r.rfm_code, []).append(r)
    for rs in by_seg.values():
        rs.sort(key=lambda r: r.rec_rank)
        scores = [r.score for r in rs]
        assert scores == sorted(scores, reverse=True)


def test_funnel_source_split_shares_and_consistency(spark, sf_dir):
    from concurrent_etl_go_spark.operators.relational12 import (
        agg_funnel_latency,
    )

    split = agg_funnel_source_split(spark, sf_dir).collect()
    assert split
    # per-source shares are basis points of that source's conversions
    by_src: dict[int, int] = {}
    for r in split:
        by_src[r.src] = by_src.get(r.src, 0) + r.share_bp
    for src, bp in by_src.items():
        assert 10000 - 5 < bp <= 10000, (src, bp)
    # the split's user totals recompose the unsplit funnel's totals
    base = agg_funnel_latency(spark, sf_dir).collect()
    assert sum(r.n_users for r in split) == sum(r.n_users for r in base)
    per_band_split: dict[str, int] = {}
    for r in split:
        per_band_split[r.band] = per_band_split.get(r.band, 0) + r.n_users
    per_band_base = {r.band: r.n_users for r in base}
    assert per_band_split == per_band_base


def test_macd_histogram_identity_and_series_shape(spark, sf_dir):
    from concurrent_etl_go_spark.operators.finance import window_macd

    rows = window_macd(spark, sf_dir).collect()
    assert rows
    by_grp: dict[str, list] = {}
    for r in rows:
        assert abs(r.histogram - (r.macd - r.signal)) < 1e-6
        by_grp.setdefault(r.grp, []).append(r)
    for grp, rs in by_grp.items():
        rs.sort(key=lambda r: r.day_idx)
        # day 1: EMA12 == EMA26 == first value, so MACD and signal are 0
        assert rs[0].macd == 0.0 and rs[0].signal == 0.0
        assert [r.day_idx for r in rs] == list(range(1, len(rs) + 1))


def test_bollinger_breach_flag_consistent(spark, sf_dir):
    from concurrent_etl_go_spark.operators.finance import (
        _BOLL_WIN,
        window_bollinger,
    )

    rows = window_bollinger(spark, sf_dir).collect()
    assert rows
    n_breach = 0
    for r in rows:
        assert r.sigma >= 0.0
        flag = 1 if abs(r.rev_cents - r.mid) > 2.0 * r.sigma else 0
        assert r.breach == flag
        n_breach += r.breach
    # 2-sigma breaches exist but are the minority (Chebyshev-ish sanity)
    assert 0 < n_breach < len(rows) / 4


def test_vwap_is_floor_quotient_within_price_range(spark, sf_dir):
    from concurrent_etl_go_spark.operators.finance import window_vwap

    rows = window_vwap(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.vwap_cents == r.rev_cents // r.qty
        assert 0 < r.vwap_cents <= r.rev_cents


def test_rsi_bounded_and_states_nonnegative(spark, sf_dir):
    from concurrent_etl_go_spark.operators.finance import window_rsi

    rows = window_rsi(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.avg_gain >= 0.0 and r.avg_loss >= 0.0
        assert 0.0 <= r.rsi <= 100.0
        if r.avg_gain + r.avg_loss > 0:
            expect = 100.0 * r.avg_gain / (r.avg_gain + r.avg_loss)
            assert abs(r.rsi - expect) < 1e-6


def test_assortativity_bounded_and_exact_moments(spark, sf_dir):
    from concurrent_etl_go_spark.operators.graph4 import graph_assortativity

    r = graph_assortativity(spark, sf_dir).collect()[0]
    assert -1.0 <= r.assortativity <= 1.0
    assert r.n_edge_ends > 0 and r.n_edge_ends % 2 == 0  # symmetric ends
    assert r.d1 >= 0  # variance numerators are non-negative
    # r's sign matches the exact integer covariance numerator
    if r.num != 0:
        assert (r.num > 0) == (r.assortativity >= 0)


def test_two_hop_reach_dominates_degree(spark, sf_dir):
    from concurrent_etl_go_spark.operators.graph4 import graph_two_hop_reach

    rows = graph_two_hop_reach(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.reach2 >= r.degree > 0  # 1-hop set is contained
    reaches = [r.reach2 for r in rows]
    assert reaches == sorted(reaches, reverse=True)


def test_js_divergence_bounded_by_ln2(spark, sf_dir):
    import math

    from concurrent_etl_go_spark.llm.text3 import text_js_divergence

    rows = text_js_divergence(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1e-9 <= r.jsd_nats <= math.log(2) + 1e-9
        assert 0 < r.n_terms <= r.n_tokens


def test_simpson_diversity_identity(spark, sf_dir):
    from pyspark.sql import functions as F

    from concurrent_etl_go_spark.llm.text import tokenized_docs
    from concurrent_etl_go_spark.llm.text3 import text_simpson_diversity

    rows = {r.lang: r for r in text_simpson_diversity(spark, sf_dir).collect()}
    assert rows
    # independent recompute for one language
    lang = sorted(rows)[0]
    counts = [
        r.c
        for r in tokenized_docs(spark, sf_dir)
        .where(F.col("lang") == lang)
        .select(F.explode("toks").alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    ]
    n = sum(counts)
    num = sum(c * (c - 1) for c in counts)
    assert rows[lang].n_tokens == n
    assert rows[lang].vocab == len(counts)
    assert rows[lang].simpson_ppm == 1_000_000 * num // (n * (n - 1))


def test_basket_substitutes_are_anti_associated(spark, sf_dir):
    from concurrent_etl_go_spark.operators.relational13 import (
        join_basket_substitutes,
    )

    rows = join_basket_substitutes(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.expected_milli >= 1000  # >= 1 expected co-basket
        assert r.lift_bp < 10000  # strictly below independence
        assert r.part_a < r.part_b
    lifts = [r.lift_bp for r in rows]
    assert lifts == sorted(lifts)


def test_abc_classes_partition_revenue(spark, sf_dir):
    from concurrent_etl_go_spark.operators.relational13 import (
        agg_abc_classification,
    )

    rows = {r.abc_class: r for r in agg_abc_classification(spark, sf_dir).collect()}
    assert set(rows) == {"A", "B", "C"}
    # the 70/20/10 split: A is the maximal head with cum share <= 70%,
    # so its share sits in (7000 - one part's share, 7000]; same for
    # the A+B cap at 90%
    assert 5000 <= rows["A"].share_bp <= 7000
    assert rows["A"].share_bp + rows["B"].share_bp <= 9000
    # classes rank by per-part revenue: A parts out-earn B out-earn C
    def per_part(r):
        return r.rev_cents / r.n_parts

    assert per_part(rows["A"]) > per_part(rows["B"]) > per_part(rows["C"])
    total_bp = sum(r.share_bp for r in rows.values())
    assert 10000 - 3 < total_bp <= 10000


def test_rolling_retention_bounded(spark, sf_dir):
    from concurrent_etl_go_spark.operators.relational13 import (
        agg_rolling_retention,
    )

    rows = agg_rolling_retention(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.retained <= r.dau
        assert r.retention_bp == r.retained * 10000 // r.dau


def test_category_drift_shares_consistent(spark, sf_dir):
    from concurrent_etl_go_spark.operators.relational13 import (
        profile_category_drift,
    )

    rows = profile_category_drift(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.drift_bp == abs(r.share_first_bp - r.share_second_bp)
    s1 = sum(r.share_first_bp for r in rows)
    s2 = sum(r.share_second_bp for r in rows)
    assert 10000 - len(rows) < s1 <= 10000
    assert 10000 - len(rows) < s2 <= 10000


def test_map_at_k_brute_is_perfect(spark, sf_dir):
    from concurrent_etl_go_spark.llm.retrieval_eval import (
        search_eval_map_at_k,
    )

    rows = search_eval_map_at_k(spark, sf_dir).collect()
    assert rows
    by_arm: dict[str, list] = {}
    for r in rows:
        assert 0 <= r.ap_bp <= 10000
        by_arm.setdefault(r.arm, []).append(r)
    assert set(by_arm) == {"brute", "matryoshka", "ivfpq"}
    for r in by_arm["brute"]:
        assert r.ap_bp == 10000 and r.hits == 10
        assert r.arm_map_bp == 10000
    # MAP is the floor-mean of the per-query APs
    for arm, rs in by_arm.items():
        assert rs[0].arm_map_bp == sum(r.ap_bp for r in rs) // len(rs)


def test_pmi_pairs_deterministic_and_symmetric_counts(spark, sf_dir):
    from concurrent_etl_go_spark.llm.text3 import _PMI_TOP, text_pmi_pairs

    rows = text_pmi_pairs(spark, sf_dir).collect()
    assert rows and len(rows) <= _PMI_TOP
    import math

    for r in rows:
        assert r.term_a < r.term_b
        assert 0 < r.c_ab <= min(r.c_a, r.c_b)
    ranks = [r.pmi_rank for r in rows]
    assert ranks == sorted(ranks)
    pmis = [r.pmi for r in rows]
    assert pmis == sorted(pmis, reverse=True)


def test_curriculum_phases_cover_corpus(spark, sf_dir):
    from pyspark.sql import functions as F

    from concurrent_etl_go_spark.llm.datasets2 import (
        dataset_curriculum_order,
    )
    from concurrent_etl_go_spark.sources.readers import read_table

    rows = {r.phase: r for r in dataset_curriculum_order(spark, sf_dir).collect()}
    assert set(rows) <= {1, 2, 3} and rows
    n_docs = read_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows.values()) == n_docs
    for r in rows.values():
        assert r.min_tokens <= r.max_tokens
        assert 0 <= r.mean_stop_bp <= 10000
    if 1 in rows and 2 in rows:
        # phase 1 is the SHORT natural-prose band
        assert rows[1].max_tokens < 120 <= rows[2].max_tokens


def test_price_elasticity_matches_numpy(spark, sf_dir):
    import numpy as np

    from concurrent_etl_go_spark.operators.relational13 import (
        agg_price_elasticity,
    )
    from concurrent_etl_go_spark.operators.finance import window_vwap

    rows = {r.brand: r for r in agg_price_elasticity(spark, sf_dir).collect()}
    assert rows
    vwap = window_vwap(spark, sf_dir).collect()
    brand = sorted(rows)[0]
    pts = [
        (np.log(r.rev_cents // r.qty), np.log(r.qty))
        for r in vwap
        if r.brand == brand and r.qty > 0
    ]
    x = np.array([p[0] for p in pts])
    y = np.array([p[1] for p in pts])
    slope = ((len(x) * (x * y).sum() - x.sum() * y.sum())
             / (len(x) * (x * x).sum() - x.sum() ** 2))
    assert abs(rows[brand].elasticity - slope) < 1e-3
    assert rows[brand].n_months == len(pts)


def test_top_quintile_share_bounds(spark, sf_dir):
    from concurrent_etl_go_spark.operators.relational13 import (
        agg_top_quintile_share,
    )

    r = agg_top_quintile_share(spark, sf_dir).collect()[0]
    assert 0 < r.head_n <= r.n_cust * 2 // 10 + 1
    assert 0 < r.head_cents <= r.total_cents
    # the top quintile must carry at least its proportional share
    assert r.head_share_bp >= 2000
    assert r.head_share_bp == r.head_cents * 10000 // r.total_cents

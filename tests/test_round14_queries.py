"""Invariant tests for the round-14 additions: omega ratio, Sortino
components, Hurst R/S (operators/finance5.py) and token rarity,
burstiness, Bloom-prefilter calibration (llm/corpus_stats.py).  The
driver hash proofs pin cross-engine equality; these pin the MATH."""

from __future__ import annotations

from concurrent_etl_go_spark.llm.corpus_stats import (
    dedup_bloom_prefilter,
    text_burstiness,
    text_rarity_score,
)
from concurrent_etl_go_spark.operators.finance5 import (
    agg_omega_ratio,
    agg_sortino_sq,
    window_hurst_rs,
)


def test_omega_components_consistent(spark, sf_dir):
    rows = agg_omega_ratio(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["gain_cents"] >= 0 and r["loss_cents"] >= 0
        assert r["n_days"] > 0
        if r["loss_cents"] == 0:
            assert r["omega_e4"] is None
        else:
            assert r["omega_e4"] == r["gain_cents"] * 10000 // r["loss_cents"]


def test_sortino_sq_matches_components(spark, sf_dir):
    rows = agg_sortino_sq(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["downside_msq"] >= 0
        if r["downside_msq"] == 0:
            assert r["sortino_sq_e6"] is None
        else:
            # downside_msq = floor(dd2/n): sandwich the emitted ratio
            # between the bounds the floored component implies
            n, s1, msq = r["n_days"], r["s1"], r["downside_msq"]
            lo = s1 * s1 * 1_000_000 // (n * n * (msq + 1))
            hi = s1 * s1 * 1_000_000 // (n * n * msq)
            assert lo <= r["sortino_sq_e6"] <= hi
            assert r["sortino_sq_e6"] >= 0


def test_hurst_rs_invariants(spark, sf_dir):
    rows = window_hurst_rs(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_days"] >= 20
        # range of cumulative deviations is non-negative; the variance
        # floor(sigma^2) is >= 0 by Cauchy-Schwarz
        assert r["r_scaled"] >= 0
        assert r["var_cents2"] >= 0
        if r["var_cents2"] > 0:
            # var_cents2 = floor(s2n/n^2): sandwich rs_sq_e4
            n, rr, v = r["n_days"], r["r_scaled"], r["var_cents2"]
            lo = rr * rr * 10000 // (n * n * (v + 1))
            hi = rr * rr * 10000 // (n * n * v)
            assert lo <= r["rs_sq_e4"] <= hi
            # R/S of an n-point series is at most n (attained by a
            # monotone ramp); check the squared bound with slack
            assert r["rs_sq_e4"] <= 10000 * r["n_days"] * r["n_days"]


def test_rarity_score_bounds(spark, sf_dir):
    df = text_rarity_score(spark, sf_dir)
    rows = df.collect()
    n_docs = df.sparkSession.read.parquet(
        f"{sf_dir}/documents.parquet"
    ).count()
    assert len(rows) == n_docs  # one row per document
    for r in rows:
        assert r["n_tokens"] > 0
        # mean df is a fraction of the corpus: (0, 1] on the e4 lattice
        assert 0 < r["mean_df_e4"] <= 10000


def test_burstiness_poisson_floor(spark, sf_dir):
    rows = text_burstiness(spark, sf_dir).collect()
    assert rows, "synthetic corpus should have tokens with df >= 100"
    for r in rows:
        assert r["df"] >= 100
        assert r["total_count"] >= r["df"]
        # VMR over all docs (zeros included) is strictly positive, and
        # a token occurring at most once per doc has VMR = 1 - s1/D < 1
        assert r["vmr_e4"] >= 0


def test_expected_shortfall_tail_math(spark, sf_dir):
    from concurrent_etl_go_spark.operators.finance5 import (
        agg_expected_shortfall,
    )

    rows = agg_expected_shortfall(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["k_tail"] <= max(r["n_days"] * 5 // 100, 1)
        # worst-5% mean: es = floor(tail_sum / k) (signed floor)
        assert r["es_cents"] == r["tail_sum_cents"] // r["k_tail"]
        # the tail mean cannot exceed the overall best day, and for a
        # loss tail it is <= 0 more often than not — structural bound:
        # k * es <= tail_sum < k * (es + 1)
        assert (
            r["k_tail"] * r["es_cents"]
            <= r["tail_sum_cents"]
            < r["k_tail"] * (r["es_cents"] + 1)
        )


def test_count_min_never_underestimates(spark, sf_dir):
    from concurrent_etl_go_spark.llm.corpus_stats import (
        sketch_count_min_calibration,
    )

    rows = sketch_count_min_calibration(spark, sf_dir).collect()
    assert rows
    total_over = 0
    for r in rows:
        assert r["cms_estimate"] >= r["exact_count"] >= 1
        assert r["overestimate"] == r["cms_estimate"] - r["exact_count"]
        total_over += r["overestimate"]
    # d=2 x w=1024 over this vocabulary: collisions are possible but
    # the sketch must stay usable (mean overestimate < mean count)
    mean_exact = sum(r["exact_count"] for r in rows) / len(rows)
    assert total_over / len(rows) <= mean_exact


def test_leakage_safe_split_cluster_consistent(spark, sf_dir):
    from concurrent_etl_go_spark.llm.corpus_stats import (
        dataset_leakage_safe_split,
    )

    rows = dataset_leakage_safe_split(spark, sf_dir).collect()
    assert rows
    by_comp: dict[int, set] = {}
    splits = {"train": 0, "val": 0, "test": 0}
    for r in rows:
        by_comp.setdefault(r["component"], set()).add(r["split"])
        splits[r["split"]] += 1
    # THE invariant: a near-dup cluster never straddles splits
    assert all(len(s) == 1 for s in by_comp.values())
    # rough 80/10/10 proportions (md5 bucket is uniform)
    n = len(rows)
    assert splits["train"] > n // 2
    assert splits["val"] > 0 and splits["test"] > 0
    # non-degenerate: at least one multi-doc cluster exists
    sizes: dict[int, int] = {}
    for r in rows:
        sizes[r["component"]] = sizes.get(r["component"], 0) + 1
    assert max(sizes.values()) > 1


def test_shapley_efficiency_identity(spark, sf_dir):
    """sum(phi) = v(full) - v(empty), exactly (times 6)."""
    from pyspark.sql import functions as F

    from concurrent_etl_go_spark.operators.attribution import (
        _SHAPLEY_CHANNELS,
        agg_shapley_attribution,
    )
    from concurrent_etl_go_spark.sources.readers import read_table

    rows = {r["channel"]: r["phi_x6"] for r in
            agg_shapley_attribution(spark, sf_dir).collect()}
    assert set(rows) == {"view", "click", "signup"}

    # recompute the mask histogram independently
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    firstp = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("pts"))
    )
    m = None
    for ch, bit in _SHAPLEY_CHANNELS:
        t = bit * F.max(
            F.when(
                (F.col("event_type") == ch) & (F.col("ts") < F.col("pts")), 1
            ).otherwise(0)
        )
        m = t if m is None else m + t
    conv = {
        int(r["m"]): int(r["c"])
        for r in firstp.join(ev, "user_id", "left")
        .groupBy("user_id")
        .agg(m.alias("m"))
        .groupBy("m")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    v_full = sum(conv.values())
    v_empty = conv.get(0, 0)
    assert sum(rows.values()) == 6 * (v_full - v_empty)
    # each channel's credit is non-negative under the cumulative v
    # (v is monotone in S by construction)
    assert all(p >= 0 for p in rows.values())


def test_pettitt_statistic_structure(spark, sf_dir):
    from concurrent_etl_go_spark.operators.stats_tests3 import (
        agg_pettitt_changepoint,
    )

    rows = agg_pettitt_changepoint(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["k_stat"] == abs(r["u_at_cp"])
    # |U_t| <= t*(n-t) + ... loose structural bound: K < n^2
    assert 0 < r["k_stat"] < r["n_days"] * r["n_days"]
    assert r["cp_day"] is not None


def test_grubbs_outlier_bounds(spark, sf_dir):
    from concurrent_etl_go_spark.operators.stats_tests3 import (
        agg_grubbs_outlier,
    )

    rows = agg_grubbs_outlier(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["dev_scaled"] >= 0
        if r["g_sq_e4"] is not None:
            # G^2 <= (n-1)^2 / n, so G^2_e4 < 10000 * n
            assert 0 <= r["g_sq_e4"] < 10000 * r["n_days"]


def test_bloom_prefilter_dominates_exact(spark, sf_dir):
    rows = dedup_bloom_prefilter(spark, sf_dir).collect()
    assert rows
    total_exact = sum(r["exact_hits"] for r in rows)
    total_fp = sum(r["false_pos"] for r in rows)
    for r in rows:
        # no false negatives, ever: bloom-positive ⊇ exact members
        assert r["bloom_hits"] >= r["exact_hits"]
        assert r["false_pos"] == r["bloom_hits"] - r["exact_hits"]
        assert 0 <= r["fpr_e6"] < 1_000_000
    # calibration is non-degenerate on the shared corpus: there ARE
    # true contaminations to catch (sf0.001+ always has cross-bucket
    # shingle overlap in this synthetic corpus)
    assert total_exact > 0
    # the filter is sized so the realized FPR stays tiny (< 1%)
    n_neg = sum(r["n_shingles"] - r["exact_hits"] for r in rows)
    assert total_fp * 100 <= n_neg

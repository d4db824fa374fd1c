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


def _rows(spark, name, sf_dir):
    from concurrent_etl_go_spark.operators.registry import (
        QUERIES,
        release_caches,
    )

    out = QUERIES[name](spark, sf_dir).collect()
    release_caches()
    return out


def test_gopher_rules_match_pure_python(spark, sf_dir):
    """Independent reference: recompute the four rule pass-counts in
    pure Python over the same parquet and compare per source."""
    import collections

    from concurrent_etl_go_spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    ).collect()
    stop = {"the", "a", "of", "to", "and", "in"}
    exp = collections.defaultdict(
        lambda: {"docs": 0, "w": 0, "m": 0, "s": 0, "r": 0, "all": 0}
    )
    for row in docs:
        toks = row["text"].split(" ")
        n = len(toks)
        tf = collections.Counter(toks)
        mean_e2 = sum(len(t) for t in toks) * 100 // n
        r_w = 1 if 50 <= n <= 100_000 else 0
        r_m = 1 if 300 <= mean_e2 <= 1000 else 0
        r_s = 1 if len(set(toks) & stop) >= 2 else 0
        r_r = 1 if max(tf.values()) * 10000 // n <= 2000 else 0
        e = exp[row["source"]]
        e["docs"] += 1
        e["w"] += r_w
        e["m"] += r_m
        e["s"] += r_s
        e["r"] += r_r
        e["all"] += r_w * r_m * r_s * r_r
    got = {r["source"]: r for r in _rows(spark, "text_gopher_rules", sf_dir)}
    assert set(got) == set(exp)
    for src, e in exp.items():
        g = got[src]
        assert (
            g["docs"],
            g["pass_word_count"],
            g["pass_mean_len"],
            g["pass_stopwords"],
            g["pass_repetition"],
            g["pass_all"],
        ) == (e["docs"], e["w"], e["m"], e["s"], e["r"], e["all"]), src


def test_ttr_prefix_matches_pure_python(spark, sf_dir):
    from collections import defaultdict

    from concurrent_etl_go_spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents").select(
        "source", "text"
    ).collect()
    sums = defaultdict(lambda: [0, 0, 0, 0])  # docs, t10, t25, t50
    for row in docs:
        toks = row["text"].split(" ")
        s = sums[row["source"]]
        s[0] += 1
        for j, p in enumerate((10, 25, 50)):
            types = len(set(toks[:p]))
            s[j + 1] += types * 10000 // min(len(toks), p)
    got = {
        r["source"]: r
        for r in _rows(spark, "text_ttr_prefix_profile", sf_dir)
    }
    for src, (d, t10, t25, t50) in sums.items():
        g = got[src]
        assert g["docs"] == d
        assert g["avg_ttr10_e4"] == t10 // d
        assert g["avg_ttr25_e4"] == t25 // d
        assert g["avg_ttr50_e4"] == t50 // d


def test_qini_structure_and_null_uplift(spark, sf_dir):
    """10 deciles, arm sizes sum to the customer count, and — because
    the md5 split is independent of everything — the per-decile
    treated/control conversion RATES stay close (the null)."""
    rows = sorted(
        _rows(spark, "agg_uplift_qini", sf_dir), key=lambda r: r["decile"]
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    from concurrent_etl_go_spark.sources.readers import read_table

    n_cust = read_table(spark, sf_dir, "customer").count()
    assert sum(r["n_t"] + r["n_c"] for r in rows) == n_cust
    for r in rows:
        # both arms populated in every decile at these scales
        assert r["n_t"] > 0 and r["n_c"] > 0
        assert 0 <= r["rate_t_e4"] <= 10000
        assert 0 <= r["rate_c_e4"] <= 10000


def test_latency_slo_percentiles_ordered(spark, sf_dir):
    for r in _rows(spark, "agg_latency_slo_hourly", sf_dir):
        assert r["p50_centi"] <= r["p95_centi"] <= r["p99_centi"]
        assert 0 <= r["breaches"] <= r["n"]
        assert r["breach_e4"] == r["breaches"] * 10000 // r["n"]


def test_drawdown_spells_are_disjoint_and_ranked(spark, sf_dir):
    rows = sorted(
        _rows(spark, "window_drawdown_duration", sf_dir),
        key=lambda r: r["spell_rank"],
    )
    assert rows and rows[0]["spell_rank"] == 1
    days = [r["days"] for r in rows]
    assert days == sorted(days, reverse=True)
    spans = sorted((r["start_day"], r["end_day"]) for r in rows)
    for (s1, e1), (s2, _e2) in zip(spans, spans[1:]):
        assert e1 < s2, "drawdown spells overlap"
    for r in rows:
        assert r["start_day"] <= r["end_day"]


def test_median_polish_residuals_reconstruct_cells(spark, sf_dir):
    """effects + residual must reproduce each cell's original cents
    EXACTLY (the decomposition is a chain of exact subtractions)."""
    from concurrent_etl_go_spark.sources.readers import read_table
    from pyspark.sql import functions as F

    rows = _rows(spark, "agg_median_polish", sf_dir)
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    nat = read_table(spark, sf_dir, "nation")
    cells = {
        (r["nation"], r["priority"]): r["cents"]
        for r in orders.join(
            cust, orders["o_custkey"] == cust["c_custkey"]
        )
        .join(nat, cust["c_nationkey"] == nat["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(
            F.sum(
                F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)")
            ).alias("cents")
        )
        .collect()
    }
    assert len(rows) == len(cells)
    for r in rows:
        total = r["resid_cents"] + r["row_eff_cents"] + r["col_eff_cents"]
        assert total == cells[(r["nation"], r["priority"])], (
            r["nation"],
            r["priority"],
        )


def test_kelly_components_consistent(spark, sf_dir):
    for r in _rows(spark, "agg_kelly_fraction", sf_dir):
        assert 0 <= r["p_e4"] <= 10000
        assert r["p_e4"] == r["n_up"] * 10000 // max(r["n_up"] + r["n_dn"], 1)
        b_e4 = r["avg_up_cents"] * 10000 // max(r["avg_dn_cents"], 1)
        assert r["b_e4"] == b_e4
        assert r["kelly_e4"] == r["p_e4"] - (10000 - r["p_e4"]) * 10000 // max(
            b_e4, 1
        )


def test_cluster_balanced_sample_bounds(spark, sf_dir):
    rows = _rows(spark, "dataset_cluster_balanced_sample", sf_dir)
    assert rows
    for r in rows:
        assert 0 <= r["sampled"] <= r["docs"]
        assert 0 <= r["in_dup_clusters"] <= r["docs"]
        assert r["sample_e4"] == r["sampled"] * 10000 // r["docs"]


def test_remove_top_component_matches_numpy(spark, sf_dir):
    """Exact integer recompute: derive the direction from the query's
    own output (hash-proven), then recompute proj/norm2/resid_norm2
    per vector in pure Python and compare exactly."""
    import math

    from concurrent_etl_go_spark.sources.readers import read_table

    vdir_rows = _rows(spark, "embeddings_top_component", sf_dir)
    v = {r["dim"]: r["weight_e6"] for r in vdir_rows}
    denom = sum(w * w for w in v.values())
    vecs = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    ).collect()
    got = {
        r["vec_id"]: r
        for r in _rows(spark, "embeddings_remove_top_component", sf_dir)
    }
    assert len(got) == len(vecs)
    for row in vecs:
        x = [int(math.floor(float(e) * 1024)) for e in row["embedding"]]
        proj = sum(x[i - 1] * v[i] for i in v)
        norm2 = sum(c * c for c in x)
        resid2 = 0
        for i in v:
            s = proj * v[i]
            u = (s - ((s % denom + denom) % denom)) // denom
            r = x[i - 1] - u
            resid2 += r * r
        g = got[row["vec_id"]]
        assert (g["proj_dot"], g["norm2"], g["resid_norm2"]) == (
            proj,
            norm2,
            resid2,
        ), row["vec_id"]


def test_remove_top_component_shrinks_on_average(spark, sf_dir):
    rows = _rows(spark, "embeddings_remove_top_component", sf_dir)
    before = sum(r["norm2"] for r in rows)
    after = sum(r["resid_norm2"] for r in rows)
    assert after < before, "removing the dominant direction must shrink mass"


def test_ulcer_index_bounds(spark, sf_dir):
    for r in _rows(spark, "agg_ulcer_index", sf_dir):
        assert 0 <= r["max_dd_bp"] <= 10000
        assert 0 <= r["days_underwater"] <= r["days"]
        assert 0 <= r["ulcer_sq_bp2"] <= r["max_dd_bp"] ** 2


def test_waterfill_respects_budget_and_caps(spark, sf_dir):
    from concurrent_etl_go_spark.sources.readers import read_table

    rows = _rows(spark, "dataset_mix_waterfill", sf_dir)
    total = read_table(spark, sf_dir, "documents").count()
    budget = total * 40 // 100
    assert sum(r["alloc"] for r in rows) <= budget
    for r in rows:
        assert 0 <= r["alloc"] <= r["avail"]
        assert r["capped"] == (1 if r["alloc"] >= r["avail"] else 0)
        assert r["fill_e4"] == r["alloc"] * 10000 // r["avail"]
    # the budget is 40% of the corpus, so unless nearly every feed is
    # capped, most of it must be spent after the redistribution rounds
    assert sum(r["alloc"] for r in rows) >= budget * 9 // 10


def test_modularity_sums_are_consistent(spark, sf_dir):
    """Community accounting: internal edges <= degree mass, the degree
    sums add up to m2, and Q = sum(q_num)/m2^2 lands in [-1, 1]."""
    rows = _rows(spark, "graph_modularity_labels", sf_dir)
    assert rows
    m2 = rows[0]["m2"]
    assert all(r["m2"] == m2 for r in rows)
    assert sum(r["degree_sum"] for r in rows) == m2
    for r in rows:
        assert 0 <= 2 * r["internal_edges"] <= r["degree_sum"]
    q = sum(r["q_num"] for r in rows) / (m2 * m2)
    assert -1.0 <= q <= 1.0


def test_minhash_calibration_buckets_sane(spark, sf_dir):
    rows = _rows(spark, "dedup_minhash_calibration", sf_dir)
    assert rows, "LSH candidates must exist on this corpus"
    for r in rows:
        assert -10 <= r["err_bucket"] <= 10
        assert 0 <= r["avg_est_e4"] <= 10000
        assert 0 <= r["avg_jac_e4"] <= 10000
        assert 0 <= r["mae_e4"] <= 10000
    # the calibration must concentrate: the |bucket| <= 2 mass (error
    # within 0.2, i.e. ~1.6 permutation slots) dominates
    total = sum(r["n_pairs"] for r in rows)
    near = sum(r["n_pairs"] for r in rows if abs(r["err_bucket"]) <= 2)
    assert near * 2 > total, "estimate errors not concentrated near 0"


def test_langid_confusion_rows_total(spark, sf_dir):
    from concurrent_etl_go_spark.sources.readers import read_table

    rows = _rows(spark, "text_langid_confusion", sf_dir)
    n_docs = read_table(spark, sf_dir, "documents").count()
    assert sum(r["n"] for r in rows) == n_docs
    by_lang: dict[str, int] = {}
    for r in rows:
        by_lang[r["lang"]] = r["lang_total"]
        assert r["correct"] == (
            1 if r["lang"] == r["predicted_lang"] else 0
        )
    assert sum(by_lang.values()) == n_docs


def test_epoch_coverage_invariants(spark, sf_dir):
    from concurrent_etl_go_spark.sources.readers import read_table

    rows = _rows(spark, "dataset_epoch_coverage", sf_dir)
    n_docs = read_table(spark, sf_dir, "documents").count()
    assert sorted(r["epoch"] for r in rows) == [0, 1, 2]
    for r in rows:
        assert r["n_docs"] == n_docs, "a document is missing from an epoch"
        assert r["dup_rows"] == 0, "a document appears twice in an epoch"
        assert r["min_shard"] <= r["max_shard"]
        assert (
            r["spread_e4"]
            == (r["max_shard"] - r["min_shard"]) * 10000
            // max(r["min_shard"], 1)
        )


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

"""Invariants + independent float recomputes for the hypothesis-test
pack (operators/stats_tests.py): chi-square, Mann-Whitney, KS, ANOVA,
Spearman."""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.stats_tests import (
    agg_anova_f,
    agg_chi_square,
    agg_ks_test,
    agg_mann_whitney,
    agg_spearman_corr,
)
from concurrent_etl_go_spark.sources.readers import read_table


def _li_pdf(spark, sf_dir) -> pd.DataFrame:
    return (
        read_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_quantity").cast("long").alias("q"),
            F.expr(
                "CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)"
            ).alias("cents"),
            F.expr("CAST(ROUND(l_discount * 100, 0) AS BIGINT)").alias(
                "disc"
            ),
            "l_linestatus",
            "l_returnflag",
        )
        .toPandas()
    )


def test_chi_square_cells_and_statistic(spark, sf_dir):
    rows = agg_chi_square(spark, sf_dir).collect()
    segs = {r.mktsegment for r in rows}
    pris = {r.priority for r in rows}
    assert len(rows) == len(segs) * len(pris)  # full grid incl. zeros
    n = sum(r.observed for r in rows)
    chi2 = rows[0].chi2_e6
    assert all(r.chi2_e6 == chi2 for r in rows)
    assert chi2 == sum(r.contrib_e6 for r in rows)
    assert all(r.contrib_e6 >= 0 for r in rows)
    # expected counts reproduce the observed total
    assert math.isclose(sum(r.expected for r in rows), n, rel_tol=1e-9)
    assert 0.0 <= rows[0].cramers_v <= 1.0
    # independent float recompute of the statistic
    obs = {(r.mktsegment, r.priority): r.observed for r in rows}
    rt = {s: sum(v for (s2, _), v in obs.items() if s2 == s) for s in segs}
    ct = {p: sum(v for (_, p2), v in obs.items() if p2 == p) for p in pris}
    chi2_f = sum(
        (obs[(s, p)] - rt[s] * ct[p] / n) ** 2 / (rt[s] * ct[p] / n)
        for s in segs
        for p in pris
    )
    assert math.isclose(chi2 / 1e6, chi2_f, rel_tol=1e-4, abs_tol=1e-3)


def test_mann_whitney_matches_pandas_ranks(spark, sf_dir):
    r = agg_mann_whitney(spark, sf_dir).collect()[0]
    assert 0 <= r.auc_e6 <= 1_000_000
    pdf = _li_pdf(spark, sf_dir)
    pdf = pdf[pdf.l_linestatus.isin(["O", "F"])]
    ranks = pdf.q.rank(method="average")
    r1 = float(ranks[pdf.l_linestatus == "O"].sum())
    n1 = int((pdf.l_linestatus == "O").sum())
    n2 = int((pdf.l_linestatus == "F").sum())
    assert (r.n_open, r.n_finished) == (n1, n2)
    u1 = r1 - n1 * (n1 + 1) / 2
    assert r.u1_x2 == int(round(2 * u1))
    assert math.isclose(
        r.auc_e6 / 1e6, u1 / (n1 * n2), abs_tol=2e-6
    )
    # z is a real standardized magnitude, sane range
    assert abs(r.z_score) < 50


def test_ks_matches_numpy_ecdf(spark, sf_dir):
    r = agg_ks_test(spark, sf_dir).collect()[0]
    pdf = _li_pdf(spark, sf_dir)
    a = pdf.q[pdf.l_linestatus == "O"]
    b = pdf.q[pdf.l_linestatus == "F"]
    d = max(
        abs(
            float((a <= v).sum()) / len(a) - float((b <= v).sum()) / len(b)
        )
        for v in sorted(pdf.q.unique())
    )
    assert math.isclose(r.d_e6 / 1e6, d, abs_tol=2e-6)
    assert 0 <= r.d_e6 <= 1_000_000


def test_anova_matches_numpy(spark, sf_dir):
    import numpy as np

    r = agg_anova_f(spark, sf_dir).collect()[0]
    pdf = _li_pdf(spark, sf_dir)
    groups = [
        g.cents.to_numpy(dtype=float)
        for _, g in pdf.groupby("l_returnflag")
    ]
    k = len(groups)
    n = sum(len(g) for g in groups)
    gm = sum(g.sum() for g in groups) / n
    ssb = sum(len(g) * (g.mean() - gm) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert (r.k_groups, r.n_rows) == (k, n)
    assert math.isclose(r.f_stat, f, rel_tol=1e-6, abs_tol=1e-6)
    assert math.isclose(
        r.eta2_e6 / 1e6, ssb / (ssb + ssw), abs_tol=2e-6
    )
    assert math.isclose(r.grand_mean_cents, gm, rel_tol=1e-9)


def test_spearman_matches_pandas(spark, sf_dir):
    rows = {r.pair: r for r in agg_spearman_corr(spark, sf_dir).collect()}
    assert set(rows) == {"quantity_discount", "quantity_tax"}
    pdf = _li_pdf(spark, sf_dir)
    # rank-then-Pearson by hand (method="spearman" would import scipy,
    # absent in this image)
    rho = pdf.q.rank(method="average").corr(
        pdf.disc.rank(method="average")
    )
    got = rows["quantity_discount"].rho
    assert -1.0 <= got <= 1.0
    # the fixed 1e9 downscale floors the 128-bit moments, so the
    # deterministic engine statistic sits within ~1e-5 of the exact
    # rank correlation at sf0.001 (resolution grows with sf)
    assert math.isclose(got, rho, abs_tol=1e-4)


def test_runs_test_counts(spark, sf_dir):
    from concurrent_etl_go_spark.operators.stats_tests import agg_runs_test

    r = agg_runs_test(spark, sf_dir).collect()[0]
    assert r.n1 > 0 and r.n2 > 0
    # runs are bounded by 1..n1+n2 and can't exceed 2*min+1
    assert 1 <= r.runs <= 2 * min(r.n1, r.n2) + 1
    assert abs(r.z_score) < 50
    # independent recompute from the daily series
    daily = (
        read_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(
            F.sum(
                F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)")
            ).alias("cents")
        )
        .orderBy("day")
        .collect()
    )
    cents = [x.cents for x in daily]
    m = sorted(cents)[(len(cents) + 1) // 2 - 1]
    hi = [1 if c > m else 0 for c in cents]
    runs = 1 + sum(1 for a, b in zip(hi, hi[1:]) if a != b)
    assert (r.n1, r.n2, r.runs) == (sum(hi), len(hi) - sum(hi), runs)


def test_wilcoxon_matches_python_ranks(spark, sf_dir):
    from concurrent_etl_go_spark.operators.stats_tests import (
        agg_wilcoxon_signed_rank,
    )

    r = agg_wilcoxon_signed_rank(spark, sf_dir).collect()[0]
    assert 0 < r.n_up <= r.nz
    assert 0 < r.wp_x2 <= r.nz * (r.nz + 1)  # W+ <= n(n+1)/2
    daily = (
        read_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(
            F.sum(
                F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)")
            ).alias("cents")
        )
        .orderBy("day")
        .collect()
    )
    cents = [x.cents for x in daily]
    diffs = [a - b for a, b in zip(cents[7:], cents)]
    diffs = [d for d in diffs if d != 0]
    order = sorted(range(len(diffs)), key=lambda i: abs(diffs[i]))
    # average ranks with ties, x2 lattice
    import itertools

    wp_x2 = 0
    pos = 0
    for _, grp in itertools.groupby(
        order, key=lambda i: abs(diffs[i])
    ):
        g = list(grp)
        rank2 = 2 * pos + len(g) + 1  # 2*avg_rank
        wp_x2 += rank2 * sum(1 for i in g if diffs[i] > 0)
        pos += len(g)
    assert r.nz == len(diffs)
    assert r.wp_x2 == wp_x2

"""Invariants for corpus analytics part 4: mutual information, RAKE,
the novelty curve."""

from __future__ import annotations

import math

from concurrent_etl_go_spark.llm.text4 import (
    text_mutual_information,
    text_novelty_curve,
    text_rake_keywords,
)


def test_mutual_information_consistency(spark, sf_dir):
    rows = text_mutual_information(spark, sf_dir).collect()
    n = rows[0].n
    assert all(r.n == n for r in rows)
    assert sum(r.n_ij for r in rows) == n
    mi = rows[0].mi_e9
    assert all(r.mi_e9 == mi for r in rows)
    # MI total is the sum of per-cell floor contributions, and the
    # floor bias keeps it within |cells| nano-nats of the float sum
    float_sum = sum((r.n_ij / n) * r.pmi for r in rows)
    assert abs(mi - float_sum * 1e9) <= len(rows) + 1
    # MI of a joint distribution is non-negative (up to pmi rounding
    # and floor bias)
    assert mi >= -len(rows)
    # PMI sign matches over/under-representation
    for r in rows:
        lift = (r.n_ij * n) / (r.r * r.c)
        assert math.isclose(r.pmi, math.log(lift), abs_tol=1e-4)


def test_rake_scores_are_degree_over_freq(spark, sf_dir):
    rows = text_rake_keywords(spark, sf_dir).collect()
    assert 0 < len(rows) <= 25
    for r in rows:
        assert r.freq >= 3
        # a word's phrase degree counts at least its own occurrences
        assert r.degree >= r.freq
        assert r.score_e6 == r.degree * 1_000_000 // r.freq
        assert math.isclose(r.score, r.degree / r.freq, rel_tol=1e-12)
    # stopwords never surface as keywords
    from concurrent_etl_go_spark.llm.text import EN_STOPWORDS

    assert not ({r.word for r in rows} & set(EN_STOPWORDS))


def test_novelty_curve_shape(spark, sf_dir):
    rows = text_novelty_curve(spark, sf_dir).collect()
    assert rows
    by_src = {}
    for r in rows:
        assert 0 <= r.decile <= 9
        assert 0 <= r.novel <= r.pairs
        assert r.novelty_e6 == r.novel * 1_000_000 // r.pairs
        by_src.setdefault(r.source, []).append(r)
    # decile 0 contains the source's first doc, whose shingles are all
    # first sightings — so some novelty must register there
    for src, rs in by_src.items():
        first = min(rs, key=lambda r: r.decile)
        if first.decile == 0:
            assert first.novel > 0, src

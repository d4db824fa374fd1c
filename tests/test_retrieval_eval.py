"""Invariants for the retrieval-evaluation queries
(``llm/retrieval_eval.py``): metric bounds, the brute-arm sanity row,
and the arm ordering the funnels guarantee by construction."""

from __future__ import annotations

import pytest

from concurrent_etl_go_spark.llm.retrieval_eval import (
    _IW,
    _K,
    _QIDS,
    search_eval_mmr_arm,
    search_eval_ndcg_at_k,
    search_eval_recall_at_k,
)


@pytest.fixture(scope="module")
def recall_rows(spark, sf_dir):
    return {
        (r.arm, r.qid): r
        for r in search_eval_recall_at_k(spark, sf_dir).collect()
    }


@pytest.fixture(scope="module")
def ndcg_rows(spark, sf_dir):
    return {
        (r.arm, r.qid): r
        for r in search_eval_ndcg_at_k(spark, sf_dir).collect()
    }


def test_weights_are_monotone_integer():
    assert list(_IW) == list(range(1, _K + 1))
    assert all(isinstance(w, int) for w in _IW.values())
    ws = list(_IW.values())
    assert ws == sorted(ws, reverse=True)
    assert ws[0] == 1_000_000


def test_recall_covers_all_arms_and_qids(recall_rows):
    assert set(recall_rows) == {
        (arm, qid)
        for arm in ("brute", "matryoshka", "ivfpq")
        for qid in _QIDS
    }


def test_brute_arm_recall_is_perfect(recall_rows):
    for qid in _QIDS:
        r = recall_rows[("brute", qid)]
        assert r.hits == _K
        assert r.recall_bp == 10000


def test_ann_arms_bounded_by_brute(recall_rows):
    for arm in ("matryoshka", "ivfpq"):
        for qid in _QIDS:
            r = recall_rows[(arm, qid)]
            assert 0 <= r.hits <= _K
            assert r.recall_bp == r.hits * 10000 // _K


def test_ndcg_bounds_and_brute_is_ideal(ndcg_rows):
    for (arm, qid), r in ndcg_rows.items():
        assert 0 <= r.dcg <= r.idcg, (arm, qid)
        assert r.ndcg_bp == r.dcg * 10000 // r.idcg
    # brute retrieves the exact top-k in exact order == the ideal
    # ranking, so its DCG IS the IDCG
    for qid in _QIDS:
        assert ndcg_rows[("brute", qid)].ndcg_bp == 10000


def test_mmr_arm_bounds(spark, sf_dir):
    rows = {r.qid: r for r in search_eval_mmr_arm(spark, sf_dir).collect()}
    assert set(rows) == set(_QIDS)
    for qid, r in rows.items():
        # MMR picks K of the top-20 pool: at least the picks that fall
        # inside the top-k count as hits, and all metrics stay bounded
        assert 0 <= r.hits <= _K
        assert r.recall_bp == r.hits * 10000 // _K
        assert 0 <= r.dcg <= r.idcg
        assert r.ndcg_bp == r.dcg * 10000 // r.idcg
        # the pool is the truth top-20, every pick has grade >= 1,
        # so DCG is strictly positive
        assert r.dcg > 0

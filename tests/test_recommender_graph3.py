"""Invariants for the item-item CF recommender (operators/recommender.py)
and sampled-source closeness centrality (operators/graph3.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.graph3 import (
    _CC_SOURCES,
    graph_closeness_centrality,
)
from concurrent_etl_go_spark.operators.recommender import (
    _NBR_TOP,
    _REC_TOP,
    _model,
    rec_item_neighbors,
    rec_user_items,
)


def test_model_is_symmetric_and_bounded(spark, sf_dir):
    m, _li, _item = _model(spark, sf_dir)
    rows = m.collect()
    pairs = {(r.i, r.j): (r.n_ab, r.cos2_bp) for r in rows}
    assert all(i != j for i, j in pairs)
    # cosine^2 of co-occurrence counts is in (0, 1]: n_ij <= min(c_i, c_j)
    assert all(0 < v[1] <= 10000 for v in pairs.values())
    # both directions present with identical score
    for (i, j), v in pairs.items():
        assert pairs[(j, i)] == v


def test_item_neighbors_ranked_and_capped(spark, sf_dir):
    rows = rec_item_neighbors(spark, sf_dir).collect()
    assert rows
    by_item: dict[int, list] = {}
    for r in rows:
        assert 1 <= r.nbr_rank <= _NBR_TOP
        assert 0 < r.cos2_bp <= 10000
        assert r.item != r.neighbor
        by_item.setdefault(r.item, []).append(r)
    for rs in by_item.values():
        rs.sort(key=lambda r: r.nbr_rank)
        scores = [r.cos2_bp for r in rs]
        assert scores == sorted(scores, reverse=True)


def test_user_recs_exclude_owned(spark, sf_dir):
    from concurrent_etl_go_spark.sources.readers import read_table

    recs = rec_user_items(spark, sf_dir).collect()
    assert recs
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    owned = {
        (r.o_custkey, r.l_partkey)
        for r in orders.join(
            li, orders["o_orderkey"] == li["l_orderkey"]
        ).collect()
    }
    for r in recs:
        assert 1 <= r.rec_rank <= _REC_TOP
        assert r.score > 0 and r.n_src >= 1
        assert (r.custkey, r.item) not in owned


def test_closeness_bounds(spark, sf_dir):
    rows = graph_closeness_centrality(spark, sf_dir).collect()
    assert len(rows) == _CC_SOURCES
    for r in rows:
        # every reached node is >= 1 hop away: sum_dist >= n_reached,
        # so classic closeness <= 10000; harmonic caps at 10000/hop
        assert r.n_reached >= 1
        assert r.sum_dist >= r.n_reached
        assert 0 < r.closeness_bp <= 10000
        assert 0 < r.harmonic <= 10000 * r.n_reached


def test_next_part_ranked_and_capped(spark, sf_dir):
    from concurrent_etl_go_spark.operators.recommender import (
        _NEXT_TOP,
        rec_next_part,
    )

    rows = rec_next_part(spark, sf_dir).collect()
    assert rows
    by_src: dict[int, list] = {}
    for r in rows:
        assert r.src_part != r.next_part
        assert r.n_trans >= 1
        assert 1 <= r.nxt_rank <= _NEXT_TOP
        by_src.setdefault(r.src_part, []).append(r)
    for rs in by_src.values():
        rs.sort(key=lambda r: r.nxt_rank)
        counts = [r.n_trans for r in rs]
        assert counts == sorted(counts, reverse=True)


def test_betweenness_nonnegative_and_ranked(spark, sf_dir):
    from concurrent_etl_go_spark.operators.graph3 import (
        _BC_TOP,
        graph_betweenness_sampled,
    )

    rows = graph_betweenness_sampled(spark, sf_dir).collect()
    assert 0 < len(rows) <= _BC_TOP
    scores = [r.bc for r in rows]
    assert all(s >= 0.0 for s in scores)
    assert scores == sorted(scores, reverse=True)
    # somebody must actually broker paths in a connected co-purchase graph
    assert scores[0] > 0.0


def test_rec_eval_hit_rate_bounds(spark, sf_dir):
    from concurrent_etl_go_spark.operators.recommender import (
        _EVAL_CUSTS,
        _EVAL_K,
        rec_eval_hit_rate,
    )

    rows = rec_eval_hit_rate(spark, sf_dir).collect()
    assert 0 < len(rows) <= _EVAL_CUSTS
    for r in rows:
        assert r.n_test >= 1  # every held-out order has lineitems
        assert 0 <= r.hits <= min(_EVAL_K, r.n_test)
        assert r.prec_bp == r.hits * 10000 // _EVAL_K
        assert r.hit_flag == (1 if r.hits > 0 else 0)


def test_clustering_coeff_bounds(spark, sf_dir):
    from concurrent_etl_go_spark.operators.graph3 import (
        _CC_TOP,
        graph_clustering_coeff,
    )

    rows = graph_clustering_coeff(spark, sf_dir).collect()
    assert 0 < len(rows) <= _CC_TOP
    for r in rows:
        assert r.degree >= 2
        # cc = 2*tri / (deg*(deg-1)) is in [0, 1]
        assert 0 <= r.cc_bp <= 10000
        assert r.cc_bp == r.n_tri * 2 * 10000 // (r.degree * (r.degree - 1))
    scores = [r.cc_bp for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_eccentricity_consistent_with_closeness(spark, sf_dir):
    from concurrent_etl_go_spark.operators.graph3 import (
        _CC_HOPS,
        _CC_SOURCES,
        graph_closeness_centrality,
        graph_eccentricity_sample,
    )

    ecc = {r.sid: r for r in graph_eccentricity_sample(
        spark, sf_dir).collect()}
    clo = {r.sid: r for r in graph_closeness_centrality(
        spark, sf_dir).collect()}
    assert set(ecc) == set(clo) and len(ecc) == _CC_SOURCES
    dia = max(r.ecc for r in ecc.values())
    for sid, r in ecc.items():
        assert 1 <= r.ecc <= _CC_HOPS
        assert r.diameter_lb == dia
        # same BFS table: reach counts must agree across the two queries
        assert r.n_reached == clo[sid].n_reached
        # sum of distances is bounded by reach x eccentricity
        assert clo[sid].sum_dist <= r.n_reached * r.ecc

"""Round-15 regression tests.

1. DLQ orphan-sidecar sweep chaos coverage (VERDICT r14 §Next #7 +
   ADVICE r14 #2): a crash injected BETWEEN the sidecar write and the
   data-file write in ``spill_batch`` leaves a genuine orphan; the
   age-gated sweep must reclaim it once aged — and must NOT touch a
   fresh sidecar (the normal transient state of a live in-flight
   spill), so a spill that completes after a concurrent replay still
   replays under its ORIGINAL chunk key (the TOCTOU double-delivery
   hole the age gate closes).
"""

from __future__ import annotations

import gzip
import os
import time

import pytest

from tests.mock_api import MockApiServer


@pytest.fixture()
def mock_api():
    server = MockApiServer().start()
    yield server
    server.stop()


def _mk_config(mock_api, tmp_path, scope):
    from concurrent_etl_go_spark.sinks.http_sink import HttpSinkConfig

    return HttpSinkConfig(
        endpoint=mock_api.endpoint,
        dlq_dir=str(tmp_path / "dlq"),
        idempotency_scope=scope,
    )


def test_crash_mid_spill_orphan_reclaimed_once_aged(
    mock_api, tmp_path, monkeypatch
):
    """Kill spill_batch between the sidecar and data writes; the orphan
    survives an immediate replay (age gate) and is reclaimed by the
    next replay after aging."""
    from concurrent_etl_go_spark.sinks import http_sink
    from concurrent_etl_go_spark.sinks.dlq import replay_dlq_posts
    from concurrent_etl_go_spark.sinks.http_sink import spill_batch

    config = _mk_config(mock_api, tmp_path, "run15")

    real_open = gzip.open

    def crash_open(*a, **k):  # the injected kill point
        raise OSError("injected crash between sidecar and data write")

    monkeypatch.setattr(http_sink.gzip, "open", crash_open)
    with pytest.raises(OSError, match="injected crash"):
        spill_batch([{"a": 1}], 0, config, idem_key="run15/p0/c0")
    monkeypatch.setattr(http_sink.gzip, "open", real_open)

    orphan = os.path.join(
        config.dlq_dir, "buffer_failed_worker0_run15-p0-c0.json.gz.key"
    )
    assert os.path.exists(orphan), "crash must leave the sidecar orphan"
    assert not os.path.exists(orphan[: -len(".key")])

    # immediate replay: the fresh orphan is indistinguishable from a
    # live spill -> the age gate must leave it alone
    replayed, remaining = replay_dlq_posts(config.dlq_dir, config)
    assert (replayed, remaining) == (0, 0)
    assert os.path.exists(orphan), "fresh orphan must survive the sweep"

    # age it past the gate -> the next replay reclaims it
    old = time.time() - 3600
    os.utime(orphan, (old, old))
    replay_dlq_posts(config.dlq_dir, config)
    assert not os.path.exists(orphan), "aged orphan must be swept"


def test_sweep_spares_live_spill_sidecar_toctou(mock_api, tmp_path):
    """The TOCTOU scenario from ADVICE r14 #2 end-to-end: a replay runs
    while a spill is mid-flight (sidecar written, data not yet); the
    data file then lands; the NEXT replay must POST under the ORIGINAL
    chunk key, not the dlq/<filename> fallback."""
    from concurrent_etl_go_spark.sinks.dlq import replay_dlq_posts
    from concurrent_etl_go_spark.sinks.http_sink import spill_batch

    config = _mk_config(mock_api, tmp_path, "run16")
    os.makedirs(config.dlq_dir, exist_ok=True)

    # mid-flight spill: sidecar exists, data file not yet written
    sidecar = os.path.join(
        config.dlq_dir, "buffer_failed_worker3_run16-p3-c7.json.gz.key"
    )
    with open(sidecar, "w", encoding="utf-8") as fh:
        fh.write("run16/p3/c7")

    # concurrent replay fires NOW — with the un-gated sweep this
    # deleted the live sidecar
    replay_dlq_posts(config.dlq_dir, config)
    assert os.path.exists(sidecar), "live sidecar must survive the sweep"

    # the spill completes (same deterministic name), then a later
    # replay delivers it
    path = spill_batch([{"a": 7}], 3, config, idem_key="run16/p3/c7")
    assert path + ".key" == sidecar
    replayed, remaining = replay_dlq_posts(config.dlq_dir, config)
    assert (replayed, remaining) == (1, 0)
    keys = [r.idem_key for r in mock_api.state.requests if r.idem_key]
    assert "run16/p3/c7" in keys, "replay must use the ORIGINAL chunk key"
    assert not any(k.startswith("dlq/") for k in keys), (
        "fallback dlq/<filename> key means the sidecar was lost — the "
        "double-delivery hole is open"
    )


# ---------------------------------------------------------------------------
# 2. Persisted co-purchase edge table (VERDICT r14 §Next #3 + ADVICE r14 #3):
#    the production path derives the edge list once, persists it as a
#    fingerprinted versioned table, and serves later consumers by SCAN —
#    the build_ivfpq_index pattern; the driver memo is only the bench-tier
#    cache on top, keyed by the source fingerprint so an in-process
#    testdata refresh can never serve stale edges.
# ---------------------------------------------------------------------------


@pytest.fixture()
def edge_roots(tmp_path, monkeypatch):
    """Isolate the persisted relation tables AND the memo in tmp_path."""
    from concurrent_etl_go_spark.operators import graph2, relation_cache

    monkeypatch.setattr(
        relation_cache,
        "table_root",
        lambda sf_dir, name: str(tmp_path / "relcache" / name),
    )
    monkeypatch.setattr(relation_cache, "_MEMO", {})
    graph2.relation_cache = relation_cache
    return graph2


def test_edge_table_build_then_pure_read(spark, sf_dir, edge_roots):
    """First call derives + persists; a cold-process load (memo cleared)
    returns identical rows WITHOUT writing a new table version."""
    import concurrent_etl_go_spark.sources.versioned as vt

    graph2 = edge_roots
    first = sorted(
        (r.src, r.dst)
        for r in graph2._copurchase_edges(spark, sf_dir).collect()
    )
    assert first, "smoke corpus must produce co-purchase edges"
    from concurrent_etl_go_spark.operators import relation_cache
    root = relation_cache.table_root(sf_dir, "copurchase_plain")
    v0 = vt.snapshot(os.path.join(root, "data")).version

    relation_cache._MEMO.clear()  # simulate a fresh process
    again = sorted(
        (r.src, r.dst)
        for r in graph2._copurchase_edges(spark, sf_dir).collect()
    )
    assert again == first
    assert vt.snapshot(os.path.join(root, "data")).version == v0, (
        "a fresh-fingerprint reload must be a pure read, not a rebuild"
    )


def test_edge_table_stale_fingerprint_rebuilds(spark, sf_dir, edge_roots):
    """A fingerprint mismatch (refreshed source parquet) forces a
    re-derive into a NEW table version; results stay identical because
    the derivation is deterministic."""
    import json as _json

    import concurrent_etl_go_spark.sources.versioned as vt

    graph2 = edge_roots
    first = sorted(
        (r.src, r.dst)
        for r in graph2._copurchase_edges(spark, sf_dir).collect()
    )
    from concurrent_etl_go_spark.operators import relation_cache
    root = relation_cache.table_root(sf_dir, "copurchase_plain")
    meta_path = os.path.join(root, "meta.json")
    with open(meta_path) as fh:
        meta = _json.load(fh)
    v0 = meta["version"]
    meta["fingerprint"] = [0, 0, 0, 0]
    with open(meta_path, "w") as fh:
        _json.dump(meta, fh)

    relation_cache._MEMO.clear()
    again = sorted(
        (r.src, r.dst)
        for r in graph2._copurchase_edges(spark, sf_dir).collect()
    )
    assert again == first
    with open(meta_path) as fh:
        assert _json.load(fh)["version"] > v0, (
            "stale fingerprint must trigger a rebuild"
        )


def test_edge_memo_keyed_by_source_fingerprint(spark, sf_dir, edge_roots):
    """ADVICE r14 #3: the memo key folds in the source fingerprint, so
    touching the source parquet evicts the in-process entry instead of
    silently serving stale edges (verified via the memo keys — the
    testdata itself is read-only here)."""
    graph2 = edge_roots
    graph2._copurchase_edges(spark, sf_dir)
    from concurrent_etl_go_spark.operators import relation_cache
    (key,) = list(relation_cache._MEMO)
    assert key[0] == sf_dir and key[1] == "copurchase_plain"
    from concurrent_etl_go_spark.operators.graph2 import _EDGE_TAG
    fp, tag = key[2]
    assert fp == tuple(
        relation_cache.source_fingerprint(sf_dir, ("lineitem", "orders"))
    ), "memo key must carry the live source fingerprint"
    assert tag == _EDGE_TAG, "memo key must carry the derivation tag"


# ---------------------------------------------------------------------------
# 3. Recommender model frames through the relation cache (VERDICT r14
#    §Next #6): cold build vs memo-hit vs cold-process reload must all
#    serve identical model rows; corpus-scale frames (baskets, trans)
#    stay on the scan tier — never driver rows.
# ---------------------------------------------------------------------------


def test_rec_model_cache_tiers_identical(spark, sf_dir, edge_roots, tmp_path):
    from concurrent_etl_go_spark.operators import recommender, relation_cache

    def neighbors():
        rows = recommender.rec_item_neighbors(spark, sf_dir).collect()
        return sorted((r.item, r.neighbor, r.n_ab, r.cos2_bp, r.nbr_rank)
                      for r in rows)

    cold = neighbors()           # derives + persists rec_model/rec_item
    assert cold
    warm = neighbors()           # memo hit
    relation_cache._MEMO.clear()
    reload = neighbors()         # cold process: pure read of the table
    assert cold == warm == reload

    # dimension-scale frames are memoized; corpus-scale ones are NOT
    memo_names = {k[1] for k in relation_cache._MEMO}
    assert "rec_model" in memo_names and "rec_item" in memo_names
    assert "rec_baskets" not in memo_names, (
        "baskets are corpus-scale — scan tier only, never driver rows"
    )
    # ...but baskets ARE persisted for the scan tier
    assert os.path.exists(
        os.path.join(relation_cache.table_root(sf_dir, "rec_baskets"),
                     "meta.json")
    )


def test_stale_derivation_tag_rebuilds(spark, sf_dir, edge_roots):
    """A derivation-code change (tag bump) must force a rebuild even
    when the source data fingerprint is unchanged — otherwise a new
    derivation silently serves the old persisted rows."""
    import json as _json

    from concurrent_etl_go_spark.operators import relation_cache

    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return (
            read_spark_range(spark)
        )

    def read_spark_range(s):
        return s.range(3).selectExpr("id AS src", "id + 1 AS dst")

    relation_cache.load_or_build(
        spark, sf_dir, "tagged_rel", ("lineitem",), build, tag="v1"
    )
    relation_cache.load_or_build(
        spark, sf_dir, "tagged_rel", ("lineitem",), build, tag="v1"
    )
    assert calls["n"] == 1, "same tag + same data must be a pure read"
    relation_cache.load_or_build(
        spark, sf_dir, "tagged_rel", ("lineitem",), build, tag="v2"
    )
    assert calls["n"] == 2, "a tag bump must force a rebuild"
    meta_path = os.path.join(
        relation_cache.table_root(sf_dir, "tagged_rel"), "meta.json"
    )
    with open(meta_path) as fh:
        assert _json.load(fh)["tag"] == "v2"

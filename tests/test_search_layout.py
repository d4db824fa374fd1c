"""Tests for retrieval (BM25), IVF-PQ search, negative sampling, and the
z-order layout (including that the layout actually skips files through
the versioned table's manifest stats).

Oracle parity for text_bm25_search / agg_heavy_hitters / layout_zorder /
sample_negatives runs automatically in test_oracle_parity.py; these tests
pin the properties the oracle can't express.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_CORRECTNESS, SF_SMOKE


def _released(spark, fn, sf_dir):
    from concurrent_etl_go_spark.operators.registry import release_caches

    rows = fn(spark, sf_dir).collect()
    release_caches()
    return rows


# ---------------------------------------------------------------- BM25


def test_bm25_top_docs_contain_query_terms(spark):
    from concurrent_etl_go_spark.operators.search import (
        BM25_TERMS,
        text_bm25_search,
    )
    from concurrent_etl_go_spark.sources.readers import read_table

    top = _released(spark, text_bm25_search, SF_SMOKE)
    assert len(top) == 20
    scores = [r.bm25 for r in top]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)

    docs = {
        r.doc_id: r.text
        for r in read_table(spark, SF_SMOKE, "documents")
        .where(F.col("doc_id").isin([r.doc_id for r in top[:5]]))
        .collect()
    }
    for r in top[:5]:
        toks = set(docs[r.doc_id].split(" "))
        assert toks & set(BM25_TERMS), f"doc {r.doc_id} matches no query term"


def test_heavy_hitters_counts_are_exact(spark):
    from concurrent_etl_go_spark.operators.search import agg_heavy_hitters
    from concurrent_etl_go_spark.sources.readers import read_table

    rows = _released(spark, agg_heavy_hitters, SF_SMOKE)
    # the sf0.001 vocabulary is smaller than K — top-k returns all of it
    assert 0 < len(rows) <= 50
    # spot-check the #1 term against a direct count
    docs = read_table(spark, SF_SMOKE, "documents")
    direct = (
        docs.select(F.explode(F.split("text", " ")).alias("t"))
        .where(F.col("t") == rows[0].term)
        .count()
    )
    assert rows[0].cnt == direct


# -------------------------------------------------------------- IVF-PQ


def test_ivfpq_topk_recall_vs_exact(spark):
    from concurrent_etl_go_spark.llm.ivfpq import similarity_ivfpq_topk
    from concurrent_etl_go_spark.llm.similarity import similarity_topk

    exact = {r.vec_id for r in _released(spark, similarity_topk, SF_CORRECTNESS)}
    approx = {
        r.vec_id
        for r in _released(spark, similarity_ivfpq_topk, SF_CORRECTNESS)
    }
    assert len(approx) == 10
    overlap = len(exact & approx)
    assert overlap >= 8, f"IVF-PQ recall too low: {overlap}/10"


def test_ivfpq_deterministic(spark):
    from concurrent_etl_go_spark.llm.ivfpq import similarity_ivfpq_topk

    a = _released(spark, similarity_ivfpq_topk, SF_SMOKE)
    b = _released(spark, similarity_ivfpq_topk, SF_SMOKE)
    assert a == b


def test_ivfpq_index_persists_and_survives_rebuild(spark, tmp_path):
    """Build-offline/serve-cheap: the first search builds and persists
    the index; later searches read it back and return identical results;
    a forced rebuild reproduces the same index (deterministic fits); a
    source-fingerprint change invalidates it."""
    import json
    import os

    from concurrent_etl_go_spark.llm import ivfpq
    from concurrent_etl_go_spark.operators.registry import release_caches

    root = str(tmp_path / "idx")
    codes1, meta1 = ivfpq.load_ivfpq_index(spark, SF_SMOKE, root=root)
    built = codes1.orderBy("vec_id").collect()
    release_caches()
    assert os.path.exists(os.path.join(root, "meta.json"))

    # read-back path: no refit, identical codes + metadata
    codes2, meta2 = ivfpq.load_ivfpq_index(spark, SF_SMOKE, root=root)
    assert meta2 == meta1
    assert codes2.orderBy("vec_id").collect() == built
    release_caches()

    # forced rebuild reproduces the same index bit-for-bit (the codes
    # table version advances — it's a fresh overwrite commit — and meta
    # tracks it, which is exactly the meta<->codes linkage)
    codes3, meta3 = ivfpq.load_ivfpq_index(
        spark, SF_SMOKE, root=root, rebuild=True
    )
    assert meta3["codes_version"] > meta1["codes_version"]
    drop = lambda m: {k: v for k, v in m.items() if k != "codes_version"}
    assert drop(meta3) == drop(meta1)
    assert codes3.orderBy("vec_id").collect() == built
    release_caches()

    # a valid meta with a missing/corrupt codes directory must fall
    # through to a rebuild, not raise (load failures are always
    # recoverable because builds are deterministic)
    import shutil

    shutil.rmtree(os.path.join(root, "codes"))
    codes_r, meta_r = ivfpq.load_ivfpq_index(spark, SF_SMOKE, root=root)
    assert codes_r.orderBy("vec_id").collect() == built
    assert drop(meta_r) == drop(meta1)
    release_caches()

    # staleness: a fingerprint mismatch triggers a rebuild (observable as
    # the meta.json being rewritten with the CURRENT fingerprint)
    meta_path = os.path.join(root, "meta.json")
    with open(meta_path) as f:
        stale = json.load(f)
    stale["fingerprint"] = [0, 0]
    with open(meta_path, "w") as f:
        json.dump(stale, f)
    _, meta4 = ivfpq.load_ivfpq_index(spark, SF_SMOKE, root=root)
    release_caches()
    assert meta4["fingerprint"] == meta1["fingerprint"]


# -------------------------------------------- z-order layout + skipping


def test_zvalue_interleave_roundtrip(spark):
    """De-interleaving the z-value recovers both coordinates exactly."""
    from concurrent_etl_go_spark.operators.layout import Z_BITS, zvalue

    df = spark.range(1024).select(
        (F.col("id") % 256).alias("x"), ((F.col("id") * 37) % 256).alias("y")
    )
    z = df.withColumn("zv", zvalue(F.col("x"), F.col("y")))
    back_x = sum(
        F.shiftleft(F.shiftright(F.col("zv"), 2 * i).bitwiseAND(1), i)
        for i in range(Z_BITS)
    )
    back_y = sum(
        F.shiftleft(F.shiftright(F.col("zv"), 2 * i + 1).bitwiseAND(1), i)
        for i in range(Z_BITS)
    )
    bad = z.where((back_x != F.col("x")) | (back_y != F.col("y"))).count()
    assert bad == 0


def test_zorder_layout_skips_files_on_second_dimension(tmp_path, spark):
    """The point of z-order: a time-range predicate skips files even
    though the alternative single-column layout was keyed on user."""
    from concurrent_etl_go_spark.operators.layout import zorder_layout
    from concurrent_etl_go_spark.sources.readers import read_table
    from concurrent_etl_go_spark.sources.versioned import (
        read_table_pruned,
        write_table_with_stats,
    )

    ev = read_table(spark, SF_SMOKE, "events")
    hb = F.floor(F.unix_timestamp("ts") / 3600).cast("long")
    base = ev.select("event_id", "user_id", hb.alias("hour_key"))

    # layout A: range-partitioned on user only
    by_user = base.withColumn("ub", F.col("user_id").bitwiseAND(255)).withColumn(
        "hb", F.col("hour_key").bitwiseAND(255)
    )
    root_a = str(tmp_path / "by_user")
    write_table_with_stats(
        by_user.repartitionByRange(8, "ub"), root_a, ("ub", "hb")
    )

    # layout B: z-ordered on (user, hour)
    root_b = str(tmp_path / "zorder")
    write_table_with_stats(
        zorder_layout(base, "user_id", "hour_key", 8), root_b, ("ub", "hb")
    )

    lo, hi = 0, 31  # an hb range covering 1/8 of the hour buckets
    opened_a = len(read_table_pruned(spark, root_a, "hb", lo, hi).inputFiles())
    opened_b = len(read_table_pruned(spark, root_b, "hb", lo, hi).inputFiles())

    # identical results either way...
    rows_a = read_table_pruned(spark, root_a, "hb", lo, hi).count()
    rows_b = read_table_pruned(spark, root_b, "hb", lo, hi).count()
    assert rows_a == rows_b > 0
    # ...but the z-layout opens strictly fewer files
    assert opened_b < opened_a, (opened_b, opened_a)


# ---------------------------------------------------- negative sampling


def test_sample_negatives_labels_differ_and_deterministic(spark):
    from concurrent_etl_go_spark.llm.negatives import sample_negatives
    from concurrent_etl_go_spark.sources.readers import read_table

    rows = _released(spark, sample_negatives, SF_SMOKE)
    assert rows  # rejection keeps a healthy fraction
    labels = {
        r.vec_id: r.label
        for r in read_table(spark, SF_SMOKE, "embeddings").collect()
    }
    for r in rows:
        assert r.neg_id != r.vec_id
        assert labels[r.neg_id] == r.neg_label
        assert r.neg_label != labels[r.vec_id]
    again = _released(spark, sample_negatives, SF_SMOKE)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


# ------------------------------------------------------- hybrid RRF


def test_hybrid_rrf_scores_recompute_from_ranks(spark):
    """search_hybrid_rrf: the fused score must be a pure function of the
    two arm ranks — recompute 1/(60+lex) + 1/(60+sem) driver-side and
    compare to the emitted rrf (the property the oracle hash proves
    cross-engine but can't explain); output is exactly RRF_TOP_K rows,
    rrf-descending with ranks 1..k, and every row carries at least one
    arm rank (a doc in neither shortlist can never appear)."""
    from concurrent_etl_go_spark.operators.search import (
        RRF_K,
        RRF_TOP_K,
        search_hybrid_rrf,
    )

    rows = _released(spark, search_hybrid_rrf, SF_SMOKE)
    assert len(rows) == RRF_TOP_K
    assert [r.rank for r in rows] == list(range(1, RRF_TOP_K + 1))
    scores = [r.rrf for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert r.lex_rank is not None or r.sem_rank is not None
        expect = 0.0
        if r.lex_rank is not None:
            expect += 1.0 / (RRF_K + r.lex_rank)
        if r.sem_rank is not None:
            expect += 1.0 / (RRF_K + r.sem_rank)
        assert abs(r.rrf - round(expect, 6)) < 1e-12


def test_hybrid_rrf_lexical_arm_agrees_with_bm25(spark):
    """The fused result's lexical ranks must agree with the standalone
    BM25 query's ordering — the shared _BM25_SCORED_SQL fragment and the
    shared Spark expression are one definition, so a drift between the
    two queries would be a refactor bug."""
    from concurrent_etl_go_spark.operators.search import (
        search_hybrid_rrf,
        text_bm25_search,
    )

    bm25 = _released(spark, text_bm25_search, SF_SMOKE)
    bm25_rank = {r.doc_id: i + 1 for i, r in enumerate(bm25)}
    for r in _released(spark, search_hybrid_rrf, SF_SMOKE):
        if r.lex_rank is not None:
            assert bm25_rank.get(r.doc_id) == r.lex_rank

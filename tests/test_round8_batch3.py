"""Invariant tests for the final round-8 surface batch: integer HITS,
event-path trigrams, the FK-orphan report, the lang x quality corpus
matrix, the leakage-audited temporal split, exact-integer centroid
drift, duplicated-ngram span coverage, and the MMR diversified re-rank.

Each test is an INDEPENDENT re-derivation (pure-Python mirror or an
algebraic consistency check on the query's own outputs) — the DuckDB
oracle equality itself is the driver's job."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_graph_hits_matches_python_mirror(spark):
    """graph_hits: the fixed-round integer hub/authority sums equal a
    pure-Python mirror of h = A.a / a = A^T.h on the same edge list,
    and the emitted top-20 respects the (auth DESC, hub DESC, id)
    order."""
    from concurrent_etl_go_spark.operators.graph2 import (
        _HITS_ROUNDS,
        _copurchase_edges,
        graph_hits,
    )
    from concurrent_etl_go_spark.operators.registry import release_caches

    edges = [
        (r.src, r.dst)
        for r in _copurchase_edges(spark, SF_SMOKE).collect()
    ]
    release_caches()
    nodes = {u for e in edges for u in e}
    a = {n: 1 for n in nodes}
    h = {}
    for _ in range(_HITS_ROUNDS):
        h = defaultdict(int)
        for u, v in edges:
            h[u] += a.get(v, 0)
        a = defaultdict(int)
        for u, v in edges:
            a[v] += h.get(u, 0)
    expect = sorted(
        ((n, h.get(n, 0), a.get(n, 0)) for n in nodes),
        key=lambda t: (-t[2], -t[1], t[0]),
    )[:20]
    got = [
        (r.id, r.hub, r.auth)
        for r in graph_hits(spark, SF_SMOKE).collect()
    ]
    release_caches()
    assert got == expect
    assert any(r[2] > 0 for r in got)  # non-trivial authority mass


def test_agg_event_paths_matches_python_mirror(spark):
    """agg_event_paths: trigram counts equal a pure-Python sliding
    window over per-user (ts, event_id)-sorted streams; shares are the
    exact floor division by the total trigram count."""
    from concurrent_etl_go_spark.operators.relational11 import (
        agg_event_paths,
    )
    from concurrent_etl_go_spark.sources.readers import read_table

    ev = (
        read_table(spark, SF_SMOKE, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    streams = defaultdict(list)
    for r in ev:
        streams[r.user_id].append((r.ts, r.event_id, r.event_type))
    counts: dict[str, int] = defaultdict(int)
    for s in streams.values():
        s.sort()
        for i in range(len(s) - 2):
            counts[">".join(x[2] for x in s[i : i + 3])] += 1
    total = sum(counts.values())
    expect = sorted(
        ((p, n, n * 10000 // total) for p, n in counts.items()),
        key=lambda t: (-t[1], t[0]),
    )[:20]
    got = [
        (r.path, r.n, r.share_bp)
        for r in agg_event_paths(spark, SF_SMOKE).collect()
    ]
    assert got == expect


def test_profile_fk_orphans_counts_planted_violations(spark):
    """profile_fk_orphans: one row per declared FK edge; child
    cardinalities match the raw tables; the planted parent purge
    yields a strictly positive orphan count on every edge (each parent
    key set loses its md5 bucket-0 eighth); the basis-point rate is
    the exact floor division of the row's own counts."""
    from concurrent_etl_go_spark.operators.profiling import (
        _FK_EDGES,
        profile_fk_orphans,
    )
    from concurrent_etl_go_spark.sources.readers import read_table

    rows = {r.fk_edge: r for r in profile_fk_orphans(spark, SF_SMOKE).collect()}
    assert len(rows) == len(_FK_EDGES)
    for child, fk, parent, pk in _FK_EDGES:
        r = rows[f"{child}.{fk}->{parent}.{pk}"]
        assert r.child_rows == read_table(spark, SF_SMOKE, child).count()
        assert 0 < r.orphans <= r.child_rows
        assert r.orphan_bp == r.orphans * 10000 // r.child_rows


def test_text_lang_quality_matrix_partitions_corpus(spark):
    """text_lang_quality_matrix: the cross-tab cells partition the
    corpus exactly (cell counts sum to the doc count), every bucket is
    one of the three declared labels, and shares are floor divisions
    of the total."""
    from concurrent_etl_go_spark.llm.text2 import text_lang_quality_matrix
    from concurrent_etl_go_spark.sources.readers import read_table

    rows = text_lang_quality_matrix(spark, SF_SMOKE).collect()
    n_docs = read_table(spark, SF_SMOKE, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    assert {r.quality_bucket for r in rows} <= {"short", "low_stopword", "ok"}
    for r in rows:
        assert r.share_bp == r.n_docs * 10000 // n_docs
    langs = {r.lang for r in rows}
    assert len(langs) >= 2  # the synthetic corpus is multilingual


def test_dataset_temporal_split_is_leak_audited(spark):
    """dataset_temporal_split: exactly train+test rows; event counts
    partition the stream; the train range ends strictly before the
    test range begins; the overlap rate is consistent with an
    independent per-user recomputation."""
    from concurrent_etl_go_spark.llm.datasets2 import (
        TEMPORAL_HOLDOUT_DAYS,
        dataset_temporal_split,
    )
    from concurrent_etl_go_spark.sources.readers import read_table

    rows = {r.split: r for r in dataset_temporal_split(spark, SF_SMOKE).collect()}
    assert set(rows) == {"train", "test"}
    ev = (
        read_table(spark, SF_SMOKE, "events")
        .select("user_id", F.date_trunc("day", "ts").alias("day"))
        .collect()
    )
    assert rows["train"].n_events + rows["test"].n_events == len(ev)
    assert rows["train"].last_day < rows["test"].first_day
    max_day = max(r.day for r in ev)
    import datetime

    cutoff = max_day - datetime.timedelta(days=TEMPORAL_HOLDOUT_DAYS)
    train_users = {r.user_id for r in ev if r.day < cutoff}
    test_users = {r.user_id for r in ev if r.day >= cutoff}
    both = len(train_users & test_users)
    assert rows["train"].n_users == len(train_users)
    assert rows["test"].n_users == len(test_users)
    assert rows["train"].seen_in_other_bp == both * 10000 // len(train_users)
    assert rows["test"].seen_in_other_bp == both * 10000 // len(test_users)


def test_embeddings_centroid_drift_matches_python_mirror(spark):
    """embeddings_centroid_drift: exact-integer micro-unit drift equals
    a pure-Python big-int recomputation from the quantized vectors
    (Python ints are arbitrary precision — an independent check of the
    DECIMAL(38,0) path)."""
    from concurrent_etl_go_spark.llm.similarity import (
        embeddings_centroid_drift,
    )
    from concurrent_etl_go_spark.sources.readers import read_table

    emb = (
        read_table(spark, SF_SMOKE, "embeddings")
        .select("label", "embedding")
        .collect()
    )
    by_label: dict[int, list] = defaultdict(list)
    for r in emb:
        by_label[r.label].append(
            [math.floor(float(x) * 1024) for x in r.embedding]
        )
    dim = len(next(iter(by_label.values()))[0])
    all_vecs = [v for vs in by_label.values() for v in vs]
    n_g = len(all_vecs)
    s_g = [sum(v[p] for v in all_vecs) for p in range(dim)]
    expect = {}
    for label, vs in by_label.items():
        n_l = len(vs)
        s2 = 0
        for p in range(dim):
            s_l = sum(v[p] for v in vs)
            num = s_l * n_g - s_g[p] * n_l
            s2 += num * num
        den = n_l * n_g
        expect[label] = (n_l, s2 * 1_000_000 // (den * den))
    got = {
        r.label: (r.n_vecs, r.drift2_micro)
        for r in embeddings_centroid_drift(spark, SF_SMOKE).collect()
    }
    assert got == expect
    assert any(d > 0 for _, d in got.values())


def test_text_dup_ngram_coverage_matches_set_mirror(spark):
    """text_dup_ngram_coverage: the interval-union sweep equals an
    independent Python mirror that marks covered token INDICES in a
    set (a structurally different algorithm than the LEAD sweep),
    over every document."""
    from concurrent_etl_go_spark.llm.text2 import (
        DUP_NGRAM_K,
        text_dup_ngram_coverage,
    )
    from concurrent_etl_go_spark.sources.readers import read_table

    k = DUP_NGRAM_K
    docs = (
        read_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text")
        .collect()
    )
    toks = {r.doc_id: r.text.split(" ") for r in docs}
    gram_docs: dict[str, set] = defaultdict(set)
    starts: dict[int, dict[str, list]] = {}
    for did, w in toks.items():
        starts[did] = {
            " ".join(w[s : s + k]): s for s in range(len(w) - k + 1)
        }
        for g in {" ".join(w[s : s + k]) for s in range(len(w) - k + 1)}:
            gram_docs[g].add(did)
    dup = {g for g, ds in gram_docs.items() if len(ds) >= 2}
    expect = {}
    for did, w in toks.items():
        covered_idx = set()
        for s in range(len(w) - k + 1):
            if " ".join(w[s : s + k]) in dup:
                covered_idx.update(range(s, s + k))
        n = len(w)
        c = len(covered_idx)
        expect[did] = (n, c, c * 10000 // n)
    got = {
        r.doc_id: (r.n_tokens, r.covered_tokens, r.coverage_bp)
        for r in text_dup_ngram_coverage(spark, SF_SMOKE).collect()
    }
    assert got == expect
    assert any(c for _, c, _ in got.values())  # planted near-dups overlap


def test_search_mmr_rerank_matches_greedy_mirror(spark):
    """search_mmr_rerank: the unrolled greedy selection equals a
    pure-Python MMR over the same quantized vectors — shortlist,
    pairwise distances, novelty - relevance argmax, and tie-breaks all
    reproduced; picks are distinct; pick 1 is the relevance argmin."""
    from concurrent_etl_go_spark.operators.search import (
        MMR_SELECT,
        MMR_SHORTLIST,
        search_mmr_rerank,
    )
    from concurrent_etl_go_spark.operators.registry import release_caches
    from concurrent_etl_go_spark.sources.readers import read_table

    emb = (
        read_table(spark, SF_SMOKE, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    vecs = {
        r.vec_id: [math.floor(float(x) * 1024) for x in r.embedding]
        for r in emb
    }
    q = vecs[0]
    d2 = {
        vid: sum((a - b) * (a - b) for a, b in zip(v, q))
        for vid, v in vecs.items()
    }
    short = sorted(
        (v for v in d2 if v != 0), key=lambda vid: (d2[vid], vid)
    )[:MMR_SHORTLIST]

    def pdist(a, b):
        return sum(
            (x - y) * (x - y) for x, y in zip(vecs[a], vecs[b])
        )

    sel = [min(short, key=lambda v: (d2[v], v))]
    expect = [(1, sel[0], d2[sel[0]], None)]
    for step in range(2, MMR_SELECT + 1):
        best = max(
            (c for c in short if c not in sel),
            key=lambda c: (min(pdist(c, s) for s in sel) - d2[c], -c),
        )
        expect.append(
            (step, best, d2[best],
             min(pdist(best, s) for s in sel) - d2[best])
        )
        sel.append(best)
    got = [
        (r.step, r.doc_id, r.d2, r.mmr)
        for r in search_mmr_rerank(spark, SF_SMOKE).collect()
    ]
    release_caches()
    assert got == expect
    assert len({g[1] for g in got}) == MMR_SELECT

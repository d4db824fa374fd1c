"""IVF-PQ approximate nearest-neighbor search (coarse quantizer + product
quantization + asymmetric distance + exact re-rank).

This composes the engine's two ANN building blocks into the index shape
used for billion-vector corpora (FAISS-style IVFPQ, per Jégou et al.,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011 — public
literature):

1. IVF: a learned k-means coarse quantizer partitions vectors into cells;
   a query probes only the ``nprobe`` cells whose centroids score best
   (the pruning decision is made on k tiny centroids, driver-side).
2. PQ: per-subspace codebooks compress each vector to M small codes; the
   query precomputes an M x K lookup table of subspace dot products, so
   scoring a candidate is M table lookups — no float vector is touched.
3. Re-rank: the top candidates BY APPROXIMATE score are re-scored with
   exact cosine (the standard refinement step that recovers most of the
   recall PQ loses).

Scale: the k-means fits are the offline INDEX BUILD — build once, serve
cheap. ``build_ivfpq_index`` persists the fitted index (coarse cells +
PQ codebooks as JSON metadata, per-vector cluster + codes as a
``sources/versioned.py`` table keyed by a source fingerprint);
``similarity_ivfpq_topk`` READS it and only rebuilds when the source
changed (or ``rebuild=True``). Per query, driver traffic is the centroid
matrix, the single query row, and the M x K LUT literals — candidate
scoring is M lookups per code row over the probed fraction (~nprobe/k of
the corpus), and only the RERANK-sized shortlist ever touches a float
vector again (one broadcast semi-join back to the corpus). At 100 TB a
per-query refit would re-scan the corpus; the persisted index makes
query cost O(probed codes + shortlist).

Rows-only driver check (learned quantizers aren't SQL-portable);
``tests/test_llm_ops.py`` pins determinism and recall vs exact top-k.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.llm.kmeans import (
    PQ_CODEBOOK_K,
    PQ_SUBSPACES,
    kmeans_fit,
)
from concurrent_etl_go_spark.llm.similarity import _vectors
from concurrent_etl_go_spark.sources import versioned as vt

IVFPQ_CLUSTERS = 8
IVFPQ_NPROBE = 3
IVFPQ_TOP_K = 10
#: Approximate-score candidates kept for the exact re-rank pass.
IVFPQ_RERANK = 4 * IVFPQ_TOP_K


def _sq_expr_sql(slice_sql: str, c: list[float]) -> str:
    """Squared distance of a vector-slice SQL expression to a literal
    centroid, as ONE SQL string.

    Why a string and not Column composition: building the equivalent
    Column tree costs thousands of py4j round-trips (one per literal and
    lambda) — measured at ~3.5 s per fit iteration for 64 codewords,
    dwarfing the actual sub-second job. One ``F.expr`` call ships the
    whole tree to the JVM at once. Float literals use repr (shortest
    round-trip form) + the D suffix, so the parsed doubles are
    bit-identical to the F.lit path."""
    lits = ",".join(f"{x!r}D" for x in c)
    return (
        f"aggregate(zip_with({slice_sql}, array({lits}), "
        "(a, b) -> (a - b) * (a - b)), 0.0D, (acc, x) -> acc + x)"
    )


def _dists_sql(slice_sql: str, codebook: list[list[float]]) -> str:
    return (
        "array("
        + ",".join(_sq_expr_sql(slice_sql, c) for c in codebook)
        + ")"
    )


def _argmin_sql(dists_col: str) -> str:
    """Index of the nearest centroid (ties -> lowest index)."""
    return f"cast(array_position({dists_col}, array_min({dists_col})) - 1 as int)"


def _subspace_bounds(dim: int) -> list[tuple[int, int]]:
    """(1-based slice start, length) per subspace; the last absorbs any
    remainder."""
    sub_dim = dim // PQ_SUBSPACES
    return [
        (
            m * sub_dim + 1,
            sub_dim if m < PQ_SUBSPACES - 1 else dim - m * sub_dim,
        )
        for m in range(PQ_SUBSPACES)
    ]


def pq_fit_joint(
    vectors: DataFrame,
    dim: int,
    k: int = PQ_CODEBOOK_K,
    iterations: int = 3,
) -> list[list[list[float]]]:
    """Train all ``PQ_SUBSPACES`` codebooks in ONE distributed pass per
    Lloyd iteration (per-subspace fits are independent, so they batch:
    the assign step computes every subspace's argmin in the same scan,
    and one posexplode aggregation updates every codebook — the
    (subspace, cluster) pair is derived from the exploded position).
    Fitting subspaces sequentially costs ``PQ_SUBSPACES``x the jobs and
    driver round-trips for identical mathematics; at 100 TB the data
    passes ARE the index-build cost, so batching them is the difference
    between 2 and 8 scans per iteration.

    Same deterministic init as ``kmeans_fit`` (slices of the k lowest
    vec_ids); driver traffic per iteration is the M x k codebook matrix.
    """
    from concurrent_etl_go_spark.operators.registry import scoped_persist

    bounds = _subspace_bounds(dim)
    sub_dim = dim // PQ_SUBSPACES
    base = scoped_persist(vectors.select("vec_id", "v"))
    init = base.where(F.col("vec_id") < k).orderBy("vec_id").collect()
    codebooks = [
        [list(row.v)[start - 1 : start - 1 + length] for row in init]
        for start, length in bounds
    ]

    for _ in range(iterations):
        # two narrow selects built from SQL strings (see _sq_expr_sql for
        # why strings): dists arrays, then argmin codes
        dist_cols = [
            F.expr(
                _dists_sql(f"slice(v, {start}, {length})", codebooks[m])
            ).alias(f"dists_{m}")
            for m, (start, length) in enumerate(bounds)
        ]
        with_dists = base.select("vec_id", "v", *dist_cols)
        cands = with_dists.select(
            "vec_id",
            "v",
            *[
                F.expr(_argmin_sql(f"dists_{m}")).alias(f"code_{m}")
                for m in range(PQ_SUBSPACES)
            ],
        )
        codes = F.array(*[F.col(f"code_{m}") for m in range(PQ_SUBSPACES)])
        per = cands.select(codes.alias("codes"), F.posexplode("v"))
        m_col = F.least(
            F.floor(F.col("pos") / sub_dim), F.lit(PQ_SUBSPACES - 1)
        ).cast("int")
        agg = (
            per.select(
                m_col.alias("m"),
                F.element_at("codes", m_col + 1).alias("cluster"),
                "pos",
                "col",
            )
            .groupBy("m", "cluster", "pos")
            .agg(F.avg("col").alias("mean"))
        )
        rows = (
            agg.groupBy("m", "cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "mean"))),
                    lambda s: s["mean"],
                ).alias("c")
            )
            .collect()  # M x k tiny rows — the only driver traffic
        )
        new = [list(cb) for cb in codebooks]
        for row in rows:
            new[row.m][row.cluster] = list(row.c)
        codebooks = new
    return codebooks


# ------------------------------------------------ persisted index build


def _default_index_root(sf_dir: str) -> str:
    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"cetl_ivfpq_index_{key}")


def _source_fingerprint(sf_dir: str) -> list[int]:
    """(size, mtime_ns) of the source parquet — cheap staleness guard so
    a refreshed corpus invalidates the index without reading any data."""
    st = os.stat(os.path.join(sf_dir, "embeddings.parquet"))
    return [st.st_size, st.st_mtime_ns]


def fit_ivfpq(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, dict]:
    """Fit the IVF-PQ index IN MEMORY: coarse quantizer + PQ codebooks +
    the per-vector ``(vec_id, cluster, code_0..code_{M-1})`` codes frame,
    with no on-disk persistence.  ``build_ivfpq_index`` wraps this with
    the versioned-table persist (the production build-offline path);
    the registry query calls it directly so every bench/oracle
    invocation computes the index from the parquet inputs."""
    vectors = _vectors(spark, sf_dir)
    first = vectors.select(F.size("v").alias("d")).first()
    if first is None:
        raise ValueError(f"no vectors under {sf_dir}")
    dim = first.d
    assigned, centroids = kmeans_fit(vectors, k=IVFPQ_CLUSTERS, iterations=2)
    codebooks = pq_fit_joint(vectors, dim, iterations=2)

    bounds = _subspace_bounds(dim)
    with_dists = assigned.select(
        "vec_id",
        "cluster",
        *[
            F.expr(
                _dists_sql(f"slice(v, {start}, {length})", codebooks[m])
            ).alias(f"dists_{m}")
            for m, (start, length) in enumerate(bounds)
        ],
    )
    codes = with_dists.select(
        "vec_id",
        "cluster",
        *[
            F.expr(_argmin_sql(f"dists_{m}")).alias(f"code_{m}")
            for m in range(PQ_SUBSPACES)
        ],
    )
    meta = {"dim": dim, "centroids": centroids, "codebooks": codebooks}
    return codes, meta


def build_ivfpq_index(
    spark: SparkSession, sf_dir: str, root: str | None = None
) -> dict:
    """Offline index build: fit the coarse quantizer + PQ codebooks, then
    persist (a) per-vector ``(vec_id, cluster, code_0..code_{M-1})`` rows
    as a versioned table under ``root/codes`` and (b) the centroid /
    codebook matrices + source fingerprint as ``root/meta.json``.

    This is the build-offline / serve-cheap split every real ANN
    deployment uses: the Lloyd fits re-scan the corpus (distributed,
    batched — see ``pq_fit_joint``), but they run once per corpus
    version, not once per query. The codes table is ~M bytes-ish per
    vector — the 250x compression that lets a 100 TB corpus's index fit
    in a fraction of one executor's scan budget.
    """
    root = root or _default_index_root(sf_dir)
    codes, fit_meta = fit_ivfpq(spark, sf_dir)
    dim = fit_meta["dim"]
    centroids, codebooks = fit_meta["centroids"], fit_meta["codebooks"]
    codes_root = os.path.join(root, "codes")
    try:
        snap = vt.write_table(codes, codes_root, mode="overwrite")
    except vt.CommitConflictError:
        # a concurrent builder won the commit race; builds are
        # deterministic, so its index is byte-equivalent — just use it
        snap = vt.snapshot(codes_root)
    meta = {
        "fingerprint": _source_fingerprint(sf_dir),
        # Atomic meta<->codes linkage: meta names the EXACT codes-table
        # version its centroids/codebooks were fit with, and loads pin
        # the read to it.  Without this a concurrent rebuild could
        # overwrite the codes table under a reader holding the old meta
        # — old centroids silently scored against new codes.
        "codes_version": snap.version,
        "dim": dim,
        "centroids": centroids,
        "codebooks": codebooks,
    }
    os.makedirs(root, exist_ok=True)
    tmp = os.path.join(root, "meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(root, "meta.json"))
    return meta


def load_ivfpq_index(
    spark: SparkSession,
    sf_dir: str,
    root: str | None = None,
    rebuild: bool = False,
) -> tuple[DataFrame, dict]:
    """(codes table, metadata) for ``sf_dir``'s corpus — built on first
    use or when the source fingerprint changed; otherwise a pure read.
    ``rebuild=True`` forces a refit (the tests' escape hatch)."""
    root = root or _default_index_root(sf_dir)
    if not rebuild:
        # EXPECTED load failures fall through to a rebuild (rebuilds
        # are deterministic, hence always safe): missing/corrupt
        # meta.json, a meta missing keys from an older layout, or a
        # codes directory that is missing/vacuumed under a valid meta
        # (read_table_version raises FileNotFoundError for an absent
        # version).  The catch is deliberately NARROW — a genuine bug
        # (bad meta schema type, Spark analysis error, permissions)
        # must surface, not silently degrade into a full rebuild on
        # every call.  The codes read is PINNED to meta's
        # codes_version, so a reader racing a rebuild gets the old
        # (meta, codes) pair consistently rather than old centroids
        # against new codes.
        try:
            with open(os.path.join(root, "meta.json")) as f:
                meta = json.load(f)
            if meta["fingerprint"] == _source_fingerprint(sf_dir):
                codes = vt.read_table_version(
                    spark, os.path.join(root, "codes"),
                    version=meta["codes_version"],
                )
                return codes, meta
        except (FileNotFoundError, json.JSONDecodeError, KeyError):
            pass
    meta = build_ivfpq_index(spark, sf_dir, root)
    codes = vt.read_table_version(
        spark, os.path.join(root, "codes"), version=meta["codes_version"]
    )
    return codes, meta


@query("similarity_ivfpq_topk")  # learned quantizers — rows-only check
def similarity_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ top-k for query vector 0 against the PERSISTED index: probe
    the best ``nprobe`` of ``IVFPQ_CLUSTERS`` cells, score candidates by
    PQ asymmetric distance (M LUT lookups per code row — no float vector
    touched), exact-cosine re-rank the best ``IVFPQ_RERANK`` via one
    broadcast semi-join back to the corpus, return the top
    ``IVFPQ_TOP_K``.

    The index is FIT FRESH per invocation (``fit_ivfpq``) so every
    bench/oracle run computes from the parquet inputs — the persisted
    build/serve split (``build_ivfpq_index``/``load_ivfpq_index``)
    remains the production API for repeated serving, where query cost
    is only the probed-codes scan + a shortlist-sized join.
    Deterministic end to end: k-means inits are id-ordered, argmin ties
    break low, and every ordering carries a vec_id tie-break — required
    for the driver's rows-only determinism check (and identical whether
    the index was freshly built or read back, which
    ``tests/test_search_layout.py`` pins).
    """
    vectors = _vectors(spark, sf_dir)
    qrow = vectors.where(F.col("vec_id") == 0).select("v", "norm").first()
    if qrow is None or qrow.v is None:
        return spark.createDataFrame([], "vec_id long, sim double")
    q, qn = list(qrow.v), float(qrow.norm)
    dim = len(q)
    sub_dim = dim // PQ_SUBSPACES

    codes, meta = fit_ivfpq(spark, sf_dir)
    centroids, codebooks = meta["centroids"], meta["codebooks"]

    # --- query-time: probe decision on k tiny centroids (driver-side) ---
    def centroid_cos(c: list[float]) -> float:
        cn = sum(x * x for x in c) ** 0.5
        return sum(x * y for x, y in zip(c, q)) / ((cn * qn) or 1.0)

    probed = sorted(
        range(len(centroids)), key=lambda i: (-centroid_cos(centroids[i]), i)
    )[:IVFPQ_NPROBE]

    # Per-subspace LUTs: dot(q_sub, codeword) and ||codeword||^2 — M x K
    # floats, embedded as literals (all a code-row scorer needs).
    luts, cnorms = [], []
    for m in range(PQ_SUBSPACES):
        qs = q[m * sub_dim : (m + 1) * sub_dim if m < PQ_SUBSPACES - 1 else dim]
        luts.append(
            [sum(x * y for x, y in zip(qs, c)) for c in codebooks[m]]
        )
        cnorms.append([sum(x * x for x in c) for c in codebooks[m]])

    def lut_sql(m: int, table: list[float]) -> str:
        lits = ",".join(f"{x!r}D" for x in table)
        return f"element_at(array({lits}), code_{m} + 1)"

    approx_dot = " + ".join(lut_sql(m, luts[m]) for m in range(PQ_SUBSPACES))
    approx_norm = (
        "sqrt("
        + " + ".join(lut_sql(m, cnorms[m]) for m in range(PQ_SUBSPACES))
        + ")"
    )
    scored = codes.where(
        F.col("cluster").isin(probed) & (F.col("vec_id") != 0)
    ).withColumn(
        "approx_sim",
        F.expr(f"({approx_dot}) / ({approx_norm} * {qn!r}D)"),
    )
    shortlist = scored.orderBy(
        F.col("approx_sim").desc(), F.col("vec_id")
    ).limit(IVFPQ_RERANK)

    # --- exact re-rank: broadcast the tiny shortlist back to the corpus
    # (the only step that touches float vectors again) ---
    qlits = ",".join(f"{x!r}D" for x in q)
    hits = vectors.join(
        F.broadcast(shortlist.select("vec_id")), "vec_id", "inner"
    )
    exact = hits.select(
        "vec_id",
        F.round(
            F.expr(
                f"aggregate(zip_with(v, array({qlits}), (x, y) -> x * y), "
                "0.0D, (acc, x) -> acc + x)"
            )
            / (F.col("norm") * F.lit(qn)),
            4,
        ).alias("sim"),
    )
    return exact.orderBy(F.col("sim").desc(), F.col("vec_id")).limit(
        IVFPQ_TOP_K
    )

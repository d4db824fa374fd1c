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

Scale: the k-means fits are the offline INDEX BUILD (amortized across
every query served); per query, driver traffic is the centroid matrix,
the single query row, and the M x K LUT literals — candidate scoring is
a per-row expression over the probed fraction (~nprobe/k of the corpus),
followed by TakeOrdered. No shuffle touches the vectors.

Rows-only driver check (learned quantizers aren't SQL-portable);
``tests/test_llm_ops.py`` pins determinism and recall vs exact top-k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.llm.kmeans import (
    PQ_CODEBOOK_K,
    PQ_SUBSPACES,
    kmeans_fit,
)
from concurrent_etl_go_spark.llm.similarity import _vectors, dot

IVFPQ_CLUSTERS = 8
IVFPQ_NPROBE = 3
IVFPQ_TOP_K = 10
#: Approximate-score candidates kept for the exact re-rank pass.
IVFPQ_RERANK = 4 * IVFPQ_TOP_K


def _argmin_code(v: Column, codebook: list[list[float]]) -> Column:
    """Index of the nearest codebook centroid (ties -> lowest index)."""
    def sq(c: list[float]) -> Column:
        lit = F.array(*[F.lit(float(x)) for x in c])
        return F.aggregate(
            F.zip_with(v, lit, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    dists = F.array(*[sq(c) for c in codebook])
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def _lut(code_col: Column, table: list[float]) -> Column:
    """LUT lookup: table[code] as a literal-array element_at (1-based)."""
    return F.element_at(
        F.array(*[F.lit(float(x)) for x in table]), code_col + 1
    )


@query("similarity_ivfpq_topk")  # learned quantizers — rows-only check
def similarity_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ top-k for query vector 0: probe the best ``nprobe`` of
    ``IVFPQ_CLUSTERS`` learned cells, score candidates by PQ asymmetric
    distance (M LUT lookups each), exact-cosine re-rank the best
    ``IVFPQ_RERANK``, return the top ``IVFPQ_TOP_K``.

    Deterministic end to end: k-means inits are id-ordered, argmin ties
    break low, and every ordering carries a vec_id tie-break — required
    for the driver's rows-only determinism check.
    """
    vectors = _vectors(spark, sf_dir)
    qrow = vectors.where(F.col("vec_id") == 0).select("v", "norm").first()
    if qrow is None or qrow.v is None:
        return spark.createDataFrame([], "vec_id long, sim double")
    q, qn = list(qrow.v), float(qrow.norm)
    dim = len(q)
    sub_dim = dim // PQ_SUBSPACES

    # --- index build (offline at scale): coarse cells + PQ codebooks ---
    assigned, centroids = kmeans_fit(vectors, k=IVFPQ_CLUSTERS, iterations=3)
    codebooks: list[list[list[float]]] = []
    for m in range(PQ_SUBSPACES):
        start = m * sub_dim + 1  # slice() is 1-based
        length = sub_dim if m < PQ_SUBSPACES - 1 else dim - m * sub_dim
        sub = vectors.select(
            "vec_id", F.slice("v", start, length).alias("v")
        )
        _, cb = kmeans_fit(sub, k=PQ_CODEBOOK_K, iterations=3)
        codebooks.append(cb)

    # --- query-time: probe decision on k tiny centroids (driver-side) ---
    def centroid_cos(c: list[float]) -> float:
        cn = sum(x * x for x in c) ** 0.5
        return sum(x * y for x, y in zip(c, q)) / ((cn * qn) or 1.0)

    probed = sorted(
        range(len(centroids)), key=lambda i: (-centroid_cos(centroids[i]), i)
    )[:IVFPQ_NPROBE]

    # Per-subspace LUTs: dot(q_sub, codeword) and ||codeword||^2 — M x K
    # floats, embedded as literals (the whole "index" a scorer needs).
    luts, cnorms = [], []
    for m in range(PQ_SUBSPACES):
        qs = q[m * sub_dim : (m + 1) * sub_dim if m < PQ_SUBSPACES - 1 else dim]
        luts.append(
            [sum(x * y for x, y in zip(qs, c)) for c in codebooks[m]]
        )
        cnorms.append([sum(x * x for x in c) for c in codebooks[m]])

    # --- candidate scoring: PQ codes + LUT sums, per-row expressions ---
    cands = assigned.where(
        F.col("cluster").isin(probed) & (F.col("vec_id") != 0)
    )
    for m in range(PQ_SUBSPACES):
        start = m * sub_dim + 1
        length = sub_dim if m < PQ_SUBSPACES - 1 else dim - m * sub_dim
        cands = cands.withColumn(
            f"code_{m}",
            _argmin_code(F.slice("v", start, length), codebooks[m]),
        )
    approx_dot = sum(
        _lut(F.col(f"code_{m}"), luts[m]) for m in range(PQ_SUBSPACES)
    )
    approx_norm = F.sqrt(
        sum(_lut(F.col(f"code_{m}"), cnorms[m]) for m in range(PQ_SUBSPACES))
    )
    scored = cands.withColumn(
        "approx_sim", approx_dot / (approx_norm * F.lit(qn))
    )
    shortlist = scored.orderBy(
        F.col("approx_sim").desc(), F.col("vec_id")
    ).limit(IVFPQ_RERANK)

    # --- exact re-rank of the shortlist ---
    qlit = F.array(*[F.lit(float(x)) for x in q])
    exact = shortlist.select(
        "vec_id",
        F.round(
            dot(F.col("v"), qlit) / (F.col("norm") * F.lit(qn)), 4
        ).alias("sim"),
    )
    return exact.orderBy(F.col("sim").desc(), F.col("vec_id")).limit(
        IVFPQ_TOP_K
    )

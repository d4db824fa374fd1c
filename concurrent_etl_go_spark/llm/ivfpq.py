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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.llm.kmeans import (
    PQ_CODEBOOK_K,
    PQ_SUBSPACES,
    kmeans_fit,
)
from concurrent_etl_go_spark.llm.similarity import _vectors

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
    assigned, centroids = kmeans_fit(vectors, k=IVFPQ_CLUSTERS, iterations=2)
    codebooks = pq_fit_joint(vectors, dim, iterations=2)

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

    # --- candidate scoring: PQ codes + LUT sums, per-row expressions
    # (SQL-string built: see _sq_expr_sql) ---
    pruned = assigned.where(
        F.col("cluster").isin(probed) & (F.col("vec_id") != 0)
    )
    bounds = _subspace_bounds(dim)
    with_dists = pruned.select(
        "vec_id",
        "v",
        "norm",
        *[
            F.expr(
                _dists_sql(f"slice(v, {start}, {length})", codebooks[m])
            ).alias(f"dists_{m}")
            for m, (start, length) in enumerate(bounds)
        ],
    )
    cands = with_dists.select(
        "vec_id",
        "v",
        "norm",
        *[
            F.expr(_argmin_sql(f"dists_{m}")).alias(f"code_{m}")
            for m in range(PQ_SUBSPACES)
        ],
    )

    def lut_sql(m: int, table: list[float]) -> str:
        lits = ",".join(f"{x!r}D" for x in table)
        return f"element_at(array({lits}), code_{m} + 1)"

    approx_dot = " + ".join(lut_sql(m, luts[m]) for m in range(PQ_SUBSPACES))
    approx_norm = (
        "sqrt("
        + " + ".join(lut_sql(m, cnorms[m]) for m in range(PQ_SUBSPACES))
        + ")"
    )
    scored = cands.withColumn(
        "approx_sim",
        F.expr(f"({approx_dot}) / ({approx_norm} * {qn!r}D)"),
    )
    shortlist = scored.orderBy(
        F.col("approx_sim").desc(), F.col("vec_id")
    ).limit(IVFPQ_RERANK)

    # --- exact re-rank of the shortlist ---
    qlits = ",".join(f"{x!r}D" for x in q)
    exact = shortlist.select(
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

"""Deterministic k-means over the embeddings table — the engine's iterative-
algorithm pattern.

Each iteration is one distributed pass (assign via argmin over k distance
expressions, recompute centroids via posexplode + per-(cluster, dim) avg);
only the k x dim centroid matrix crosses the driver boundary between
iterations (exactly how MLlib structures Lloyd's algorithm). Initialization
is deterministic (the k lowest vec_ids), so results are bit-stable across
runs — required for the driver's rows-only determinism check.

The centroid update is dimension-agnostic: ``posexplode`` derives positions
from the data instead of unrolling ``element_at(v, i)`` for a hardcoded
dim, so any embedding width works unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query, scoped_persist
from concurrent_etl_go_spark.sources.readers import read_table


def _sq_dist(v, centroid: list[float]):
    lit = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(v, lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def kmeans_fit(
    vectors: DataFrame, k: int = 8, iterations: int = 5
) -> tuple[DataFrame, list[list[float]]]:
    """Lloyd's k-means returning (assignments, learned centroids).

    ``vectors`` needs (vec_id, v: array<double>); every other input column
    passes through to the assignment DataFrame (so callers can keep
    precomputed norms etc. without a re-join). Deterministic: init = the k
    smallest vec_ids; argmin ties break to the lowest cluster index.

    Driver traffic per iteration is exactly the k x dim centroid matrix —
    the canonical Lloyd's structure; everything else is one distributed
    assign pass + one partial-aggregated centroid update.
    """
    # persisted across the assign/update iterations AND the caller's final
    # action over the returned assignments; released via release_caches()
    vectors = scoped_persist(vectors)
    centroids = [
        list(row.v)
        for row in vectors.where(F.col("vec_id") < k).orderBy("vec_id").collect()
    ]

    assigned = None
    for _ in range(iterations):
        dists = F.array(*[_sq_dist(F.col("v"), c) for c in centroids])
        assigned = vectors.withColumn(
            "cluster",
            (F.array_position(dists, F.array_min(dists)) - 1).cast("int"),
        ).withColumn("sq_dist", F.array_min(dists))
        per_dim = (
            assigned.select("cluster", F.posexplode("v").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.avg("val").alias("mean"))
        )
        rows = (
            per_dim.groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "mean"))),
                    lambda s: s["mean"],
                ).alias("c")
            )
            .collect()  # k tiny rows — the only driver traffic
        )
        new_centroids = list(centroids)
        for row in rows:
            new_centroids[row.cluster] = list(row.c)
        centroids = new_centroids

    return assigned, centroids


def kmeans_assign(
    vectors: DataFrame, k: int = 8, iterations: int = 5
) -> DataFrame:
    """Lloyd's k-means: returns (vec_id, cluster, sq_dist)."""
    assigned, _ = kmeans_fit(vectors.select("vec_id", "v"), k, iterations)
    return assigned.select(
        "vec_id", "cluster", F.round("sq_dist", 4).alias("sq_dist")
    )


@query("similarity_kmeans")  # iterative algorithm — rows-only check
def similarity_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    parallelism = spark.sparkContext.defaultParallelism
    vectors = emb.repartition(parallelism, "vec_id").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    return kmeans_assign(vectors, k=8, iterations=5)


PQ_SUBSPACES = 4
PQ_CODEBOOK_K = 16


@query("embeddings_pq_codes")  # iterative per-subspace k-means — rows-only
def embeddings_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization: learn a ``PQ_CODEBOOK_K``-entry codebook per
    vector SUBSPACE (the embedding split into ``PQ_SUBSPACES`` contiguous
    slices) and encode every vector as one small code per subspace, plus
    its total squared reconstruction error.

    PQ is the storage/recall workhorse of billion-vector ANN (the "PQ" in
    IVF-PQ): 64 floats (256 bytes) compress to 4 one-byte codes, and
    asymmetric distances against a query need only M table lookups per
    vector. The coarse IVF quantizer (``similarity_ivf_topk``) prunes
    which vectors to scan; PQ shrinks what each scanned vector costs.

    Scale: each subspace's fit is the same Lloyd's loop as
    ``similarity_kmeans`` — per iteration one distributed assign pass and
    one partial-aggregated centroid update, with only the k x (dim/M)
    centroid matrix crossing the driver. Encoding is a final assign pass
    per subspace; the M per-subspace code frames equi-join back on
    vec_id (narrow rows). Deterministic init (k lowest vec_ids per
    subspace) keeps the codes bit-stable for the driver's rows-only
    check.
    """
    emb = read_table(spark, sf_dir, "embeddings")
    parallelism = spark.sparkContext.defaultParallelism
    first = emb.select(F.size("embedding").alias("d")).first()
    if first is None:
        return spark.createDataFrame(
            [], "vec_id long, codes array<int>, recon_sq_err double"
        )
    dim = first.d
    sub_dim = dim // PQ_SUBSPACES
    base = scoped_persist(
        emb.repartition(parallelism, "vec_id").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("full_v")
        )
    )

    out = None
    for m in range(PQ_SUBSPACES):
        start = m * sub_dim + 1  # slice() is 1-based
        length = sub_dim if m < PQ_SUBSPACES - 1 else dim - m * sub_dim
        sub = base.select(
            "vec_id", F.slice("full_v", start, length).alias("v")
        )
        assigned, _ = kmeans_fit(sub, k=PQ_CODEBOOK_K, iterations=3)
        codes_m = assigned.select(
            "vec_id",
            F.col("cluster").alias(f"code_{m}"),
            F.col("sq_dist").alias(f"err_{m}"),
        )
        out = codes_m if out is None else out.join(codes_m, "vec_id")

    return out.select(
        "vec_id",
        F.array(*[F.col(f"code_{m}") for m in range(PQ_SUBSPACES)]).alias(
            "codes"
        ),
        F.round(
            sum(F.col(f"err_{m}") for m in range(PQ_SUBSPACES)), 4
        ).alias("recon_sq_err"),
    )

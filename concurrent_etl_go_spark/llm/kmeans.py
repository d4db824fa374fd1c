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

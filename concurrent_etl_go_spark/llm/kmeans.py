"""Deterministic k-means over the embeddings table — the engine's iterative-
algorithm pattern.

Each iteration is one distributed pass (assign via argmin over k distance
expressions, recompute centroids via per-dimension sums); only the k x dim
centroid matrix crosses the driver boundary between iterations (exactly how
MLlib structures Lloyd's algorithm). Initialization is deterministic (the k
lowest vec_ids), so results are bit-stable across runs — required for the
driver's rows-only determinism check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.sources.readers import read_table

DIM = 64


def _sq_dist(v, centroid: list[float]):
    lit = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(v, lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def kmeans_assign(
    vectors: DataFrame, k: int = 8, iterations: int = 5
) -> DataFrame:
    """Lloyd's k-means: returns (vec_id, cluster, sq_dist).

    ``vectors`` needs columns (vec_id, v: array<double>). Deterministic:
    init = vectors with the k smallest vec_ids; argmin ties break to the
    lowest cluster index.
    """
    vectors = vectors.select("vec_id", "v").persist()
    centroids = [
        row.v
        for row in vectors.where(F.col("vec_id") < k).orderBy("vec_id").collect()
    ]

    assigned = None
    for _ in range(iterations):
        dists = F.array(*[_sq_dist(F.col("v"), c) for c in centroids])
        assigned = vectors.select(
            "vec_id",
            "v",
            (F.array_position(dists, F.array_min(dists)) - 1)
            .cast("int")
            .alias("cluster"),
            F.array_min(dists).alias("sq_dist"),
        )
        sums = assigned.groupBy("cluster").agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(F.element_at("v", i + 1)).alias(f"s{i}")
                for i in range(DIM)
            ],
        )
        new_centroids = list(centroids)
        for row in sums.collect():  # k tiny rows — the only driver traffic
            new_centroids[row.cluster] = [
                row[f"s{i}"] / row.n for i in range(DIM)
            ]
        centroids = new_centroids

    result = assigned.select(
        "vec_id", "cluster", F.round("sq_dist", 4).alias("sq_dist")
    )
    vectors.unpersist()
    return result


@query("similarity_kmeans")  # iterative algorithm — rows-only check
def similarity_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    parallelism = spark.sparkContext.defaultParallelism
    vectors = emb.repartition(parallelism, "vec_id").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    return kmeans_assign(vectors, k=8, iterations=5)

"""Similarity search over the ``embeddings`` table (array<float> column).

Brute-force cosine top-k is the exact baseline (oracle-checked); the
IVF-style variant is the scale path: a coarse quantizer (here the label
column standing in for cluster assignment) prunes the candidate set so the
scan touches only probed partitions. Dot products run through
``zip_with``/``aggregate`` — JVM-side, no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.sources.readers import read_table


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<double> columns (sequential fold — matches
    the oracle's summation order bit-for-bit)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectors as array<double> + precomputed self-norm, spread across
    cores (the embeddings table is often one parquet split). Precomputing
    ``norm`` once per vector keeps pairwise cosine to a single dot product
    per pair instead of three."""
    emb = read_table(spark, sf_dir, "embeddings")
    parallelism = spark.sparkContext.defaultParallelism
    base = emb.repartition(parallelism, "vec_id").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    return base.withColumn("norm", F.sqrt(dot(F.col("v"), F.col("v"))))


def brute_force_topk(
    vectors: DataFrame, query_vec: DataFrame, k: int
) -> DataFrame:
    """Exact top-k by cosine: broadcast the single query row (qv + qnorm)
    against the vector table; one dot product per row against precomputed
    norms; deterministic tie-break. At scale this is one scan + a
    TakeOrdered(k) — no shuffle of the vectors themselves."""
    joined = vectors.crossJoin(F.broadcast(query_vec))
    scored = joined.select(
        "vec_id",
        F.round(
            dot(F.col("v"), F.col("qv")) / (F.col("norm") * F.col("qnorm")), 4
        ).alias("sim"),
    )
    return scored.orderBy(F.col("sim").desc(), F.col("vec_id")).limit(k)


@query(
    "similarity_topk",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
    SELECT e.vec_id,
           ROUND(list_dot_product(e.v, q.qv)
               / (sqrt(list_dot_product(e.v, e.v))
                  * sqrt(list_dot_product(q.qv, q.qv))), 4) AS sim
    FROM e, q WHERE e.vec_id <> 0
    ORDER BY sim DESC, e.vec_id LIMIT 10
    """,
)
def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    vectors = _vectors(spark, sf_dir)
    qv = vectors.where(F.col("vec_id") == 0).select(
        F.col("v").alias("qv"), F.col("norm").alias("qnorm")
    )
    return brute_force_topk(vectors.where(F.col("vec_id") != 0), qv, k=10)


@query(
    "similarity_pairs",
    oracle="""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(a.v, b.v), 4) AS sim
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.v, b.v) >= 0.3
    """,
)
def similarity_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: label-blocked (the coarse-cluster key) so
    the pair space is per-bucket; one dot product per pair against the
    precomputed norms (persisted so the self-join computes vectors once)."""
    vectors = _vectors(spark, sf_dir).persist()
    a, b = vectors.alias("a"), vectors.alias("b")
    pairs = a.join(
        b,
        (F.col("a.label") == F.col("b.label"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("id_a"),
        F.col("b.vec_id").alias("id_b"),
        (
            dot(F.col("a.v"), F.col("b.v"))
            / (F.col("a.norm") * F.col("b.norm"))
        ).alias("s"),
    )
    return pairs.where(F.col("s") >= 0.3).select(
        "id_a", "id_b", F.round("s", 4).alias("sim")
    )


@query("similarity_ivf_topk")  # pruned search — result ≈ exact, rows-only
def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: centroids per label (the coarse quantizer), rank
    labels by query-centroid cosine, probe the top 3 partitions, exact
    search inside them. At 100 TB the probed fraction bounds the scan."""
    vectors = _vectors(spark, sf_dir)
    qv = vectors.where(F.col("vec_id") == 0).select(
        F.col("v").alias("qv"), F.col("norm").alias("qnorm")
    )

    # centroid per label: element-wise mean via explode + posexplode-free agg
    dim = 64
    sums = vectors.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(F.element_at("v", i + 1)).alias(f"s{i}")
            for i in range(dim)
        ],
    )
    centroids = sums.select(
        "label",
        F.array(*[F.col(f"s{i}") / F.col("n") for i in range(dim)]).alias("c"),
    )
    probed = (
        centroids.crossJoin(F.broadcast(qv))
        .select("label", cosine(F.col("c"), F.col("qv")).alias("csim"))
        .orderBy(F.col("csim").desc(), F.col("label"))
        .limit(3)
        .select("label")
    )
    candidates = vectors.join(F.broadcast(probed), "label").where(
        F.col("vec_id") != 0
    )
    return brute_force_topk(candidates, qv, k=10)

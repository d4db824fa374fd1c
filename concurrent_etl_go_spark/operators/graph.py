"""Iterative graph analytics: PageRank over the document near-dup graph.

Third iterative-algorithm shape in the engine (after Lloyd's k-means,
``llm/kmeans.py``, and pointer-jumping connected components,
``llm/dedup.py``): a fixed-iteration damped PageRank whose per-round
plan is one join + one aggregation, with ``localCheckpoint`` truncating
lineage each round — the same discipline the other loops use, and the
reason the driver never holds more than a per-round plan. Only scalar
convergence telemetry crosses the driver.

Reference parity: generalizes the reference's iterate-until-drained
worker loop (etl/main.go:240-262) to data-dependent fixpoint iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import (
    query,
    release_df,
    track_cache,
)
from concurrent_etl_go_spark.sources.readers import read_table


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 8,
) -> DataFrame:
    """Damped PageRank on an UNDIRECTED edge list ``(src, dst)``.

    Undirected graphs have no dangling nodes (every node's rank flows
    somewhere), so the rank mass is conserved at exactly ``n`` — the
    invariant the tests assert. Each round shuffles only (node, rank)
    pairs keyed by node; degrees are computed once. Scale: identical
    join/agg shape to connected components — linear per round, O(rounds)
    total, no driver materialization.
    """
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).persist()
    track_cache(deg)

    ranks = deg.select(F.col("src").alias("id"), F.lit(1.0).alias("rank"))
    storage = None
    for _ in range(iterations):
        contrib = (
            sym.join(deg, "src")
            .join(ranks, sym["src"] == ranks["id"])
            .select(
                F.col("dst").alias("id"),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("inflow"))
        )
        new_ranks = contrib.select(
            "id",
            (F.lit(1.0 - damping) + F.lit(damping) * F.col("inflow")).alias(
                "rank"
            ),
        ).localCheckpoint(eager=True)
        if storage is not None:
            release_df(storage)
        storage = new_ranks
        ranks = new_ranks
    if storage is not None:
        track_cache(storage)
    # rounded for display; rank mass (pre-round) sums to n_nodes
    return ranks.select("id", F.round("rank", 4).alias("rank"))


@query("graph_pagerank")  # iterative algorithm — rows-only check
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the MinHash-LSH near-dup graph: which
    documents sit in the middle of large duplicate clusters — a ranking
    signal a curation pipeline can use to pick cluster survivors by
    connectivity instead of min-id."""
    from concurrent_etl_go_spark.llm.dedup import minhash_lsh_pairs

    docs = read_table(spark, sf_dir, "documents")
    edges = minhash_lsh_pairs(docs, threshold=0.5).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    return pagerank(edges)


def bfs_hops(edges: DataFrame, source: int, max_hops: int = 6) -> DataFrame:
    """Bounded-hop BFS from ``source`` over an UNDIRECTED edge list
    ``(src, dst)`` — ``(id, dist)`` for every node within ``max_hops``.

    Frontier-propagation form: each round expands only the nodes first
    reached LAST round (one equi-join keyed by node + one anti-join
    against the settled set), so a node enters the result exactly once,
    with its minimal hop count — the textbook distributed BFS.  Per
    round the shuffle is O(frontier x avg-degree), not O(nodes): on a
    100 TB graph the early rounds move tiny frontiers and the loop never
    re-touches settled nodes, unlike a min-fold over the full distance
    table.  ``localCheckpoint`` truncates lineage per round (the
    PageRank/components discipline); the loop stops early when a round
    adds nothing, so ``max_hops`` is a ceiling, not a fixed cost.
    """
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    spark = edges.sparkSession
    dist = spark.createDataFrame([(source, 0)], "id long, dist long")
    frontier = dist
    for k in range(1, max_hops + 1):
        newf = (
            frontier.join(sym, frontier["id"] == sym["src"])
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(dist, "id", "left_anti")
            .select("id", F.lit(k).cast("long").alias("dist"))
            .localCheckpoint(eager=True)
        )
        track_cache(newf)
        if newf.isEmpty():
            break
        dist = dist.unionByName(newf)
        frontier = newf
    return dist


def kcore_peel(
    edges: DataFrame, min_degree: int = 2, rounds: int = 4
) -> DataFrame:
    """Fixed-round k-core peel over an UNDIRECTED edge list ``(src, dst)``
    — ``(id, degree)`` for nodes surviving ``rounds`` removals of
    degree-below-threshold nodes.

    Fixed rounds (not a fixpoint loop) so an unrolled SQL oracle can
    state the identical computation; when the peel converges within the
    budget the result IS the k-core (pytest-pinned).  Per round: one
    degree hash-agg + two semi-joins on the node key — linear in the
    surviving edges — with ``localCheckpoint`` truncating lineage (the
    PageRank/BFS loop discipline).
    """
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    cur = sym
    for _ in range(rounds):
        keep = (
            cur.groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
            .where(F.col("deg") >= min_degree)
            .select(F.col("src").alias("id"))
        )
        cur = (
            cur.join(keep, cur["src"] == keep["id"], "left_semi")
            .join(keep, cur["dst"] == keep["id"], "left_semi")
            .localCheckpoint(eager=True)
        )
        track_cache(cur)
    return cur.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("degree")
    )

"""Oracle-provable graph analytics over the customer co-purchase graph.

The engine's iterative graph algorithms (``llm/dedup.py`` connected
components, ``operators/graph.py`` PageRank) run over the MinHash-LSH
near-dup graph — whose EDGES depend on engine-specific hash functions,
so those registry entries are necessarily rows-only.  This module pins
the same algorithms to an edge list BOTH engines can derive exactly from
the shared tables: customers are connected when they bought the same
part in the same ISO week (Monday-truncated, the ``agg_retention_cohort``
convention).  That graph is real (sf0.01: 1,417 nodes, 2,666 edges, a
1,404-node giant component plus six small ones) and every derivation
step — distinct (part, week, customer) triples, within-group pairing,
min-label closure, damped rank iteration, triangle join — is plain
relational algebra, so the driver's value hash proves the ITERATIVE
ALGORITHMS themselves, not just their plumbing.

Scale notes: pair generation is bounded by the (part, week) group size
(max 5 at sf0.1; both sides cap groups at ``_GROUP_CAP`` so one viral
part can never go quadratic at 100 TB).  Spark-side components use the
pointer-jumping min-label loop (O(log diameter) rounds); the oracle's
recursive-CTE closure is O(component²) rows and exists only as the
bounded correctness twin at driver scale.

Reference parity: the reference engine (etl/main.go) has no graph
surface; this extends SURVEY.md §2.B alongside ``graph_pagerank``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query, scoped_persist
from concurrent_etl_go_spark.sources.readers import read_table

#: Drop (part, week) groups larger than this before pairing — the skew
#: guard that keeps edge generation linear when one part goes viral.
#: Far above the observed max (5 at sf0.1), so results are unaffected
#: on the shared tables; both engine and oracle apply it identically.
_GROUP_CAP = 100

#: PageRank constants — must match ``operators/graph.py::pagerank``
#: defaults AND the unrolled oracle below.
_DAMPING = 0.85
_ITERATIONS = 8

_EDGE_SQL = f"""
    pc AS (
        SELECT DISTINCT l.l_partkey AS pk,
               date_trunc('week', o.o_orderdate) AS wk,
               o.o_custkey AS ck
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    pc_ok AS (
        SELECT pk, wk, ck FROM pc
        QUALIFY COUNT(*) OVER (PARTITION BY pk, wk) <= {_GROUP_CAP}
    ),
    edges AS (
        SELECT DISTINCT a.ck AS src, b.ck AS dst
        FROM pc_ok a
        JOIN pc_ok b ON a.pk = b.pk AND a.wk = b.wk AND a.ck < b.ck
    )
"""


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (src < dst) customer pairs that bought the same part in
    the same week.  One equi-join on the (part, week) block key; group
    sizes are capped, so the pair fan-out is linear in the input.

    PERSISTED (scoped): every consumer reuses the edge list several
    times — the triangle query aliases it three ways, the PageRank loop
    reads it every iteration, components reads it twice for the
    symmetric union.  Without the persist each reuse re-derives the
    whole join+window+distinct subtree from the parquet scans (the
    audit showed 36 scans / 55 shuffles for triangles)."""
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    pc = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.col("l_partkey").alias("pk"),
            F.date_trunc("week", F.col("o_orderdate")).alias("wk"),
            F.col("o_custkey").alias("ck"),
        )
        .distinct()
    )
    from pyspark.sql import Window

    pc_ok = (
        pc.withColumn(
            "n", F.count(F.lit(1)).over(Window.partitionBy("pk", "wk"))
        )
        .where(F.col("n") <= _GROUP_CAP)
        .drop("n")
    )
    a, b = pc_ok.alias("a"), pc_ok.alias("b")
    return scoped_persist(
        a.join(
            b,
            (F.col("a.pk") == F.col("b.pk"))
            & (F.col("a.wk") == F.col("b.wk"))
            & (F.col("a.ck") < F.col("b.ck")),
        )
        .select(F.col("a.ck").alias("src"), F.col("b.ck").alias("dst"))
        .distinct()
    )


@query(
    "graph_components_copurchase",
    oracle=f"""
    WITH RECURSIVE {_EDGE_SQL},
    sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
    nodes AS (SELECT DISTINCT src AS id FROM sym),
    reach(node, lbl) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT s.dst, r.lbl FROM reach r JOIN sym s ON s.src = r.node
    )
    SELECT node AS id, MIN(lbl) AS component
    FROM reach GROUP BY node
    """,
)
def graph_components_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the co-purchase graph — the driver-hash-
    provable twin of ``dedup_components``' iterative min-label loop
    (``llm/dedup.py::connected_components``, pointer-jumping, fixpoint-
    checked).  The oracle's recursive closure is the bounded correctness
    form; the engine's loop is the 100 TB path."""
    from concurrent_etl_go_spark.llm.dedup import connected_components

    edges = _copurchase_edges(spark, sf_dir)
    return connected_components(edges.select("src", "dst")).select(
        "id", "component"
    )


def _pagerank_oracle() -> str:
    """Unrolled fixed-iteration PageRank as a plain CTE chain (recursive
    CTEs cannot aggregate over their own reference).  Iteration k reads
    only r{{k-1}}, exactly mirroring ``operators/graph.py::pagerank``:
    init 1.0 per node, update (1-d) + d * sum(rank/deg over in-edges)."""
    steps = [
        "r0 AS (SELECT id, 1.0 AS rank FROM deg)",
    ]
    for k in range(1, _ITERATIONS + 1):
        steps.append(
            f"""r{k} AS (
        SELECT s.dst AS id,
               {1 - _DAMPING} + {_DAMPING} * SUM(r.rank / d.n_deg) AS rank
        FROM sym s JOIN deg d ON s.src = d.id JOIN r{k - 1} r ON s.src = r.id
        GROUP BY s.dst
    )"""
        )
    chain = ",\n    ".join(steps)
    return f"""
    WITH {_EDGE_SQL},
    sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
    deg AS (SELECT src AS id, COUNT(*) AS n_deg FROM sym GROUP BY src),
    {chain}
    SELECT id, ROUND(rank, 4) + 0.0 AS rank FROM r{_ITERATIONS}
    """


@query("graph_pagerank_copurchase", oracle=_pagerank_oracle())
def graph_pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damped PageRank over the co-purchase graph — the driver-hash-
    provable twin of ``graph_pagerank``'s iterative loop (same
    ``operators/graph.py::pagerank`` code, 8 rounds, d=0.85).  Proves the
    join-per-round update rule numerically against an independent
    unrolled-SQL evaluation; ROUND(4) absorbs cross-engine summation-
    order jitter, ``+ 0.0`` canonicalizes signed zero (ranks are
    >= 0.15, but the idiom is uniform — see ``scalar_float_canary``)."""
    from concurrent_etl_go_spark.operators.graph import pagerank

    edges = _copurchase_edges(spark, sf_dir)
    ranked = pagerank(edges, damping=_DAMPING, iterations=_ITERATIONS)
    return ranked.select("id", (F.col("rank") + F.lit(0.0)).alias("rank"))


@query(
    "graph_triangles_copurchase",
    oracle=f"""
    WITH {_EDGE_SQL},
    tri AS (
        SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
        FROM edges e1
        JOIN edges e2 ON e2.src = e1.dst
        JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
    ),
    member AS (
        SELECT a AS id FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
    )
    SELECT id, COUNT(*) AS n_triangles
    FROM member GROUP BY id
    """,
)
def graph_triangles_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer triangle participation counts over the co-purchase
    graph — the clustering-coefficient numerator, and the classic
    distributed-join graph kernel: with edges oriented src < dst, each
    triangle (a < b < c) is found exactly once by the path join
    (a,b)+(b,c) closed by (a,c).  Two equi-join shuffles on node keys;
    fan-out bounded by the oriented degree (further bounded upstream by
    the group cap).  Only nodes in >= 1 triangle appear."""
    e = _copurchase_edges(spark, sf_dir)
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.src") == F.col("e1.dst"))
        .join(
            e3,
            (F.col("e3.src") == F.col("e1.src"))
            & (F.col("e3.dst") == F.col("e2.dst")),
        )
        .select(
            F.col("e1.src").alias("a"),
            F.col("e1.dst").alias("b"),
            F.col("e2.dst").alias("c"),
        )
    )
    member = (
        tri.select(F.col("a").alias("id"))
        .unionAll(tri.select(F.col("b").alias("id")))
        .unionAll(tri.select(F.col("c").alias("id")))
    )
    return member.groupBy("id").agg(F.count(F.lit(1)).alias("n_triangles"))


@query(
    "graph_degree_distribution",
    oracle=f"""
    WITH {_EDGE_SQL},
    deg AS (
        SELECT src AS node, COUNT(*) AS degree FROM edges GROUP BY 1
    )
    SELECT CAST(length(format('{{:b}}', degree)) - 1 AS BIGINT)
             AS log2_bucket,
           COUNT(*) AS n_nodes,
           MIN(degree) AS min_degree,
           MAX(degree) AS max_degree
    FROM deg
    GROUP BY 1
    """,
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the co-purchase graph in power-of-two
    buckets — the first profile a graph-pipeline owner reads before
    choosing partitioning (heavy-tailed degrees are why the pairing
    stage carries its group cap, and why PageRank shuffles by src).
    The edge list is symmetric, so out-degree over ``src`` covers every
    node.

    Scale: edges derive with the same capped pairing as the other
    co-purchase queries; degree is one hash agg on the node key and the
    histogram a second tiny agg — the ``agg_log2_histogram`` bucketing
    applied to graph structure.
    """
    e = _copurchase_edges(spark, sf_dir)
    deg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    # Exact INTEGER bucketing: bit_length(degree) - 1, via the binary
    # string form on both engines.  floor(ln(d)/ln 2) is a latent
    # cross-engine flake for integer degrees — exact powers of two land
    # exactly on bucket boundaries, where a 1-ulp libm difference
    # between JVM Math.log and DuckDB's libm flips the floor (unlike
    # agg_log2_histogram's continuous prices, power-of-two degrees are
    # common).  length(bin(d)) - 1 is pure integer arithmetic.
    return deg.groupBy(
        (F.length(F.bin(F.col("degree"))) - 1)
        .cast("long")
        .alias("log2_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.min("degree").alias("min_degree"),
        F.max("degree").alias("max_degree"),
    )


#: BFS hop ceiling — matches the unrolled oracle below.
_BFS_HOPS = 6


def _bfs_oracle() -> str:
    """Unrolled bounded-hop BFS as a plain CTE chain (the PageRank
    technique: fixed-iteration loops become provable by unrolling).
    Round k min-folds the previous distance table with its one-hop
    expansion — mathematically identical to the engine's
    frontier-propagation loop (a node's first reach IS its minimal
    hop), stated in the fold form SQL can express without recursion."""
    steps = [
        "d0 AS (SELECT MIN(src) AS id, 0 AS dist FROM sym)",
    ]
    for k in range(1, _BFS_HOPS + 1):
        steps.append(
            f"""d{k} AS (
        SELECT id, MIN(dist) AS dist FROM (
            SELECT id, dist FROM d{k - 1}
            UNION ALL
            SELECT s.dst AS id, d.dist + 1 AS dist
            FROM sym s JOIN d{k - 1} d ON s.src = d.id
        ) GROUP BY id
    )"""
        )
    chain = ",\n    ".join(steps)
    return f"""
    WITH {_EDGE_SQL},
    sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
    {chain}
    SELECT id, CAST(dist AS BIGINT) AS dist FROM d{_BFS_HOPS}
    """


@query("graph_bfs_hops", oracle=_bfs_oracle())
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-hop BFS (single-source shortest hop counts) from the
    smallest customer in the co-purchase graph — the fourth hash-proven
    iterative kernel (after components, PageRank, triangles), and the
    reachability primitive under "within N hops of X" audience queries.

    The engine runs ``operators/graph.py::bfs_hops`` — frontier
    propagation, one join + one anti-join per round, O(frontier x
    degree) not O(nodes) per round, early exit on an empty frontier.
    The oracle evaluates the same recurrence as an unrolled min-fold
    chain; pure integer ids and hop counts, so the driver hash is
    bit-exact with no float discipline needed.  Source choice (MIN of
    the edge list's src — the smallest connected customer, src < dst
    orientation makes it the global min node) is derived identically
    by both engines, never hard-coded to a data value."""
    from concurrent_etl_go_spark.operators.graph import bfs_hops

    edges = _copurchase_edges(spark, sf_dir)
    source = edges.agg(F.min("src")).first()[0]
    return bfs_hops(edges.select("src", "dst"), source, _BFS_HOPS)

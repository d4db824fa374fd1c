"""Round-8 relational surface: recursive-hierarchy rollup and
TABLESAMPLE-style deterministic block sampling.

Two shapes the registry lacked:

* ``agg_hierarchy_rollup`` — the org-chart / bill-of-materials shape: a
  SELF-REFERENCING dimension (each supplier points at a parent supplier)
  rolled up so every node reports its whole subtree.  The ancestor
  closure unrolls to a FIXED depth as k self-joins on the parent pointer
  (the ``graph_bfs_hops`` unrolled-CTE convention — recursion becomes
  provable by unrolling), which is also the right 100 TB plan: the
  dimension is broadcast-sized, so the closure is k broadcast joins and
  the rollup one hash-agg on the ancestor key over nodes x depth rows.
* ``sample_block_hash`` — deterministic block sampling (the
  ``TABLESAMPLE SYSTEM`` shape): the keep/drop decision hashes the
  BLOCK id, not the row, so it is reproducible across engines and runs,
  and at scale it is a map-side filter computable before any shuffle —
  aligned to a partition/bucket key it becomes partition pruning (entire
  files skipped).  Sampling by ``rand()`` can express the rate but not
  the block alignment, reproducibility, or pruning.

Reference parity: the reference engine (etl/main.go, 485 LoC) has
neither shape; both extend SURVEY.md §2.B (sampling family:
``sample_fraction`` / ``sample_stratified_hash``; hierarchy: new).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators import lib
from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.sources.readers import read_table

#: Fixed ancestor-closure depth.  Parent ids shed one decimal digit per
#: hop (see the dim derivation), so depth 6 covers any s_suppkey below
#: 10^7 — far above every test sf, and the unrolled oracle matches it
#: exactly.
_HIER_DEPTH = 6

#: The self-referencing dimension, shared verbatim by both engines:
#: parent = one decimal digit stripped (suppkey DIV 10), roots are
#: suppkeys 1..9.  A real org chart carries an explicit parent COLUMN;
#: deriving it by a portable rule keeps the closure/rollup algebra —
#: the part under test — identical while letting both engines build
#: the same table without a fixture.  Balances land as exact integer
#: cents (the ``lib.exact_money_sum`` signed-rounding discipline, per
#: row: negative balances round half-away-from-zero in both engines).
_DIM_SQL = """
    dim AS (
      SELECT CAST(s_suppkey AS BIGINT) AS id,
             CASE WHEN s_suppkey >= 10
                  THEN CAST(s_suppkey // 10 AS BIGINT) END AS parent,
             CAST(ROUND(s_acctbal * 100) AS BIGINT) AS units
      FROM supplier
    )
"""


def _hier_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = read_table(spark, sf_dir, "supplier")
    return sup.select(
        F.col("s_suppkey").cast("long").alias("id"),
        F.when(
            F.col("s_suppkey") >= 10,
            F.expr("s_suppkey div 10").cast("long"),
        ).alias("parent"),
        # signed half-add, the lib.exact_money_sum per-row idiom:
        # codegen-fast, equals ROUND for exact 2-decimal balances of
        # either sign
        (
            F.col("s_acctbal") * F.lit(100.0)
            + F.signum("s_acctbal") * F.lit(0.5)
        )
        .cast("long")
        .alias("units"),
    )


def _hier_oracle() -> str:
    steps = ["a0 AS (SELECT id, id AS anc FROM dim)"]
    for k in range(1, _HIER_DEPTH + 1):
        steps.append(
            f"""a{k} AS (
      SELECT a.id, d.parent AS anc
      FROM a{k - 1} a JOIN dim d ON a.anc = d.id
      WHERE d.parent IS NOT NULL
    )"""
        )
    chain = ",\n    ".join(steps)
    union = "\n      UNION ALL ".join(
        f"SELECT id, anc FROM a{k}" for k in range(_HIER_DEPTH + 1)
    )
    return f"""
    WITH {_DIM_SQL},
    {chain},
    closure AS (
      {union}
    )
    SELECT c.anc AS node_id,
           CAST(COUNT(*) AS BIGINT) AS n_subtree,
           CAST(SUM(d.units) AS BIGINT) AS subtree_units,
           CAST(SUM(d.units) AS DOUBLE) / 100.0 AS subtree_balance
    FROM closure c JOIN dim d ON c.id = d.id
    GROUP BY 1
    """


@query("agg_hierarchy_rollup", oracle=_hier_oracle())
def agg_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subtree rollup over a self-referencing dimension: every node's
    descendant count and exact subtree balance — the org-chart / BOM
    aggregation.  The ancestor closure is ``_HIER_DEPTH`` unrolled
    self-joins on the parent pointer ((node, ancestor) pairs, depth 0 =
    self), then ONE hash-agg keyed by ancestor.

    Scale: the dimension is broadcast-sized by definition of the shape
    (hierarchies are organizational metadata, not facts), so each
    closure step is a broadcast join and the closure holds nodes x
    avg-depth rows; the rollup aggregates exact integer cents (signed
    half-add per row — balances CAN be negative; the final
    integer -> double division is deterministic).  If the hierarchy
    were fact-sized, the closure would shuffle on the ancestor key —
    same algebra, hash-partitioned; depth stays the bound either way.
    """
    dim = _hier_dim(spark, sf_dir)
    closure = dim.select("id", F.col("id").alias("anc"))
    cur = closure
    for _ in range(_HIER_DEPTH):
        p = dim.select(
            F.col("id").alias("anc_id"), F.col("parent").alias("anc_parent")
        )
        cur = (
            cur.join(F.broadcast(p), cur["anc"] == p["anc_id"])
            .where(F.col("anc_parent").isNotNull())
            .select("id", F.col("anc_parent").alias("anc"))
        )
        closure = closure.unionByName(cur)
    return (
        closure.join(
            F.broadcast(dim.select("id", "units")), "id"
        )
        .groupBy(F.col("anc").alias("node_id"))
        .agg(
            F.count(F.lit(1)).alias("n_subtree"),
            F.sum("units").alias("subtree_units"),
            (F.sum("units").cast("double") / F.lit(100.0)).alias(
                "subtree_balance"
            ),
        )
    )


#: Block geometry and sampling rate for ``sample_block_hash``: orders
#: group into blocks of 32 consecutive orderkeys; a block survives when
#: the portable md5 bucket of its id lands in bucket 0 of
#: ``_SAMPLE_MOD`` (expected rate 1/8).
_BLOCK_KEYS = 32
_SAMPLE_MOD = 8


@query(
    "sample_block_hash",
    oracle=f"""
    WITH blk AS (
      SELECT CAST(o_orderkey // {_BLOCK_KEYS} AS BIGINT) AS block_id,
             o_totalprice
      FROM orders
    )
    SELECT block_id,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {lib.exact_money_sum_sql("o_totalprice")} AS revenue
    FROM blk
    WHERE (('0x' || substr(md5(CAST(block_id AS VARCHAR)), 1, 4))::BIGINT
           % {_SAMPLE_MOD}) = 0
    GROUP BY 1
    """,
)
def sample_block_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TABLESAMPLE-SYSTEM-style deterministic block sample: keep whole
    blocks of ``_BLOCK_KEYS`` consecutive orderkeys when the portable
    md5 bucket of the block id is 0 (rate 1/``_SAMPLE_MOD``), then
    aggregate each surviving block.  Reproducible across engines, runs,
    and row order — the property ``rand()``-based sampling lacks, and
    the reason block sampling composes with audits (the same blocks
    come back every time).

    Scale: the keep decision is a per-row expression on the derived
    block id — a map-side filter evaluated at the scan, BEFORE any
    shuffle; only surviving rows reach the (block_id) hash-agg.
    Aligned to the table's physical layout (orderkey-sorted files, or a
    bucket/partition column), the same predicate skips entire files —
    ``layout_zorder`` measures exactly that effect for range
    predicates.  The md5 bucket is ``llm/datasets.py::hash_bucket``'s
    portable idiom (Spark conv(substring(md5,1,4),16,10) ==
    DuckDB ('0x'||substr(md5,1,4))::BIGINT, bit-for-bit)."""
    from concurrent_etl_go_spark.llm.datasets import hash_bucket

    orders = read_table(spark, sf_dir, "orders")
    blk = orders.select(
        F.expr(f"o_orderkey div {_BLOCK_KEYS}").cast("long").alias(
            "block_id"
        ),
        "o_totalprice",
    )
    return (
        blk.where(hash_bucket("block_id", _SAMPLE_MOD) == 0)
        .groupBy("block_id")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            lib.exact_money_sum(F.col("o_totalprice")).alias("revenue"),
        )
    )

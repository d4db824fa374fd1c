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
from concurrent_etl_go_spark.operators.registry import query, scoped_persist
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
    """PERSISTED (scoped): the closure loop joins the dim once per
    depth step plus the measure join-back — 8 reads of the same tiny
    frame (the audit showed 29 supplier scans without the persist)."""
    sup = read_table(spark, sf_dir, "supplier")
    return scoped_persist(sup.select(
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
    ))


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


@query(
    "agg_pareto_frontier",
    oracle=f"""
    WITH perf AS MATERIALIZED (
      SELECT l_suppkey AS suppkey,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS revenue_units,
             CAST(SUM(date_diff('day', o_orderdate, l_shipdate)) * 100
                  // COUNT(*) AS BIGINT) AS delay_cdays
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1
    ),
    pts AS MATERIALIZED (
      SELECT DISTINCT revenue_units, delay_cdays FROM perf
    ),
    front AS (
      SELECT revenue_units, delay_cdays,
             MIN(delay_cdays) OVER (
               ORDER BY revenue_units DESC, delay_cdays
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS best_prev
      FROM pts
    )
    SELECT p.suppkey, p.revenue_units, p.delay_cdays
    FROM perf p
    JOIN front f ON f.revenue_units = p.revenue_units
               AND f.delay_cdays = p.delay_cdays
    WHERE f.best_prev IS NULL OR f.delay_cdays < f.best_prev
    """,
)
def agg_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto-frontier) query over per-supplier performance:
    suppliers not dominated on (revenue: higher better, average ship
    delay: lower better) — the multi-criteria shortlist shape
    (Börzsönyi et al. 2001, public literature).  Both metrics are exact
    integers (revenue cents; delay in floor-divided centi-days), so
    dominance decisions cannot flip on float representation.

    Dominance is decided on DISTINCT metric POINTS: ordered by
    (revenue DESC, delay ASC), a point is dominated exactly when some
    previous point has delay <= its own (previous means strictly more
    revenue, or equal revenue with strictly less delay — either way
    dominated by definition since points are distinct), so the frontier
    is one running-min window over the point set.  Suppliers join back
    by their point, so ties in BOTH metrics all surface.

    Scale: the per-supplier agg is an order-key co-partitioned
    fact-to-fact join + one supplier-keyed hash agg; the window runs
    over DISTINCT POINTS — bounded by |suppliers|, dimension-sized
    (the ``agg_revenue_lorenz`` argument).  A frontier over fact-sized
    points uses the two-pass range-partition + per-partition running
    min + broadcast partition offsets form of
    ``operators/quantiles.py`` — same algebra, no global funnel."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    perf = scoped_persist(
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(
            F.sum(
                (
                    F.col("l_extendedprice") * F.lit(100.0)
                    + F.signum("l_extendedprice") * F.lit(0.5)
                ).cast("long")
            ).alias("revenue_units"),
            F.expr(
                "sum(datediff(l_shipdate, o_orderdate)) * 100"
                " div count(*)"
            ).alias("delay_cdays"),
        )
    )
    pts = perf.select("revenue_units", "delay_cdays").distinct()
    from pyspark.sql import Window

    w = (
        Window.orderBy(F.desc("revenue_units"), "delay_cdays")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    front = pts.select(
        "revenue_units",
        "delay_cdays",
        F.min("delay_cdays").over(w).alias("best_prev"),
    ).where(
        F.col("best_prev").isNull()
        | (F.col("delay_cdays") < F.col("best_prev"))
    )
    return perf.join(
        front.select("revenue_units", "delay_cdays"),
        ["revenue_units", "delay_cdays"],
    ).select("suppkey", "revenue_units", "delay_cdays")


def _bom_oracle() -> str:
    """Unrolled multiplicative path closure: step k extends every
    (anc, node) path by one child edge, multiplying the edge quantity
    into the path's effective quantity."""
    steps = [
        "b0 AS (SELECT id AS anc, id AS node, 0 AS depth, "
        "CAST(1 AS BIGINT) AS eff_qty FROM dim)"
    ]
    for k in range(1, _HIER_DEPTH + 1):
        steps.append(
            f"""b{k} AS (
      SELECT b.anc, d.id AS node, {k} AS depth,
             CAST(b.eff_qty * d.qty AS BIGINT) AS eff_qty
      FROM b{k - 1} b JOIN dim d ON d.parent = b.node
    )"""
        )
    chain = ",\n    ".join(steps)
    union = "\n      UNION ALL ".join(
        f"SELECT anc, node, depth, eff_qty FROM b{k}"
        for k in range(_HIER_DEPTH + 1)
    )
    return f"""
    WITH {_DIM_SQL},
    dim2 AS (
      SELECT id, parent,
             CAST(1 + id % 3 AS BIGINT) AS qty FROM dim
    ),
    {chain.replace('FROM dim', 'FROM dim2').replace('JOIN dim d', 'JOIN dim2 d')},
    closure AS (
      {union}
    )
    SELECT anc AS assembly, node AS component,
           CAST(depth AS BIGINT) AS depth, eff_qty
    FROM closure
    """


@query("join_bom_explosion", oracle=_bom_oracle())
def join_bom_explosion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bill-of-materials explosion over the self-referencing supplier
    hierarchy: every (assembly, component) pair within ``_HIER_DEPTH``
    levels with the EFFECTIVE quantity — the product of per-edge
    quantities along the path (edge qty = 1 + child % 3, a portable
    integer rule standing in for a real BOM's per-edge quantity
    column).  The multiplicative twin of ``agg_hierarchy_rollup``'s
    additive closure: requirements planning asks "how many of part X
    does one unit of assembly A consume", which is exactly the path
    product, NOT a subtree sum.

    Scale: same fixed-depth unrolled closure as the rollup —
    ``_HIER_DEPTH`` broadcast self-joins extending paths one level per
    step, each step keyed on the parent pointer; path counts are nodes
    x avg-depth, and the products stay tiny integers (< 3^depth).
    Depth-0 self rows (eff_qty 1) anchor the closure on both engines.
    """
    dim = _hier_dim(spark, sf_dir).withColumn(
        "qty", (1 + F.col("id") % 3).cast("long")
    )
    closure = dim.select(
        F.col("id").alias("anc"),
        F.col("id").alias("node"),
        F.lit(0).cast("long").alias("depth"),
        F.lit(1).cast("long").alias("eff_qty"),
    )
    cur = closure
    for k in range(1, _HIER_DEPTH + 1):
        child = dim.select(
            F.col("id").alias("c_id"),
            F.col("parent").alias("c_parent"),
            F.col("qty").alias("c_qty"),
        )
        cur = (
            cur.join(F.broadcast(child), cur["node"] == child["c_parent"])
            .select(
                "anc",
                F.col("c_id").alias("node"),
                F.lit(k).cast("long").alias("depth"),
                (F.col("eff_qty") * F.col("c_qty")).alias("eff_qty"),
            )
        )
        closure = closure.unionByName(cur)
    return closure.select(
        F.col("anc").alias("assembly"),
        F.col("node").alias("component"),
        "depth",
        "eff_qty",
    )


@query(
    "profile_key_islands",
    oracle=f"""
    WITH keys AS MATERIALIZED (
      SELECT DISTINCT o_orderkey AS k FROM orders
      WHERE (('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4))::BIGINT
             % {_SAMPLE_MOD}) <> 0
    ),
    isl AS (
      SELECT k, k - row_number() OVER (ORDER BY k) AS grp FROM keys
    )
    SELECT CAST(MIN(k) AS BIGINT) AS island_start,
           CAST(MAX(k) AS BIGINT) AS island_end,
           CAST(COUNT(*) AS BIGINT) AS n_keys
    FROM isl GROUP BY grp
    """,
)
def profile_key_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-gap profile (gaps-and-islands over a key column): the
    contiguous runs of surviving order keys after a simulated purge
    (keys whose portable md5 bucket is 0 are removed — deterministically
    planted gaps, the ``dataset_dedup_cross_split`` convention, since
    the synthetic orderkeys are otherwise gap-free).  The DQ check that
    finds deleted ranges, sequence-generator skips, and failed loads:
    each output row is one unbroken island, so gaps are exactly the
    spaces between consecutive islands.

    Scale: the classic ``key − rank`` island id needs a GLOBAL rank
    over the distinct keys — a single-partition window trap at fact
    scale — so the engine attaches it with
    ``operators/quantiles._global_rank`` (range-bucket on frozen
    approx-quantile boundaries, rank within buckets, add broadcast
    bucket offsets: no global sort, no single-partition stage), then
    one hash-agg on the island id.  The oracle states the plain
    row_number form; identical islands."""
    from concurrent_etl_go_spark.llm.datasets import hash_bucket
    from concurrent_etl_go_spark.operators.quantiles import _global_rank

    keys = (
        read_table(spark, sf_dir, "orders")
        .select(F.col("o_orderkey").alias("k"))
        .where(hash_bucket("k", _SAMPLE_MOD) != 0)
        .distinct()
    )
    ranked, _ = _global_rank(keys, "k")
    return (
        ranked.groupBy((F.col("k") - F.col("rn")).alias("grp"))
        .agg(
            F.min("k").alias("island_start"),
            F.max("k").alias("island_end"),
            F.count(F.lit(1)).alias("n_keys"),
        )
        .drop("grp")
        .select("island_start", "island_end", "n_keys")
    )


@query(
    "agg_event_transitions",
    oracle="""
    WITH seq AS MATERIALIZED (
      SELECT user_id, event_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS next_type
      FROM events
    ),
    cnt AS MATERIALIZED (
      SELECT event_type AS from_type, next_type AS to_type,
             COUNT(*) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
           CAST(n * 10000 // SUM(n) OVER (PARTITION BY from_type)
                AS BIGINT) AS p_bp
    FROM cnt
    """,
)
def agg_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: for every (from_type -> to_type) pair of CONSECUTIVE
    events of one user, the transition count and the row-normalized
    probability in integer basis points (floor division — float-free
    across engines) — the product-analytics "what do users do next"
    operator, and the input to Markov-chain attribution.

    Scale: the successor pairing is one LEAD window partitioned BY
    USER (perfectly spread, never a global sort — the
    ``window_streak_lengths`` argument), ordered by (ts, event_id)
    so concurrent same-timestamp events cannot flip pairs between
    engines; then one hash-agg on the (from, to) pair — at most
    |event_types|^2 output rows — and a window over that
    dimension-sized matrix for the row totals."""
    ev = read_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    ).where(F.col("next_type").isNotNull())
    cnt = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).alias("n"))
    row_total = F.sum("n").over(
        Window.partitionBy("from_type")
    )
    return cnt.select(
        "from_type",
        "to_type",
        "n",
        F.expr("n * 10000").cast("long").alias("_num"),
        row_total.alias("_den"),
    ).select(
        "from_type",
        "to_type",
        "n",
        F.expr("_num div _den").alias("p_bp"),
    )


@query(
    "agg_event_paths",
    oracle="""
    WITH seq AS MATERIALIZED (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS t2,
             lead(event_type, 2) OVER w AS t3
      FROM events WHERE event_type IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    paths AS MATERIALIZED (
      SELECT event_type || '>' || t2 || '>' || t3 AS path, COUNT(*) AS n
      FROM seq WHERE t2 IS NOT NULL AND t3 IS NOT NULL
      GROUP BY 1
    )
    SELECT path, CAST(n AS BIGINT) AS n,
           CAST(n * 10000 // SUM(n) OVER () AS BIGINT) AS share_bp
    FROM paths
    ORDER BY n DESC, path LIMIT 20
    """,
)
def agg_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user journeys as sliding event-type trigrams — the Sankey /
    path-analysis input one order up from ``agg_event_transitions``'s
    first-order matrix: every window of three CONSECUTIVE events of one
    user becomes a ``a>b>c`` path, counted corpus-wide, with the share
    of all trigrams in integer basis points (floor division —
    float-free).

    Scale: the successor pairing is one double-LEAD window partitioned
    BY USER (perfectly spread, never a global sort), ordered (ts,
    event_id) so same-timestamp events cannot flip paths between
    engines; the path hash-agg output is at most |event_types|³ rows —
    dimension-sized — so the share window and top-20 TakeOrdered run
    on a tiny frame."""
    from pyspark.sql import Window

    # typed events only, filtered BEFORE the window on both sides: a
    # NULL event_type would otherwise diverge — concat_ws SKIPS nulls
    # (emitting the 2-hop "a>c") while the oracle's || propagates NULL
    # into a NULL path row
    ev = read_table(spark, sf_dir, "events").where(
        F.col("event_type").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).where(F.col("t2").isNotNull() & F.col("t3").isNotNull())
    paths = seq.groupBy(
        F.concat_ws(">", "event_type", "t2", "t3").alias("path")
    ).agg(F.count(F.lit(1)).alias("n"))
    total = F.sum("n").over(Window.partitionBy())
    return (
        paths.select(
            "path",
            "n",
            F.expr("n * 10000").alias("_num"),
            total.alias("_den"),
        )
        .select(
            "path",
            "n",
            F.expr("_num div _den").cast("long").alias("share_bp"),
        )
        .orderBy(F.desc("n"), "path")
        .limit(20)
    )

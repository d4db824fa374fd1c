"""Oracle-backed Lloyd's iteration — the k-means FIT loop's math under
the driver's hash compare.

The production fits (``llm/kmeans.py`` k-means / PQ codebooks,
``llm/ivfpq.py`` coarse+PQ quantizers) are iterative float Lloyd's runs
covered by determinism / inertia-decrease / beats-global-mean pytests;
``llm/ivfpq2.py`` hash-proved the SERVING algebra those fits feed.  This
module closes the remaining gap — the fit ITERATION itself (assign ->
mean-update -> reassign) — with the same one-ingredient-swap technique:

* vectors quantize by the exact-IEEE portable rule ``floor(x * 1024)``
  (power-of-two scale: widen + multiply are exact, floor unambiguous —
  the ``ivfpq2`` argument), so every distance is an integer sum with no
  summation-order variance;
* the K seed centroids are corpus rows picked by fixed vec_ids (the
  ``_CENTROID_IDS`` donor convention), so no init-order drift exists;
* the mean update keeps centroids INTEGER via portable floor division
  ``(s - ((s % n + n) % n)) div n`` — identical on both engines for any
  sign of ``s`` (Spark ``div`` truncates and DuckDB ``//`` need agree
  only on the exact multiple the mod-subtraction guarantees), mirroring
  the float fit's mean at 1/1024 resolution;
* EXACTLY ``_ROUNDS`` assignment/update rounds run on both engines (the
  ``graph_pagerank_copurchase`` fixed-iteration convention), unrolled as
  a plain CTE chain on the oracle side;
* empty clusters keep their previous centroid (both engines: LEFT JOIN
  new sums onto the old centroid table + COALESCE) — the same rule the
  production fit applies.

Every per-round decision is pinned: round-1 and round-2 assignments per
vector AND the round-2 integer distance (any drift in the updated
centroid coordinates changes ``d2_r2``).  What remains outside hash
coverage after this: nothing algorithmic — only the float-precision
production fits themselves, whose algebra is now proven here at integer
resolution.

Scale: the plan is the real distributed Lloyd shape.  Vectors explode to
(vec_id, dim, x) rows IN PLACE (map-side, no shuffle); each assignment
round joins that long table to a BROADCAST K x dim centroid table (512
rows) and hash-aggregates on (vec_id, cid) with map-side partials —
rows x K x dim work, the true Lloyd cost, never O(n^2); the mean update
is one hash-agg keyed by (cluster, dim) producing a K x dim table.  No
``.collect()`` anywhere — centroids stay in-plan as broadcast frames.

Reference parity: the reference engine (etl/main.go, 485 LoC) has no
clustering surface; this extends SURVEY.md §2.B's ANN family
(``similarity_kmeans``, ``embeddings_pq_codes``, ``llm/ivfpq2.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query, scoped_persist
from concurrent_etl_go_spark.sources.readers import read_table

_SCALE = 1024
_DIM = 64
#: Frozen seed centroids: corpus rows by vec_id (the ivfpq2 donor
#: convention — seed ids ARE the cluster labels, no index-order drift).
_SEED_IDS = (3, 17, 29, 41, 53, 65, 77, 89)
#: Fixed assignment/update rounds on BOTH engines (unrolled oracle).
_ROUNDS = 2

#: Portable signed floor division (see module docstring).
_FDIV = "({s} - (({s} % {n} + {n}) % {n})) {op} {n}"


def _long_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, d, x): integer-quantized vectors in long format — the
    in-place explode that every round's distance join keys on ``d``.

    PERSISTED (scoped): every Lloyd's round reads this frame twice
    (distance join + mean update) and the seed filter reads it once
    more — without the persist the audit showed 7 parquet scans of
    embeddings for the 2-round query; with it, one."""
    iv = read_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr(
            f"transform(embedding, x -> "
            f"cast(floor(cast(x as double) * {_SCALE}) as bigint))"
        ).alias("v"),
    )
    return scoped_persist(
        iv.select("vec_id", F.posexplode("v").alias("d", "x"))
    )


def _assign(vd: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, cid, d2) argmin assignment against a K x dim centroid
    table: broadcast distance join on the dim key, one (vec_id, cid)
    hash-agg, min_by over the unique (d2, cid) struct (deterministic
    tie-break low, the ``ivfpq2`` idiom)."""
    d2 = (
        vd.join(F.broadcast(cent), "d")
        .groupBy("vec_id", "cid")
        .agg(
            F.sum(
                (F.col("x") - F.col("cx")) * (F.col("x") - F.col("cx"))
            ).alias("d2")
        )
    )
    return d2.groupBy("vec_id").agg(
        F.min(F.struct("d2", "cid")).alias("m")
    ).select(
        "vec_id",
        F.col("m.cid").alias("cid"),
        F.col("m.d2").alias("d2"),
    )


def _update(vd: DataFrame, assign: DataFrame, cent: DataFrame) -> DataFrame:
    """Mean update at integer resolution: per-(cluster, dim) sums +
    counts, portable floor division, empty clusters keep their previous
    coordinate via LEFT JOIN + COALESCE."""
    sums = (
        vd.join(assign.select("vec_id", "cid"), "vec_id")
        .groupBy("cid", "d")
        .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
        .withColumn(
            "newx", F.expr(_FDIV.format(s="s", n="n", op="div"))
        )
    )
    return cent.join(sums.select("cid", "d", "newx"), ["cid", "d"], "left").select(
        "cid", "d", F.coalesce("newx", "cx").alias("cx")
    )


def _oracle() -> str:
    """Unrolled fixed-round Lloyd's as a plain CTE chain (the PageRank /
    BFS technique: fixed-iteration loops become provable by unrolling).
    Integer sums cast back to BIGINT at every aggregate — DuckDB SUMs
    into HUGEINT, which pandas would otherwise skew to float64."""
    fdiv = _FDIV.format(s="u.s", n="u.n", op="//")
    steps = [
        f"""c0 AS (
      SELECT vec_id AS cid, d, x AS cx FROM vd
      WHERE vec_id IN {_SEED_IDS}
    )"""
    ]
    for r in range(1, _ROUNDS + 1):
        steps.append(
            f"""dist{r} AS (
      SELECT vd.vec_id, c.cid,
             CAST(SUM((vd.x - c.cx) * (vd.x - c.cx)) AS BIGINT) AS d2
      FROM vd JOIN c{r - 1} c USING (d)
      GROUP BY 1, 2
    ),
    a{r} AS (
      SELECT vec_id, cid, d2 FROM (
        SELECT vec_id, cid, d2,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d2, cid) AS rn
        FROM dist{r}
      ) WHERE rn = 1
    ),
    u{r} AS (
      SELECT a.cid, vd.d,
             CAST(SUM(vd.x) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM vd JOIN a{r} a USING (vec_id)
      GROUP BY 1, 2
    ),
    c{r} AS (
      SELECT c.cid, c.d,
             CAST(COALESCE({fdiv}, c.cx) AS BIGINT) AS cx
      FROM c{r - 1} c
      LEFT JOIN u{r} u ON u.cid = c.cid AND u.d = c.d
    )"""
        )
    chain = ",\n    ".join(steps)
    return f"""
    WITH iv AS (
      SELECT vec_id,
             [CAST(floor(CAST(x AS DOUBLE) * {_SCALE}) AS BIGINT)
              for x in embedding] AS v
      FROM embeddings
    ),
    vd AS (
      SELECT vec_id, d, v[d + 1] AS x
      FROM iv, range(0, {_DIM}) t(d)
    ),
    {chain}
    SELECT a1.vec_id,
           CAST(a1.cid AS BIGINT) AS c1,
           CAST(a{_ROUNDS}.cid AS BIGINT) AS c{_ROUNDS},
           a{_ROUNDS}.d2 AS d2_r{_ROUNDS}
    FROM a1 JOIN a{_ROUNDS} USING (vec_id)
    """


@query("similarity_kmeans_step_portable", oracle=_oracle())
def similarity_kmeans_step_portable(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Two full Lloyd's rounds at integer resolution, every decision
    pinned by the driver hash: per-vector round-1 cluster, round-2
    cluster (after the in-plan mean update), and the round-2 integer
    distance — which pins the updated centroid COORDINATES themselves,
    since any drift in any coordinate changes some vector's ``d2_r2``.
    See the module docstring for the frozen ingredients, the portable
    floor-division mean, and the 100 TB plan shape."""
    vd = _long_vectors(spark, sf_dir)
    cent0 = vd.where(F.col("vec_id").isin(*_SEED_IDS)).select(
        F.col("vec_id").alias("cid"), "d", F.col("x").alias("cx")
    )
    a1 = _assign(vd, cent0)
    cent = cent0
    assign = a1
    for _ in range(_ROUNDS - 1):
        cent = _update(vd, assign, cent)
        assign = _assign(vd, cent)
    return (
        a1.select("vec_id", F.col("cid").alias("c1"))
        .join(
            assign.select(
                "vec_id",
                F.col("cid").alias(f"c{_ROUNDS}"),
                F.col("d2").alias(f"d2_r{_ROUNDS}"),
            ),
            "vec_id",
        )
    )

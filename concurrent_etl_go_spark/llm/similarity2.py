"""Similarity search, part 2: threshold (range) search over
int8-quantized embeddings.

``similarity_range_search`` returns EVERY corpus vector whose cosine
similarity to a query-panel vector clears a threshold — the "find all
near-duplicates / all in-radius neighbors" primitive that complements
top-k search (top-k bounds the OUTPUT, range search bounds the
DISTANCE; dedup and contamination sweeps need the latter).

All-integer decision rule: vectors are symmetric-int8 quantized
(codes = round(x / scale), scale = max|x|/127 — the proven
``embeddings_quantize_int8`` arithmetic, identical on both engines),
and the cosine test runs on exact integer code moments:

    cos(q, v) >= tau  <=>  dot > 0  AND
    dot^2 * 1e6 >= tau^2*1e6 * (nq * nv)

with dot = sum q_i*v_i, nq/nv = sum of squared codes — every quantity
an int64 (|code| <= 127, 64 dims -> dot <= ~1e6), the squared form in
128-bit.  No float enters the predicate, so the match SET is exact and
the emitted signed cos2_e6 is a pure integer.

Scale: the query panel (fixed, id-ordered) broadcasts; the corpus scan
is map-only — each row evaluates |Q| integer dot products and emits
only matches.  At 100 TB this is the same one-pass shape the
brute-force recall baselines use; a production variant gates the scan
with the RP-LSH bucketer first (``similarity_rp_lsh``).

Reference parity: no vector surface exists in the reference
(etl/main.go); extends SURVEY.md §2.B's similarity family beside
``llm/similarity.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.sources.readers import read_table

_RANGE_QUERIES = 5  # panel: smallest vec_ids
#: tau^2 * 1e6 (tau = 0.3 cosine) — sized to the synthetic corpus's
#: cosine distribution (p99 ~ 0.3, max ~ 0.39 from the panel), so the
#: radius admits roughly the top percentile per query at every sf.
_RANGE_TAU2_E6 = 90_000

#: Codes CTE shared by both dialect texts in spirit: round(x/scale)
#: with scale = max|x|/127; the zero vector is guarded out.
_CODES_DUCK = """
    codes AS MATERIALIZED (
      SELECT vec_id,
             list_transform(embedding::DOUBLE[],
                            x -> CAST(round(x / scale) AS BIGINT)) AS c
      FROM (
        SELECT vec_id, embedding,
               list_max(list_transform(embedding::DOUBLE[],
                                       x -> abs(x))) / 127 AS scale
        FROM embeddings
      ) WHERE scale > 0
    ),
    norms AS MATERIALIZED (
      SELECT vec_id, c,
             CAST(list_sum(list_transform(c, x -> x * x)) AS BIGINT) AS n2
      FROM codes
    )
"""


@query(
    "similarity_range_search",
    oracle=f"""
    WITH {_CODES_DUCK},
    panel AS MATERIALIZED (
      SELECT vec_id AS qid, c AS qc, n2 AS qn2
      FROM norms ORDER BY vec_id LIMIT {_RANGE_QUERIES}
    ),
    pairs AS MATERIALIZED (
      SELECT p.qid, v.vec_id, p.qn2, v.n2,
             CAST(list_sum(list_transform(range(1, len(v.c) + 1),
                  i -> p.qc[i] * v.c[i])) AS BIGINT) AS dot
      FROM panel p CROSS JOIN norms v
      WHERE p.qid <> v.vec_id
    )
    SELECT qid AS query_id, vec_id, dot,
           CAST(CAST(dot AS HUGEINT) * dot * 1000000
                // (CAST(qn2 AS HUGEINT) * n2) AS BIGINT) AS cos2_e6
    FROM pairs
    WHERE dot > 0
      AND CAST(dot AS HUGEINT) * dot * 1000000
          >= {_RANGE_TAU2_E6} * CAST(qn2 AS HUGEINT) * n2
    """,
)
def similarity_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All corpus vectors within cosine >= 0.3 of each query-panel
    vector (tau^2 = 0.09 via ``_RANGE_TAU2_E6`` = 90,000 millionths —
    sized to the corpus cosine p99 ~ 0.3; tau = 0.5 returns an EMPTY
    match set on this corpus, a hollow green), decided entirely on
    integer int8-code moments (exact match set, no float in the
    predicate), emitting the integer dot product and squared cosine in
    millionths.

    Scale: broadcast panel x map-only corpus scan; emits only
    matches."""
    big = "DECIMAL(38,0)"
    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    scaled = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        (
            F.array_max(
                F.transform("embedding", lambda x: F.abs(x.cast("double")))
            )
            / 127
        ).alias("scale"),
    ).where(F.col("scale") > 0)
    norms = scaled.select(
        "vec_id",
        F.expr(
            "transform(v, x -> CAST(round(x / scale) AS BIGINT))"
        ).alias("c"),
    ).select(
        "vec_id",
        "c",
        F.expr(
            "CAST(aggregate(transform(c, x -> x * x), 0L,"
            " (acc, x) -> acc + x) AS BIGINT)"
        ).alias("n2"),
    )
    panel = (
        norms.orderBy("vec_id")
        .limit(_RANGE_QUERIES)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("c").alias("qc"),
            F.col("n2").alias("qn2"),
        )
    )
    pairs = (
        F.broadcast(panel)
        .crossJoin(norms)
        .where(F.col("qid") != F.col("vec_id"))
        .select(
            "qid",
            "vec_id",
            "qn2",
            "n2",
            F.expr(
                "CAST(aggregate(zip_with(qc, c, (a, b) -> a * b), 0L,"
                " (acc, x) -> acc + x) AS BIGINT)"
            ).alias("dot"),
        )
    )
    return pairs.where(
        (F.col("dot") > 0)
        & F.expr(
            f"CAST(dot AS {big}) * dot * 1000000"
            f" >= {_RANGE_TAU2_E6} * CAST(qn2 AS {big}) * n2"
        )
    ).select(
        F.col("qid").alias("query_id"),
        "vec_id",
        "dot",
        F.expr(
            f"CAST(CAST(dot AS {big}) * dot * 1000000"
            f" div (CAST(qn2 AS {big}) * n2) AS BIGINT)"
        ).alias("cos2_e6"),
    )

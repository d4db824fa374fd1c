"""Sketch family, batch 2: Theta-sketch set algebra and approximate
heavy hitters (Apache DataSketches integration shipped in Spark 4).

``agg_hll_mergeable`` already covers mergeable distinct COUNTS; what HLL
cannot do is set INTERSECTION — "how many users active in week N were
also active in week N+1" (retention) normally needs a self-join of the
raw event history. Theta sketches support union/intersection/difference
on the sketches themselves, so week-over-week retention across a 100 TB
history becomes algebra over |weeks| kilobyte-sized sketches: build each
week's sketch once (incrementally, as the week lands), never rescan.

``agg_approx_topk`` is the one-pass mergeable twin of the exact
``agg_heavy_hitters`` — the form that works when the vocabulary doesn't
fit a hash aggregation.

Both rows-only (sketch estimates aren't SQL-portable to DuckDB);
pytest pins estimates against exact recomputation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.llm.text import tokens
from concurrent_etl_go_spark.sources.readers import read_table


@query("agg_theta_retention")  # sketch estimates — rows-only check
def agg_theta_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week user retention via Theta-sketch intersection: for
    each consecutive week pair, estimate |active(w) ∩ active(w+1)| and
    the retention share, from per-week sketches alone.

    Scale: one pass builds a kilobyte sketch per week (map-side
    combined); the retention table is a self-join over |weeks| tiny
    rows. The exact twin (``agg_retention_cohort``) re-joins raw events
    — correct, but O(history) per question; sketches answer from state
    the size of a calendar.
    """
    ev = read_table(spark, sf_dir, "events")
    weekly = (
        ev.groupBy(F.date_trunc("week", "ts").alias("week"))
        .agg(F.expr("theta_sketch_agg(user_id)").alias("sk"))
    )
    nxt = weekly.select(
        F.col("week").alias("next_week"), F.col("sk").alias("sk_next")
    )
    pairs = weekly.join(
        nxt,
        F.col("next_week") == F.col("week") + F.expr("INTERVAL 7 DAYS"),
    )
    return pairs.select(
        "week",
        F.expr("cast(theta_sketch_estimate(sk) as long)").alias("active"),
        F.expr("cast(theta_sketch_estimate(sk_next) as long)").alias(
            "active_next"
        ),
        F.expr(
            "cast(theta_sketch_estimate(theta_intersection(sk, sk_next)) "
            "as long)"
        ).alias("retained"),
        F.round(
            F.expr("theta_sketch_estimate(theta_intersection(sk, sk_next))")
            / F.greatest(F.expr("theta_sketch_estimate(sk)"), F.lit(1.0)),
            4,
        ).alias("retention_rate"),
    ).orderBy("week")


APPROX_TOPK_K = 20


@query("agg_approx_topk")  # sketch estimates — rows-only check
def agg_approx_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k corpus tokens via ``approx_top_k`` — the
    one-pass mergeable twin of the exact ``agg_heavy_hitters``. The
    sketch buffers a bounded number of candidates per partition and
    merges, so it survives vocabularies that would blow an exact hash
    aggregation's memory; estimates for true heavy hitters are exact or
    near-exact (pytest pins the head against the exact query).
    """
    docs = read_table(spark, sf_dir, "documents")
    topk = docs.select(F.explode(tokens("text")).alias("term")).agg(
        F.expr(f"approx_top_k(term, {APPROX_TOPK_K})").alias("tk")
    )
    return (
        topk.select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").alias("term"), F.col("e.count").alias("cnt")
        )
        .orderBy(F.desc("cnt"), "term")
    )


@query("agg_theta_churn")  # sketch estimates — rows-only check
def agg_theta_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week churned and new users via Theta-sketch DIFFERENCE:
    churned = active(w) \\ active(w+1), new = active(w+1) \\ active(w) —
    the other two cells of the retention square ``agg_theta_retention``
    fills with the intersection. Same scale story: answered entirely
    from per-week kilobyte sketches; the raw history is never re-joined.
    """
    ev = read_table(spark, sf_dir, "events")
    weekly = (
        ev.groupBy(F.date_trunc("week", "ts").alias("week"))
        .agg(F.expr("theta_sketch_agg(user_id)").alias("sk"))
    )
    nxt = weekly.select(
        F.col("week").alias("next_week"), F.col("sk").alias("sk_next")
    )
    pairs = weekly.join(
        nxt,
        F.col("next_week") == F.col("week") + F.expr("INTERVAL 7 DAYS"),
    )
    return pairs.select(
        "week",
        F.expr(
            "cast(theta_sketch_estimate(theta_difference(sk, sk_next)) "
            "as long)"
        ).alias("churned"),
        F.expr(
            "cast(theta_sketch_estimate(theta_difference(sk_next, sk)) "
            "as long)"
        ).alias("new_users"),
        F.expr(
            "cast(theta_sketch_estimate(theta_union(sk, sk_next)) as long)"
        ).alias("either_week"),
    ).orderBy("week")


# --- portable count-min: the CMS algebra under the driver hash ---------

#: Same dimensions as the production sketch (sketches.py); identical
#: literals appear in the oracle SQL.
_PCMS_DEPTH = 4
_PCMS_WIDTH = 256


def _pcms_bucket(item, row):
    """Engine-portable CMS bucket: md5-prefix int of 'row|item', mod
    width — Spark conv(substr(md5(.),1,8),16,10) == DuckDB
    ('0x'||substr(md5(.),1,8))::BIGINT bit-for-bit (the hash_bucket
    idiom from llm/datasets.py, salted per sketch row)."""
    key = F.concat(row.cast("string"), F.lit("|"), item)
    return (
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
        % _PCMS_WIDTH
    )


@query(
    "text_countmin_portable",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS item FROM documents
    ),
    coords AS (
      SELECT item, t.d AS row_id,
             ('0x' || substr(md5(CAST(t.d AS VARCHAR) || '|' || item),
                             1, 8))::BIGINT % {_PCMS_WIDTH} AS bucket
      FROM toks, (SELECT unnest(range(0, {_PCMS_DEPTH})) AS d) t
    ),
    sketch AS (
      SELECT row_id, bucket, COUNT(*) AS n FROM coords GROUP BY 1, 2
    ),
    probes AS (
      SELECT DISTINCT item, row_id, bucket FROM coords
    )
    SELECT item, CAST(min(coalesce(n, 0)) AS BIGINT) AS approx_count
    FROM probes LEFT JOIN sketch USING (row_id, bucket)
    GROUP BY item
    """,
)
def text_countmin_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch, hash-proven: build a depth x width CMS over the
    corpus TOKEN stream with the portable base hash, then point-estimate
    every distinct token from the sketch alone. DuckDB rebuilds the
    identical sketch (same buckets, same collisions), so the driver hash
    proves the CMS algebra end to end — bucket derivation, map-side
    count merge, and the min-over-rows estimator with its one-sided
    collision error. The seeded-xxhash64 production sketch
    (``text_countmin_sketch``, sketches.py) keeps its rows-only check +
    error-bound pytest.

    Scale: the sketch is depth x width rows regardless of corpus size
    (one explode + one map-side-combined agg); estimation joins each
    probe's d coordinates against the broadcast-sized sketch.
    """
    from concurrent_etl_go_spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("item")
    )
    rows_arr = F.transform(
        F.sequence(F.lit(0), F.lit(_PCMS_DEPTH - 1)),
        lambda d: F.struct(
            d.cast("long").alias("row_id"),
            _pcms_bucket(F.col("item"), d).alias("bucket"),
        ),
    )
    coords = toks.select(
        "item", F.explode(rows_arr).alias("rb")
    ).select("item", "rb.row_id", "rb.bucket")
    sketch = coords.groupBy("row_id", "bucket").agg(
        F.count(F.lit(1)).alias("n")
    )
    probes = coords.distinct()
    return (
        probes.join(F.broadcast(sketch), ["row_id", "bucket"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce("n", F.lit(0))).alias("approx_count"))
    )


#: Bloom-filter geometry: m bits, k double-hashed probe positions.
#: Build keys are the deterministic custkey % 3 == 0 subset, so the
#: exact false-positive SET is pinned by the driver hash.
BLOOM_BITS = 4096
BLOOM_HASHES = 3


def _bloom_h1h2_sql(key: str) -> tuple[str, str]:
    """Portable (h1, h2) from md5 prefixes — h2 forced nonzero so the
    double-hash probe sequence never degenerates."""
    h1 = f"(('0x' || substr(md5(CAST({key} AS VARCHAR)), 1, 8))::BIGINT % {BLOOM_BITS})"
    h2 = (
        f"((('0x' || substr(md5(CAST({key} AS VARCHAR)), 9, 8))::BIGINT"
        f" % {BLOOM_BITS - 1}) + 1)"
    )
    return h1, h2


@query(
    "sketch_bloom_membership",
    oracle=f"""
    WITH build AS (
      SELECT c_custkey AS key FROM customer WHERE c_custkey % 3 = 0
    ),
    bits AS (
      SELECT DISTINCT
             ({_bloom_h1h2_sql('key')[0]} + i * {_bloom_h1h2_sql('key')[1]})
               % {BLOOM_BITS} AS pos
      FROM build, range(0, {BLOOM_HASHES}) t(i)
    ),
    probe AS (
      SELECT c_custkey AS key FROM customer
    ),
    probe_pos AS (
      SELECT key,
             ({_bloom_h1h2_sql('key')[0]} + i * {_bloom_h1h2_sql('key')[1]})
               % {BLOOM_BITS} AS pos
      FROM probe, range(0, {BLOOM_HASHES}) t(i)
    ),
    hits AS (
      SELECT p.key, COUNT(b.pos) AS n_hits
      FROM probe_pos p LEFT JOIN bits b ON b.pos = p.pos
      GROUP BY p.key
    )
    SELECT key AS custkey,
           CAST(CASE WHEN n_hits = {BLOOM_HASHES} THEN 1 ELSE 0 END
                AS BIGINT) AS maybe_present,
           CAST(CASE WHEN key % 3 = 0 THEN 1 ELSE 0 END AS BIGINT)
             AS actually_present
    FROM hits
    """,
)
def sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership, fully relational and hash-proven: build
    a BLOOM_BITS-bit filter over a deterministic key subset (BLOOM_HASHES
    double-hashed positions per key, Kirsch-Mitzenmacher h1 + i*h2 —
    public literature), then probe EVERY key and report the filter's
    verdict next to ground truth.  Because the hash is the engine-
    portable md5-prefix integer, the driver hash pins the exact
    false-positive SET, not just a rate — the strongest possible
    cross-engine proof of the filter algebra.  The geometry is
    DELIBERATELY small so false positives exist at driver scale and
    the proof has teeth (sf0.01: 24 FPs across 1,500 probes; at sf0.1
    the 4096-bit filter saturates against 5,000 build keys — honest
    Bloom behavior, every verdict still pinned).  A production filter
    sizes m ~ 10-15 bits/key for ~1% FP.  (The production-scale
    filter would live in a compact bitmap / ``bloom_filter_agg``; the
    relational bit TABLE here is the oracle-checkable form with the
    same semantics, and the distinct-positions relation IS that bitmap,
    one row per set bit.)

    Scale: build side is one distinct-agg over |build| x k narrow rows;
    the probe is a (probe x k)-row equi-join against the |set bits| <=
    BLOOM_BITS-row bit table — broadcastable at ANY corpus size since
    the bit table is bounded by the filter geometry, never by data."""
    cust = read_table(spark, sf_dir, "customer")
    # Spark-dialect twin of _bloom_h1h2_sql (conv() instead of the
    # DuckDB '0x'||...::BIGINT cast — same md5-prefix integers)
    h1 = (
        f"(cast(conv(substring(md5(cast(key as string)), 1, 8), 16, 10)"
        f" as bigint) % {BLOOM_BITS})"
    )
    h2 = (
        f"((cast(conv(substring(md5(cast(key as string)), 9, 8), 16, 10)"
        f" as bigint) % {BLOOM_BITS - 1}) + 1)"
    )
    pos_expr = (
        f"transform(sequence(0, {BLOOM_HASHES - 1}),"
        f" i -> ({h1} + i * {h2}) % {BLOOM_BITS})"
    )
    build = cust.where(F.col("c_custkey") % 3 == 0).select(
        F.col("c_custkey").alias("key")
    )
    bits = (
        build.select(F.explode(F.expr(pos_expr)).alias("pos")).distinct()
    )
    probe_pos = cust.select(F.col("c_custkey").alias("key")).select(
        "key", F.explode(F.expr(pos_expr)).alias("pos")
    )
    hits = (
        probe_pos.join(F.broadcast(bits).withColumnRenamed("pos", "bpos"),
                       F.col("pos") == F.col("bpos"), "left")
        .groupBy("key")
        .agg(F.count("bpos").alias("n_hits"))
    )
    return hits.select(
        F.col("key").alias("custkey"),
        (F.col("n_hits") == BLOOM_HASHES).cast("long").alias("maybe_present"),
        (F.col("key") % 3 == 0).cast("long").alias("actually_present"),
    )

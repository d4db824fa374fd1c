"""Data-quality profiling and monitoring operators.

A 100 TB ingest pipeline is fronted by exactly these two shapes: a
single-pass column profiler (null rates, cardinalities, ranges — the
stats that gate schema drift and garbage batches) and a time-series
anomaly score over arrival volumes (the pager for upstream breakage).
Both are pure declarative aggregations — the profiler is ONE scan
producing a handful of scalars regardless of table width x height, the
anomaly score is one narrow daily rollup plus a bounded window.

Reference parity: generalizes the run-report counters of reference
etl/main.go:244-262 (records seen / dropped / enriched per run) into
per-column and per-day observability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.sources.readers import read_table

#: Numeric lineitem measures profiled by ``profile_table_stats``.
PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@query(
    "profile_table_stats",
    oracle="""
    SELECT 'l_quantity' AS column_name, COUNT(*) AS n_rows,
           COUNT(*) - COUNT(l_quantity) AS n_null,
           COUNT(DISTINCT l_quantity) AS n_distinct,
           ROUND(MIN(l_quantity), 4) AS min_val,
           ROUND(MAX(l_quantity), 4) AS max_val,
           ROUND(AVG(l_quantity), 4) AS mean_val
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', COUNT(*), COUNT(*) - COUNT(l_extendedprice),
           COUNT(DISTINCT l_extendedprice), ROUND(MIN(l_extendedprice), 4),
           ROUND(MAX(l_extendedprice), 4), ROUND(AVG(l_extendedprice), 4)
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', COUNT(*), COUNT(*) - COUNT(l_discount),
           COUNT(DISTINCT l_discount), ROUND(MIN(l_discount), 4),
           ROUND(MAX(l_discount), 4), ROUND(AVG(l_discount), 4)
    FROM lineitem
    UNION ALL
    SELECT 'l_tax', COUNT(*), COUNT(*) - COUNT(l_tax),
           COUNT(DISTINCT l_tax), ROUND(MIN(l_tax), 4),
           ROUND(MAX(l_tax), 4), ROUND(AVG(l_tax), 4)
    FROM lineitem
    """,
)
def profile_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profile of the lineitem measures: row count,
    null count, exact distinct count, min / max / mean per column, one
    output row per column.

    Scale: ONE scan computes every per-column aggregate simultaneously
    (a single agg node with 4 x 6 buffers — Spark evaluates them in the
    same partial/final aggregation pass); the wide 1-row result then
    pivots to long form with an in-row explode, so profiling cost is a
    scan plus a constant, never columns x scans. The oracle's UNION ALL
    of per-column SELECTs is the same relation computed the readable
    way. Exact COUNT(DISTINCT) keeps the oracle comparable; at extreme
    cardinalities swap in approx_count_distinct / the HLL sketch
    (``agg_hll_mergeable``) — same shape, bounded buffers.
    """
    li = read_table(spark, sf_dir, "lineitem")
    aggs = []
    for c in PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__null"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.round(F.min(c), 4).alias(f"{c}__min"),
            F.round(F.max(c), 4).alias(f"{c}__max"),
            F.round(F.avg(c), 4).alias(f"{c}__mean"),
        ]
    wide = li.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col(f"{c}__rows").alias("n_rows"),
            F.col(f"{c}__null").alias("n_null"),
            F.col(f"{c}__distinct").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_val"),
            F.col(f"{c}__max").alias("max_val"),
            F.col(f"{c}__mean").alias("mean_val"),
        )
        for c in PROFILE_COLS
    ]
    return wide.select(F.explode(F.array(*per_col)).alias("s")).select("s.*")


@query(
    "agg_daily_zscore",
    oracle="""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, day, n,
           ROUND((n - AVG(n) OVER w) /
                 NULLIF(STDDEV_SAMP(n) OVER w, 0), 4) AS zscore
    FROM daily
    WINDOW w AS (
      PARTITION BY event_type ORDER BY day
      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING
    )
    """,
)
def agg_daily_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly score: each (event_type, day)'s arrival count as a
    z-score against the trailing 7 days (frame excludes the current day,
    so a spike cannot mask itself). NULL for the warm-up days where the
    trailing sample has no variance defined — surfacing "not enough
    history" explicitly beats a fake 0.

    Scale: raw events collapse to the (type, day) grain in one combine-
    heavy pass; the window runs over that tiny rollup partitioned by
    event_type — never over raw events. This is the monitoring twin of
    ``agg_trailing_distinct``'s grain-first discipline.
    """
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    std = F.stddev_samp("n").over(w)
    return daily.select(
        "event_type",
        "day",
        "n",
        F.round(
            (F.col("n") - F.avg("n").over(w))
            / F.when(std != 0, std),
            4,
        ).alias("zscore"),
    )


@query(
    "window_gap_fill",
    oracle="""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             ROUND(SUM(value), 4) AS revenue
      FROM events WHERE event_type IN ('purchase', 'view')
      GROUP BY 1, 2
    ),
    spine AS (
      SELECT t.event_type, d.day
      FROM (SELECT DISTINCT event_type FROM daily) t
      CROSS JOIN (SELECT DISTINCT date_trunc('day', ts) AS day
                  FROM events) d
    )
    SELECT s.event_type, s.day,
           daily.revenue IS NOT NULL AS observed,
           last_value(daily.revenue IGNORE NULLS) OVER (
             PARTITION BY s.event_type ORDER BY s.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS revenue_filled
    FROM spine s LEFT JOIN daily
      ON s.event_type = daily.event_type AND s.day = daily.day
    """,
)
def window_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine forward fill: build the complete (event_type, day)
    grid, left-join the observed daily revenue, and carry the last
    observation forward across the gaps — the standard shape for turning
    sparse event rollups into dense time series (dashboards, feature
    windows, as-of training labels). Days before a type's first
    observation stay NULL rather than inventing a value.

    Scale: the spine is a cross join of two TINY distinct relations
    (types x days), broadcast against nothing bigger than itself; raw
    events collapse to the daily grain first (grain-first discipline,
    as in agg_daily_zscore), and the fill is one window over the dense
    grid partitioned by type — days x types rows, never event rows.
    """
    ev = read_table(spark, sf_dir, "events")
    daily = (
        ev.where(F.col("event_type").isin("purchase", "view"))
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.round(F.sum("value"), 4).alias("revenue"))
    )
    types = daily.select("event_type").distinct()
    days = ev.select(F.date_trunc("day", "ts").alias("day")).distinct()
    # broadcast keeps the spine build a BroadcastNestedLoopJoin (tiny x
    # tiny), never a CartesianProduct shuffle
    spine = types.crossJoin(F.broadcast(days))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(daily, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            F.col("revenue").isNotNull().alias("observed"),
            F.last("revenue", ignorenulls=True).over(w).alias("revenue_filled"),
        )
    )


@query(
    "agg_ewma",
    oracle="""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(COUNT(*) AS DOUBLE) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           ROUND(list_reduce(list(n ORDER BY day),
                 (acc, x) -> 0.3 * x + 0.7 * acc), 4) AS ewma
    FROM daily GROUP BY 1
    """,
)
def agg_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (alpha = 0.3) of each event
    type's daily volume — the smoothing baseline behind the z-score
    monitor's "expected" line.

    EWMA is inherently SEQUENTIAL (each step depends on the previous),
    which windows can't express and recursion would driver-loop. The
    declarative escape hatch: collect the per-type daily series into an
    ORDERED array (bounded — days per type, not events) and fold it with
    ``F.aggregate``, seeding with the first element exactly as DuckDB's
    ``list_reduce`` does. Both engines then execute the identical
    left-to-right IEEE sequence, so the compare is exact.

    Scale: the fold runs over day-count-sized arrays inside a hash agg —
    one grain-collapsing shuffle of (type, day) rows, then O(days) work
    per type. The array never exceeds the series length; for unbounded
    series, chunk by month and fold the chunk results (EWMA composes:
    carry the last smoothed value as the next chunk's seed).
    """
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    series = daily.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "n"))),
            lambda s: s["n"],
        ).alias("vals")
    )
    vals = F.col("vals")
    ewma = F.aggregate(
        F.slice(vals, F.lit(2), F.size(vals) - 1),
        F.element_at(vals, 1),
        lambda acc, x: 0.3 * x + 0.7 * acc,
    )
    return series.select("event_type", F.round(ewma, 4).alias("ewma"))


@query(
    "profile_constraint_check",
    oracle="""
    SELECT 'l_orderkey_not_null' AS constraint_name,
           CAST(COUNT(*) - COUNT(l_orderkey) AS BIGINT) AS violations,
           (COUNT(*) - COUNT(l_orderkey)) = 0 AS passed
    FROM lineitem
    UNION ALL
    SELECT 'l_discount_in_0_1',
           CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1
                         THEN 1 ELSE 0 END) AS BIGINT),
           SUM(CASE WHEN l_discount < 0 OR l_discount > 1
               THEN 1 ELSE 0 END) = 0
    FROM lineitem
    UNION ALL
    SELECT 'l_quantity_le_40',
           CAST(SUM(CASE WHEN l_quantity > 40 THEN 1 ELSE 0 END) AS BIGINT),
           SUM(CASE WHEN l_quantity > 40 THEN 1 ELSE 0 END) = 0
    FROM lineitem
    UNION ALL
    SELECT 'o_orderkey_unique',
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT),
           (COUNT(*) - COUNT(DISTINCT o_orderkey)) = 0
    FROM orders
    UNION ALL
    SELECT 'lineitem_orderkey_fk', CAST(COUNT(*) AS BIGINT), COUNT(*) = 0
    FROM lineitem ANTI JOIN orders ON l_orderkey = o_orderkey
    """,
)
def profile_constraint_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative constraint validation (the Deequ/Great-Expectations
    shape): one row per declared constraint with its violation count —
    non-null, value-range, primary-key uniqueness, and referential
    integrity, over lineitem/orders. ``l_quantity_le_40`` is a
    deliberately tight bound so the report demonstrably COUNTS failures
    rather than rubber-stamping.

    Scale: all three lineitem row-level checks share ONE scan (one agg
    node, conditional-sum buffers); the PK check is one orders agg; the
    FK check is an anti join partial-counted per partition. Violation
    COUNTS (not violating rows) cross the network — the report is
    O(constraints) rows regardless of table size. Quarantining the
    violating rows themselves is the same predicates applied as filters
    (the ``text_quality_filter`` keep/drop pattern).
    """
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")

    li_checks = li.agg(
        F.sum(F.when(F.col("l_orderkey").isNull(), 1).otherwise(0)).alias(
            "v_null"
        ),
        F.sum(
            F.when(
                (F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1
            ).otherwise(0)
        ).alias("v_range"),
        F.sum(F.when(F.col("l_quantity") > 40, 1).otherwise(0)).alias(
            "v_qty"
        ),
    )
    pk = orders.agg(
        (F.count(F.lit(1)) - F.count_distinct(F.col("o_orderkey"))).alias(
            "v_pk"
        )
    )
    fk = (
        li.select("l_orderkey")
        .join(
            orders.select(F.col("o_orderkey").alias("l_orderkey")),
            "l_orderkey",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("v_fk"))
    )
    # one 1-row frame holding every count (re-using a branch in a union
    # would re-execute its aggregation once per reference), exploded
    # in-row to the long report form
    wide = li_checks.crossJoin(pk).crossJoin(fk)
    checks = (
        ("l_orderkey_not_null", "v_null"),
        ("l_discount_in_0_1", "v_range"),
        ("l_quantity_le_40", "v_qty"),
        ("o_orderkey_unique", "v_pk"),
        ("lineitem_orderkey_fk", "v_fk"),
    )
    report = F.array(
        *[
            F.struct(
                F.lit(name).alias("constraint_name"),
                F.col(v).cast("long").alias("violations"),
            )
            for name, v in checks
        ]
    )
    return (
        wide.select(F.explode(report).alias("r"))
        .select("r.constraint_name", "r.violations")
        .withColumn("passed", F.col("violations") == 0)
    )


SKEW_TOP_KEYS = 5


@query(
    "profile_key_skew",
    oracle=f"""
    WITH k AS (
      SELECT l_orderkey AS key, COUNT(*) AS cnt
      FROM lineitem GROUP BY 1
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(cnt) AS BIGINT) AS n_rows,
             CAST(MAX(cnt) AS BIGINT) AS max_cnt,
             AVG(cnt) AS avg_cnt
      FROM k
    )
    SELECT k.key, k.cnt,
           ROUND(CAST(k.cnt AS DOUBLE) / s.n_rows, 6) AS row_share,
           s.n_keys, s.n_rows,
           ROUND(s.max_cnt / s.avg_cnt, 4) AS max_over_avg
    FROM k CROSS JOIN s
    ORDER BY k.cnt DESC, k.key
    LIMIT {SKEW_TOP_KEYS}
    """,
)
def profile_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic: the ``SKEW_TOP_KEYS`` heaviest
    l_orderkey values with their row share, plus the key-space summary
    (distinct keys, rows, max/avg heaviness ratio) on every row — the
    report a table owner reads BEFORE choosing a mitigation from the
    skew suite (``agg_salted_skew`` / ``join_salted_skew`` /
    ``join_null_skew_outer``; AQE's skew-join split handles the runtime
    side).

    Scale: one map-side-combined count per key, a scalar summary agg
    broadcast back, and a TakeOrdered(top-n) — the profile never
    materializes more than |keys| narrow rows.
    """
    li = read_table(spark, sf_dir, "lineitem")
    k = li.groupBy(F.col("l_orderkey").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    s = k.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_cnt"),
        F.avg("cnt").alias("avg_cnt"),
    )
    return (
        k.crossJoin(F.broadcast(s))
        .select(
            "key",
            "cnt",
            F.round(F.col("cnt") / F.col("n_rows"), 6).alias("row_share"),
            "n_keys",
            "n_rows",
            F.round(F.col("max_cnt") / F.col("avg_cnt"), 4).alias(
                "max_over_avg"
            ),
        )
        .orderBy(F.desc("cnt"), "key")
        .limit(SKEW_TOP_KEYS)
    )


#: Freshness anchor "now": fixed just after the events table's time range
#: so lag is deterministic (never wall-clock); staleness threshold in
#: hours. Identical literals appear in the oracle.
FRESHNESS_ANCHOR = "2024-02-01 00:00:00"
FRESHNESS_STALE_HOURS = 36


@query(
    "profile_freshness",
    oracle=f"""
    SELECT event_type,
           max(ts) AS last_ts,
           CAST(floor(date_diff('second', max(ts),
                      TIMESTAMP '{FRESHNESS_ANCHOR}') / 3600.0) AS BIGINT)
               AS lag_hours,
           CAST(floor(date_diff('second', max(ts),
                      TIMESTAMP '{FRESHNESS_ANCHOR}') / 3600.0) AS BIGINT)
               > {FRESHNESS_STALE_HOURS} AS is_stale
    FROM events
    GROUP BY event_type
    """,
)
def profile_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-freshness monitor: per event type, the latest arrival, its
    lag in whole hours behind a FIXED reference instant, and a staleness
    flag — the "did the feed stop" check every ingestion SLA dashboard
    runs (the anchor is a pinned literal here so the result is
    deterministic; production passes the scheduler's logical run time).

    Scale: one hash aggregation on the type key — max(ts) combines
    map-side, so the check costs one scan regardless of table size, and
    at 100 TB a partition-pruned recent-window scan serves the same
    answer.
    """
    ev = read_table(spark, sf_dir, "events")
    anchor = F.lit(FRESHNESS_ANCHOR).cast("timestamp")
    lag_h = F.floor(
        (anchor.cast("long") - F.max("ts").cast("long")) / 3600.0
    ).cast("long")
    return ev.groupBy("event_type").agg(
        F.max("ts").alias("last_ts"),
        lag_h.alias("lag_hours"),
        (lag_h > FRESHNESS_STALE_HOURS).alias("is_stale"),
    )


@query(
    "agg_benford_check",
    oracle="""
    WITH digits AS (
      SELECT CAST(floor(o_totalprice /
                 pow(10, floor(log10(o_totalprice)))) AS BIGINT) AS d
      FROM orders WHERE o_totalprice > 0
    ),
    counts AS (
      SELECT d, COUNT(*) AS n FROM digits GROUP BY d
    ),
    tot AS (SELECT SUM(n) AS total FROM counts)
    SELECT d AS leading_digit, n,
           ROUND(n / total, 6) + 0.0 AS observed_share,
           ROUND(ln(1.0 + 1.0 / d) / ln(10.0), 6) + 0.0
               AS benford_share,
           ROUND(abs(n / total - ln(1.0 + 1.0 / d) / ln(10.0)), 6) + 0.0
               AS abs_deviation
    FROM counts CROSS JOIN tot
    """,
)
def agg_benford_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the classic
    fabricated-data screen (organically grown monetary amounts follow
    log10(1 + 1/d); uniform or hand-entered data does not). Reports each
    leading digit's observed share against the Benford expectation and
    the absolute deviation.

    Scale: the leading digit is a per-row expression (no string cast),
    the profile one 9-key hash agg with map-side partials, and the
    total a broadcast single-row join.
    """
    orders = read_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice") > 0
    )
    d = F.floor(
        F.col("o_totalprice")
        / F.pow(F.lit(10.0), F.floor(F.log10("o_totalprice")))
    ).cast("long")
    counts = orders.select(d.alias("d")).groupBy("d").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = counts.agg(F.sum("n").alias("total"))
    benford = F.log(1.0 + 1.0 / F.col("d")) / F.log(F.lit(10.0))
    return counts.crossJoin(F.broadcast(tot)).select(
        F.col("d").alias("leading_digit"),
        "n",
        (F.round(F.col("n") / F.col("total"), 6) + F.lit(0.0)).alias(
            "observed_share"
        ),
        (F.round(benford, 6) + F.lit(0.0)).alias("benford_share"),
        (
            F.round(F.abs(F.col("n") / F.col("total") - benford), 6)
            + F.lit(0.0)
        ).alias("abs_deviation"),
    )


#: The referential edges of the shared schema, child -> parent.
_FK_EDGES = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
)

#: Planted-fixture purge (the ``profile_key_islands`` convention): the
#: synthetic tables are referentially PERFECT, so a parent filter that
#: drops the md5 bucket-2 eighth of each parent key set plants a
#: deterministic, engine-identical violation population — the report
#: demonstrably COUNTS orphans instead of rubber-stamping zeros.
_FK_PURGE_MOD = 8

#: The purged bucket: 2 (not 0) — chosen so every parent key set in the
#: shared schema, including the 5-row region dimension, loses at least
#: one key (md5("1") lands in bucket 2; no region key lands in 0).
_FK_PURGE_BUCKET = 2


def _fk_oracle() -> str:
    arms = []
    for child, fk, parent, pk in _FK_EDGES:
        arms.append(f"""
    SELECT '{child}.{fk}->{parent}.{pk}' AS fk_edge,
           CAST(COUNT(*) AS BIGINT) AS child_rows,
           CAST(SUM(CASE WHEN p.{pk} IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS orphans,
           CAST(SUM(CASE WHEN p.{pk} IS NULL THEN 1 ELSE 0 END) * 10000
                // COUNT(*) AS BIGINT) AS orphan_bp
    FROM {child} c
    LEFT JOIN (
      SELECT {pk} FROM {parent}
      WHERE ('0x' || substr(md5(CAST({pk} AS VARCHAR)), 1, 4))::BIGINT
            % {_FK_PURGE_MOD} != {_FK_PURGE_BUCKET}
    ) p ON c.{fk} = p.{pk}""")
    union = "\n    UNION ALL".join(arms)
    return f"SELECT * FROM ({union}) ORDER BY fk_edge"


@query("profile_fk_orphans", oracle=_fk_oracle())
def profile_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity orphan report across every FK edge of the
    schema — the full-schema generalization of the single FK check in
    ``profile_constraint_check``: one row per (child.fk -> parent.pk)
    edge with the child cardinality, the orphan count, and the orphan
    rate in integer basis points.  The parent side drops its md5
    bucket-``_FK_PURGE_BUCKET`` eighth (identical expression both
    engines) so the planted orphans prove the counting path.

    Scale: each edge is ONE left join probed only for parent-key
    existence (the parent side prunes to its key column; small
    dimensions broadcast, the lineitem->orders edge shuffles on the
    join key) folded immediately into per-edge conditional COUNTs —
    O(edges) rows cross the network, never the violating rows
    themselves.  Quarantining actual orphans is the same predicate as
    a filter."""
    arms = []
    for child, fk, parent, pk in _FK_EDGES:
        c = read_table(spark, sf_dir, child).select(fk)
        bucket = (
            F.conv(
                F.substring(F.md5(F.col(pk).cast("string")), 1, 4), 16, 10
            ).cast("long")
            % _FK_PURGE_MOD
        )
        p = (
            read_table(spark, sf_dir, parent)
            .select(pk)
            .where(bucket != _FK_PURGE_BUCKET)
        )
        joined = c.join(p, c[fk] == p[pk], "left")
        arms.append(
            joined.agg(
                F.lit(f"{child}.{fk}->{parent}.{pk}").alias("fk_edge"),
                F.count(F.lit(1)).alias("child_rows"),
                F.sum(
                    F.when(F.col(pk).isNull(), 1).otherwise(0)
                ).alias("orphans"),
            ).select(
                "fk_edge",
                "child_rows",
                "orphans",
                F.expr("orphans * 10000 div child_rows")
                .cast("long")
                .alias("orphan_bp"),
            )
        )
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out.orderBy("fk_edge")

"""Product/retail analytics, part 4: bounce rate by entry event,
session dwell-time bands, RFM-segment migration, the Markov
next-action recommendation, and the CUSUM change-point locator —
standard product-analytics reads (bounce/dwell from web analytics
practice, RFM migration from direct-marketing literature, Page 1954
for CUSUM) extending ``relational11.py``'s event-path family.

Exactness: everything here is exact-integer end to end — session
durations in whole seconds via ``unix_micros`` floor division, counts,
basis-point floor shares, the change-point deviation on the
``n*run - t*total`` integer lattice (no float mean), and the segment
split boundary derived as the integer midpoint of the order-date
micros range (data-derived identically on both engines, never a
hard-coded date).

Scale: sessionization and successor pairing are per-user windows
(perfectly spread); every aggregation lands on a bounded key (entry
type, duration band, segment pair, one argmax row).  Reference parity:
no analytics surface exists in the reference (etl/main.go); extends
SURVEY.md §2.B.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.sources.readers import read_table

#: Shared gaps-and-islands session assembly over events (the
#: window_session oracle shape) with exact integer durations.
_SESS_SQL = """
    flagged AS MATERIALIZED (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                            > 1800000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS MATERIALIZED (
        SELECT user_id, ts, event_id, event_type,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS seq
        FROM flagged
    ),
    sessions0 AS MATERIALIZED (
        SELECT user_id, seq,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000
                 AS duration_s
        FROM sess GROUP BY 1, 2
    ),
    firsts AS MATERIALIZED (
        SELECT user_id, seq, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id, seq
                                  ORDER BY ts, event_id) AS rn
        FROM sess
    ),
    sessions AS MATERIALIZED (
        SELECT s.user_id, s.seq, s.n_events, s.duration_s,
               f.event_type AS entry_type
        FROM sessions0 s
        JOIN firsts f ON f.user_id = s.user_id AND f.seq = s.seq
                     AND f.rn = 1
    )
"""


def _sessions_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, seq, n_events, entry_type, duration_s) per session —
    the Spark twin of ``_SESS_SQL``."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn("prev_ts", F.lag("ts").over(w)).withColumn(
        "is_new",
        F.when(
            F.col("prev_ts").isNull()
            | (
                F.expr("unix_micros(ts) - unix_micros(prev_ts)")
                > 1_800_000_000
            ),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "seq",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "seq").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.expr("min_by(event_type, struct(ts, event_id))").alias(
            "entry_type"
        ),
        F.expr(
            "(unix_micros(MAX(ts)) - unix_micros(MIN(ts))) div 1000000"
        ).alias("duration_s"),
    )


@query(
    "agg_bounce_rate",
    oracle=f"""
    WITH {_SESS_SQL}
    SELECT entry_type,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounces,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 10000
                // COUNT(*) AS BIGINT) AS bounce_bp
    FROM sessions GROUP BY 1
    """,
)
def agg_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounce rate by session ENTRY event type: the share of 30-min-gap
    sessions that contain exactly one event, keyed by what the user did
    first (``min_by`` over the deterministic (ts, event_id) order) —
    the landing-quality read every funnel dashboard leads with.
    Exact integer basis points via floor division.

    Scale: per-user sessionization windows; one bounded-key agg on
    entry type."""
    s = _sessions_df(spark, sf_dir)
    return s.groupBy("entry_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_bounces"),
        F.expr(
            "CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 10000"
            " div COUNT(*) AS BIGINT)"
        ).alias("bounce_bp"),
    )


@query(
    "agg_dwell_time_bands",
    oracle=f"""
    WITH {_SESS_SQL},
    banded AS (
      SELECT CASE WHEN duration_s = 0 THEN 'bounce'
                  WHEN duration_s < 60 THEN 'under_1m'
                  WHEN duration_s < 300 THEN 'under_5m'
                  WHEN duration_s < 1800 THEN 'under_30m'
                  ELSE 'over_30m' END AS band,
             duration_s
      FROM sessions
    )
    SELECT band, CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(duration_s) AS BIGINT) AS total_seconds,
           CAST(COUNT(*) * 10000 // SUM(COUNT(*)) OVER () AS BIGINT)
             AS share_bp
    FROM banded GROUP BY 1
    """,
)
def agg_dwell_time_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session dwell-time distribution in fixed engagement bands
    (bounce / <1m / <5m / <30m / 30m+): session counts, total seconds,
    and integer basis-point shares — the engagement histogram behind
    "time on site".  Durations are exact whole seconds
    (``unix_micros`` floor division).

    Scale: per-user sessionization; a 5-key band agg plus one window
    over those 5 rows for the shares."""
    s = _sessions_df(spark, sf_dir)
    banded = s.select(
        F.expr(
            "CASE WHEN duration_s = 0 THEN 'bounce'"
            " WHEN duration_s < 60 THEN 'under_1m'"
            " WHEN duration_s < 300 THEN 'under_5m'"
            " WHEN duration_s < 1800 THEN 'under_30m'"
            " ELSE 'over_30m' END"
        ).alias("band"),
        "duration_s",
    )
    g = banded.groupBy("band").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum("duration_s").cast("long").alias("total_seconds"),
    )
    return g.select(
        "band",
        "n_sessions",
        "total_seconds",
        F.expr(
            "n_sessions * 10000 div SUM(n_sessions) OVER ()"
        ).cast("long").alias("share_bp"),
    )


#: Frequency-segment rule shared by both halves (fixed literals).
_SEG = (
    "CASE WHEN n IS NULL OR n = 0 THEN 'none'"
    " WHEN n = 1 THEN 'one'"
    " WHEN n <= 3 THEN 'few'"
    " ELSE 'many' END"
)


@query(
    "agg_rfm_migration",
    oracle=f"""
    WITH bounds AS MATERIALIZED (
      SELECT (epoch_us(MIN(o_orderdate)) + epoch_us(MAX(o_orderdate))) // 2
               AS mid
      FROM orders
    ),
    per_cust AS MATERIALIZED (
      SELECT o_custkey AS c,
             SUM(CASE WHEN epoch_us(o_orderdate) <= bounds.mid
                 THEN 1 ELSE 0 END) AS n1,
             SUM(CASE WHEN epoch_us(o_orderdate) > bounds.mid
                 THEN 1 ELSE 0 END) AS n2
      FROM orders, bounds GROUP BY 1, bounds.mid
    ),
    seg AS (
      SELECT {_SEG.replace('n ', 'n1 ')} AS seg_early,
             {_SEG.replace('n ', 'n2 ')} AS seg_late
      FROM per_cust
    )
    SELECT seg_early, seg_late, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM seg GROUP BY 1, 2
    """,
)
def agg_rfm_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-segment migration matrix: split the order history at
    the integer midpoint of its date range (data-derived identically
    on both engines), bucket each customer's order count per half into
    none/one/few/many, and count customers per (early, late) segment
    pair — the churn/upgrade flow a lifecycle-marketing team reads as
    a Sankey.

    Scale: one orders scan with the 1-row bounds broadcast; customer
    hash agg; 16-cell matrix agg after."""
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate"
    )
    bounds = o.agg(
        F.expr(
            "(unix_micros(MIN(o_orderdate))"
            " + unix_micros(MAX(o_orderdate))) div 2"
        ).alias("mid")
    )
    per_cust = (
        o.crossJoin(F.broadcast(bounds))
        .groupBy(F.col("o_custkey").alias("c"))
        .agg(
            F.sum(
                F.expr(
                    "CASE WHEN unix_micros(o_orderdate) <= mid"
                    " THEN 1 ELSE 0 END"
                )
            ).alias("n1"),
            F.sum(
                F.expr(
                    "CASE WHEN unix_micros(o_orderdate) > mid"
                    " THEN 1 ELSE 0 END"
                )
            ).alias("n2"),
        )
    )
    seg = per_cust.select(
        F.expr(_SEG.replace("n ", "n1 ")).alias("seg_early"),
        F.expr(_SEG.replace("n ", "n2 ")).alias("seg_late"),
    )
    return seg.groupBy("seg_early", "seg_late").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers")
    )


@query(
    "rec_markov_next_event",
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
             CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT from_type, to_type, n,
             CAST(n * 10000 // SUM(n) OVER (PARTITION BY from_type)
                  AS BIGINT) AS p_bp,
             ROW_NUMBER() OVER (PARTITION BY from_type
                                ORDER BY n DESC, to_type) AS rk
      FROM cnt
    )
    SELECT from_type, to_type AS best_next, n, p_bp
    FROM ranked WHERE rk = 1
    """,
)
def rec_markov_next_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov next-action recommendation: for each event type, the
    single most likely next event (argmax over the
    ``agg_event_transitions`` matrix, deterministic (count desc, type)
    tie-break) with its count and floor basis-point probability — the
    one-step "what should the UI suggest next" table.

    Scale: per-user LEAD pairing, bounded (from, to) hash agg, then
    rank over the |types|^2 matrix."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).where(F.col("next_type").isNotNull())
    cnt = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    wf = Window.partitionBy("from_type")
    ranked = cnt.select(
        "from_type",
        "to_type",
        "n",
        F.expr("n * 10000").cast("long").alias("_num"),
        F.sum("n").over(wf).alias("_den"),
        F.row_number()
        .over(wf.orderBy(F.desc("n"), "to_type"))
        .alias("rk"),
    )
    return ranked.where(F.col("rk") == 1).select(
        "from_type",
        F.col("to_type").alias("best_next"),
        "n",
        F.expr("_num div _den").alias("p_bp"),
    )


@query(
    "agg_cusum_changepoint",
    oracle="""
    WITH daily AS MATERIALIZED (
      SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY 1
    ),
    dev AS (
      SELECT day,
             CAST(COUNT(*) OVER () AS HUGEINT)
               * SUM(cents) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             - CAST(ROW_NUMBER() OVER (ORDER BY day) AS HUGEINT)
               * SUM(cents) OVER () AS d,
             CAST(COUNT(*) OVER () AS BIGINT) AS n_days
      FROM daily
    )
    SELECT day AS change_day, n_days,
           CAST(ABS(d) // n_days // 100 AS BIGINT) AS peak_dev_dollars,
           CAST(CASE WHEN d >= 0 THEN 1 ELSE -1 END AS BIGINT)
             AS direction
    FROM dev
    ORDER BY ABS(d) DESC, day LIMIT 1
    """,
)
def agg_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point LOCATOR: the single day where the cumulative
    deviation from the series mean peaks — the argmax row of
    ``window_cusum``, computed on the exact integer lattice
    ``n*run_t - t*total`` (cross-multiplied so no float mean exists;
    the 128-bit product floor-divides to whole dollars only for the
    emitted magnitude).  Deterministic (|dev| desc, day) tie-break.

    Scale: grain-first day rollup; the windows and the argmax run on
    the day-count-sized series."""
    big = "DECIMAL(38,0)"
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    )
    units = (
        F.col("o_totalprice") * F.lit(100.0)
        + F.signum("o_totalprice") * F.lit(0.5)
    ).cast("long")
    daily = orders.groupBy(
        F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd").alias(
            "day"
        )
    ).agg(F.sum(units).alias("cents"))
    w_run = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    dev = daily.select(
        "day",
        (
            F.expr(f"CAST(COUNT(*) OVER () AS {big})")
            * F.sum("cents").over(w_run)
            - F.expr(f"CAST(ROW_NUMBER() OVER (ORDER BY day) AS {big})")
            * F.sum("cents").over(w_all)
        ).alias("d"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("n_days"),
    )
    return (
        dev.select(
            F.col("day").alias("change_day"),
            "n_days",
            F.expr("CAST(ABS(d) div n_days div 100 AS BIGINT)").alias(
                "peak_dev_dollars"
            ),
            F.expr(
                "CAST(CASE WHEN d >= 0 THEN 1 ELSE -1 END AS BIGINT)"
            ).alias("direction"),
            F.abs("d").alias("_absd"),
        )
        .orderBy(F.desc("_absd"), "change_day")
        .limit(1)
        .drop("_absd")
    )
"""Time-series resampling and robust outlier scoring over ``events``.

Two more shapes the monitoring half of a 100 TB pipeline runs daily:

- ``agg_resample_ohlc``: downsample an event stream to fixed bars with
  FIRST/LAST semantics (open/close) plus min/max/sum — the generic
  "resample with edge values" operator (finance calls it OHLC; ops
  dashboards call it first/last-seen rollup). First/last are made
  deterministic with explicit (ts, event_id) row numbering — never
  ``first()``'s partition-order roulette.
- ``agg_mad_outliers``: per-group robust outlier counts via median
  absolute deviation. Mean/stddev z-scores (``agg_daily_zscore``) break
  down under the very outliers they hunt; median/MAD is the standard
  robust alternative. Exact medians buffer per group (oracle-comparable
  — the same caveat as ``agg_percentiles``); the production swap is
  ``approx_percentile(0.5)``, same plan shape with bounded buffers.

Scale: OHLC is one exchange on (type, hour) with the row-number sort
inside the partitions; MAD is two grouped aggregations over the same
partitioning plus tiny broadcast join-backs (|groups| rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.sources.readers import read_table

MAD_K = 3.0  # outlier threshold: |x - median| > MAD_K * MAD


@query(
    "agg_resample_ohlc",
    oracle="""
    WITH b AS (
      SELECT event_type, date_trunc('hour', ts) AS bar, value, ts, event_id
      FROM events
    ),
    r AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY event_type, bar
                                ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY event_type, bar
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM b
    )
    SELECT event_type, bar,
           ROUND(MAX(CASE WHEN rn_a = 1 THEN value END), 4) AS open,
           ROUND(MAX(value), 4) AS high,
           ROUND(MIN(value), 4) AS low,
           ROUND(MAX(CASE WHEN rn_d = 1 THEN value END), 4) AS close,
           ROUND(SUM(value), 4) AS volume,
           COUNT(*) AS n_events
    FROM r
    GROUP BY 1, 2
    """,
)
def agg_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event type: open/close are the values at the
    earliest/latest (ts, event_id) in the bar — an explicit total order,
    because Spark's ``first()``/``last()`` aggregate functions depend on
    partition arrival order and would be non-deterministic.

    Scale: one hash exchange on (type, bar); both row_number windows
    share that partitioning (one sort ascending serves rn_a, the
    descending twin is computed in the same window stage); the final
    groupBy re-uses the exchange. No driver traffic.
    """
    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("hour", "ts").alias("bar"),
        "value",
        "ts",
        "event_id",
    )
    w_asc = Window.partitionBy("event_type", "bar").orderBy("ts", "event_id")
    w_desc = Window.partitionBy("event_type", "bar").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    r = ev.withColumn("rn_a", F.row_number().over(w_asc)).withColumn(
        "rn_d", F.row_number().over(w_desc)
    )
    return r.groupBy("event_type", "bar").agg(
        F.round(F.max(F.when(F.col("rn_a") == 1, F.col("value"))), 4).alias(
            "open"
        ),
        F.round(F.max("value"), 4).alias("high"),
        F.round(F.min("value"), 4).alias("low"),
        F.round(F.max(F.when(F.col("rn_d") == 1, F.col("value"))), 4).alias(
            "close"
        ),
        F.round(F.sum("value"), 4).alias("volume"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "agg_mad_outliers",
    oracle=f"""
    WITH med AS (
      SELECT event_type, median(value) AS med
      FROM events GROUP BY 1
    ),
    dev AS (
      SELECT e.event_type, e.value, m.med,
             abs(e.value - m.med) AS adev
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, median(adev) AS mad FROM dev GROUP BY 1
    )
    SELECT d.event_type,
           ROUND(MAX(d.med), 4) AS med,
           ROUND(MAX(m.mad), 4) AS mad,
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN d.adev > {MAD_K} * m.mad THEN 1 ELSE 0 END)
               AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY 1
    """,
)
def agg_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outlier counts: median + MAD, flag rows whose
    absolute deviation exceeds ``MAD_K`` * MAD.

    Scale: two grouped medians over the same (event_type) partitioning
    with tiny (|types| rows) broadcast join-backs between them. Exact
    ``median`` buffers each group's values (the oracle-comparable form,
    same caveat as ``agg_percentiles``); swap ``F.median`` for
    ``F.percentile_approx(..., 0.5)`` at extreme group sizes — identical
    plan, bounded buffers.
    """
    ev = read_table(spark, sf_dir, "events").select("event_type", "value")
    return mad_outlier_report(ev)


def mad_outlier_report(ev: DataFrame) -> DataFrame:
    """Per-group median/MAD/outlier-count report over (event_type, value)
    rows — the reusable core of ``agg_mad_outliers`` (property-tested for
    translation/scale invariance of the outlier count)."""
    med = ev.groupBy("event_type").agg(F.median("value").alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.median("adev").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.max("med"), 4).alias("med"),
            F.round(F.max("mad"), 4).alias("mad"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.when(F.col("adev") > MAD_K * F.col("mad"), 1).otherwise(0)
            ).alias("n_outliers"),
        )
    )


@query(
    "agg_log2_histogram",
    oracle="""
    SELECT CAST(floor(ln(o_totalprice) / ln(2)) AS BIGINT) AS log2_bucket,
           COUNT(*) AS n_orders,
           ROUND(MIN(o_totalprice), 4) AS min_price,
           ROUND(MAX(o_totalprice), 4) AS max_price
    FROM orders
    WHERE o_totalprice > 0
    GROUP BY 1
    ORDER BY log2_bucket
    """,
)
def agg_log2_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-scale (power-of-two bucket) histogram of order values — the
    profiling standard for heavy-tailed distributions, where linear
    buckets (``agg_histogram``) put everything in one bin and equi-depth
    buckets (``agg_equidepth_histogram``) hide the tail's extent.

    Cross-engine note: the bucket is floor(ln(x)/ln(2)) in BOTH engines
    (not a native log2), so the IEEE operation sequence is identical and
    values sitting near power-of-two boundaries bucket identically.

    Scale: one map-side expression + a groupBy over ~64 possible buckets
    — combiner-friendly, output size independent of row count.
    """
    orders = read_table(spark, sf_dir, "orders")
    bucket = F.floor(F.log(F.col("o_totalprice")) / F.log(F.lit(2.0))).cast(
        "long"
    )
    return (
        orders.where(F.col("o_totalprice") > 0)
        .groupBy(bucket.alias("log2_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 4).alias("min_price"),
            F.round(F.max("o_totalprice"), 4).alias("max_price"),
        )
        .orderBy("log2_bucket")
    )


ROLL_CORR_DAYS = 14


@query(
    "window_rolling_corr",
    oracle=f"""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day,
             COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS views,
             COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
                 AS purchases
      FROM events GROUP BY 1
    )
    SELECT day, CAST(views AS BIGINT) AS views,
           CAST(purchases AS BIGINT) AS purchases,
           ROUND(corr(views, purchases) OVER (
             ORDER BY day
             ROWS BETWEEN {ROLL_CORR_DAYS - 1} PRECEDING AND CURRENT ROW
           ), 4) AS roll_corr
    FROM daily
    """,
)
def window_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling {d}-day correlation between daily view and purchase
    volumes — the drift detector for metric relationships (a correlation
    that collapses flags funnel breakage even when each volume alone
    looks healthy).

    Scale: grain-first discipline again — raw events collapse to one row
    per day, the window runs over |days| rows. The window is
    unpartitioned but over the DAILY grain (a few thousand rows for a
    decade), not events; partition by a series key when tracking many
    metric pairs.
    """
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.when(F.col("event_type") == "view", 1)).alias("views"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias(
            "purchases"
        ),
    )
    w = (
        Window.orderBy("day").rowsBetween(-(ROLL_CORR_DAYS - 1), 0)
    )
    return daily.select(
        "day",
        F.col("views").cast("long").alias("views"),
        F.col("purchases").cast("long").alias("purchases"),
        F.round(F.corr("views", "purchases").over(w), 4).alias("roll_corr"),
    )


@query(
    "agg_regression_trend",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(floor(epoch(date_trunc('day', ts)) / 86400) AS DOUBLE)
                 AS day_num,
             CAST(COUNT(*) AS DOUBLE) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(regr_slope(n, day_num), 4) AS slope_per_day,
           ROUND(regr_intercept(n, day_num), 4) AS intercept,
           ROUND(regr_r2(n, day_num), 4) AS r2
    FROM daily
    GROUP BY 1
    """,
)
def agg_regression_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type linear trend of daily volumes via the SQL regression
    aggregates (regr_slope / regr_intercept / regr_r2) — "is this metric
    growing, and how well does a line explain it" in one pass, the
    capacity-planning companion to ``agg_daily_zscore``'s anomaly view.

    Scale: grain-first (events collapse to |types| x |days| rows), then
    ONE aggregation computes all three regression statistics from the
    same running moments — no iteration, no driver-side fitting; the
    regression aggregates are combiner-friendly like corr/covar.
    """
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.floor(
            F.unix_timestamp(F.date_trunc("day", "ts")) / 86400
        ).cast("double").alias("day_num"),
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    return daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.round(F.regr_slope("n", "day_num"), 4).alias("slope_per_day"),
        F.round(F.regr_intercept("n", "day_num"), 4).alias("intercept"),
        F.round(F.regr_r2("n", "day_num"), 4).alias("r2"),
    )


@query(
    "agg_hourly_seasonality",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hr, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(EXTRACT(hour FROM hr) AS BIGINT) AS hour_of_day,
           CAST(SUM(n) AS BIGINT) AS n_events,
           ROUND(AVG(n), 4) AS avg_per_hour
    FROM hourly
    GROUP BY 1, 2
    """,
)
def agg_hourly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonality profile per event type: total and average
    hourly volume for each of the 24 clock hours — the baseline shape
    every volume-anomaly monitor normalizes against (a 3 a.m. dip is not
    an incident if 3 a.m. always dips).

    Scale: two stacked tiny aggregations (hour grain, then clock-hour
    grain) — the first is the only one that sees event rows, map-side
    combined. Hours extract under the UTC-pinned session, so both
    engines bucket identically.
    """
    ev = read_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count(F.lit(1)).alias("n"))
    return hourly.groupBy(
        "event_type", F.hour("hr").cast("long").alias("hour_of_day")
    ).agg(
        F.sum("n").cast("long").alias("n_events"),
        F.round(F.avg("n"), 4).alias("avg_per_hour"),
    )


@query(
    "window_streak_lengths",
    oracle="""
    WITH d AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    r AS (
      SELECT user_id, day,
             row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
      FROM d
    ),
    s AS (
      SELECT user_id, day - CAST(rn AS INTEGER) AS grp, COUNT(*) AS len
      FROM r GROUP BY 1, 2
    )
    SELECT user_id,
           MAX(len) AS max_streak,
           COUNT(*) AS n_streaks,
           CAST(SUM(len) AS BIGINT) AS active_days
    FROM s GROUP BY user_id
    """,
)
def window_streak_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-day activity streaks per user (gaps-and-islands at
    day grain): longest streak, streak count, and total active days —
    the engagement profile behind "7-day streak" product mechanics,
    and the day-grain complement of ``sessionize_events``' time-gap
    islands.

    The island key is the classic ``day - row_number()`` trick: within
    an unbroken run of consecutive days the difference is constant, so
    one window pass + two hash aggs produce every streak.  Scale: the
    window partitions by the natural entity key (same shuffle class as
    ``agg_user_lifetime``); day-grain dedup first caps the window input
    at users x days.  All-integer output — bit-exact, no float
    discipline."""
    ev = read_table(spark, sf_dir, "events")
    d = ev.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    s = (
        d.withColumn(
            "grp", F.date_sub(F.col("day"), F.row_number().over(w))
        )
        .groupBy("user_id", "grp")
        .agg(F.count(F.lit(1)).alias("len"))
    )
    return s.groupBy("user_id").agg(
        F.max("len").alias("max_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.sum("len").cast("long").alias("active_days"),
    )


@query(
    "window_daily_backlog",
    oracle="""
    WITH span AS (
      SELECT o.o_orderkey,
             CAST(o.o_orderdate AS DATE) AS start_day,
             CAST(MAX(l.l_shipdate) AS DATE) + 1 AS end_day
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ),
    deltas AS (
      SELECT start_day AS day, 1 AS delta FROM span
      UNION ALL
      SELECT end_day AS day, -1 AS delta FROM span
    ),
    daily AS (SELECT day, SUM(delta) AS d FROM deltas GROUP BY day)
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(SUM(d) OVER (ORDER BY day) AS BIGINT) AS open_orders
    FROM daily
    """,
)
def window_daily_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog per day: how many orders are placed but not
    yet fully shipped on each calendar day — the operations dashboard's
    headline series, computed with the SWEEP-LINE trick: +1 at each
    order's start day, -1 the day after its last line item ships, then
    a running sum over days.

    Scale: the sweep turns interval counting (an interval join of
    orders x days, quadratic-ish) into one order-keyed hash agg + a
    day-grain delta agg + a running sum over the CALENDAR — the window
    input is bounded by distinct days (~2.4k for the TPC-H range), so
    the single-partition ordering is over dimension-sized data (the
    ``agg_revenue_lorenz`` argument; a year-partitioned two-pass form
    takes over if the calendar itself ever becomes large).  All-integer
    output — bit-exact."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    span = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("start_day"),
        )
        .agg(
            F.date_add(F.max("l_shipdate").cast("date"), 1).alias("end_day")
        )
    )
    deltas = span.select(
        F.col("start_day").alias("day"), F.lit(1).alias("delta")
    ).unionByName(
        span.select(F.col("end_day").alias("day"), F.lit(-1).alias("delta"))
    )
    daily = deltas.groupBy("day").agg(F.sum("delta").alias("d"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    # string day output: Spark DATE surfaces as python-object cells in
    # pandas while DuckDB DATE becomes datetime64 — same values, dtype
    # mismatch under the driver's exact compare
    return daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.sum("d").over(w).cast("long").alias("open_orders"),
    )


@query(
    "window_cusum",
    oracle="""
    WITH daily AS (
      SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS day,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_cents
      FROM orders GROUP BY 1
    )
    SELECT day, CAST(rev_cents AS BIGINT) AS rev_cents,
           ROUND(
             CAST(SUM(rev_cents) OVER (
               ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS DOUBLE) / 100.0
             - CAST(ROW_NUMBER() OVER (ORDER BY day) AS DOUBLE)
               * ((CAST(SUM(rev_cents) OVER () AS DOUBLE) / 100.0)
                  / CAST(COUNT(*) OVER () AS DOUBLE)),
             4) + 0.0 AS cusum_dollars
    FROM daily
    """,
)
def window_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point series over daily revenue (Page 1954, public
    literature): S_t = running_sum(x) − t·mean — the cumulative sum of
    deviations from the series mean.  A regime shift (price change,
    demand step, pipeline breakage) shows as the |S_t| peak AT the
    change day, which per-day z-scores (``agg_daily_zscore``) smear
    across the whole post-change period; the analyst reads the argmax
    row straight off the returned series.

    Cross-engine float discipline: daily revenue lands as EXACT integer
    cents (the per-row signed half-add of ``lib.exact_money_sum``);
    both engines then evaluate the IDENTICAL IEEE op sequence
    (run/100.0 − t·((total/100.0)/n)) on integers well inside 2^53, so
    every double matches bit-for-bit before the ROUND(…,4)+0.0
    canonicalization even touches it.  Beyond 2^53 total cents the
    recombination moves into decimal, the ``exact_money_sum`` scale>=4
    discipline.

    Scale: grain-first (the ``window_rolling_corr`` argument) — facts
    collapse to one row per day in ONE combiner-friendly hash agg; all
    three windows then run over the |days|-sized series (a few
    thousand rows for a decade), so the unpartitioned ordering is over
    dimension-sized data; per-metric series partition by the metric
    key."""
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
    ).agg(F.sum(units).alias("rev_cents"))
    w_run = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    run = F.sum("rev_cents").over(w_run).cast("double") / F.lit(100.0)
    t = F.row_number().over(Window.orderBy("day")).cast("double")
    mean = (
        F.sum("rev_cents").over(w_all).cast("double") / F.lit(100.0)
    ) / F.count(F.lit(1)).over(w_all).cast("double")
    return daily.select(
        "day",
        F.col("rev_cents").cast("long").alias("rev_cents"),
        (F.round(run - t * mean, 4) + F.lit(0.0)).alias("cusum_dollars"),
    )


@query(
    "window_drawdown",
    oracle="""
    WITH daily AS (
      SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS day,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_cents
      FROM orders GROUP BY 1
    )
    SELECT day, CAST(rev_cents AS BIGINT) AS rev_cents,
           CAST(MAX(rev_cents) OVER (
             ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS peak_cents,
           CAST(MAX(rev_cents) OVER (
             ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) - rev_cents AS BIGINT) AS drawdown_cents
    FROM daily
    """,
)
def window_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-peak deficit (drawdown) of daily revenue: each day's
    shortfall against the best day SEEN SO FAR — the running-extreme
    companion to ``window_cusum``'s running-sum deviation (CUSUM finds
    WHERE the regime changed; drawdown measures how far and how long
    the series sits below its peak — the recovery-tracking view).  The
    max row of ``drawdown_cents`` is the max drawdown.

    ALL-INTEGER output — daily revenue lands as exact cents (per-row
    signed half-add), the running max and subtraction stay in bigint,
    so the driver hash is bit-exact with no float discipline at all.

    Scale: grain-first — one combiner-friendly hash agg to the daily
    grain, one running-max window over the |days|-sized series (the
    ``window_daily_backlog`` single-partition-over-dimension-sized
    argument); per-metric series partition by the metric key."""
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
    ).agg(F.sum(units).alias("rev_cents"))
    w_run = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    peak = F.max("rev_cents").over(w_run)
    return daily.select(
        "day",
        F.col("rev_cents").cast("long").alias("rev_cents"),
        peak.cast("long").alias("peak_cents"),
        (peak - F.col("rev_cents")).cast("long").alias("drawdown_cents"),
    )

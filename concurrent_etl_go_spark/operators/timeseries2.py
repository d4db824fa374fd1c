"""Timeseries analytics, part 2: lagged autocorrelation, the stochastic
oscillator, and Croston's intermittent-demand forecast.

* ``window_autocorr`` — the ACF at lags 1..7 of the per-priority daily
  revenue series (Box & Jenkins, public literature): the seasonality /
  momentum diagnostic a forecasting pipeline reads before choosing lag
  features.  Computed RELATIONALLY — a position self-join on
  ``(priority, pos + k)`` — never an array fold, so the same equi-join
  plan holds at any series length.
* ``window_stochastic_osc`` — %K/%D (Lane's stochastic, public
  literature) over the same daily series: rolling 14-day min/max
  windows partitioned by priority, both emitted as EXACT integer
  millionths (``%D`` is the floor-mean of three integer %K values, so
  no float chain ever forms).
* ``agg_croston`` — Croston 1972 (public literature): the forecast for
  INTERMITTENT demand, two independent exponential folds — one over
  the nonzero demand sizes, one over the inter-arrival gaps — giving
  demand-per-day = size/interval.  The struct-accumulator encoding is
  banned (DuckDB list_reduce mis-evaluates struct accs; see
  operators/forecast.py), but Croston's two states never read each
  other, so each is a plain SCALAR fold — the exact idiom the
  hash-proven Holt family pins.

Cross-engine exactness: ACF mean-centering is done on the
integer lattice (``n*x_i - S`` — exact int64), products accumulate in
128-bit and downscale by a fixed 1e12 into int64 before ONE unrounded
shared-text division (the round-10 float rules); the oscillator is
pure integer floor division; Croston folds double-cast integers with
precomputed-literal alpha coefficients and emits ROUND(4) + 0.0 like
the proven forecast family.

Scale: the daily aggregation is the only event-row-sized step; the
ACF join, window frames, and folds all run on day-count-sized frames
(constant in corpus size per group).  Reference parity: no timeseries
surface exists in the reference (etl/main.go); extends SURVEY.md
§2.B's timeseries family beside ``operators/timeseries.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query, scoped_persist
from concurrent_etl_go_spark.sources.readers import read_table

_ACF_MAX_LAG = 7
#: Downscale divisor taking 128-bit centered-product sums into int64
#: before the double tree (max ~4e28 at sf1 -> ~4e16 after).
_ACF_K = "1000000000000"

#: Unrounded shared-tree ACF over exact int64 inputs.
_ACF = (
    "CASE WHEN denom_s <= 0 THEN 0.0"
    " ELSE (CAST(numer_s AS DOUBLE) / CAST(denom_s AS DOUBLE)) + 0.0 END"
)

_O_CENTS = "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"


def _acf_sql() -> str:
    return f"""
    WITH daily AS MATERIALIZED (
      SELECT o_orderpriority AS priority, date_trunc('day', o_orderdate)
               AS day,
             SUM({_O_CENTS}) AS cents
      FROM orders GROUP BY 1, 2
    ),
    pos AS MATERIALIZED (
      SELECT priority, cents,
             ROW_NUMBER() OVER (PARTITION BY priority ORDER BY day) AS p
      FROM daily
    ),
    stats AS MATERIALIZED (
      SELECT priority, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS s
      FROM pos GROUP BY 1
    ),
    dev AS MATERIALIZED (
      SELECT pos.priority, p, n,
             n * CAST(cents AS BIGINT) - s AS d
      FROM pos JOIN stats ON pos.priority = stats.priority
    ),
    denom AS MATERIALIZED (
      SELECT priority, n,
             CAST(SUM(CAST(d AS HUGEINT) * d) // {_ACF_K} AS BIGINT)
               AS denom_s
      FROM dev GROUP BY 1, 2
    ),
    lags AS (SELECT UNNEST(range(1, {_ACF_MAX_LAG + 1})) AS lag),
    pairs AS MATERIALIZED (
      SELECT a.priority, l.lag,
             CAST(a.d AS HUGEINT) * b.d AS prod
      FROM dev a CROSS JOIN lags l
      JOIN dev b ON b.priority = a.priority AND b.p = a.p + l.lag
    ),
    numer AS (
      SELECT priority, lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(CASE WHEN SUM(prod) < 0
                  THEN -(ABS(SUM(prod)) // {_ACF_K})
                  ELSE SUM(prod) // {_ACF_K} END AS BIGINT) AS numer_s
      FROM pairs GROUP BY 1, 2
    )
    SELECT numer.priority, CAST(lag AS BIGINT) AS lag, n_pairs,
           numer_s, denom_s, {_ACF} AS acf
    FROM numer JOIN denom ON numer.priority = denom.priority
    """


@query("window_autocorr", oracle=_acf_sql())
def window_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the per-priority daily revenue series at lags
    1..7, computed on the integer lattice: deviations are
    ``n*x_i - S`` (exact int64), lagged products pair up through an
    equi-join on ``(priority, position + lag)``, 128-bit product sums
    downscale by 1e12 (ABS-resigned so floor and truncating division
    agree), and the ACF ratio is one unrounded shared-text division.

    Scale: one orders scan -> day-keyed hash agg; the lag join is
    day-count x 7 rows regardless of corpus size."""
    big = "DECIMAL(38,0)"
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderdate", "o_totalprice"
    )
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.date_trunc("day", "o_orderdate").alias("day"),
    ).agg(F.sum(F.expr(_O_CENTS)).alias("cents"))
    pos = daily.select(
        "priority",
        "cents",
        F.row_number()
        .over(Window.partitionBy("priority").orderBy("day"))
        .alias("p"),
    )
    stats = pos.groupBy("priority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
    )
    dev = scoped_persist(
        pos.join(stats, "priority").select(
            "priority",
            "p",
            "n",
            F.expr("n * CAST(cents AS BIGINT) - s").alias("d"),
        )
    )
    denom = dev.groupBy("priority", "n").agg(
        F.expr(
            f"CAST(CAST(SUM(CAST(d AS {big}) * d) AS {big})"
            f" div {_ACF_K} AS BIGINT)"
        ).alias("denom_s")
    )
    lags = spark.range(1, _ACF_MAX_LAG + 1).select(
        F.col("id").alias("lag")
    )
    b = dev.select(
        F.col("priority").alias("priority_b"),
        F.col("p").alias("p_b"),
        F.col("d").alias("d_b"),
    )
    pairs = (
        dev.crossJoin(F.broadcast(lags))
        .join(
            b,
            (F.col("priority_b") == F.col("priority"))
            & (F.col("p_b") == F.col("p") + F.col("lag")),
        )
        .select(
            "priority", "lag", F.expr(f"CAST(d AS {big}) * d_b").alias("prod")
        )
    )
    numer = pairs.groupBy("priority", "lag").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.expr(
            f"CAST(CASE WHEN SUM(prod) < 0"
            f" THEN -(ABS(SUM(prod)) div {_ACF_K})"
            f" ELSE SUM(prod) div {_ACF_K} END AS BIGINT)"
        ).alias("numer_s"),
    )
    return numer.join(denom, "priority").select(
        "priority",
        F.col("lag").cast("long").alias("lag"),
        "n_pairs",
        "numer_s",
        "denom_s",
        F.expr(_ACF).alias("acf"),
    )


# --------------------------------------------------------------------------
# stochastic oscillator %K / %D
# --------------------------------------------------------------------------

_OSC_WIN = 14  # lookback days for the rolling low/high
_OSC_SMOOTH = 3  # %D smoothing width


def _osc_sql() -> str:
    return f"""
    WITH daily AS MATERIALIZED (
      SELECT o_orderpriority AS priority, date_trunc('day', o_orderdate)
               AS day,
             SUM({_O_CENTS}) AS cents
      FROM orders GROUP BY 1, 2
    ),
    w AS MATERIALIZED (
      SELECT priority, day, CAST(cents AS BIGINT) AS cents,
             CAST(MIN(cents) OVER (PARTITION BY priority ORDER BY day
               ROWS BETWEEN {_OSC_WIN - 1} PRECEDING AND CURRENT ROW)
               AS BIGINT) AS lo,
             CAST(MAX(cents) OVER (PARTITION BY priority ORDER BY day
               ROWS BETWEEN {_OSC_WIN - 1} PRECEDING AND CURRENT ROW)
               AS BIGINT) AS hi,
             ROW_NUMBER() OVER (PARTITION BY priority ORDER BY day) AS rn
      FROM daily
    ),
    k AS MATERIALIZED (
      SELECT priority, day, cents, rn, lo, hi,
             CASE WHEN hi = lo THEN 500000 ELSE
               CAST((CAST(cents AS HUGEINT) - lo) * 1000000 // (hi - lo)
                    AS BIGINT) END AS k_e6
      FROM w
    ),
    d AS (
      SELECT priority, day, cents, lo, hi, rn, k_e6,
             CAST(SUM(k_e6) OVER (PARTITION BY priority ORDER BY day
               ROWS BETWEEN {_OSC_SMOOTH - 1} PRECEDING AND CURRENT ROW)
               // {_OSC_SMOOTH} AS BIGINT) AS d_e6
      FROM k
    )
    SELECT priority, day, cents, lo, hi, k_e6, d_e6
    FROM d WHERE rn >= {_OSC_WIN + _OSC_SMOOTH - 1}
    """


@query("window_stochastic_osc", oracle=_osc_sql())
def window_stochastic_osc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stochastic oscillator over per-priority daily revenue:
    %K = (close - 14-day low) * 1e6 / (14-day high - low) and
    %D = floor-mean of the last three %K values — BOTH exact integer
    millionths (a flat window pins %K to 500000 by convention), rows
    restricted to full lookback+smoothing windows so every emitted
    value has complete history.

    Scale: one hash agg to days, then frame-bounded windows partitioned
    by priority — day-count-sized state per group."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderdate", "o_totalprice"
    )
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.date_trunc("day", "o_orderdate").alias("day"),
    ).agg(F.sum(F.expr(_O_CENTS)).alias("cents"))
    wp = Window.partitionBy("priority").orderBy("day")
    wf = wp.rowsBetween(-(_OSC_WIN - 1), Window.currentRow)
    w = daily.select(
        "priority",
        "day",
        F.col("cents").cast("long").alias("cents"),
        F.min("cents").over(wf).cast("long").alias("lo"),
        F.max("cents").over(wf).cast("long").alias("hi"),
        F.row_number().over(wp).alias("rn"),
    )
    big = "DECIMAL(38,0)"
    k = w.withColumn(
        "k_e6",
        F.expr(
            f"CASE WHEN hi = lo THEN 500000 ELSE"
            f" CAST((CAST(cents AS {big}) - lo) * 1000000 div (hi - lo)"
            f" AS BIGINT) END"
        ),
    )
    ws = wp.rowsBetween(-(_OSC_SMOOTH - 1), Window.currentRow)
    d = k.withColumn("k_sum", F.sum("k_e6").over(ws)).withColumn(
        "d_e6", F.expr(f"CAST(k_sum div {_OSC_SMOOTH} AS BIGINT)")
    )
    return d.where(F.col("rn") >= _OSC_WIN + _OSC_SMOOTH - 1).select(
        "priority", "day", "cents", "lo", "hi", "k_e6", "d_e6"
    )


# --------------------------------------------------------------------------
# Croston's intermittent-demand forecast
# --------------------------------------------------------------------------

_CR_ALPHA = 0.2
#: Scalar SES fold — precomputed literals (pure literal DIVISION is not
#: portable; literal constants are), identical text in both dialects.
_CR_FOLD = f"(acc, x) -> {_CR_ALPHA} * x + {1.0 - _CR_ALPHA} * acc"
#: Croston demand-per-day rate: size state / interval state.
_CR_RATE = "CASE WHEN p <= 0.0 THEN 0.0 ELSE z / p END"
_CR_MIN_DEMANDS = 5
_CR_MAX_DEMANDS = 60
_CR_TOP = 20


def _croston_sql() -> str:
    return f"""
    WITH daily AS MATERIALIZED (
      SELECT l_partkey AS partkey, date_trunc('day', l_shipdate) AS day,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS qty
      FROM lineitem GROUP BY 1, 2
    ),
    series AS MATERIALIZED (
      SELECT partkey,
             list(qty ORDER BY day) AS sizes,
             list(day ORDER BY day) AS days,
             COUNT(*) AS n_demands,
             CAST(SUM(CAST(qty AS BIGINT)) AS BIGINT) AS total_qty
      FROM daily GROUP BY 1
      HAVING COUNT(*) BETWEEN {_CR_MIN_DEMANDS} AND {_CR_MAX_DEMANDS}
    ),
    picked AS MATERIALIZED (
      SELECT * FROM series ORDER BY partkey LIMIT {_CR_TOP}
    ),
    gaps AS MATERIALIZED (
      SELECT partkey, n_demands, total_qty, sizes,
             [CAST(date_diff('day', days[i - 1], days[i]) AS DOUBLE)
              for i in range(2, len(days) + 1)] AS gaps
      FROM picked
    ),
    states AS (
      SELECT partkey, n_demands, total_qty,
             list_reduce(sizes, {_CR_FOLD}) AS z,
             list_reduce(gaps, {_CR_FOLD}) AS p
      FROM gaps
    )
    SELECT partkey, CAST(n_demands AS BIGINT) AS n_demands, total_qty,
           ROUND(z, 4) + 0.0 AS size_state,
           ROUND(p, 4) + 0.0 AS interval_state,
           ROUND({_CR_RATE}, 4) + 0.0 AS rate_per_day
    FROM states
    """


@query("agg_croston", oracle=_croston_sql())
def agg_croston(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's method over intermittent per-part demand (daily
    shipped quantity): exponential smoothing of the nonzero demand
    SIZES and, independently, of the inter-demand day GAPS; the
    demand-per-day rate is size/interval.  Two plain scalar folds —
    never a struct accumulator (DuckDB's list_reduce struct quirk,
    operators/forecast.py) — seeded with each list's first element
    exactly as ``list_reduce`` seeds.  Deterministic part panel: the
    {_CR_TOP} smallest partkeys with {_CR_MIN_DEMANDS}..{_CR_MAX_DEMANDS}
    demand days.

    Scale: one lineitem scan -> (part, day) hash agg; folds run on
    bounded per-part series (<= {_CR_MAX_DEMANDS} elements)."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_quantity"
    )
    daily = li.groupBy(
        F.col("l_partkey").alias("partkey"),
        F.date_trunc("day", "l_shipdate").alias("day"),
    ).agg(
        F.sum(F.col("l_quantity").cast("long"))
        .cast("double")
        .alias("qty")
    )
    series = (
        daily.groupBy("partkey")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("day", "qty"))),
                lambda s: s["qty"],
            ).alias("sizes"),
            F.array_sort(F.collect_list("day")).alias("days"),
            F.count(F.lit(1)).alias("n_demands"),
            F.sum(F.col("qty").cast("long")).cast("long").alias(
                "total_qty"
            ),
        )
        .where(
            F.col("n_demands").between(_CR_MIN_DEMANDS, _CR_MAX_DEMANDS)
        )
        .orderBy("partkey")
        .limit(_CR_TOP)
    )
    gaps = series.select(
        "partkey",
        "n_demands",
        "total_qty",
        "sizes",
        F.expr(
            "transform(sequence(2, size(days)), i -> "
            "CAST(datediff(element_at(days, i),"
            " element_at(days, i - 1)) AS DOUBLE))"
        ).alias("gaps"),
    )
    states = gaps.select(
        "partkey",
        "n_demands",
        "total_qty",
        F.expr(
            f"aggregate(slice(sizes, 2, size(sizes) - 1), "
            f"element_at(sizes, 1), {_CR_FOLD})"
        ).alias("z"),
        F.expr(
            f"aggregate(slice(gaps, 2, size(gaps) - 1), "
            f"element_at(gaps, 1), {_CR_FOLD})"
        ).alias("p"),
    )
    return states.select(
        "partkey",
        F.col("n_demands").cast("long").alias("n_demands"),
        "total_qty",
        F.expr("ROUND(z, 4) + 0.0").alias("size_state"),
        F.expr("ROUND(p, 4) + 0.0").alias("interval_state"),
        F.expr(f"ROUND({_CR_RATE}, 4) + 0.0").alias("rate_per_day"),
    )


#: Unrounded shared tree over exact int64s: the weekday's mean daily
#: revenue (cents).
_WD_MEAN = "(CAST(sum_cents AS DOUBLE) / n_days) + 0.0"


@query(
    "agg_weekday_seasonality",
    oracle=f"""
    WITH daily AS MATERIALIZED (
      SELECT date_trunc('day', o_orderdate) AS day,
             CAST(SUM({_O_CENTS}) AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ),
    wd AS MATERIALIZED (
      SELECT CAST(isodow(day) - 1 AS BIGINT) AS dow,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(cents) AS BIGINT) AS sum_cents
      FROM daily GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(n_days) AS BIGINT) AS nt,
             CAST(SUM(sum_cents) AS BIGINT) AS st
      FROM wd
    )
    SELECT dow, n_days, sum_cents,
           {_WD_MEAN} AS mean_cents,
           CAST(CAST(sum_cents AS HUGEINT) * nt * 1000000
                // (CAST(n_days AS HUGEINT) * st) AS BIGINT)
             AS index_e6
    FROM wd CROSS JOIN tot
    """,
)
def agg_weekday_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday seasonality index of daily order revenue: each
    Monday-based weekday's mean daily revenue relative to the overall
    mean, as an exact integer in millionths (1e6 = an average day).
    The one-glance day-of-week profile a forecaster reads before
    choosing the seasonal-naive lag (`agg_forecast_backtest` uses 7).

    Weekday parity: Spark ``weekday()`` (0 = Monday) equals DuckDB
    ``isodow - 1``.  Scale: one orders scan -> day hash agg -> 7-row
    agg."""
    big = "DECIMAL(38,0)"
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    )
    daily = orders.groupBy(
        F.date_trunc("day", "o_orderdate").alias("day")
    ).agg(F.sum(F.expr(_O_CENTS)).cast("long").alias("cents"))
    wd = daily.groupBy(
        F.expr("CAST(weekday(day) AS BIGINT)").alias("dow")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("cents").cast("long").alias("sum_cents"),
    )
    tot = wd.agg(
        F.sum("n_days").cast("long").alias("nt"),
        F.sum("sum_cents").cast("long").alias("st"),
    )
    return wd.crossJoin(F.broadcast(tot)).select(
        "dow",
        "n_days",
        "sum_cents",
        F.expr(_WD_MEAN).alias("mean_cents"),
        F.expr(
            f"CAST(CAST(sum_cents AS {big}) * nt * 1000000"
            f" div (CAST(n_days AS {big}) * st) AS BIGINT)"
        ).alias("index_e6"),
    )


_SEAS_HALF = 3  # centered moving-average half-width (7-day window)


@query(
    "agg_seasonal_strength",
    oracle=f"""
    WITH daily AS MATERIALIZED (
      SELECT date_trunc('day', o_orderdate) AS day,
             CAST(SUM({_O_CENTS}) AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ),
    w AS MATERIALIZED (
      SELECT day, cents,
             CAST(SUM(cents) OVER (ORDER BY day
               ROWS BETWEEN {_SEAS_HALF} PRECEDING
               AND {_SEAS_HALF} FOLLOWING) AS BIGINT) AS sum7,
             CAST(COUNT(*) OVER (ORDER BY day
               ROWS BETWEEN {_SEAS_HALF} PRECEDING
               AND {_SEAS_HALF} FOLLOWING) AS BIGINT) AS cnt7,
             ROW_NUMBER() OVER (ORDER BY day) AS rn,
             COUNT(*) OVER () AS nall
      FROM daily
    ),
    det AS MATERIALIZED (
      SELECT CAST(isodow(day) - 1 AS BIGINT) AS dow,
             7 * cents - sum7 AS d
      FROM w WHERE cnt7 = 7
    ),
    g AS MATERIALIZED (
      SELECT dow, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(d) AS BIGINT) AS s,
             SUM(CAST(d AS HUGEINT) * d) AS ss
      FROM det GROUP BY 1
    ),
    a AS (
      SELECT dow, n, s, ss,
             CAST(s AS HUGEINT) * s // n AS a_g
      FROM g
    ),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nt, SUM(s) AS st,
             SUM(ss) AS sst, SUM(a_g) AS asum
      FROM a
    ),
    f AS (
      SELECT nt,
             GREATEST(asum - (CAST(st AS HUGEINT) * st // nt), 0) AS ssb,
             GREATEST(sst - (CAST(st AS HUGEINT) * st // nt), 0) AS sst_c
      FROM tot
    )
    SELECT nt AS n_days_used,
           CAST(ssb // 1000 AS BIGINT) AS ssb_s,
           CAST(sst_c // 1000 AS BIGINT) AS sst_s,
           CASE WHEN sst_c <= 0 THEN 0 ELSE
             CAST(ssb * 1000000 // sst_c AS BIGINT) END
             AS seasonal_strength_e6
    FROM f
    """,
)
def agg_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly seasonal strength of daily revenue (the Hyndman &
    Athanasopoulos FPP decomposition readout, public literature):
    detrend with a centered 7-day moving average kept INTEGER by
    scaling (``7*x - sum7`` — full windows only), then measure how much
    of the detrended variance the weekday explains — the ANOVA
    between-group share ``SSB/SST`` as exact integer millionths.
    ~1e6 = rigid weekly seasonality, ~0 = no weekday effect.

    Scale: one day-keyed hash agg; the centered window and the 7-group
    moment agg are day-count sized.

    Caveat shared with the ANOVA family: negative detrended values are
    fine (all moments are signed 128-bit; per-group ``s^2/n`` uses a
    non-negative square so floor == truncate on both engines)."""
    big = "DECIMAL(38,0)"
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    )
    daily = orders.groupBy(
        F.date_trunc("day", "o_orderdate").alias("day")
    ).agg(F.sum(F.expr(_O_CENTS)).cast("long").alias("cents"))
    wf = Window.orderBy("day").rowsBetween(-_SEAS_HALF, _SEAS_HALF)
    w = daily.select(
        "day",
        "cents",
        F.sum("cents").over(wf).cast("long").alias("sum7"),
        F.count(F.lit(1)).over(wf).cast("long").alias("cnt7"),
    )
    det = w.where(F.col("cnt7") == 7).select(
        F.expr("CAST(weekday(day) AS BIGINT)").alias("dow"),
        (7 * F.col("cents") - F.col("sum7")).alias("d"),
    )
    g = det.groupBy("dow").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("d").cast("long").alias("s"),
        F.sum(F.expr(f"CAST(d AS {big}) * d")).alias("ss"),
    )
    a = g.select(
        "n",
        "s",
        "ss",
        F.expr(
            f"CAST((CAST(s AS {big}) * s"
            f" - CAST(s AS {big}) * s % n) / n AS {big})"
        ).alias("a_g"),
    )
    tot = a.agg(
        F.sum("n").cast("long").alias("nt"),
        F.sum("s").alias("st"),
        F.sum("ss").alias("sst"),
        F.sum("a_g").alias("asum"),
    )
    f = tot.select(
        "nt",
        F.expr(
            f"GREATEST(asum - CAST((CAST(st AS {big}) * st"
            f" - CAST(st AS {big}) * st % nt) / nt AS {big}),"
            f" CAST(0 AS {big}))"
        ).alias("ssb"),
        F.expr(
            f"GREATEST(sst - CAST((CAST(st AS {big}) * st"
            f" - CAST(st AS {big}) * st % nt) / nt AS {big}),"
            f" CAST(0 AS {big}))"
        ).alias("sst_c"),
    )
    return f.select(
        F.col("nt").alias("n_days_used"),
        F.expr("CAST(ssb div 1000 AS BIGINT)").alias("ssb_s"),
        F.expr("CAST(sst_c div 1000 AS BIGINT)").alias("sst_s"),
        F.expr(
            "CASE WHEN sst_c <= 0 THEN 0 ELSE"
            " CAST(ssb * 1000000 div (sst_c) AS BIGINT) END"
        ).alias("seasonal_strength_e6"),
    )

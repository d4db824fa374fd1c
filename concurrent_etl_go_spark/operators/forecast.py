"""Double-exponential (Brown) smoothing forecast — the trend-aware
upgrade of ``agg_ewma`` (operators/profiling.py), per VERDICT r8 item 7.

Brown's linear exponential smoothing (public literature; the
single-parameter form of Holt's method): smooth the series once
(``s1``), smooth the smoothed series again (``s2``), then

    level    = 2*s1 - s2
    trend    = alpha/(1-alpha) * (s1 - s2)
    forecast = level + h * trend

Exactness: the obvious one-pass encoding (a {s1, s2} STRUCT
accumulator) is NOT portable — probing DuckDB 1.0's ``list_reduce``
showed the second struct field's ``acc.s1`` reference reading the
step's NEW s1 from the third element on (a common-subexpression quirk),
so the engines would diverge.  Instead both sides run SCALAR left folds
only, the semantics the proven ``agg_ewma`` already pins:

* ``s1s[i]`` — the EWMA fold over the first i daily values (prefix
  fold, seeded with the first element exactly as ``list_reduce``
  seeds);
* ``s2`` — the same scalar fold applied to the ``s1s`` series;
* level/trend/forecast — ONE shared SQL text evaluated verbatim by
  both engines, then ``ROUND(x, 4) + 0.0`` canonicalizes representation
  and signed zero (a negative trend can round to -0.0).

The prefix family costs O(days²) multiply-adds per group — bounded by
the SERIES length (days), never by event rows, so it is flat work even
at 100 TB of events; for unbounded series chunk by month and carry
(s1, s2) as the next chunk's seeds (exponential smoothing composes).

Reference parity: no forecasting surface exists in the reference
(etl/main.go); extends SURVEY.md §2.B's timeseries family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.sources.readers import read_table

_ALPHA = 0.3

#: The scalar EWMA fold body — identical text in both dialects.
_FOLD = f"(acc, x) -> {_ALPHA} * x + {1 - _ALPHA} * acc"

#: Shared final-expression texts (evaluated verbatim by BOTH engines —
#: identical IEEE trees by construction).
_LEVEL = "2.0 * s1 - s2"
_TREND = f"{_ALPHA} * (s1 - s2) / {1 - _ALPHA}"
_F1 = f"({_LEVEL}) + ({_TREND})"
_F3 = f"({_LEVEL}) + 3.0 * ({_TREND})"


def _emit(expr: str, alias: str) -> str:
    return f"ROUND({expr}, 4) + 0.0 AS {alias}"


_DECAY_TOP = 25


@query(
    "agg_time_decay_score",
    oracle=f"""
    WITH anchor AS (
      SELECT MAX(o_orderdate) AS mx FROM orders
    ),
    scored AS (
      SELECT o_custkey AS custkey,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS total_cents,
             CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                      * 1000
                      // (1 + date_diff('day', o_orderdate, a.mx)))
                  AS BIGINT) AS decay_score
      FROM orders CROSS JOIN anchor a
      GROUP BY 1
    )
    SELECT custkey, CAST(n_orders AS BIGINT) AS n_orders,
           total_cents, decay_score
    FROM scored
    ORDER BY decay_score DESC, custkey LIMIT {_DECAY_TOP}
    """,
)
def agg_time_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decayed customer spend score with HYPERBOLIC decay: each
    order contributes ``cents * 1000 div (1 + age_days)`` relative to
    the newest order date — the "recent revenue counts more" ranking
    signal behind churn/LTV triage, kept PURE INTEGER (the exponential
    half-life form needs ``pow``, whose last-ulp differences could flip
    a floor across engines; the hyperbolic kernel is a rational
    function of integer inputs, so the score is exact and
    order-independent).  Top ``_DECAY_TOP`` customers by
    (score DESC, custkey).

    Overflow envelope: cents <= 5e7 per order, x1000 = 5e10; a
    customer with a million orders reaches ~5e16 — inside int64 with
    two orders of magnitude to spare.  Scale: one hash agg keyed on
    customer with three integer accumulators; the anchor date is a
    broadcast one-row frame; TakeOrdered for the top-N."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    anchor = orders.agg(F.max("o_orderdate").alias("mx"))
    cents = "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"
    scored = (
        orders.crossJoin(F.broadcast(anchor))
        .select(
            F.col("o_custkey").alias("custkey"),
            F.expr(cents).alias("cents"),
            F.expr(
                f"{cents} * 1000"
                " div (1 + datediff(mx, o_orderdate))"
            ).alias("contrib"),
        )
        .groupBy("custkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("total_cents"),
            F.sum("contrib").cast("long").alias("decay_score"),
        )
    )
    return scored.orderBy(F.desc("decay_score"), "custkey").limit(
        _DECAY_TOP
    )


@query(
    "agg_holt_forecast",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(COUNT(*) AS DOUBLE) AS n
      FROM events GROUP BY 1, 2
    ),
    series AS (
      SELECT event_type, list(n ORDER BY day) AS vals
      FROM daily GROUP BY 1
    ),
    smoothed AS (
      SELECT event_type,
             [list_reduce(vals[1:i], {_FOLD})
              for i in range(1, len(vals) + 1)] AS s1s
      FROM series
    ),
    states AS (
      SELECT event_type,
             s1s[len(s1s)] AS s1,
             list_reduce(s1s, {_FOLD}) AS s2
      FROM smoothed
    )
    SELECT event_type,
           {_emit('s1', 's1_smooth')},
           {_emit('s2', 's2_smooth')},
           {_emit(_LEVEL, 'level')},
           {_emit(_TREND, 'trend')},
           {_emit(_F1, 'forecast_1')},
           {_emit(_F3, 'forecast_3')}
    FROM states
    """,
)
def agg_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type Brown double-exponential smoothing over the daily
    volume series: both smoothing states, the implied level and trend,
    and the 1-day and 3-day-ahead forecasts — the capacity-planning
    readout next to ``agg_ewma``'s flat smoothing (a growing event type
    forecasts ABOVE its last level; EWMA alone lags trends by
    construction)."""
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
    # prefix folds: aggregate(slice(vals, 2, i - 1), vals[1], fold) IS
    # list_reduce(vals[1:i], fold) — the same left fold seeded with the
    # first element, applied to elements 2..i
    smoothed = series.select(
        "event_type",
        F.expr(
            "transform(sequence(1, size(vals)), i -> "
            f"aggregate(slice(vals, 2, i - 1), element_at(vals, 1), "
            f"{_FOLD}))"
        ).alias("s1s"),
    )
    states = smoothed.select(
        "event_type",
        F.expr("element_at(s1s, size(s1s))").alias("s1"),
        F.expr(
            "aggregate(slice(s1s, 2, size(s1s) - 1), "
            f"element_at(s1s, 1), {_FOLD})"
        ).alias("s2"),
    )
    return states.selectExpr(
        "event_type",
        _emit("s1", "s1_smooth"),
        _emit("s2", "s2_smooth"),
        _emit(_LEVEL, "level"),
        _emit(_TREND, "trend"),
        _emit(_F1, "forecast_1"),
        _emit(_F3, "forecast_3"),
    )


_BT_HOLDOUT = 3  # backtest horizon (last N days of each series)
_BT_SEASON = 7  # seasonal-naive lag (positions, weekly)
_BT_MIN_LEN = _BT_HOLDOUT + _BT_SEASON + 1  # shortest eligible series


def _bt_exprs(engine: str, h: int) -> list[str]:
    """The six backtest output expressions for horizon ``h`` — the SAME
    fragment strings feed both dialects; only the list-index function
    differs (``vals[i]`` vs ``element_at(vals, i)``)."""
    fc = f"({_LEVEL}) + {float(h)} * ({_TREND})"
    a_idx = f"n - {_BT_HOLDOUT} + {h}"
    nv_idx = f"n - {_BT_HOLDOUT} + {h} - {_BT_SEASON}"
    if engine == "duckdb":
        actual, naive = f"vals[{a_idx}]", f"vals[{nv_idx}]"
    else:
        actual = f"element_at(vals, CAST({a_idx} AS INT))"
        naive = f"element_at(vals, CAST({nv_idx} AS INT))"
    return [
        "event_type",
        f"CAST({h} AS BIGINT) AS h",
        f"ROUND({fc}, 4) + 0.0 AS forecast",
        f"CAST({actual} AS BIGINT) AS actual",
        f"ROUND(ABS(({fc}) - {actual}), 4) + 0.0 AS abs_err",
        f"CAST(ABS({naive} - {actual}) AS BIGINT) AS naive_abs_err",
    ]


def _bt_rows_sql() -> str:
    return "\n    UNION ALL\n    ".join(
        "SELECT " + ", ".join(_bt_exprs("duckdb", h)) + " FROM states"
        for h in range(1, _BT_HOLDOUT + 1)
    )


@query(
    "agg_forecast_backtest",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(COUNT(*) AS DOUBLE) AS n
      FROM events GROUP BY 1, 2
    ),
    series AS (
      SELECT event_type, list(n ORDER BY day) AS vals,
             len(list(n)) AS n
      FROM daily GROUP BY 1
      HAVING len(list(n)) >= {_BT_MIN_LEN}
    ),
    smoothed AS (
      SELECT event_type, vals, n,
             [list_reduce(vals[1:i], {_FOLD})
              for i in range(1, n - {_BT_HOLDOUT} + 1)] AS s1s
      FROM series
    ),
    states AS (
      SELECT event_type, vals, n,
             s1s[len(s1s)] AS s1,
             list_reduce(s1s, {_FOLD}) AS s2
      FROM smoothed
    )
    {_bt_rows_sql()}
    """,
)
def agg_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holdout backtest of the Brown forecaster: per event type, fit on
    the series MINUS its last ``_BT_HOLDOUT`` days, forecast each
    held-out position, and report the absolute error next to the
    seasonal-naive baseline (the value ``_BT_SEASON`` positions
    earlier) — the forecast family's measured-not-claimed query,
    sibling of ``rec_eval_hit_rate`` and ``search_eval_*``.  A Holt
    row beating naive_abs_err is the model earning its keep; the MASE
    denominator is exactly this baseline (Hyndman & Koehler 2006).

    The fit reuses the scalar prefix-fold discipline of
    ``agg_holt_forecast`` on the TRAIN slice; actual/naive values are
    list indexing over the same ordered series, so the only float
    surface is the pinned fold + one shared forecast expression,
    ROUND(4)+0.0 at every emission.  Series shorter than
    ``_BT_MIN_LEN`` days are excluded by the identical HAVING rule on
    both sides."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    series = (
        daily.groupBy("event_type")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("day", "n"))),
                lambda s: s["n"],
            ).alias("vals")
        )
        .withColumn("n", F.size("vals"))
        .where(F.col("n") >= _BT_MIN_LEN)
    )
    smoothed = series.select(
        "event_type",
        "vals",
        "n",
        F.expr(
            f"transform(sequence(1, size(vals) - {_BT_HOLDOUT}), i -> "
            f"aggregate(slice(vals, 2, i - 1), element_at(vals, 1), "
            f"{_FOLD}))"
        ).alias("s1s"),
    )
    states = smoothed.select(
        "event_type",
        "vals",
        "n",
        F.expr("element_at(s1s, size(s1s))").alias("s1"),
        F.expr(
            "aggregate(slice(s1s, 2, size(s1s) - 1), "
            f"element_at(s1s, 1), {_FOLD})"
        ).alias("s2"),
    )
    out = None
    for h in range(1, _BT_HOLDOUT + 1):
        row = states.selectExpr(*_bt_exprs("spark", h))
        out = row if out is None else out.unionByName(row)
    return out



"""Timeseries technical-indicator pack: MACD, Bollinger bands, VWAP,
and Wilder RSI over the order-revenue series — the standard
dashboard indicators (Appel's MACD, Bollinger 1980s, Wilder 1978; all
public literature) an analytics engine serves next to the
smoothing/forecast family (``agg_ewma``, ``agg_holt_forecast``).

Cross-engine float discipline (SURVEY §7.6):

* All series values are exact integers (daily revenue cents, counts,
  quantities) collected into deterministically-ordered arrays.
* EMAs are SCALAR prefix folds seeded with the first element — the
  ``agg_ewma`` / ``agg_holt_forecast`` convention both engines execute
  as the identical left-to-right IEEE sequence (``list_reduce`` ==
  ``aggregate(slice(...), first, fold)``); alphas are shared decimal
  literals.
* Bollinger mean/sigma derive from INTEGER rolling sums (S1, S2, n) via
  one shared expression; the breach flag compares doubles computed from
  the same integers on both engines.
* VWAP is a pure integer floor division (cents per unit).
* Emissions are UNROUNDED ``+ 0.0``: every emitted float is a
  shared-IEEE-tree function of exact integers, so the engines produce
  BIT-IDENTICAL doubles and rounding would only ADD risk — at 1e9-cent
  magnitudes ROUND(x, 4) is itself the hazard (Spark rounds the
  shortest-decimal repr HALF_UP, DuckDB rounds the binary value; a
  value landing on a .00005 boundary flips — observed at sf0.1 on both
  MACD and Bollinger before this form).  Fold states are likewise never
  re-rounded mid-sequence (the round-10 betweenness triage:
  grid-snapping intermediate rationals MANUFACTURES half-way ties).

Scale: every query collapses to a grain first (day x small dimension),
so fold arrays are bounded by SERIES LENGTH, never row count; for
unbounded series chunk by month and carry fold states as seeds
(exponential smoothing composes).  Reference parity: the reference
(etl/main.go) has no analytics surface; extends SURVEY.md §2.B.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query, scoped_persist
from concurrent_etl_go_spark.sources.readers import read_table

#: Exact integer cents for an order's price.
_CENTS = "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"

#: Shared EMA fold bodies (identical text in both dialects).  Alphas are
#: the classic 12/26/9-period smoothing factors as exact decimal
#: literals (2/(n+1) rounded to 10 places — a PARAMETER, not a derived
#: quantity, so the literal IS the definition).
_A12, _A26, _A9 = "0.1538461538", "0.0740740741", "0.2"
_FOLD12 = f"(acc, x) -> {_A12} * x + (1.0 - {_A12}) * acc"
_FOLD26 = f"(acc, x) -> {_A26} * x + (1.0 - {_A26}) * acc"
_FOLD9 = f"(acc, x) -> {_A9} * x + (1.0 - {_A9}) * acc"


#: Two-level prefix-fold chunk size.  A flat prefix fold re-runs the
#: fold from element 1 for every i — O(days^2) lambda evaluations
#: (~2.9M per EMA at a 2,400-day series, the most expensive real
#: compute in the round-10 headline).  The two-level form first
#: computes fold states at chunk boundaries (seeds), then folds each
#: prefix only from its chunk start seeded by the boundary state —
#: O(days * (days/c + c) / 2) evaluations, ~24x less at c ~ sqrt(days).
#: BIT-IDENTICAL by construction: a left fold from a boundary state
#: continues the exact same IEEE operation sequence as the flat fold
#: (fold(x[1..i]) == fold(x[s+1..i], init=fold(x[1..s]))) — no
#: re-rounding, no re-association; probed on both engines (300-element
#: series, 0 mismatching bits) before adoption, per the round-9
#: list_reduce discipline.  c is a fixed constant so the oracle text is
#: static; sqrt(2400) ~ 49, 64 keeps both levels balanced out to
#: ~40 years of days.
_CHUNK = 64


def _seeds_sql(src: str, fold: str) -> str:
    """DuckDB chunk-boundary fold states: seeds[j+1] = fold over the
    first j*c elements (j = 0 slot is an unused placeholder so the list
    indexes 1-based without a branch on the consumer side)."""
    c = _CHUNK
    return (
        f"[CASE WHEN j = 0 THEN {src}[1]"
        f" ELSE list_reduce({src}[1 : cast(j*{c} as int)], {fold}) END"
        f" for j in range(0, cast(ceil(len({src}) / {c}.0) as int))]"
    )


def _prefix2_sql(src: str, seeds: str, fold: str) -> str:
    """DuckDB two-level prefix-fold list: [fold over src[1:i]] for each
    i, resumed from the chunk-boundary state in ``seeds``."""
    c = _CHUNK
    return (
        f"[CASE WHEN i <= {c} THEN list_reduce({src}[1:i], {fold})"
        f" ELSE list_reduce(list_prepend("
        f"{seeds}[cast((i-1)//{c} as int)+1],"
        f" {src}[cast((i-1)//{c} as int)*{c}+1 : cast(i as int)]), {fold})"
        f" END for i in range(1, len({src}) + 1)]"
    )


def _seeds_spark(src: str, fold: str) -> str:
    """Spark twin of ``_seeds_sql`` (same left fold, same seeding)."""
    c = _CHUNK
    return (
        f"transform(sequence(0, cast(ceil(size({src}) / {c}.0) as int) - 1),"
        f" j -> CASE WHEN j = 0 THEN element_at({src}, 1)"
        f" ELSE aggregate(slice({src}, 2, j*{c} - 1),"
        f" element_at({src}, 1), {fold}) END)"
    )


def _prefix2_spark(src: str, seeds: str, fold: str) -> str:
    """Spark twin of ``_prefix2_sql``.  ``seeds`` MUST name a stored
    column behind a persist boundary: lambda-captured expressions inline
    at every reference (the minhash lesson), and an inlined seeds
    expression would re-run once per transform ELEMENT — O(days^2)
    again, silently."""
    c = _CHUNK
    return (
        f"transform(sequence(1, size({src})), i -> "
        f"CASE WHEN i <= {c} THEN aggregate(slice({src}, 2, i - 1),"
        f" element_at({src}, 1), {fold})"
        f" ELSE aggregate("
        f"slice({src}, cast((i-1) div {c} as int)*{c} + 1,"
        f" i - cast((i-1) div {c} as int)*{c}),"
        f" element_at({seeds}, cast((i-1) div {c} as int) + 1), {fold})"
        f" END)"
    )


@query(
    "window_macd",
    oracle=f"""
    WITH daily AS (
      SELECT o_orderpriority AS grp, date_trunc('day', o_orderdate) AS day,
             CAST(SUM({_CENTS}) AS DOUBLE) AS v
      FROM orders GROUP BY 1, 2
    ),
    series AS (
      SELECT grp, list(v ORDER BY day) AS vals, list(day ORDER BY day) AS days
      FROM daily GROUP BY 1
    ),
    sd AS MATERIALIZED (
      SELECT grp, days, vals,
             {_seeds_sql('vals', _FOLD12)} AS sd12,
             {_seeds_sql('vals', _FOLD26)} AS sd26
      FROM series
    ),
    emas AS MATERIALIZED (
      SELECT grp, days,
             {_prefix2_sql('vals', 'sd12', _FOLD12)} AS e12,
             {_prefix2_sql('vals', 'sd26', _FOLD26)} AS e26
      FROM sd
    ),
    macd AS MATERIALIZED (
      SELECT grp, days,
             [e12[i] - e26[i] for i in range(1, len(e12) + 1)] AS macds
      FROM emas
    ),
    ms AS MATERIALIZED (
      SELECT grp, days, macds,
             {_seeds_sql('macds', _FOLD9)} AS sd9
      FROM macd
    ),
    sig AS MATERIALIZED (
      SELECT grp, days, macds,
             {_prefix2_sql('macds', 'sd9', _FOLD9)} AS signals
      FROM ms
    )
    SELECT grp,
           CAST(unnest(range(1, len(macds) + 1)) AS BIGINT) AS day_idx,
           unnest(days) AS day,
           unnest(macds) + 0.0 AS macd,
           unnest(signals) + 0.0 AS signal,
           (unnest(macds) - unnest(signals)) + 0.0 AS histogram
    FROM sig
    """,
)
def window_macd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MACD series per order priority over daily revenue cents:
    EMA(12) − EMA(26), the EMA(9) signal line, and the histogram, one
    row per (priority, day).  EMAs are prefix folds over the ordered
    integer-cents series (seed = first element, the list_reduce
    convention); the signal line is a second fold over the computed
    MACD array.

    Scale: grain collapse to (priority, day) first — one shuffle; the
    prefix-fold work is bounded by series length per group (~2,400 days
    for 7 years), flat in row count, and runs as the TWO-LEVEL chunked
    fold (see ``_CHUNK``): chunk-boundary seeds then within-chunk
    resumes — O(days^1.5) lambda evaluations instead of the flat form's
    O(days^2), bit-identical by the fold-composition identity.
    Unnest/posexplode emits the series without a second shuffle."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderdate", "o_totalprice"
    )
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("grp"),
        F.date_trunc("day", "o_orderdate").alias("day"),
    ).agg(F.sum(F.expr(_CENTS)).cast("double").alias("v"))
    series = daily.groupBy("grp").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "v"))),
            lambda s: s["v"],
        ).alias("vals"),
        F.array_sort(F.collect_list("day")).alias("days"),
    )
    # Persist boundaries around the seeds columns: without one, Catalyst's
    # CollapseProject can inline the seeds expression into the downstream
    # transform lambda, where it would re-evaluate per element.
    sd = scoped_persist(
        series.select(
            "grp",
            "days",
            "vals",
            F.expr(_seeds_spark("vals", _FOLD12)).alias("sd12"),
            F.expr(_seeds_spark("vals", _FOLD26)).alias("sd26"),
        )
    )
    emas = sd.select(
        "grp",
        "days",
        F.expr(_prefix2_spark("vals", "sd12", _FOLD12)).alias("e12"),
        F.expr(_prefix2_spark("vals", "sd26", _FOLD26)).alias("e26"),
    )
    macd = emas.select(
        "grp",
        "days",
        F.expr("zip_with(e12, e26, (a, b) -> a - b)").alias("macds"),
    )
    ms = scoped_persist(
        macd.select(
            "grp",
            "days",
            "macds",
            F.expr(_seeds_spark("macds", _FOLD9)).alias("sd9"),
        )
    )
    sig = ms.select(
        "grp",
        "days",
        "macds",
        F.expr(_prefix2_spark("macds", "sd9", _FOLD9)).alias("signals"),
    )
    return sig.select(
        "grp",
        F.posexplode(F.expr("arrays_zip(days, macds, signals)")).alias(
            "pos", "z"
        ),
    ).select(
        "grp",
        (F.col("pos") + 1).cast("long").alias("day_idx"),
        F.col("z.days").alias("day"),
        (F.col("z.macds") + F.lit(0.0)).alias("macd"),
        (F.col("z.signals") + F.lit(0.0)).alias("signal"),
        (
            (F.col("z.macds") - F.col("z.signals")) + F.lit(0.0)
        ).alias("histogram"),
    )


_BOLL_WIN = 7  # rolling window (days)
_BOLL_K = "2.0"  # band width in sigmas (shared literal)

#: Shared Bollinger fragments over integer rolling sums s1/s2/n and the
#: day's integer value v.  ``n*S2 - S1^2`` is computed EXACTLY in
#: 128-bit integers and only the (much smaller) difference converts to
#: DOUBLE: converting S2 (~1e20) first loses low bits BEFORE the
#: catastrophic cancellation, and the engines' big-int->double
#: roundings differ by an ulp (observed: 3e-14 relative sigma skew at
#: sf0.1).  The exact difference fits int64 through ~3e9-cent days;
#: beyond that the conversion itself is the documented precision edge.
def _b_sig(big: str) -> str:
    return (
        f"sqrt(CAST(CAST(n AS {big}) * s2"
        f" - CAST(s1 AS {big}) * s1 AS DOUBLE)"
        " / (CAST(n AS DOUBLE) * n))"
    )


_B_MEAN = "CAST(s1 AS DOUBLE) / n"


def _b_breach(big: str) -> str:
    return (
        f"CASE WHEN ABS(CAST(v AS DOUBLE) - ({_B_MEAN}))"
        f" > {_BOLL_K} * ({_b_sig(big)}) THEN 1 ELSE 0 END"
    )


@query(
    "window_bollinger",
    oracle=f"""
    WITH daily AS (
      SELECT date_trunc('day', o_orderdate) AS day,
             SUM({_CENTS}) AS v
      FROM orders GROUP BY 1
    ),
    rolled AS (
      SELECT day, v,
             SUM(v) OVER w AS s1,
             SUM(CAST(v AS HUGEINT) * v) OVER w AS s2,
             COUNT(*) OVER w AS n
      FROM daily
      WINDOW w AS (ORDER BY day
                   ROWS BETWEEN {_BOLL_WIN - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT day, CAST(v AS BIGINT) AS rev_cents,
           ({_B_MEAN}) + 0.0 AS mid,
           ({_b_sig('HUGEINT')}) + 0.0 AS sigma,
           CAST({_b_breach('HUGEINT')} AS BIGINT) AS breach
    FROM rolled
    WHERE n = {_BOLL_WIN}
    """,
)
def window_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands over daily order revenue: the 7-day rolling
    mean, population sigma, and a band-breach flag
    (|value − mean| > 2 sigma).  Mean and sigma derive from INTEGER
    rolling sums (S1, S2, n) via one shared expression — the engines
    compare bit-identical doubles, so even the breach INEQUALITY is
    deterministic.  Warm-up days (window shorter than the period) are
    excluded.  The squared-value sum CASTS BEFORE MULTIPLYING
    (DECIMAL(38,0)/HUGEINT on both engines) — a bare v*v multiplies in
    int64 first and overflows at ~3e9-cent revenue days (hit at mimic
    sf1 during the scale decade).

    Scale: one grain-collapsing day agg, then a single-partition window
    over the DAY DIMENSION (thousands of rows, not the fact table) —
    the same bounded-series argument as the fold family; partition by
    month-range at planetary scale."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    )
    daily = orders.groupBy(
        F.date_trunc("day", "o_orderdate").alias("day")
    ).agg(F.sum(F.expr(_CENTS)).alias("v"))
    w = Window.orderBy("day").rowsBetween(-(_BOLL_WIN - 1), 0)
    rolled = daily.select(
        "day",
        "v",
        F.sum("v").over(w).alias("s1"),
        F.sum(
            F.expr("CAST(v AS DECIMAL(38,0)) * v")
        ).over(w).alias("s2"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    return rolled.where(F.col("n") == _BOLL_WIN).select(
        F.col("day"),
        F.col("v").cast("long").alias("rev_cents"),
        F.expr(f"({_B_MEAN}) + 0.0").alias("mid"),
        F.expr(f"({_b_sig('DECIMAL(38,0)')}) + 0.0").alias("sigma"),
        F.expr(_b_breach("DECIMAL(38,0)")).cast("long").alias("breach"),
    )


@query(
    "window_vwap",
    oracle="""
    WITH monthly AS (
      SELECT p.p_brand AS brand, strftime(l.l_shipdate, '%Y-%m') AS month,
             CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS rev_cents
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    )
    SELECT brand, month, qty, rev_cents,
           CAST(rev_cents // qty AS BIGINT) AS vwap_cents
    FROM monthly
    """,
)
def window_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-weighted average price per (brand, ship month): exact
    revenue cents floor-divided by total quantity — the integer VWAP
    that needs no float discipline at all.  The per-unit realized price
    trend a pricing dashboard plots against the list price.

    Scale: one fact scan, broadcast part dimension, one (brand, month)
    hash agg; the division is per-output-row scalar work on a
    dimension-sized table."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_quantity", "l_extendedprice"
    )
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.date_format("l_shipdate", "yyyy-MM").alias("month"),
        )
        .agg(
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"),
            F.sum(
                F.expr("CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)")
            )
            .cast("long")
            .alias("rev_cents"),
        )
        .select(
            "brand",
            "month",
            "qty",
            "rev_cents",
            F.expr("rev_cents div qty").alias("vwap_cents"),
        )
    )


#: Wilder smoothing constants as <=15-significant-digit string
#: literals.  A pure-literal division like ``1.0 / 14.0`` inside the
#: shared fold text is NOT portable: Spark types both literals DECIMAL
#: and divides at scale 6 (0.071429…), DuckDB divides as DOUBLE — a
#: 4e-6 relative skew that diverged the smoothed states (round-10
#: probe).  And a 17-digit repr() literal is not portable either:
#: DuckDB double-rounds decimal literals whose digit-string numerator
#: exceeds 2^53 (the round-11 window_keltner red row).  So the literal
#: itself, capped at 15 significant digits, IS the parameter
#: definition — both engines parse it to the same double
#: (probe-asserted in tests/test_fold_literals.py).
_RSI_A = "0.0714285714286"
_RSI_B = "0.928571428571"
_FOLD_RSI = f"(acc, x) -> x * {_RSI_A} + acc * {_RSI_B}"
#: RSI from the two final smoothed states; flat series (g + l = 0) pins
#: to the conventional neutral 50.
_RSI_EXPR = (
    "CASE WHEN g + l = 0.0 THEN 50.0"
    " ELSE (100.0 * g / (g + l)) + 0.0 END"
)


@query(
    "window_rsi",
    oracle=f"""
    WITH daily AS (
      SELECT o_orderpriority AS grp, date_trunc('day', o_orderdate) AS day,
             CAST(SUM({_CENTS}) AS DOUBLE) AS v
      FROM orders GROUP BY 1, 2
    ),
    series AS (
      SELECT grp, list(v ORDER BY day) AS vals
      FROM daily GROUP BY 1
      HAVING len(list(v)) >= 2
    ),
    deltas AS (
      SELECT grp,
             [GREATEST(vals[i] - vals[i - 1], 0.0)
              for i in range(2, len(vals) + 1)] AS gains,
             [GREATEST(vals[i - 1] - vals[i], 0.0)
              for i in range(2, len(vals) + 1)] AS losses
      FROM series
    ),
    states AS (
      SELECT grp,
             list_reduce(gains, {_FOLD_RSI}) AS g,
             list_reduce(losses, {_FOLD_RSI}) AS l
      FROM deltas
    )
    SELECT grp,
           g + 0.0 AS avg_gain,
           l + 0.0 AS avg_loss,
           {_RSI_EXPR} AS rsi
    FROM states
    """,
)
def window_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilder's RSI per order priority over the daily-revenue series:
    day-over-day deltas split into gain/loss streams, each smoothed by
    the Wilder fold (alpha ~= 1/14 as a 15-digit shared literal — see _RSI_A), then
    ``100 * g / (g + l)`` — the overbought/oversold oscillator.  Flat
    series pin to the conventional 50.  Both smoothed streams emit too
    (the auditable states, like the Holt family).

    Scale: grain collapse then O(days) folds per group — series-bounded
    work, identical left-to-right IEEE sequence on both engines."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderdate", "o_totalprice"
    )
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("grp"),
        F.date_trunc("day", "o_orderdate").alias("day"),
    ).agg(F.sum(F.expr(_CENTS)).cast("double").alias("v"))
    series = (
        daily.groupBy("grp")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("day", "v"))),
                lambda s: s["v"],
            ).alias("vals")
        )
        .where(F.size("vals") >= 2)
    )
    deltas = series.select(
        "grp",
        F.expr(
            "transform(sequence(2, size(vals)), i -> "
            "GREATEST(element_at(vals, i) - element_at(vals, i - 1), 0.0))"
        ).alias("gains"),
        F.expr(
            "transform(sequence(2, size(vals)), i -> "
            "GREATEST(element_at(vals, i - 1) - element_at(vals, i), 0.0))"
        ).alias("losses"),
    )
    states = deltas.select(
        "grp",
        F.expr(
            "aggregate(slice(gains, 2, size(gains) - 1), "
            f"element_at(gains, 1), {_FOLD_RSI})"
        ).alias("g"),
        F.expr(
            "aggregate(slice(losses, 2, size(losses) - 1), "
            f"element_at(losses, 1), {_FOLD_RSI})"
        ).alias("l"),
    )
    return states.selectExpr(
        "grp",
        "g + 0.0 AS avg_gain",
        "l + 0.0 AS avg_loss",
        f"{_RSI_EXPR} AS rsi",
    )

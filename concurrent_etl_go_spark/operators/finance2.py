"""Timeseries technical-indicator pack, part 2: OBV, Donchian channel,
Wilder ATR, rolling Sharpe, rolling beta, and advertising adstock —
the remaining standard dashboard indicators (Granville 1963, Donchian
1960s, Wilder 1978, Sharpe 1966, the CAPM beta, Broadbent 1979 adstock;
all public literature) beside ``operators/finance.py``'s MACD/
Bollinger/VWAP/RSI.

Cross-engine float discipline (SURVEY §7.6 + the round-10 float rules):

* OBV and Donchian are PURE INTEGER (signed cumulative sums, rolling
  min/max, flag comparisons) — no float exists anywhere.
* ATR and adstock are scalar left folds over exact-integer series with
  precomputed repr-literal coefficients (``finance._RSI_A`` precedent:
  a literal division types DECIMAL in Spark but DOUBLE in DuckDB),
  emitted unrounded ``+ 0.0``.
* Sharpe and beta derive from INTEGER rolling sums via the Bollinger
  convention: the 128-bit cancellation (n*S2 - S1^2, n*Sxy - Sx*Sy)
  happens exactly in DECIMAL(38,0)/HUGEINT and only the much smaller
  DIFFERENCE converts to DOUBLE.  Beta's round-11 int64 cancellation
  overflowed at the builder's sf1 decade point, so it now widens like
  Sharpe always did and pins its ratio with ROUND(6) (beyond 2^53 the
  engines' 128-bit -> double conversions can differ by an ulp).

Scale: every query collapses to the day grain first — one fact-sized
hash agg; windows, folds, and joins run on day-count-sized frames.
Reference parity: the reference (etl/main.go) has no analytics
surface; extends SURVEY.md §2.B's timeseries family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.finance import _CENTS, _RSI_A, _RSI_B
from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.sources.readers import read_table


@query(
    "window_obv",
    oracle=f"""
    WITH daily AS (
      SELECT o_orderpriority AS grp, date_trunc('day', o_orderdate) AS day,
             CAST(SUM({_CENTS}) AS BIGINT) AS cents,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1, 2
    ),
    signed AS (
      SELECT grp, day, cents, n_orders,
             CASE WHEN LAG(cents) OVER w IS NULL THEN 0
                  WHEN cents > LAG(cents) OVER w THEN n_orders
                  WHEN cents < LAG(cents) OVER w THEN -n_orders
                  ELSE 0 END AS dv
      FROM daily
      WINDOW w AS (PARTITION BY grp ORDER BY day)
    )
    SELECT grp, day, cents AS rev_cents, n_orders,
           CAST(SUM(dv) OVER (PARTITION BY grp ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS obv
    FROM signed
    """,
)
def window_obv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """On-Balance Volume per order priority: the day's order count
    flows INTO the cumulative line when revenue rose day-over-day, OUT
    when it fell, flat days contribute nothing — the volume-confirms-
    price indicator.  Every quantity is an exact integer (cents, order
    counts, a signed integer cumulative sum), so no float discipline
    is needed at all.

    Scale: one orders scan -> (priority, day) hash agg; LAG and the
    cumulative sum run per priority over day-count-sized partitions."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderdate", "o_totalprice"
    )
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("grp"),
        F.date_trunc("day", "o_orderdate").alias("day"),
    ).agg(
        F.sum(F.expr(_CENTS)).cast("long").alias("cents"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
    )
    w = Window.partitionBy("grp").orderBy("day")
    signed = daily.withColumn(
        "dv",
        F.when(F.lag("cents").over(w).isNull(), F.lit(0))
        .when(F.col("cents") > F.lag("cents").over(w), F.col("n_orders"))
        .when(F.col("cents") < F.lag("cents").over(w), -F.col("n_orders"))
        .otherwise(F.lit(0)),
    )
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    return signed.select(
        "grp",
        "day",
        F.col("cents").alias("rev_cents"),
        "n_orders",
        F.sum("dv").over(cum).cast("long").alias("obv"),
    )


_DON_WIN = 14


@query(
    "window_donchian",
    oracle=f"""
    WITH daily AS (
      SELECT date_trunc('day', o_orderdate) AS day,
             CAST(SUM({_CENTS}) AS BIGINT) AS v
      FROM orders GROUP BY 1
    ),
    rolled AS (
      SELECT day, v,
             MAX(v) OVER w AS upper_band,
             MIN(v) OVER w AS lower_band,
             COUNT(*) OVER w AS n
      FROM daily
      WINDOW w AS (ORDER BY day
                   ROWS BETWEEN {_DON_WIN} PRECEDING AND 1 PRECEDING)
    )
    SELECT day, v AS rev_cents,
           CAST(upper_band AS BIGINT) AS upper_band,
           CAST(lower_band AS BIGINT) AS lower_band,
           CAST(CASE WHEN v > upper_band THEN 1 ELSE 0 END AS BIGINT)
             AS break_up,
           CAST(CASE WHEN v < lower_band THEN 1 ELSE 0 END AS BIGINT)
             AS break_down
    FROM rolled WHERE n = {_DON_WIN}
    """,
)
def window_donchian(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Donchian channel over daily order revenue: the prior-14-day
    high/low band (EXCLUDING the current day, the breakout convention)
    and breakout flags when today closes outside it.  Pure integer
    min/max/compare — the channel the turtle-trading rules read.

    Scale: one orders scan -> day hash agg; the rolling extrema run on
    the day-count-sized frame."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    )
    daily = orders.groupBy(
        F.date_trunc("day", "o_orderdate").alias("day")
    ).agg(F.sum(F.expr(_CENTS)).cast("long").alias("v"))
    w = Window.orderBy("day").rowsBetween(-_DON_WIN, -1)
    rolled = daily.select(
        "day",
        "v",
        F.max("v").over(w).alias("upper_band"),
        F.min("v").over(w).alias("lower_band"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    return rolled.where(F.col("n") == _DON_WIN).select(
        "day",
        F.col("v").alias("rev_cents"),
        F.col("upper_band").cast("long"),
        F.col("lower_band").cast("long"),
        F.when(F.col("v") > F.col("upper_band"), 1)
        .otherwise(0)
        .cast("long")
        .alias("break_up"),
        F.when(F.col("v") < F.col("lower_band"), 1)
        .otherwise(0)
        .cast("long")
        .alias("break_down"),
    )


_FOLD_ATR = f"(acc, x) -> x * {_RSI_A} + acc * {_RSI_B}"


@query(
    "window_atr",
    oracle=f"""
    WITH daily AS (
      SELECT o_orderpriority AS grp, date_trunc('day', o_orderdate) AS day,
             CAST(MAX({_CENTS}) AS BIGINT) AS hi,
             CAST(MIN({_CENTS}) AS BIGINT) AS lo,
             CAST(max_by({_CENTS}, o_orderkey) AS BIGINT) AS cl
      FROM orders GROUP BY 1, 2
    ),
    tr AS (
      SELECT grp, day,
             CASE WHEN LAG(cl) OVER w IS NULL THEN NULL
                  ELSE GREATEST(hi - lo, ABS(hi - LAG(cl) OVER w),
                                ABS(lo - LAG(cl) OVER w)) END AS t
      FROM daily
      WINDOW w AS (PARTITION BY grp ORDER BY day)
    ),
    series AS (
      SELECT grp,
             list(CAST(t AS DOUBLE) ORDER BY day) AS ts
      FROM tr WHERE t IS NOT NULL GROUP BY 1
    )
    SELECT grp, CAST(len(ts) AS BIGINT) AS n_tr,
           list_reduce(ts, {_FOLD_ATR}) + 0.0 AS atr
    FROM series
    """,
)
def window_atr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilder's Average True Range per order priority: each day's
    high/low/close are the max/min/latest (by order key) single-order
    cents, the true range is the integer
    ``GREATEST(hi-lo, |hi-prev_close|, |lo-prev_close|)``, and the ATR
    is the Wilder fold (alpha = 1/14 repr literals, the RSI
    convention) over the ordered TR series — the volatility unit the
    channel/stop-loss rules are denominated in.

    Scale: grain collapse then one O(days) fold per group —
    series-bounded work, identical left-to-right IEEE sequence."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderdate", "o_totalprice", "o_orderkey"
    )
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("grp"),
        F.date_trunc("day", "o_orderdate").alias("day"),
    ).agg(
        F.max(F.expr(_CENTS)).cast("long").alias("hi"),
        F.min(F.expr(_CENTS)).cast("long").alias("lo"),
        F.expr(f"max_by({_CENTS}, o_orderkey)").cast("long").alias("cl"),
    )
    w = Window.partitionBy("grp").orderBy("day")
    tr = daily.select(
        "grp",
        "day",
        F.when(
            F.lag("cl").over(w).isNull(), F.lit(None).cast("long")
        )
        .otherwise(
            F.greatest(
                F.col("hi") - F.col("lo"),
                F.abs(F.col("hi") - F.lag("cl").over(w)),
                F.abs(F.col("lo") - F.lag("cl").over(w)),
            )
        )
        .alias("t"),
    )
    series = (
        tr.where(F.col("t").isNotNull())
        .groupBy("grp")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("day", "t"))),
                lambda s: s["t"].cast("double"),
            ).alias("ts")
        )
    )
    return series.select(
        "grp",
        F.size("ts").cast("long").alias("n_tr"),
        F.expr(
            "aggregate(slice(ts, 2, size(ts) - 1), "
            f"element_at(ts, 1), {_FOLD_ATR}) + 0.0"
        ).alias("atr"),
    )


_SHARPE_WIN = 28

#: Bollinger-convention Sharpe over integer rolling sums: the 128-bit
#: cancellation n*S2 - S1^2 happens exactly, and mean/sigma =
#: S1 / sqrt(n*S2 - S1^2) (the n's cancel).  The cancellation EXCEEDS
#: int64 here (n^2 * sigma^2 ~ 8e20 at sf0.1 cent-scale diffs; a raw
#: 128-bit -> double cast differs by an ulp across engines — this
#: MISMATCHED at sf0.1 before the downscale), so it floor-divides by a
#: fixed 1e6 into int64 first and the 1e6 multiplies back inside the
#: shared double tree (exact: 1e6 and any int64 are exactly double-
#: representable).  Degenerate (variance < 1e6 cents^2, i.e. sigma
#: under a dime) windows pin to 0.
_SHARPE = (
    "CASE WHEN CAST((CAST(n AS {big}) * s2 - CAST(s1 AS {big}) * s1)"
    "           {intdiv} 1000000 AS BIGINT) <= 0"
    " THEN 0.0"
    " ELSE CAST(s1 AS DOUBLE)"
    " / SQRT(CAST(CAST((CAST(n AS {big}) * s2 - CAST(s1 AS {big}) * s1)"
    "                  {intdiv} 1000000 AS BIGINT) AS DOUBLE)"
    "        * 1000000.0) + 0.0 END"
)


@query(
    "window_sharpe",
    oracle=f"""
    WITH daily AS (
      SELECT date_trunc('day', o_orderdate) AS day,
             CAST(SUM({_CENTS}) AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ),
    rets AS (
      SELECT day, cents - LAG(cents) OVER (ORDER BY day) AS r
      FROM daily
    ),
    rolled AS (
      SELECT day, r,
             SUM(r) OVER w AS s1,
             SUM(CAST(r AS HUGEINT) * r) OVER w AS s2,
             COUNT(*) OVER w AS n
      FROM rets WHERE r IS NOT NULL
      WINDOW w AS (ORDER BY day
                   ROWS BETWEEN {_SHARPE_WIN - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT day, CAST(r AS BIGINT) AS ret_cents,
           CAST(s1 AS BIGINT) AS s1,
           {_SHARPE.format(big="HUGEINT", intdiv="//")} AS sharpe_q
    FROM rolled WHERE n = {_SHARPE_WIN}
    """,
)
def window_sharpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 28-day Sharpe ratio of daily revenue CHANGES (the
    mean-over-sigma signal-to-noise of the return stream): integer
    day-over-day differences feed integer rolling sums (S1, S2, n),
    the population-variance cancellation n*S2 - S1^2 runs exactly in
    128 bits, and the emitted quotient S1 / sqrt(n*S2 - S1^2) — the
    n's cancel out of mean/sigma — is one shared unrounded double
    tree.  Zero-variance windows pin to 0.

    Scale: day-grain windows (Bollinger's shape); the exact difference
    fits int64 through ~3e9-cent daily swings — the same documented
    envelope as window_bollinger."""
    big = "DECIMAL(38,0)"
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    )
    daily = orders.groupBy(
        F.date_trunc("day", "o_orderdate").alias("day")
    ).agg(F.sum(F.expr(_CENTS)).cast("long").alias("cents"))
    rets = daily.select(
        "day",
        (F.col("cents") - F.lag("cents").over(Window.orderBy("day"))).alias(
            "r"
        ),
    ).where(F.col("r").isNotNull())
    w = Window.orderBy("day").rowsBetween(-(_SHARPE_WIN - 1), 0)
    rolled = rets.select(
        "day",
        "r",
        F.sum("r").over(w).alias("s1"),
        F.sum(F.expr(f"CAST(r AS {big}) * r")).over(w).alias("s2"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    return rolled.where(F.col("n") == _SHARPE_WIN).select(
        "day",
        F.col("r").cast("long").alias("ret_cents"),
        F.col("s1").cast("long").alias("s1"),
        F.expr(_SHARPE.format(big=big, intdiv="div")).alias("sharpe_q"),
    )


_BETA_WIN = 28

#: Exact rolling beta: Cov(x,y)/Var(y) as the ratio of two 128-bit
#: cancellations over whole-dollar sums.  The cancellations run in
#: DECIMAL(38,0) (HUGEINT-compatible on DuckDB): the round-11 BIGINT
#: form overflowed at the builder's sf1 decade point (n * syy passes
#: 2^63 once daily market dollars reach ~1e6).  Past 2^53 the two
#: engines' 128-bit -> double conversions can differ by an ulp (the
#: documented round-10 rule), so the emitted ratio pins with ROUND(6)
#: instead of the unrounded tree the int64-exact form could afford.
_BETA = (
    "CASE WHEN CAST(n AS DECIMAL(38,0)) * syy"
    "          - CAST(sy AS DECIMAL(38,0)) * sy <= 0"
    " THEN 0.0"
    " ELSE ROUND("
    "   CAST(CAST(n AS DECIMAL(38,0)) * sxy"
    "        - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)"
    "   / CAST(CAST(n AS DECIMAL(38,0)) * syy"
    "          - CAST(sy AS DECIMAL(38,0)) * sy AS DOUBLE), 6)"
    " + 0.0 END"
)


@query(
    "window_beta",
    oracle=f"""
    WITH daily AS (
      SELECT o_orderpriority AS grp, date_trunc('day', o_orderdate) AS day,
             CAST(SUM({_CENTS}) AS BIGINT) // 100 AS x
      FROM orders GROUP BY 1, 2
    ),
    market AS (
      SELECT day, CAST(SUM(x) AS BIGINT) AS y FROM daily GROUP BY 1
    ),
    joined AS (
      SELECT d.grp, d.day, d.x, m.y
      FROM daily d JOIN market m ON d.day = m.day
    ),
    rolled AS (
      SELECT grp, day, x, y,
             SUM(x) OVER w AS sx, SUM(y) OVER w AS sy,
             SUM(x * y) OVER w AS sxy, SUM(y * y) OVER w AS syy,
             COUNT(*) OVER w AS n
      FROM joined
      WINDOW w AS (PARTITION BY grp ORDER BY day
                   ROWS BETWEEN {_BETA_WIN - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT grp, day, CAST(x AS BIGINT) AS x_dollars,
           CAST(y AS BIGINT) AS mkt_dollars,
           {_BETA} AS beta
    FROM rolled WHERE n = {_BETA_WIN}
    """,
)
def window_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 28-day CAPM-style beta of each priority's daily revenue
    against the whole-market (all-priority) series: Cov(x,y)/Var(y)
    from integer rolling sums, both cancellations (n*Sxy - Sx*Sy,
    n*Syy - Sy^2) exact in DECIMAL(38,0)/HUGEINT — the round-11 int64
    form overflowed at the builder's sf1 decade point, so the products
    widened and the ratio now pins with ROUND(6) (beyond 2^53 the
    engines' 128-bit -> double conversions can differ by an ulp).
    Inputs still floor to whole DOLLARS (non-negative, so `//` and
    Spark's `div` agree).  Degenerate flat-market windows pin to 0.

    Scale: the market series is a day-keyed rollup of the same daily
    frame (broadcast-sized); windows run per priority over day-count
    partitions."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderdate", "o_totalprice"
    )
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("grp"),
        F.date_trunc("day", "o_orderdate").alias("day"),
    ).agg(
        F.expr(f"CAST(SUM({_CENTS}) AS BIGINT) div 100").alias("x")
    )
    market = daily.groupBy("day").agg(F.sum("x").cast("long").alias("y"))
    joined = daily.join(F.broadcast(market), "day").select(
        "grp", "day", "x", "y"
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("day")
        .rowsBetween(-(_BETA_WIN - 1), 0)
    )
    rolled = joined.select(
        "grp",
        "day",
        "x",
        "y",
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("syy"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    return rolled.where(F.col("n") == _BETA_WIN).select(
        "grp",
        "day",
        F.col("x").cast("long").alias("x_dollars"),
        F.col("y").cast("long").alias("mkt_dollars"),
        F.expr(_BETA).alias("beta"),
    )


#: Adstock retention rate as an exact shared decimal literal (a
#: PARAMETER, like the EMA alphas).
_ADSTOCK_LAMBDA = "0.8"
_FOLD_ADSTOCK = f"(acc, x) -> x + {_ADSTOCK_LAMBDA} * acc"


@query(
    "agg_adstock",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    series AS (
      SELECT event_type,
             list(CAST(c AS DOUBLE) ORDER BY day) AS cs,
             CAST(SUM(c) AS BIGINT) AS total_events,
             CAST(COUNT(*) AS BIGINT) AS n_days
      FROM daily GROUP BY 1
    )
    SELECT event_type, n_days, total_events,
           list_reduce(cs, {_FOLD_ADSTOCK}) + 0.0 AS adstock
    FROM series
    """,
)
def agg_adstock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Advertising adstock (geometric-decay carryover, Broadbent) per
    event type over the daily event-count series: each day's exposure
    adds to a stock that retains lambda = 0.8 of itself per day — the
    standard marketing-mix transformation applied before regression.
    One scalar left fold over exact integer counts (first-element
    seeded, the list_reduce convention), emitted unrounded ``+ 0.0``.

    Scale: one events scan -> (type, day) hash agg; one O(days) fold
    per type."""
    ev = read_table(spark, sf_dir, "events").select("event_type", "ts")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    series = daily.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "c"))),
            lambda s: s["c"].cast("double"),
        ).alias("cs"),
        F.sum("c").cast("long").alias("total_events"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    return series.select(
        "event_type",
        "n_days",
        "total_events",
        F.expr(
            "aggregate(slice(cs, 2, size(cs) - 1), "
            f"element_at(cs, 1), {_FOLD_ADSTOCK}) + 0.0"
        ).alias("adstock"),
    )

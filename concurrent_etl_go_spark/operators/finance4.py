"""Timeseries technical-indicator pack, part 4: Amihud illiquidity,
the Kelly criterion fraction, and drawdown-spell durations (Amihud
2002; Kelly 1956; drawdown analysis standard in the risk literature —
all public) beside ``finance.py`` / ``finance2.py``.

Cross-engine exactness: every emitted value is an exact int64 — cents
sums, unit counts, floor-divided e4/e6 ratios, day counts — computed by
IDENTICAL integer expressions in both dialects (the ``window_obv``
discipline).  No float exists anywhere in this module.

Scale: every query collapses to the day grain first (one fact-sized
hash agg); diffs/rolling sums/islands run over day-count-sized frames.
Reference parity: the reference (etl/main.go) has no analytics
surface; extends SURVEY.md §2.B's timeseries family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.finance import _CENTS
from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.sources.readers import read_table

_AMI_WIN = 14

_LI_CENTS = "CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)"


@query(
    "window_amihud_illiquidity",
    oracle=f"""
    WITH daily AS (
      SELECT date_trunc('day', l_shipdate) AS day,
             CAST(SUM({_LI_CENTS}) AS BIGINT) AS cents,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem GROUP BY 1
    ),
    diffed AS (
      SELECT day, cents, qty,
             ABS(cents - LAG(cents) OVER (ORDER BY day)) AS adc,
             ROW_NUMBER() OVER (ORDER BY day) AS rn
      FROM daily
    ),
    illiq AS (
      SELECT day, qty, rn,
             CAST(adc * 1000000 // qty AS BIGINT) AS illiq_e6
      FROM diffed WHERE adc IS NOT NULL
    )
    SELECT day, qty, illiq_e6,
           CAST(SUM(illiq_e6) OVER (ORDER BY day
                ROWS BETWEEN {_AMI_WIN - 1} PRECEDING AND CURRENT ROW)
                // {_AMI_WIN} AS BIGINT) AS illiq_roll_e6
    FROM illiq
    QUALIFY ROW_NUMBER() OVER (ORDER BY day) >= {_AMI_WIN}
    """,
)
def window_amihud_illiquidity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Amihud (2002) illiquidity over the daily lineitem tape:
    ``|Δ revenue cents| * 1e6 div units shipped`` per day — absolute
    price impact per unit of volume — plus its {_AMI_WIN}-day rolling
    floor-mean.  Rows before the first complete rolling window are
    dropped (the ``window_sharpe`` convention), so every emitted row is
    fully defined and exactly integer.

    Scale: one lineitem scan -> day-grain hash agg; the diff and
    rolling sum are windows over a day-count-sized frame."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_extendedprice", "l_quantity"
    )
    daily = li.groupBy(
        F.date_trunc("day", "l_shipdate").alias("day")
    ).agg(
        F.sum(F.expr(_LI_CENTS)).cast("long").alias("cents"),
        F.sum(F.expr("CAST(l_quantity AS BIGINT)"))
        .cast("long")
        .alias("qty"),
    )
    w = Window.orderBy("day")
    diffed = daily.select(
        "day",
        "qty",
        F.abs(F.col("cents") - F.lag("cents").over(w)).alias("adc"),
    ).where(F.col("adc").isNotNull())
    illiq = diffed.select(
        "day",
        "qty",
        F.expr("CAST(adc * 1000000 div qty AS BIGINT)").alias("illiq_e6"),
    )
    roll = Window.orderBy("day").rowsBetween(-(_AMI_WIN - 1), 0)
    return (
        illiq.select(
            "day",
            "qty",
            "illiq_e6",
            F.expr(
                f"CAST(SUM(illiq_e6) OVER (ORDER BY day ROWS BETWEEN"
                f" {_AMI_WIN - 1} PRECEDING AND CURRENT ROW)"
                f" div {_AMI_WIN} AS BIGINT)"
            ).alias("illiq_roll_e6"),
            F.row_number().over(Window.orderBy("day")).alias("_rn"),
        )
        .where(F.col("_rn") >= _AMI_WIN)
        .drop("_rn")
    )


@query(
    "agg_kelly_fraction",
    oracle=f"""
    WITH daily AS (
      SELECT o_orderpriority AS grp, date_trunc('day', o_orderdate) AS day,
             CAST(SUM({_CENTS}) AS BIGINT) AS cents
      FROM orders GROUP BY 1, 2
    ),
    diffed AS (
      SELECT grp, cents - LAG(cents) OVER (PARTITION BY grp ORDER BY day)
               AS d
      FROM daily
    ),
    agg AS (
      SELECT grp,
             CAST(COUNT(*) FILTER (WHERE d > 0) AS BIGINT) AS n_up,
             CAST(COUNT(*) FILTER (WHERE d < 0) AS BIGINT) AS n_dn,
             CAST(COALESCE(SUM(d) FILTER (WHERE d > 0), 0) AS BIGINT)
               AS sum_up,
             CAST(COALESCE(SUM(-d) FILTER (WHERE d < 0), 0) AS BIGINT)
               AS sum_dn
      FROM diffed WHERE d IS NOT NULL GROUP BY grp
    ),
    kelly AS (
      SELECT grp, n_up, n_dn,
             CAST(n_up * 10000 // GREATEST(n_up + n_dn, 1) AS BIGINT)
               AS p_e4,
             CAST(sum_up // GREATEST(n_up, 1) AS BIGINT) AS avg_up_cents,
             CAST(sum_dn // GREATEST(n_dn, 1) AS BIGINT) AS avg_dn_cents
      FROM agg
    )
    SELECT grp, n_up, n_dn, p_e4, avg_up_cents, avg_dn_cents,
           CAST(avg_up_cents * 10000 // GREATEST(avg_dn_cents, 1)
                AS BIGINT) AS b_e4,
           CAST(p_e4 - (10000 - p_e4) * 10000
                // GREATEST(avg_up_cents * 10000
                            // GREATEST(avg_dn_cents, 1), 1)
                AS BIGINT) AS kelly_e4
    FROM kelly
    """,
)
def agg_kelly_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kelly-criterion betting fraction per order priority, from the
    daily revenue diff series: win probability ``p`` (up-days over
    moving days), win/loss ratio ``b`` (average up-move over average
    down-move), and ``f* = p - q/b`` — all on the e4 integer lattice
    with floor division and GREATEST(_,1) guards shared verbatim by
    both dialects.  A negative ``kelly_e4`` reads "no edge: bet
    nothing", exactly as in the literature.

    Scale: day-grain collapse, then a 5-row arithmetic table."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderdate", "o_totalprice"
    )
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("grp"),
        F.date_trunc("day", "o_orderdate").alias("day"),
    ).agg(F.sum(F.expr(_CENTS)).cast("long").alias("cents"))
    w = Window.partitionBy("grp").orderBy("day")
    diffed = daily.select(
        "grp", (F.col("cents") - F.lag("cents").over(w)).alias("d")
    ).where(F.col("d").isNotNull())
    agg = diffed.groupBy("grp").agg(
        F.sum(F.when(F.col("d") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_up"),
        F.sum(F.when(F.col("d") < 0, 1).otherwise(0))
        .cast("long")
        .alias("n_dn"),
        F.coalesce(F.sum(F.when(F.col("d") > 0, F.col("d"))), F.lit(0))
        .cast("long")
        .alias("sum_up"),
        F.coalesce(F.sum(F.when(F.col("d") < 0, -F.col("d"))), F.lit(0))
        .cast("long")
        .alias("sum_dn"),
    )
    kelly = agg.select(
        "grp",
        "n_up",
        "n_dn",
        F.expr(
            "CAST(n_up * 10000 div GREATEST(n_up + n_dn, 1) AS BIGINT)"
        ).alias("p_e4"),
        F.expr("CAST(sum_up div GREATEST(n_up, 1) AS BIGINT)").alias(
            "avg_up_cents"
        ),
        F.expr("CAST(sum_dn div GREATEST(n_dn, 1) AS BIGINT)").alias(
            "avg_dn_cents"
        ),
    )
    return kelly.select(
        "grp",
        "n_up",
        "n_dn",
        "p_e4",
        "avg_up_cents",
        "avg_dn_cents",
        F.expr(
            "CAST(avg_up_cents * 10000 div GREATEST(avg_dn_cents, 1)"
            " AS BIGINT)"
        ).alias("b_e4"),
        F.expr(
            "CAST(p_e4 - (10000 - p_e4) * 10000"
            " div GREATEST(avg_up_cents * 10000"
            " div GREATEST(avg_dn_cents, 1), 1) AS BIGINT)"
        ).alias("kelly_e4"),
    )


@query(
    "agg_ulcer_index",
    oracle=f"""
    WITH daily AS (
      SELECT o_orderpriority AS grp, date_trunc('day', o_orderdate) AS day,
             CAST(SUM({_CENTS}) AS BIGINT) AS cents
      FROM orders GROUP BY 1, 2
    ),
    dd AS (
      SELECT grp,
             CAST((MAX(cents) OVER w - cents) * 10000
                  // MAX(cents) OVER w AS BIGINT) AS dd_bp
      FROM daily
      WINDOW w AS (PARTITION BY grp ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT grp,
           CAST(COUNT(*) AS BIGINT) AS days,
           CAST(COUNT(*) FILTER (WHERE dd_bp > 0) AS BIGINT)
             AS days_underwater,
           CAST(MAX(dd_bp) AS BIGINT) AS max_dd_bp,
           CAST(SUM(dd_bp * dd_bp) // COUNT(*) AS BIGINT)
             AS ulcer_sq_bp2
    FROM dd GROUP BY grp
    """,
)
def agg_ulcer_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ulcer-index family per priority: daily drawdown from the running
    peak in basis points, its maximum, the underwater-day count, and
    the MEAN SQUARED drawdown (``ulcer_sq_bp2`` — the square of
    Martin's ulcer index, kept squared so the statistic stays an exact
    integer; take the root downstream if a float display is wanted).
    Depth x duration in one table, complementing
    ``window_drawdown_duration``'s spell list.

    Scale: day-grain collapse, one running-max window per group, a
    5-row report."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderdate", "o_totalprice"
    )
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("grp"),
        F.date_trunc("day", "o_orderdate").alias("day"),
    ).agg(F.sum(F.expr(_CENTS)).cast("long").alias("cents"))
    w = (
        Window.partitionBy("grp")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dd = daily.withColumn("rm", F.max("cents").over(w)).select(
        "grp",
        F.expr("CAST((rm - cents) * 10000 div rm AS BIGINT)").alias(
            "dd_bp"
        ),
    )
    return dd.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("days"),
        F.sum(F.when(F.col("dd_bp") > 0, 1).otherwise(0))
        .cast("long")
        .alias("days_underwater"),
        F.max("dd_bp").cast("long").alias("max_dd_bp"),
        F.expr(
            "CAST(SUM(dd_bp * dd_bp) div COUNT(*) AS BIGINT)"
        ).alias("ulcer_sq_bp2"),
    )


_TOP_SPELLS = 10


@query(
    "window_drawdown_duration",
    oracle=f"""
    WITH daily AS (
      SELECT date_trunc('day', o_orderdate) AS day,
             CAST(SUM({_CENTS}) AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ),
    peaked AS (
      SELECT day, cents,
             MAX(cents) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS run_max,
             ROW_NUMBER() OVER (ORDER BY day) AS rn
      FROM daily
    ),
    below AS (
      SELECT day, run_max, rn,
             rn - ROW_NUMBER() OVER (ORDER BY day) AS grp
      FROM peaked WHERE cents < run_max
    ),
    spells AS (
      SELECT MIN(day) AS start_day, MAX(day) AS end_day,
             CAST(COUNT(*) AS BIGINT) AS days,
             CAST(MAX(run_max) AS BIGINT) AS peak_cents
      FROM below GROUP BY grp
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY days DESC, start_day)
                AS BIGINT) AS spell_rank,
           start_day, end_day, days, peak_cents
    FROM spells
    ORDER BY days DESC, start_day LIMIT {_TOP_SPELLS}
    """,
)
def window_drawdown_duration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The ``_TOP_SPELLS`` longest drawdown spells of the daily revenue
    series: consecutive runs of days strictly below the running peak
    (gaps-and-islands on the below-peak flag), each with its span, day
    count, and the peak it failed to regain — time-UNDER-water, the
    duration companion of ``window_drawdown``'s depth.  Pure integer:
    cents, day counts, rank.

    Scale: day-grain collapse; islands and ranking run over a
    day-count-sized frame (the top-k is a 10-row LIMIT with a total
    deterministic order)."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    )
    daily = orders.groupBy(
        F.date_trunc("day", "o_orderdate").alias("day")
    ).agg(F.sum(F.expr(_CENTS)).cast("long").alias("cents"))
    w = Window.orderBy("day")
    peaked = daily.select(
        "day",
        "cents",
        F.max("cents")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("run_max"),
        F.row_number().over(w).alias("rn"),
    )
    below = peaked.where(F.col("cents") < F.col("run_max")).select(
        "day",
        "run_max",
        (F.col("rn") - F.row_number().over(Window.orderBy("day"))).alias(
            "grp"
        ),
    )
    spells = below.groupBy("grp").agg(
        F.min("day").alias("start_day"),
        F.max("day").alias("end_day"),
        F.count(F.lit(1)).cast("long").alias("days"),
        F.max("run_max").cast("long").alias("peak_cents"),
    )
    wr = Window.orderBy(F.desc("days"), "start_day")
    return (
        spells.select(
            F.row_number().over(wr).cast("long").alias("spell_rank"),
            "start_day",
            "end_day",
            "days",
            "peak_cents",
        )
        .where(F.col("spell_rank") <= _TOP_SPELLS)
    )

"""Finance pack 3 — range-based volatility estimators.

Close-to-close volatility wastes the intraday range; Parkinson (1980)
showed the daily high-low range alone estimates variance with ~5x the
efficiency, and Garman-Klass (1980) adds the open/close.  Both are
public-literature estimators over the daily OHLC grain the engine
already rolls up (``agg_resample_ohlc``).

Portability: each day's term is computed identically on both engines
from the integer cents hi/lo (one ``ln`` + one multiply per day); the
21-day rolling mean follows the proven ``window_rolling_corr``
convention (ROWS frame over the daily grain, ROUND(6) absorbing
frame-summation jitter).

Scale: grain-first — the fact scan collapses to |days| rows before any
window; the rolling frame is over the day series, partition by symbol
when tracking many series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.sources.readers import read_table

_CENTS = "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"
#: Parkinson scaling 1/(4 ln 2) as a <=15-digit shared literal (the
#: fold-literal rule of tests/test_fold_literals.py applies to every
#: cross-engine coefficient).
_PARKINSON_C = "0.360673760222241"
PARKINSON_WINDOW = 21


@query(
    "window_parkinson_vol",
    oracle=f"""
    WITH daily AS (
      SELECT date_trunc('day', o_orderdate) AS day,
             CAST(MAX({_CENTS}) AS BIGINT) AS hi,
             CAST(MIN({_CENTS}) AS BIGINT) AS lo
      FROM orders GROUP BY 1
    ),
    terms AS (
      SELECT day, hi, lo,
             {_PARKINSON_C}
             * ln(CAST(hi AS DOUBLE) / lo)
             * ln(CAST(hi AS DOUBLE) / lo) AS pk
      FROM daily
    )
    SELECT day, hi, lo,
           ROUND(AVG(pk) OVER (
             ORDER BY day
             ROWS BETWEEN {PARKINSON_WINDOW - 1} PRECEDING
               AND CURRENT ROW
           ), 6) + 0.0 AS parkinson_var,
           CAST(COUNT(*) OVER (
             ORDER BY day
             ROWS BETWEEN {PARKINSON_WINDOW - 1} PRECEDING
               AND CURRENT ROW
           ) AS BIGINT) AS n_days
    FROM terms
    """,
)
def window_parkinson_vol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parkinson range volatility over daily order-revenue hi/lo: the
    per-day term ``ln(hi/lo)^2 / (4 ln 2)`` averaged over a rolling
    {w}-day frame — the range-based variance estimator (Parkinson 1980,
    public literature).  Day terms are identical IEEE doubles on both
    engines (same cents ratio, same ln); the frame AVG follows the
    ``window_rolling_corr`` ROUND(6) convention.

    Scale: grain-first day rollup, one unpartitioned window over the
    |days| series (partition by series key for many symbols)."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    )
    daily = orders.groupBy(
        F.date_trunc("day", "o_orderdate").alias("day")
    ).agg(
        F.max(F.expr(_CENTS)).cast("long").alias("hi"),
        F.min(F.expr(_CENTS)).cast("long").alias("lo"),
    )
    pk = F.expr(
        f"{_PARKINSON_C} * ln(CAST(hi AS DOUBLE) / lo)"
        " * ln(CAST(hi AS DOUBLE) / lo)"
    )
    w = Window.orderBy("day").rowsBetween(-(PARKINSON_WINDOW - 1), 0)
    return daily.select(
        "day",
        "hi",
        "lo",
        (F.round(F.avg(pk).over(w), 6) + F.lit(0.0)).alias(
            "parkinson_var"
        ),
        F.count(F.lit(1)).over(w).cast("long").alias("n_days"),
    )

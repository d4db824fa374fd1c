"""Operational SLO analytics: exact nearest-rank latency percentiles
per hour with breach accounting — the p50/p95/p99 dashboard every
service team runs over its event stream (nearest-rank percentile
definition: value at rank ``ceil(p/100 * n)`` — the convention with no
interpolation, hence exactly reproducible on an integer lattice).

Cross-engine exactness: latencies are exact centi-units
(``ROUND(value*100)``), ranks are integers with a total (latency,
event_id) order, and each percentile is the VALUE AT a computed rank —
no quantile-interpolation rule can diverge between engines (the
``robust_stats`` rationale).

Scale: one events scan -> per-hour rank window (hour partitions are
day-volume/24 sized; for a 100 TB stream swap in the grouped
distributed rank of ``quantiles.grouped_rank``, or the mergeable
approx sketch of ``agg_approx`` when exactness is negotiable) -> an
hours-sized report.  Reference parity: the reference (etl/main.go)
has no analytics surface; extends SURVEY.md §2.B.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.sources.readers import read_table

#: SLO threshold in latency centi-units (15.00), chosen inside the
#: event value distribution so the breach rate is non-trivial at every
#: scale factor.
_SLO_CENTI = 1500

_LAT = "CAST(ROUND(value * 100, 0) AS BIGINT)"


@query(
    "agg_latency_slo_hourly",
    oracle=f"""
    WITH lat AS MATERIALIZED (
      SELECT date_trunc('hour', ts) AS hour,
             {_LAT} AS lat,
             event_id,
             ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', ts)
                                ORDER BY {_LAT}, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY date_trunc('hour', ts)) AS n
      FROM events
    )
    SELECT hour,
           CAST(MAX(n) AS BIGINT) AS n,
           CAST(MAX(CASE WHEN rn = (n * 50 + 99) // 100 THEN lat END)
                AS BIGINT) AS p50_centi,
           CAST(MAX(CASE WHEN rn = (n * 95 + 99) // 100 THEN lat END)
                AS BIGINT) AS p95_centi,
           CAST(MAX(CASE WHEN rn = (n * 99 + 99) // 100 THEN lat END)
                AS BIGINT) AS p99_centi,
           CAST(COUNT(*) FILTER (WHERE lat > {_SLO_CENTI}) AS BIGINT)
             AS breaches,
           CAST(COUNT(*) FILTER (WHERE lat > {_SLO_CENTI}) * 10000
                // MAX(n) AS BIGINT) AS breach_e4
    FROM lat GROUP BY hour
    """,
)
def agg_latency_slo_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly exact nearest-rank p50/p95/p99 of the event value (the
    latency proxy, centi-units) plus SLO breach count and rate against
    the {_SLO_CENTI}-centi threshold.  Ranks use the total (latency,
    event_id) order, percentile rank = ``ceil(p * n / 100)`` computed
    as ``(n * p + 99) div 100`` — identical integer arithmetic in both
    dialects.

    Scale: see module note — per-hour rank windows here, grouped
    distributed rank or mergeable sketches at 100 TB."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "ts", "value"
    )
    hour = F.date_trunc("hour", "ts")
    w = Window.partitionBy(hour).orderBy(F.expr(_LAT), "event_id")
    wn = Window.partitionBy(hour)
    lat = ev.select(
        hour.alias("hour"),
        F.expr(_LAT).alias("lat"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return lat.groupBy("hour").agg(
        F.max("n").cast("long").alias("n"),
        F.expr(
            "CAST(MAX(CASE WHEN rn = (n * 50 + 99) div 100"
            " THEN lat END) AS BIGINT)"
        ).alias("p50_centi"),
        F.expr(
            "CAST(MAX(CASE WHEN rn = (n * 95 + 99) div 100"
            " THEN lat END) AS BIGINT)"
        ).alias("p95_centi"),
        F.expr(
            "CAST(MAX(CASE WHEN rn = (n * 99 + 99) div 100"
            " THEN lat END) AS BIGINT)"
        ).alias("p99_centi"),
        F.sum(F.when(F.col("lat") > _SLO_CENTI, 1).otherwise(0))
        .cast("long")
        .alias("breaches"),
        F.expr(
            f"CAST(SUM(CASE WHEN lat > {_SLO_CENTI} THEN 1 ELSE 0 END)"
            " * 10000 div MAX(n) AS BIGINT)"
        ).alias("breach_e4"),
    )

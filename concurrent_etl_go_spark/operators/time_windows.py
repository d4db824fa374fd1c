"""Event-time window aggregations, batch-checked (SURVEY §2.B Streaming).

The same window expressions run unchanged under ``readStream`` (see
``streaming/``); here they execute as batch queries so the DuckDB oracle can
verify the window semantics: tumbling and sliding via ``F.window``, sessions
via the gaps-and-islands sessionizer (``operators.lib.sessionize``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators import lib
from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.sources.readers import read_table

SESSION_GAP_SECONDS = 1800


@query(
    "window_tumbling",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
           event_type, COUNT(*) AS n, ROUND(SUM(value), 4) AS total_value
    FROM events GROUP BY 1, 2, 3
    """,
)
def window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window; ``F.window`` is the same expression
    Structured Streaming uses, so batch == streaming semantics."""
    events = read_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


@query(
    "window_sliding",
    oracle="""
    WITH starts AS (
        -- CAST to plain TIMESTAMP: DuckDB to_timestamp() yields TIMESTAMPTZ,
        -- which dtype-mismatches Spark's session-UTC naive timestamps.
        SELECT CAST(to_timestamp(floor(epoch(ts) / 1800) * 1800)
                    AS TIMESTAMP) AS window_start,
               value FROM events
        UNION ALL
        SELECT CAST(to_timestamp(floor(epoch(ts) / 1800) * 1800 - 1800)
                    AS TIMESTAMP) AS window_start, value FROM events
    )
    SELECT window_start, window_start + INTERVAL 1 HOUR AS window_end,
           COUNT(*) AS n, ROUND(SUM(value), 4) AS total_value
    FROM starts GROUP BY 1, 2
    """,
)
def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour window sliding every 30 min: each event lands in exactly two
    windows; the oracle materializes both membership copies explicitly."""
    events = read_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n",
            "total_value",
        )
    )


@query(
    "window_session",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR epoch(ts) - epoch(LAG(ts) OVER w) > 1800
                    THEN 1 ELSE 0 END AS is_new
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sessions AS (
        SELECT user_id, ts, value,
               CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS session_seq
        FROM flagged
    )
    SELECT user_id, session_seq, MIN(ts) AS session_start,
           MAX(ts) AS session_last, COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS total_value
    FROM sessions GROUP BY user_id, session_seq
    """,
)
def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min inactivity gap) per user via gaps-and-islands;
    the streaming twin uses ``F.session_window`` (streaming/pipelines.py)."""
    events = read_table(spark, sf_dir, "events")
    sessions = lib.sessionize(
        events.select("user_id", "ts", "value"),
        key_col="user_id",
        ts_col="ts",
        gap_seconds=SESSION_GAP_SECONDS,
    )
    return sessions.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_last"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )

"""Seventh coverage batch: behavioral analytics over ``events`` —
retention cohorts (the canonical product-analytics rollup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.sources.readers import read_table


@query(
    "agg_retention_cohort",
    oracle="""
    WITH c AS (SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id)
    SELECT CAST(date_trunc('week', c.first_ts) AS TIMESTAMP) AS cohort_week,
           CAST(datediff('day', date_trunc('week', c.first_ts),
                         date_trunc('week', e.ts)) // 7 AS BIGINT) AS week_offset,
           COUNT(DISTINCT e.user_id) AS n_users
    FROM events e JOIN c USING (user_id)
    GROUP BY 1, 2
    """,
)
def agg_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by their first-activity week
    (Monday-truncated — identical semantics in Spark and DuckDB), counted
    per week offset they were active again.

    Single scan, two shuffles at any scale: first-activity comes from a
    MIN window over the user partition (no self-join — a groupBy+join
    cohort doubles the events scan and was measured at 8 exchanges vs 2),
    then one (cohort_week, offset) count-distinct aggregation.
    """
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events").select("user_id", "ts")
    joined = ev.withColumn(
        "first_ts", F.min("ts").over(Window.partitionBy("user_id"))
    )
    cohort_week = F.date_trunc("week", F.col("first_ts"))
    event_week = F.date_trunc("week", F.col("ts"))
    return (
        joined.select(
            "user_id",
            # emit as timestamp (not date): Monday-midnight weeks compare
            # identically and timestamps normalize cleanly in the
            # value-hash (DateType round-trips as python date objects)
            cohort_week.alias("cohort_week"),
            F.floor(F.datediff(event_week, cohort_week) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@query(
    "agg_funnel",
    oracle="""
    WITH s AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
               MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purch
        FROM events GROUP BY user_id
    )
    SELECT COUNT(t_view) AS n_view,
           COUNT(CASE WHEN t_click > t_view THEN 1 END) AS n_click,
           COUNT(CASE WHEN t_purch > t_click AND t_click > t_view
                      THEN 1 END) AS n_purchase
    FROM s
    """,
)
def agg_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase: a user counts
    at each step only if the step's FIRST occurrence strictly follows the
    previous step's first occurrence.

    One shuffle (per-user conditional-min pivot, map-side combined) plus a
    scalar global aggregate — the standard scalable funnel shape; no
    self-joins, no per-user event sorting.
    """
    ev = read_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    def first_ts(step: str):
        return F.min(F.when(F.col("event_type") == step, F.col("ts")))

    s = ev.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purch"),
    )
    return s.agg(
        F.count("t_view").alias("n_view"),
        F.count(F.when(F.col("t_click") > F.col("t_view"), 1)).alias("n_click"),
        F.count(
            F.when(
                (F.col("t_purch") > F.col("t_click"))
                & (F.col("t_click") > F.col("t_view")),
                1,
            )
        ).alias("n_purchase"),
    )

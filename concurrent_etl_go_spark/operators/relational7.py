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

"""ETL-parity queries: the reference's transform/route/batch semantics as
SQL-checkable operators (SURVEY §2.A anchors S7-S11, S14, S17, S22).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from concurrent_etl_go_spark.functions.casts import cast_zero_default
from concurrent_etl_go_spark.functions.indicators import (
    explode_indicators,
    pack_indicators,
)
from concurrent_etl_go_spark.operators import lib
from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.sources.readers import read_table


@query(
    "etl_transform_flat",
    oracle="""
    SELECT user_id AS device_id,
           event_type AS cpu_number,
           epoch_us(ts) // 1000000 AS timestamp,
           ROUND(100.0 - value, 4) AS utilization,
           ROUND(value, 4) AS raw_value,
           ROUND(COALESCE(TRY_CAST(json_extract_string(props, '$.k')
               AS DOUBLE), 0.0), 4) AS k,
           ROUND(COALESCE(TRY_CAST(json_extract_string(props, '$.k')
               AS DOUBLE), 0.0) / 100.0, 4) AS k_ratio
    FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    """,
)
def etl_transform_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship transform (flat form): malformed-drop (S2), JSON extract
    (S17), zero-default cast (S7), derived metric (S8), projection (S10).

    Reference ``transform`` at etl/main.go:213-234, applied to the events
    analog per FIXTURES.md B.
    """
    events = read_table(spark, sf_dir, "events")
    k = cast_zero_default(F.get_json_object("props", "$.k"))
    return events.where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    ).select(
        F.col("user_id").alias("device_id"),
        F.col("event_type").alias("cpu_number"),
        F.unix_timestamp("ts").alias("timestamp"),
        F.round(F.lit(100.0) - F.col("value"), 4).alias("utilization"),
        F.round("value", 4).alias("raw_value"),
        F.round(k, 4).alias("k"),
        F.round(k / 100.0, 4).alias("k_ratio"),
    )


@query(
    "etl_explode_indicators",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'quantity' AS indicator_name,
           ROUND(l_quantity, 4) AS indicator_value FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'price', ROUND(l_extendedprice, 4)
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', ROUND(l_discount, 4)
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'tax', ROUND(l_tax, 4) FROM lineitem
    """,
)
def etl_explode_indicators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack (S9) then unnest: array<struct<name,value>> built in declared
    order, exploded back to rows — the round-trip proves the nest/unnest
    pair preserves content."""
    li = read_table(spark, sf_dir, "lineitem")
    pairs = [
        ("quantity", F.round("l_quantity", 4)),
        ("price", F.round("l_extendedprice", 4)),
        ("discount", F.round("l_discount", 4)),
        ("tax", F.round("l_tax", 4)),
    ]
    packed = li.select(
        "l_orderkey", "l_linenumber", pack_indicators(pairs).alias("indicators")
    )
    return explode_indicators(packed)


@query(
    "etl_worker_route",
    oracle="""
    WITH named AS (
        SELECT CASE WHEN event_id % 97 = 0
                    THEN 'buffer_failed_workerX.json.gz'
                    ELSE 'buffer_failed_worker' || CAST(event_id % 10 AS VARCHAR)
                         || '.json.gz' END AS fname
        FROM events
    )
    SELECT COALESCE(TRY_CAST(NULLIF(regexp_extract(fname,
               'worker(\\d+)\\.json\\.gz$', 1), '') AS INT), 0) AS worker_id,
           COUNT(*) AS n
    FROM named GROUP BY 1
    """,
)
def etl_worker_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S22 parity: DLQ filename -> worker id with fallback-to-0 on malformed
    names (reference etl/main.go:361-372), plus S11 mod-routing shape."""
    from concurrent_etl_go_spark.functions.scalars import worker_id_from_filename

    events = read_table(spark, sf_dir, "events")
    fname = F.when(
        F.col("event_id") % 97 == 0, F.lit("buffer_failed_workerX.json.gz")
    ).otherwise(
        F.concat(
            F.lit("buffer_failed_worker"),
            (F.col("event_id") % 10).cast("string"),
            F.lit(".json.gz"),
        )
    )
    return (
        events.select(worker_id_from_filename(fname).alias("worker_id"))
        .groupBy("worker_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "etl_micro_batch",
    oracle="""
    SELECT user_id, batch_id, COUNT(*) AS batch_size FROM (
        SELECT user_id,
               CAST(floor((ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) - 1) / 200) AS BIGINT) AS batch_id
        FROM events
    ) t GROUP BY user_id, batch_id
    """,
)
def etl_micro_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S14/S15 declaratively: per-lane micro-batch assignment at the
    reference's threshold (200); every batch is full except at most one
    trailing partial per lane (reference etl/main.go:240-262)."""
    events = read_table(spark, sf_dir, "events")
    assigned = lib.micro_batch_ids(
        events, lane_col="user_id", order_cols=[F.col("ts"), F.col("event_id")],
        batch_size=200,
    )
    return assigned.groupBy("user_id", "batch_id").agg(
        F.count(F.lit(1)).alias("batch_size")
    )

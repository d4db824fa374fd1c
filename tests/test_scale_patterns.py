"""Tests for the explicit at-scale join patterns: salting for skew,
bucketing for shuffle-free co-located joins."""

from __future__ import annotations

from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.lib import salted_join
from concurrent_etl_go_spark.sinks.files import write_bucketed
from concurrent_etl_go_spark.sources.readers import read_table
from tests.conftest import SF_SMOKE


def test_salted_join_equals_plain_join(spark):
    """Salting must be a pure physical rewrite: row-identical results."""
    # skewed big side: 90% of rows share one hot key
    big = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, 1).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(100).select(
        F.col("id").alias("sk"), (F.col("id") * 2).alias("sval")
    )
    plain = big.join(small, F.col("k") == F.col("sk")).select(
        "k", "payload", "sval"
    )
    salted = salted_join(big, small, "k", "sk", n_salts=8).select(
        "k", "payload", "sval"
    )
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_join_spreads_hot_key(spark):
    """The hot key's rows must land in multiple salt buckets pre-join."""
    big = spark.range(1000).select(F.lit(7).alias("k"))
    salted = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(8))
    )
    n_buckets = salted.select("__salt").distinct().count()
    assert n_buckets >= 4  # hot key fanned across salts


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bdb LOCATION '{tmp_path}/bdb'")
    try:
        orders = read_table(spark, SF_SMOKE, "orders")
        lineitem = read_table(spark, SF_SMOKE, "lineitem")
        write_bucketed(
            orders.select("o_orderkey", "o_totalprice"),
            "bdb.orders_b",
            "o_orderkey",
        )
        write_bucketed(
            lineitem.select("l_orderkey", "l_quantity"),
            "bdb.lineitem_b",
            "l_orderkey",
        )
        joined = spark.table("bdb.lineitem_b").join(
            spark.table("bdb.orders_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located buckets: no hash-partition exchange on either side
        assert "Exchange hashpartitioning" not in plan
        # and the join still returns the right number of rows
        assert joined.count() == lineitem.count()
    finally:
        spark.sql("DROP DATABASE IF EXISTS bdb CASCADE")

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


def test_asof_merge_matches_rank_twin_and_survives_hot_key(spark):
    """The production as-of join (cogroup + pd.merge_asof) must be
    row-identical to its rank-based oracle twin, including on a hot-key
    fixture (1 user, 3k orders x 3k events = 9M pre-rank intermediate for
    the twin; the merge form's intermediate stays at 3k rows per group)."""
    from pyspark.sql import functions as F

    from concurrent_etl_go_spark.operators.lib import asof_join, asof_join_merge

    events = (
        spark.range(3000)
        .select(
            F.col("id").alias("event_id"),
            F.lit(7).alias("user_id"),
            F.to_timestamp(
                F.lit("2026-01-01 00:00:00")
            ).alias("base"),
        )
        .select(
            "event_id",
            "user_id",
            (F.col("base") + F.make_interval(secs=F.col("event_id") * 10)).alias("ts"),
        )
    )
    orders = spark.range(3000).select(
        F.col("id").alias("o_orderkey"),
        F.lit(7).alias("o_custkey"),
        (
            F.to_timestamp(F.lit("2026-01-01 00:00:00"))
            + F.make_interval(secs=F.col("id") * 7)
        ).alias("o_ts"),
    )
    kwargs = dict(
        left_key="user_id",
        right_key="o_custkey",
        left_time="ts",
        right_time="o_ts",
        right_tiebreak="o_orderkey",
    )
    merge = asof_join_merge(events, orders, **kwargs)
    assert "MapInPandas" in merge._jdf.queryExecution().executedPlan().toString()
    got = {
        (r.event_id, r.o_orderkey)
        for r in merge.select("event_id", "o_orderkey").collect()
    }
    want = {
        (r.event_id, r.o_orderkey)
        for r in asof_join(events, orders, **kwargs)
        .select("event_id", "o_orderkey")
        .collect()
    }
    assert got == want and len(got) == 3000

    # left variant: a key present only on the left survives with nulls
    lonely = events.withColumn("user_id", F.lit(99)).limit(5)
    left_out = asof_join_merge(
        events.union(lonely), orders, how="left", **kwargs
    )
    rows = left_out.where(F.col("user_id") == 99).collect()
    assert len(rows) == 5 and all(r.o_orderkey is None for r in rows)


def test_asof_merge_null_time_keys_and_how_validation(spark):
    """Null time keys must not crash pd.merge_asof inside the task: a
    null-time right row can never match (null never satisfies <=); a
    null-time left row matches nothing — dropped under how='inner', kept
    with null right columns under how='left'. Unknown ``how`` raises."""
    import pytest
    from pyspark.sql import functions as F

    from concurrent_etl_go_spark.operators.lib import asof_join_merge

    events = spark.createDataFrame(
        [
            (1, 7, "2026-01-01 00:10:00"),
            (2, 7, None),  # null left time
            (3, 8, "2026-01-01 00:10:00"),
        ],
        "event_id long, user_id long, ts_s string",
    ).select("event_id", "user_id", F.to_timestamp("ts_s").alias("ts"))
    orders = spark.createDataFrame(
        [
            (100, 7, "2026-01-01 00:00:00"),
            (101, 7, None),  # null right time: never matches
            (102, 8, None),  # key 8's only right row is null-time
        ],
        "o_orderkey long, o_custkey long, o_ts_s string",
    ).select("o_orderkey", "o_custkey", F.to_timestamp("o_ts_s").alias("o_ts"))
    kwargs = dict(
        left_key="user_id",
        right_key="o_custkey",
        left_time="ts",
        right_time="o_ts",
        right_tiebreak="o_orderkey",
    )

    inner = {
        (r.event_id, r.o_orderkey)
        for r in asof_join_merge(events, orders, **kwargs).collect()
    }
    assert inner == {(1, 100)}

    left = {
        (r.event_id, r.o_orderkey)
        for r in asof_join_merge(events, orders, how="left", **kwargs).collect()
    }
    assert left == {(1, 100), (2, None), (3, None)}

    with pytest.raises(ValueError, match="how"):
        asof_join_merge(events, orders, how="outer", **kwargs)


def test_partitioned_fact_join_gets_dynamic_partition_pruning(spark, tmp_path):
    """Writing the fact partitioned by its join-relevant dimension key
    lets Catalyst inject a dynamic-partition-pruning filter: the fact
    scan waits for the (filtered) dim side and reads only matching
    partitions — at 100 TB the difference between scanning one month
    and scanning the table. Asserts the plan carries the DPP expression
    and that results equal the unpartitioned join."""
    import pyspark.sql.functions as F
    from concurrent_etl_go_spark.sources.readers import read_table

    sf = "/root/testdata/sf0.001"
    li = read_table(spark, sf, "lineitem").withColumn(
        "ship_month", F.month("l_shipdate")
    )
    fact_path = str(tmp_path / "fact_by_month")
    li.write.partitionBy("ship_month").parquet(fact_path)

    # the dim filter is on a NON-join column, so the matching partitions
    # are only known at runtime — the DPP case (a filter directly on the
    # join key would constant-fold into static pruning instead)
    dim = (
        spark.range(1, 13)
        .select(
            F.col("id").cast("int").alias("ship_month"),
            F.when(F.col("id") == 3, "peak").otherwise("off").alias("season"),
        )
        .where(F.col("season") == "peak")
    )
    fact = spark.read.parquet(fact_path)
    joined = fact.join(dim, "ship_month").select("ship_month", "l_orderkey")

    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]

    expected = li.where(F.col("ship_month") == 3).count()
    assert joined.count() == expected > 0


def test_exact_money_sum_high_scale_survives_int64_overflow(spark):
    """The scale>=4 decimal accumulator must survive totals where a long
    SUM cannot: sum_charge-style units (~4e10/row at scale=6) cross
    int64 max near sf~40, where a long sum hard-fails under Spark 4's
    ANSI default (and wraps SILENTLY with ANSI off) while the DuckDB
    oracle sums into HUGEINT — a crashed or silently-wrong total either
    way.  Three rows of 5e12 at scale=6 are 1.5e19 units, past int64
    max (9.2e18); the decimal path recovers the exact total, and the
    SQL twin agrees in BOTH dialects."""
    import duckdb
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import ArithmeticException

    from concurrent_etl_go_spark.operators.lib import (
        exact_money_sum,
        exact_money_sum_sql,
    )

    df = spark.createDataFrame([(5e12,), (5e12,), (5e12,)], "val double")
    got = df.agg(exact_money_sum(F.col("val"), scale=6).alias("s")).first().s
    assert got == 1.5e13  # exact: 1.5e13 is an integer < 2^53

    # the long path DOES overflow here (guards the test's own premise —
    # under this session's ANSI default that is a query-killing
    # ARITHMETIC_OVERFLOW; with ANSI off it would be a silent wrap)
    with pytest.raises((ArithmeticException, Py4JJavaError)):
        df.agg(
            F.sum((F.col("val") * F.lit(1e6) + F.lit(0.5)).cast("long"))
        ).first()

    # SQL twin: identical fragment, both dialects, same exact answer
    frag = exact_money_sum_sql("val", scale=6)
    df.createOrReplaceTempView("money_overflow_t")
    spark_sql = spark.sql(
        f"SELECT {frag} AS s FROM money_overflow_t"
    ).first().s
    duck = duckdb.sql(
        f"SELECT {frag} AS s FROM (VALUES (5e12), (5e12), (5e12)) t(val)"
    ).fetchone()[0]
    assert spark_sql == duck == 1.5e13

    # scale<=3 keeps the measured-fast long path and matches its twin
    small = spark.createDataFrame([(1.23,), (4.56,)], "val double")
    got2 = small.agg(exact_money_sum(F.col("val")).alias("s")).first().s
    assert got2 == 5.79


def test_exact_money_sum_negative_amounts_match_oracle(spark):
    """Refund/credit-shaped NEGATIVE money values must round
    half-AWAY-FROM-ZERO like both dialects' ROUND: the pre-r8 bare
    ``+ 0.5`` half-add truncated negatives toward zero (e.g. -1.005 at
    scale=2 -> -100 units instead of ROUND's -101), so any future
    negative money expression would hash-diverge from its oracle.  The
    signed half-add (``+ signum(x) * 0.5``) and DuckDB's ROUND must
    agree exactly at BOTH the long and the hi/lo-split (scale>=4)
    accumulators.  Values honor the helper's contract (EXACT k-decimal
    money values — -1.01 scales to within ulps of integer -101, where
    the old idiom truncated to -100): the contract never covered
    half-boundary inputs like -1.005 at scale=2."""
    import duckdb

    from concurrent_etl_go_spark.operators.lib import (
        exact_money_sum,
        exact_money_sum_sql,
    )

    # exact 2-decimal values, mixed signs, so the accumulators must
    # cancel exactly; also exact at scale=6 for the hi/lo-split path
    vals = [(-1.01,), (2.67,), (-3.99,), (-0.01,), (7.12,)]
    df = spark.createDataFrame(vals, "val double")
    sql_vals = ", ".join(f"({v[0]!r})" for v in vals)

    for scale in (2, 6):  # long path and hi/lo-split path
        got = (
            df.agg(exact_money_sum(F.col("val"), scale=scale).alias("s"))
            .first()
            .s
        )
        frag = exact_money_sum_sql("val", scale=scale)
        want = duckdb.sql(
            f"SELECT {frag} AS s FROM (VALUES {sql_vals}) t(val)"
        ).fetchone()[0]
        assert got == want, (scale, got, want)

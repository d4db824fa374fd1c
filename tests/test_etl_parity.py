"""Golden tests for reference-parity semantics (SURVEY §5.2): S1-S3 scan +
malformed drop, S7 zero-on-failure cast, S8/S9 derived metric + ordered
indicator array."""

from __future__ import annotations

from pyspark.sql import functions as F

from concurrent_etl_go_spark.functions.casts import cast_null, cast_zero_default
from concurrent_etl_go_spark.plans import transform_cpu_stats
from concurrent_etl_go_spark.sources.readers import read_appliances_csv


def test_appliances_scan_drops_malformed(spark, tmp_path):
    """S1-S3: headerless positional CSV; <2-field rows dropped; extra
    fields ignored (reference etl/main.go:400-425)."""
    csv = tmp_path / "appliances.csv"
    csv.write_text(
        "192.168.0.1,device-0\n"
        "192.168.99.1\n"  # single field -> dropped
        "192.168.0.2,device-1,extra,fields\n"  # extra fields ignored
        "192.168.0.3,device-2\n"
    )
    df = read_appliances_csv(spark, str(csv))
    rows = {(r.ip, r.hostname) for r in df.collect()}
    assert rows == {
        ("192.168.0.1", "device-0"),
        ("192.168.0.2", "device-1"),
        ("192.168.0.3", "device-2"),
    }


def test_cast_zero_default_semantics(spark):
    """S7: malformed numeric strings become 0.0, not null (reference
    etl/main.go:214-218); adversarial values from FIXTURES.md A2."""
    df = spark.createDataFrame(
        [("95",), ("87.5",), ("",), ("N/A",), ("12,5",), ("1e310",), (None,)],
        "s string",
    )
    got = df.select(
        cast_zero_default("s").alias("zero"), cast_null("s").alias("null_mode")
    ).collect()
    zeros = [r.zero for r in got]
    nulls = [r.null_mode for r in got]
    assert zeros[0] == 95.0 and zeros[1] == 87.5
    assert zeros[2] == 0.0 and zeros[3] == 0.0 and zeros[4] == 0.0
    assert zeros[5] == float("inf") or zeros[5] == 0.0  # 1e310 overflow handling
    assert zeros[6] == 0.0  # Go zero-value for missing
    assert nulls[2] is None and nulls[3] is None


def test_transform_indicator_order_and_utilization(spark):
    """S8/S9: utilization = 100 - p_idle; indicators in the reference's
    exact slice order (etl/main.go:220-226)."""
    cpu = spark.createDataFrame(
        [("device-0", 1751450637, "0", "95", "1.5", "2", "0.5", "N/A")],
        "name string, timestamp long, cpu_number string, p_idle string, "
        "p_user string, p_sys string, p_irq string, p_nice string",
    )
    out = transform_cpu_stats(cpu).collect()[0]
    assert out.name == "device-0"
    inds = [(i.name, i.value) for i in out.indicators]
    assert inds == [
        ("utilization", 5.0),
        ("nice", 0.0),  # "N/A" -> 0.0
        ("user", 1.5),
        ("system", 2.0),
        ("irq", 0.5),
    ]


def test_transform_is_single_projection(spark):
    """The whole transform must stay one codegen'd projection — no shuffle,
    no UDF in the plan."""
    cpu = spark.createDataFrame(
        [("d", 0, "0", "1", "2", "3", "4", "5")],
        "name string, timestamp long, cpu_number string, p_idle string, "
        "p_user string, p_sys string, p_irq string, p_nice string",
    )
    plan = transform_cpu_stats(cpu)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

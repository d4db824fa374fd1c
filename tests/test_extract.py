"""Golden tests for the extract stage (S4/S5/S6): pluggable fetch inside
mapInPandas, deadline enforcement, quarantine split."""

from __future__ import annotations

from concurrent_etl_go_spark.operators.extract import (
    ExtractorConfig,
    quarantine_split,
    run_extract,
    synthetic_fetch,
)


def make_appliances(spark, n=40):
    return spark.createDataFrame(
        [(f"192.168.0.{i}", f"device-{i}") for i in range(n)],
        "ip string, hostname string",
    )


def test_extract_success_shape_and_timestamp(spark):
    fixed_clock = lambda: 1751450637  # noqa: E731
    out = run_extract(make_appliances(spark, 10), clock=fixed_clock)
    rows = out.collect()
    assert len(rows) == 10
    for r in rows:
        assert r.error is None
        assert r.timestamp == 1751450637  # stamped at extract (S4)
        assert r.cpu_number == "0"
        assert r.p_idle is not None  # stringly-typed numerics preserved


def test_extract_failures_are_quarantined_not_dropped(spark):
    def flaky_fetch(ip: str, hostname: str) -> dict:
        if ip.endswith(("0", "5")):
            raise ConnectionError(f"unreachable {ip}")
        return synthetic_fetch(ip, hostname)

    out = run_extract(make_appliances(spark, 20), fetch_fn=flaky_fetch)
    ok, failed = quarantine_split(out)
    assert ok.count() == 16
    assert failed.count() == 4
    assert "error" not in ok.columns
    for r in failed.collect():
        assert r.error.startswith("ConnectionError")


def test_extract_deadline_enforced(spark):
    def slow_fetch(ip: str, hostname: str) -> dict:
        import time

        time.sleep(0.2)
        return synthetic_fetch(ip, hostname)

    config = ExtractorConfig(timeout_s=0.05)
    out = run_extract(make_appliances(spark, 4).coalesce(1), slow_fetch, config)
    ok, failed = quarantine_split(out)
    assert ok.count() == 0
    assert failed.count() == 4
    assert all("TimeoutError" in r.error for r in failed.collect())


def test_extract_to_transform_end_to_end(spark):
    """S1->S10 chain: appliances -> extract -> transform -> DeviceData."""
    from concurrent_etl_go_spark.plans import transform_cpu_stats

    out = run_extract(make_appliances(spark, 8))
    ok, _ = quarantine_split(out)
    devices = transform_cpu_stats(ok)
    rows = devices.collect()
    assert len(rows) == 8
    names = [i.name for i in rows[0].indicators]
    assert names == ["utilization", "nice", "user", "system", "irq"]


def test_extract_fanout_concurrency(spark):
    """The per-partition thread pool must give real fan-out: 100 devices at
    0.5 s each would take 50 s serially; with pool width 50 over 2
    partitions it must finish in ~1 wave."""
    import time

    config = ExtractorConfig(
        timeout_s=5.0, simulate_delay_s=0.5, concurrency=50
    )
    appliances = make_appliances(spark, 100).repartition(2)
    start = time.perf_counter()
    out = run_extract(appliances, config=config)
    n = out.count()
    wall = time.perf_counter() - start
    assert n == 100
    assert wall < 10, f"fan-out broken: {wall:.1f}s for 100 x 0.5s fetches"

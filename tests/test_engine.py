"""End-to-end engine tests: the full reference flow (run_etl) against the
mock server, including crash-recovery across two runs, and the Engine
query facade."""

from __future__ import annotations

import pytest

from concurrent_etl_go_spark.engine import Engine, run_etl
from concurrent_etl_go_spark.sinks import HttpSinkConfig, dlq_files
from tests.conftest import SF_SMOKE
from tests.mock_api import MockApiServer


@pytest.fixture()
def mock_api():
    server = MockApiServer().start()
    yield server
    server.stop()


@pytest.fixture()
def appliances_csv(tmp_path):
    lines = [f"192.168.{i // 256}.{i % 256},device-{i}" for i in range(400)]
    lines.insert(7, "192.168.99.1")  # malformed: dropped by the scan
    path = tmp_path / "appliances.csv"
    path.write_text("\n".join(lines) + "\n")
    return str(path)


def test_run_etl_end_to_end(spark, mock_api, appliances_csv, tmp_path):
    sink = HttpSinkConfig(
        endpoint=mock_api.endpoint,
        auth_token="run-token",
        batch_size=200,
        dlq_dir=str(tmp_path / "dlq"),
    )
    report = run_etl(spark, appliances_csv, sink, lanes=4)
    assert mock_api.total_rows_received() == 400  # malformed row dropped
    assert report.extracted_rows == 400
    assert report.quarantined_rows == 0
    assert report.replayed_rows == 0
    assert report.spill_files_after == 0
    assert report.wall_clock_s > 0
    assert set(report.phases) == {"dlq_replay_s", "plan_s", "load_s"}


def test_run_etl_crash_recovery_two_runs(spark, mock_api, appliances_csv, tmp_path):
    """Run 1 with the sink down spills everything; run 2 replays the spills
    and clears them after ack — the reference's restart story (S19/S20)."""
    sink = HttpSinkConfig(
        endpoint=mock_api.endpoint, batch_size=200, dlq_dir=str(tmp_path / "dlq")
    )
    mock_api.state.fail_all = True
    r1 = run_etl(spark, appliances_csv, sink, lanes=4)
    assert mock_api.total_rows_received() == 0
    assert r1.spill_files_after > 0

    mock_api.state.fail_all = False
    r2 = run_etl(spark, appliances_csv, sink, lanes=4)
    # run 2 delivers its own 400 fresh + 400 replayed
    assert mock_api.total_rows_received() == 800
    assert r2.replayed_rows == 400
    assert r2.spill_files_after == 0
    assert dlq_files(sink.dlq_dir) == []


def test_engine_facade_sql_and_named_queries(spark):
    engine = Engine(spark, SF_SMOKE)
    assert engine.table("nation").count() == 25
    df = engine.sql(
        "SELECT r_name, COUNT(*) AS n FROM nation "
        "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name"
    )
    assert df.count() == 5
    assert "agg_pricing_summary" in engine.queries()
    assert engine.query("agg_pricing_summary").count() > 0


def test_cli_list_run_sql_explain(capsys, spark):
    """The CLI front door: list needs no session; run/sql/explain reuse
    the active one (get_spark returns the existing session)."""
    from concurrent_etl_go_spark.cli import main

    assert main(["list", "--prefix", "agg_pricing"]) == 0
    out = capsys.readouterr().out
    assert "agg_pricing_summary\tproduction\toracle" in out

    assert main(["run", "agg_pricing_summary", "--limit", "5"]) == 0
    out = capsys.readouterr().out
    assert "l_returnflag" in out

    assert main(["sql", "SELECT COUNT(*) AS n FROM region"]) == 0
    assert "n" in capsys.readouterr().out

    assert main(["explain", "sort_limit_topk"]) == 0
    assert "TakeOrderedAndProject" in capsys.readouterr().out


def test_cli_table_management(capsys, spark, tmp_path):
    """The table subcommand drives the versioned-table lifecycle end to
    end from the command line: history, show, restore, changes, vacuum."""
    from pyspark.sql import functions as F

    from concurrent_etl_go_spark.cli import main
    from concurrent_etl_go_spark.sources import versioned as vt

    root = str(tmp_path / "tbl")
    df = spark.range(0, 5).select(F.col("id"), (F.col("id") * 2).alias("v"))
    vt.write_table(df, root)
    vt.write_table(
        spark.range(5, 8).select(F.col("id"), (F.col("id") * 2).alias("v")),
        root,
    )

    assert main(["table", root, "history"]) == 0
    out = capsys.readouterr().out
    assert "v1\tappend" in out and "v2\tappend" in out

    assert main(["table", root, "show", "--version", "1"]) == 0
    assert "id" in capsys.readouterr().out

    assert main(["table", root, "changes", "1", "2"]) == 0
    out = capsys.readouterr().out
    assert "insert" in out and "_change_type" in out

    assert main(["table", root, "restore", "1"]) == 0
    assert "as v3" in capsys.readouterr().out
    assert vt.read_table_version(spark, root).count() == 5

    assert main(["table", root, "vacuum", "--keep-versions", "1"]) == 0
    assert "deleted" in capsys.readouterr().out


def test_engine_sql_over_versioned_view(spark, tmp_path):
    """Versioned tables join the SQL surface via register_versioned_view,
    with time travel and snapshot isolation (view pinned at registration)."""
    from pyspark.sql import functions as F

    from concurrent_etl_go_spark.engine import Engine
    from concurrent_etl_go_spark.sources import versioned as vt

    root = str(tmp_path / "tbl")
    df = spark.range(0, 6).select(F.col("id"), (F.col("id") * 3).alias("v"))
    vt.write_table(df, root)

    eng = Engine(spark, "/root/testdata/sf0.001")
    eng.register_versioned_view("facts", root)
    assert eng.sql("SELECT COUNT(*) AS n FROM facts").first().n == 6
    # joins against the shared tables work in the same statement
    joined = eng.sql(
        "SELECT COUNT(*) AS n FROM facts JOIN region ON facts.id = region.r_regionkey"
    ).first().n
    assert joined == 5

    # snapshot isolation: a later commit doesn't move the view
    vt.write_table(
        spark.range(6, 9).select(F.col("id"), (F.col("id") * 3).alias("v")),
        root,
    )
    assert eng.sql("SELECT COUNT(*) AS n FROM facts").first().n == 6
    # explicit time travel
    eng.register_versioned_view("facts_v2", root, version=2)
    assert eng.sql("SELECT COUNT(*) AS n FROM facts_v2").first().n == 9

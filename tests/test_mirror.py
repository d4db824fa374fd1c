"""Table replication (sources/mirror.py): cheapest-mechanism selection,
convergence after every upstream shape, and crash-retry idempotence."""

from __future__ import annotations

import json
import os
from collections import Counter

from pyspark.sql import functions as F

from concurrent_etl_go_spark.sources import mirror, versioned as vt


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 2).alias("double_id")
    )


def _multiset(spark, root):
    return Counter(
        (r.id, r.double_id)
        for r in vt.read_table_version(spark, root).collect()
    )


def test_mirror_selects_cheapest_mechanism_and_converges(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")

    vt.write_table(_df(spark, 0, 6), src)
    v, mode = mirror.mirror_table(spark, src, dst)
    assert (v, mode) == (1, "rebuild")  # first sync
    assert _multiset(spark, dst) == _multiset(spark, src)

    v, mode = mirror.mirror_table(spark, src, dst)
    assert mode == "noop"

    # plain appends forward as appends (delta files only)
    vt.write_table(_df(spark, 6, 9), src)
    vt.write_table(_df(spark, 9, 11), src)
    v, mode = mirror.mirror_table(spark, src, dst)
    assert (v, mode) == (3, "append")
    assert _multiset(spark, dst) == _multiset(spark, src)

    # a rewritten window with a key catches up via CDC
    upd = spark.createDataFrame([(0, 999)], "id long, double_id long")
    vt.merge_upsert(spark, src, upd, key="id")
    v, mode = mirror.mirror_table(spark, src, dst, key="id")
    assert mode == "cdc"
    assert _multiset(spark, dst) == _multiset(spark, src)

    # a rewritten window WITHOUT a key rebuilds (priced, surfaced)
    vt.compact(spark, src, target_files=1)
    vt.write_table(_df(spark, 50, 52), src)
    vt.compact(spark, src, target_files=1)
    v, mode = mirror.mirror_table(spark, src, dst)
    assert mode == "rebuild"
    assert _multiset(spark, dst) == _multiset(spark, src)


def test_mirror_crash_retry_never_duplicates(spark, tmp_path):
    """Crash between the dst commit and the mirror-state write: the retry
    must detect the committed source version (batch id) and not re-append
    the same delta."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    vt.write_table(_df(spark, 0, 5), src)
    mirror.mirror_table(spark, src, dst)
    vt.write_table(_df(spark, 5, 8), src)
    mirror.mirror_table(spark, src, dst)
    assert _multiset(spark, dst) == _multiset(spark, src)

    # simulate the crash: roll the state back one sync
    with open(os.path.join(dst, "_mirror_state.json"), "w") as f:
        json.dump({"src_version": 1}, f)

    v, mode = mirror.mirror_table(spark, src, dst)
    assert (v, mode) == (2, "noop")  # replay detected, nothing re-applied
    assert _multiset(spark, dst) == _multiset(spark, src)
    assert mirror.mirror_state(dst) == {"src_version": 2}


def test_mirror_cdc_crash_retry_is_idempotent(spark, tmp_path):
    """Same crash window on the CDC path: the applied source version rides
    in the dst manifest, so the retry is a no-op instead of re-applying
    inserts twice."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    vt.write_table(_df(spark, 0, 5), src)
    mirror.mirror_table(spark, src, dst)

    upd = spark.createDataFrame([(1, 111), (70, 777)], "id long, double_id long")
    vt.merge_upsert(spark, src, upd, key="id")
    mirror.mirror_table(spark, src, dst, key="id")
    assert _multiset(spark, dst) == _multiset(spark, src)

    with open(os.path.join(dst, "_mirror_state.json"), "w") as f:
        json.dump({"src_version": 1}, f)
    v, mode = mirror.mirror_table(spark, src, dst, key="id")
    assert mode == "noop"
    assert _multiset(spark, dst) == _multiset(spark, src)


def test_cli_mirror_subcommand(capsys, spark, tmp_path):
    from concurrent_etl_go_spark.cli import main

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    vt.write_table(_df(spark, 0, 4), src)
    assert main(["table", src, "mirror", dst]) == 0
    assert "via rebuild" in capsys.readouterr().out
    vt.write_table(_df(spark, 4, 6), src)
    assert main(["table", src, "mirror", dst, "--key", "id"]) == 0
    assert "via append" in capsys.readouterr().out
    assert _multiset(spark, dst) == _multiset(spark, src)

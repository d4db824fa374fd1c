#!/usr/bin/env python
"""Round-13 bench-drift forensics (VERDICT r12 §Next #1).

Round 12's committed bench slowed a median 1.28x on queries whose code
did not change, with within-session samples RISING.  Two hypotheses:

  A. session-state accumulation — localCheckpoint RDD blocks pinned
     until Python+JVM GC, UI/status-store retention, codegen cache —
     so later queries in the 219-query session run against a heavier
     JVM;
  B. host contention — a shared noisy box.

This script separates them by experiment:

  * repeat a fixed probe set N times in ONE session under the current
    protocol (release_caches only), recording per-repeat times plus
    JVM state (persistent RDD count, driver heap, storage memory).
    If times rise with repeat index while RDD count / heap grow ->
    hypothesis A; flat times but noisy -> B.
  * optionally (--deep-clean) add the candidate fix between queries:
    python gc.collect() + py4j-side System.gc() so ContextCleaner can
    actually release checkpointed RDD blocks, and compare.

Usage:
  python scripts/bench_forensics.py [--deep-clean] [--repeats N]
         [--sf-dir DIR] [--queries a,b,c]
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# mix of round-12 "weak five" (drifted, code unchanged), heavy
# iteratives (localCheckpoint users), and stable cheap controls
DEFAULT_PROBES = [
    "agg_chi_square",            # 3.4x drift, code unchanged
    "agg_kendall_tau",           # 2.1x drift
    "agg_runs_test",             # 2.0x drift
    "agg_wilcoxon_signed_rank",  # 2.3x drift
    "graph_ppr",                 # 8 rounds x localCheckpoint
    "embeddings_top_component",  # 8 rounds x localCheckpoint (round 12)
    "graph_kcore",               # iterative
    "agg_pricing_summary",       # cheap scan control
    "join_inner_broadcast",      # cheap join control
]


def jvm_state(spark) -> dict:
    sc = spark.sparkContext
    jsc = sc._jsc.sc()
    rt = spark._jvm.java.lang.Runtime.getRuntime()
    heap_used = (rt.totalMemory() - rt.freeMemory()) / (1 << 20)
    n_rdds = jsc.getPersistentRDDs().size()
    try:
        status = jsc.getExecutorMemoryStatus()
        mem = status.values().iterator().next()
        storage_used_mb = (mem._1() - mem._2()) / (1 << 20)
    except Exception:
        storage_used_mb = -1.0
    return {
        "heap_used_mb": round(heap_used, 1),
        "persistent_rdds": n_rdds,
        "storage_used_mb": round(storage_used_mb, 1),
    }


def deep_clean(spark) -> None:
    """The candidate fix: drop py4j refs so the JVM objects become
    unreachable, then ask the JVM to GC so ContextCleaner releases
    checkpointed RDD blocks + stale broadcasts."""
    spark.catalog.clearCache()
    gc.collect()
    spark._jvm.java.lang.System.gc()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--deep-clean", action="store_true")
    ap.add_argument("--repeats", type=int, default=6)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--queries", default=",".join(DEFAULT_PROBES))
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    probes = args.queries.split(",")

    from concurrent_etl_go_spark.operators.registry import (
        QUERIES,
        release_caches,
    )
    from concurrent_etl_go_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="bench_forensics",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    results: dict[str, list[float]] = {n: [] for n in probes}
    states: list[dict] = []
    wall0 = time.perf_counter()
    for rep in range(args.repeats):
        for name in probes:
            t0 = time.perf_counter()
            df = QUERIES[name](spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            release_caches()
            if args.deep_clean:
                deep_clean(spark)
            results[name].append(round(dt, 3))
        st = jvm_state(spark)
        st["repeat"] = rep
        st["wall_s"] = round(time.perf_counter() - wall0, 1)
        states.append(st)
        print(json.dumps(st), flush=True)

    out = {
        "mode": "deep_clean" if args.deep_clean else "current_protocol",
        "sf_dir": args.sf_dir,
        "repeats": args.repeats,
        "times": results,
        "jvm_states": states,
    }
    for name in probes:
        t = results[name]
        print(
            f"{name:32s} first={t[0]:7.3f} last={t[-1]:7.3f} "
            f"min={min(t):7.3f} max={max(t):7.3f} "
            f"trend={'RISING' if t[-1] > 1.3 * min(t[1:] or t) else 'flat'}"
        )
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()

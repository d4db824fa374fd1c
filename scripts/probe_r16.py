#!/usr/bin/env python
"""Targeted A/B probe: time named registry queries with the noop sink.

    python scripts/probe_r16.py name1,name2,... [n_passes]

Same session config as bench.py (local[$SPARK_GRAFT_CPUS], AQE,
shuffle_partitions = cpus), one cold pass + n warm passes per query,
prints per-query min/median/samples as JSON.  Used for the round-16
quiet-host A/B probes (VERDICT r15 §Next #2: only same-host-window
minima are comparable).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main() -> int:
    names = [n for n in sys.argv[1].split(",") if n]
    n_warm = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from concurrent_etl_go_spark.session import get_spark

    spark = get_spark(
        app_name="probe_r16",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    import concurrent_etl_go_spark.operators as ops
    from concurrent_etl_go_spark.operators.registry import release_caches

    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def run_once(name: str) -> float:
        spark.sparkContext.setJobDescription(f"probe:{name}")
        start = time.perf_counter()
        df = ops.QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        end = time.perf_counter()
        release_caches()
        return round(end - start, 3)

    out = {}
    for name in names:
        cold = run_once(name)
        samples = [run_once(name) for _ in range(n_warm)]
        out[name] = {
            "cold": cold,
            "min": min(samples),
            "median": round(statistics.median(samples), 3),
            "samples": samples,
            "loadavg1": round(os.getloadavg()[0], 2),
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"probe": out}, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    sys.exit(main())

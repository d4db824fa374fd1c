#!/usr/bin/env python
"""Rounds-vs-wall curves for the iterative graph kernels.

The round-11 bench showed the iterative kernels dominate e2e wall
(graph_ppr 6.3 s at sf0.1) while their terminal ACTION is <=0.23 s —
i.e. the cost is per-round driver orchestration x eager
``localCheckpoint``, not data volume.  At 100x DATA that constant is
flat; at 100x ROUNDS it is not.  This script measures the constant:
run ``graph_ppr`` (float PageRank recurrence) and
``graph_katz_centrality`` (integer Katz fold) at 3/6/12 rounds on the
same sf dir and fit seconds-per-round from the marginal differences.

    python scripts/scale_graph_rounds.py [sf_dir] [out.json]

Writes ``SCALE_GRAPH_ROUNDS.json``: per kernel, wall at each round
count, the fitted per-round marginal cost, and the fixed setup
intercept.  Monkeypatches the module round constants (the loop reads
the global at call time); oracle text is irrelevant here — only the
Spark side runs.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main() -> int:
    from pyspark.sql import SparkSession

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO_ROOT, "SCALE_GRAPH_ROUNDS.json")
    )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from concurrent_etl_go_spark.operators import graph2, graph5
    from concurrent_etl_go_spark.operators.registry import release_caches

    kernels = [
        ("graph_ppr", graph2, "_PPR_ROUNDS", graph2.graph_ppr),
        (
            "graph_katz_centrality",
            graph5,
            "_KATZ_ROUNDS",
            graph5.graph_katz_centrality,
        ),
    ]
    sweep = [3, 6, 12]
    report: dict = {"sf_dir": sf_dir, "cpus": int(cpus), "kernels": {}}
    for name, mod, attr, fn in kernels:
        orig = getattr(mod, attr)
        walls: dict[str, float] = {}
        try:
            # one discarded warm-up at the smallest rounds so JVM/scan
            # warm-up does not pollute the marginal differences
            setattr(mod, attr, sweep[0])
            fn(spark, sf_dir).count()
            release_caches()
            for r in sweep:
                setattr(mod, attr, r)
                t0 = time.monotonic()
                n = fn(spark, sf_dir).count()
                walls[str(r)] = round(time.monotonic() - t0, 3)
                release_caches()
                assert n > 0
        finally:
            setattr(mod, attr, orig)
        # two-point marginal fits + the least-squares slope over all 3
        lo, mid, hi = (walls[str(r)] for r in sweep)
        slope_3_12 = (hi - lo) / (sweep[2] - sweep[0])
        xs, ys = sweep, [lo, mid, hi]
        xbar, ybar = sum(xs) / 3, sum(ys) / 3
        slope_ls = sum(
            (x - xbar) * (y - ybar) for x, y in zip(xs, ys)
        ) / sum((x - xbar) ** 2 for x in xs)
        report["kernels"][name] = {
            "rounds_wall_s": walls,
            "sec_per_round_endpoints": round(slope_3_12, 3),
            "sec_per_round_leastsq": round(slope_ls, 3),
            "setup_intercept_s": round(ybar - slope_ls * xbar, 3),
            "default_rounds": orig,
        }
        print(name, report["kernels"][name], flush=True)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
        f.write("\n")
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Forward scale proof for round-12's perf-weak-flagged queries
(VERDICT r12 §Next #7): one MORE decade point, sf1 -> sf2, for the five
queries whose committed bench drifted in round 12.  The round-13 drift
forensics (DRIFT_FORENSICS_r13.json) already exonerated their absolute
times (all back at round-11 levels); this records that their SCALING
stays sub-quadratic through sf2 (same generator, seed 42, as the
BENCH_SF1.json decade), clearing the weak labels with data.

Round 14 (VERDICT r13 §Next #7) extends the set to the three costliest
graph kernels — ``graph_ppr``, ``graph_kcore``,
``graph_betweenness_sampled`` — the queries where scale proof matters
most in absolute terms.  Since the optimization round the query path
derives the edge list fresh per invocation, so kernel passes include
the derivation; it is ALSO timed separately per sf (``edge_derive``
in the output) with its own exponent, so neither cost hides.

exponent = log2(t_sf2 / t_sf1) for the 2x step (1.0 = linear).
Action-only is the honest volume signal at these scales (e2e carries
fixed planning/job-latency costs).

    python scripts/scale_weak_sf2.py [--runs 2]
Writes SCALE_WEAK_SF2.json.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

WEAK = (
    "agg_chi_square",
    "agg_kendall_tau",
    "agg_runs_test",
    "agg_wilcoxon_signed_rank",
    "search_eval_mmr_arm",
    # round 14: the costliest absolute graph kernels (VERDICT r13 #7)
    "graph_ppr",
    "graph_kcore",
    "graph_betweenness_sampled",
)

SF_DIRS = {
    "sf1": os.path.join(REPO_ROOT, "localdata", "sf1"),
    "sf2": os.path.join(REPO_ROOT, "localdata", "sf2"),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from concurrent_etl_go_spark.operators.registry import release_caches
    from concurrent_etl_go_spark.session import get_spark

    spark = get_spark(
        app_name="scale-weak-sf2", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()

    def run_once(name: str, sf_dir: str) -> tuple[float, float]:
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        release_caches()
        return t2 - t0, t2 - t1

    # edge-list derivation cost per sf, timed explicitly so the
    # scan+pairing prefix has its own scale record.  (Since the
    # optimization round the query path derives fresh per invocation —
    # there is no memo or persisted table to clear.)
    from concurrent_etl_go_spark.operators import graph2

    edge_derive: dict[str, float] = {}
    for sf, sf_dir in SF_DIRS.items():
        t0 = time.perf_counter()
        graph2._copurchase_edges(spark, sf_dir).count()
        edge_derive[sf] = round(time.perf_counter() - t0, 3)
        release_caches()

    results: dict[str, dict] = {}
    for name in WEAK:
        per_sf: dict[str, tuple[float, float]] = {}
        for sf, sf_dir in SF_DIRS.items():
            run_once(name, sf_dir)  # warm-up (codegen, footers)
            best = min(
                (run_once(name, sf_dir) for _ in range(args.runs)),
                key=lambda t: t[0],
            )
            per_sf[sf] = (round(best[0], 3), round(best[1], 3))
        e2e1, act1 = per_sf["sf1"]
        e2e2, act2 = per_sf["sf2"]
        results[name] = {
            "sf1_e2e": e2e1,
            "sf1_act": act1,
            "sf2_e2e": e2e2,
            "sf2_act": act2,
            "exp_e2e": round(math.log2(max(e2e2, 1e-3) / max(e2e1, 1e-3)), 3),
            "exp_act": round(math.log2(max(act2, 1e-3) / max(act1, 1e-3)), 3),
        }
        print(name, results[name], flush=True)

    out = {
        "metric": "weak_plus_graph_sf1_to_sf2",
        "edge_derive": {
            **edge_derive,
            "exp": round(
                math.log2(
                    max(edge_derive["sf2"], 1e-3)
                    / max(edge_derive["sf1"], 1e-3)
                ),
                3,
            ),
        },
        "generator": "scripts/gen_sf.py seed=42 (same generator at both points)",
        "points": SF_DIRS,
        "runs": args.runs,
        "timing": "best-of-n after one warm-up, serialized",
        "queries": results,
        "worst_exp_act": max(r["exp_act"] for r in results.values()),
        "note": "exponent = log2(t_sf2/t_sf1) over a 2x step; <= 1.3 "
        "clears the round-12 weak label (VERDICT r12 item 7)",
    }
    with open(os.path.join(REPO_ROOT, "SCALE_WEAK_SF2.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"worst_exp_act": out["worst_exp_act"]}))


if __name__ == "__main__":
    main()

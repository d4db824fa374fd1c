#!/usr/bin/env python
"""Round-over-round bench regression gate (VERDICT r12 §Next #1).

Compares the current ``BENCH_LOCAL.json`` against a baseline bench
record (default: the version committed at the given git rev) and FAILS
close-out when, under the identical protocol:

Round 14: both sides are reduced to the ROBUST stat — the per-query MIN
of the raw ``samples_e2e`` when the record carries samples, else the
headline ``queries`` value — so the gate is protocol-independent: a
round-14 min-of-n record gates cleanly against a round-13 median-era
baseline, and one contended sample on either side cannot fake (or mask)
a regression.  Host contention only ever ADDS time, so the min is the
estimator of the plan's uncontended cost.

- any common query regressed more than ``--max-ratio`` (default 1.5x)
  with an absolute slowdown above ``--min-delta`` seconds (so a
  0.05s -> 0.09s blip cannot fail the gate), or
- the common-query median ratio exceeds ``--max-median`` (default
  1.15x) — the fleet-wide-drift signature round 12 shipped unnoticed.

Also prints the sentinel-drift number when present (bench.py re-runs
its first queries at session end; a high value means the session got
heavier — accumulation — while a clean sentinel with slow mid-run
queries means host noise).

Usage:
  python scripts/bench_regression_gate.py [--current BENCH_LOCAL.json]
      [--baseline-rev <rev>] [--baseline-file <path>]
      [--max-ratio 1.5] [--max-median 1.15] [--min-delta 0.3]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_baseline(args) -> dict:
    if args.baseline_file:
        with open(args.baseline_file) as f:
            return json.load(f)
    out = subprocess.run(
        ["git", "show", f"{args.baseline_rev}:BENCH_LOCAL.json"],
        cwd=REPO_ROOT,
        capture_output=True,
        text=True,
        check=True,
    )
    return json.loads(out.stdout)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--current", default=os.path.join(REPO_ROOT, "BENCH_LOCAL.json"))
    ap.add_argument("--baseline-rev", default="HEAD")
    ap.add_argument("--baseline-file", default="")
    ap.add_argument("--max-ratio", type=float, default=1.5)
    ap.add_argument("--max-median", type=float, default=1.15)
    ap.add_argument("--min-delta", type=float, default=0.3)
    args = ap.parse_args()

    with open(args.current) as f:
        cur = json.load(f)
    base = load_baseline(args)

    def robust(rec: dict) -> dict:
        """Per-query min of raw samples when present, else the headline."""
        q = dict(rec.get("queries", {}))
        for name, samples in rec.get("samples_e2e", {}).items():
            if samples:
                q[name] = min(samples)
        return q

    cq, bq = robust(cur), robust(base)
    common = sorted(set(cq) & set(bq))
    if not common:
        print("no common queries — nothing to gate")
        return 0

    ratios = []
    offenders = []
    per_query = []
    for name in common:
        b, c = bq[name], cq[name]
        if b <= 0:
            continue
        r = c / b
        ratios.append(r)
        per_query.append((r, name, b, c))
        if r > args.max_ratio and (c - b) > args.min_delta:
            offenders.append((r, name, b, c))
    med = statistics.median(ratios)
    # Epoch-normalized offenders (round 14): a PLAN regression inflates
    # specific queries; a host-epoch change inflates every query by the
    # same factor (the DRIFT_FORENSICS_r13 signature — this shared host
    # has stepped 1.2x within a single day on identical code, see
    # BENCH_AB_r14.json).  Dividing each ratio by the fleet median
    # cancels uniform drift, so what survives IS query-specific.
    norm_offenders = [
        (r / med, name, b, c)
        for r, name, b, c in per_query
        if med > 0
        and (r / med) > args.max_ratio
        and (c - b * med) > args.min_delta
    ]
    cur_total = sum(cq[n] for n in common)
    base_total = sum(bq[n] for n in common)
    print(
        f"common queries: {len(common)}; total {base_total:.1f}s -> "
        f"{cur_total:.1f}s ({cur_total / base_total:.2f}x); "
        f"median ratio {med:.3f}"
    )
    if cur.get("sentinel_drift") is not None:
        print(
            f"sentinel drift (end-of-session re-run of first queries): "
            f"{cur['sentinel_drift']}x "
            f"({'accumulation signature' if cur['sentinel_drift'] > 1.2 else 'session stayed light'})"
        )
    for r, name, b, c in sorted(offenders, reverse=True):
        print(f"  REGRESSED {r:5.2f}x  {name}: {b:.2f}s -> {c:.2f}s")
    for r, name, b, c in sorted(norm_offenders, reverse=True):
        print(
            f"  NORM-REGRESSED {r:5.2f}x (epoch-normalized)  "
            f"{name}: {b:.2f}s -> {c:.2f}s"
        )

    fail = bool(offenders) or med > args.max_median
    sentinel = cur.get("sentinel_drift")
    uniform_drift = (
        fail
        and not norm_offenders
        and (sentinel is None or sentinel <= 1.1)
    )
    if uniform_drift:
        print(
            f"GATE OK (uniform-drift exoneration): median {med:.3f} "
            f"exceeds {args.max_median} but ZERO epoch-normalized "
            f"offenders survive and the sentinel re-run is clean "
            f"({sentinel}) — a plan regression cannot inflate every "
            f"query by the same factor; this is the host-epoch "
            f"signature (DRIFT_FORENSICS_r13 / BENCH_AB_r14)."
        )
        return 0
    if fail:
        print(
            f"GATE FAILED: {len(offenders)} per-query offenders "
            f"({len(norm_offenders)} survive epoch normalization), "
            f"median {med:.3f} (limit {args.max_median})"
        )
    else:
        print("GATE OK")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main())

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

Round 15 (VERDICT r14 §Next #1/#2 + ADVICE r14 #1):

- The default baseline is the ROUND-14 committed bench (rev 25902b3) —
  the first record measured under the frozen pass-major protocol — so
  round-over-round comparisons are protocol-identical by default.
- Protocol freeze: the gate reads ``protocol_version`` from both
  records (inferring v3 from the "PASS-MAJOR" protocol string for the
  one pre-stamp v3 record, r14's) and REFUSES cross-protocol
  comparisons unless ``--allow-cross-protocol`` — the r14 close-out
  proved the "min-of-samples is protocol-independent" premise false
  across session structures (pass-major warm passes lose back-to-back
  codegen/JIT reuse that query-major passes enjoyed).
- The uniform-drift exoneration is ADVISORY, not a pass: a genuine
  global regression (session conf change, fleet-wide harness overhead)
  inflates every query by roughly the same factor and is
  indistinguishable from host drift by this test alone.  It now exits
  3 (distinct from OK=0 / FAIL=1) and requires an explicit
  ``--allow-uniform-drift`` — backed by a same-host code-A/B rerun on
  identical code (the BENCH_AB_r14.json procedure) — to pass.

Usage:
  python scripts/bench_regression_gate.py [--current BENCH_LOCAL.json]
      [--baseline-rev <rev>] [--baseline-file <path>]
      [--max-ratio 1.5] [--max-median 1.15] [--min-delta 0.3]
      [--allow-uniform-drift] [--allow-cross-protocol]
      [--transcript <path>]

Exit codes: 0 = OK; 1 = FAILED; 2 = refused (cross-protocol baseline);
3 = uniform-drift signature (advisory — A/B then rerun with
--allow-uniform-drift).
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
    # r14 artifacts commit: the first pass-major (protocol v3) bench
    ap.add_argument("--baseline-rev", default="25902b3")
    ap.add_argument("--baseline-file", default="")
    ap.add_argument("--max-ratio", type=float, default=1.5)
    ap.add_argument("--max-median", type=float, default=1.15)
    ap.add_argument("--min-delta", type=float, default=0.3)
    ap.add_argument("--allow-uniform-drift", action="store_true")
    ap.add_argument("--allow-cross-protocol", action="store_true")
    ap.add_argument(
        "--transcript",
        default="",
        help="also write the gate verdict + per-query ratios as JSON "
        "(the committed close-out artifact, e.g. GATE_r15.json)",
    )
    args = ap.parse_args()

    with open(args.current) as f:
        cur = json.load(f)
    base = load_baseline(args)

    def proto_version(rec: dict) -> int | None:
        """Explicit stamp, else inferred v3 from the pass-major protocol
        string (r14's record predates the stamp), else None."""
        v = rec.get("protocol_version")
        if v is not None:
            return int(v)
        if "PASS-MAJOR" in rec.get("protocol", ""):
            return 3
        return None

    pv_cur, pv_base = proto_version(cur), proto_version(base)
    if pv_cur != pv_base:
        print(
            f"protocol mismatch: current v{pv_cur} vs baseline "
            f"v{pv_base} — per-query samples are NOT comparable across "
            f"session structures (r14 lesson: pass-major passes lose "
            f"back-to-back codegen reuse; mins shift without any code "
            f"change)."
        )
        if not args.allow_cross_protocol:
            print("GATE REFUSED (rerun with --allow-cross-protocol to override)")
            return 2
        print("proceeding under --allow-cross-protocol; treat offenders as advisory")

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
        # ADVISORY (round 15, ADVICE r14 #1): zero normalized offenders
        # + clean sentinel is the host-epoch signature, but a GLOBAL
        # code regression (session conf, fleet-wide harness overhead)
        # also inflates every query uniformly and cannot be told apart
        # here.  The documented exoneration is a same-host code-A/B on
        # identical code (BENCH_AB_r14.json procedure); only then pass
        # --allow-uniform-drift.
        if args.allow_uniform_drift:
            verdict = "OK-uniform-drift-allowed"
            print(
                f"GATE OK (--allow-uniform-drift): median {med:.3f} "
                f"exceeds {args.max_median}, zero epoch-normalized "
                f"offenders, sentinel clean ({sentinel}); uniform drift "
                f"accepted on the caller's A/B evidence."
            )
            rc = 0
        else:
            verdict = "UNIFORM-DRIFT"
            print(
                f"GATE UNIFORM-DRIFT (advisory, exit 3): median "
                f"{med:.3f} exceeds {args.max_median} but ZERO "
                f"epoch-normalized offenders survive and the sentinel "
                f"re-run is clean ({sentinel}).  This is host-epoch "
                f"OR a fleet-uniform code regression — the two are "
                f"indistinguishable here.  Run the same-host code-A/B "
                f"(BENCH_AB_r14.json procedure), then rerun with "
                f"--allow-uniform-drift."
            )
            rc = 3
    elif fail:
        verdict = "FAILED"
        print(
            f"GATE FAILED: {len(offenders)} per-query offenders "
            f"({len(norm_offenders)} survive epoch normalization), "
            f"median {med:.3f} (limit {args.max_median})"
        )
        rc = 1
    else:
        verdict = "OK"
        print("GATE OK")
        rc = 0

    if args.transcript:
        transcript = {
            "verdict": verdict,
            "exit_code": rc,
            "baseline": args.baseline_file or args.baseline_rev,
            "protocol_version": {"current": pv_cur, "baseline": pv_base},
            "common_queries": len(common),
            "base_total_s": round(base_total, 3),
            "cur_total_s": round(cur_total, 3),
            "median_ratio": round(med, 4),
            "sentinel_drift": sentinel,
            "max_ratio": args.max_ratio,
            "max_median": args.max_median,
            "min_delta": args.min_delta,
            "offenders": [
                {"name": n, "ratio": round(r, 3), "base_s": b, "cur_s": c}
                for r, n, b, c in sorted(offenders, reverse=True)
            ],
            "norm_offenders": [
                {"name": n, "norm_ratio": round(r, 3), "base_s": b, "cur_s": c}
                for r, n, b, c in sorted(norm_offenders, reverse=True)
            ],
            "per_query_ratio": {
                n: round(r, 4) for r, n, b, c in per_query
            },
        }
        with open(args.transcript, "w") as f:
            json.dump(transcript, f, indent=1)
        print(f"transcript written: {args.transcript}")
    return rc


if __name__ == "__main__":
    sys.exit(main())

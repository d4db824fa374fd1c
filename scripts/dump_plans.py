#!/usr/bin/env python
"""Dump .explain("formatted") for a list of registry queries to files.

    python scripts/dump_plans.py <out_dir> <suffix> <query1,query2,...>

Writes <out_dir>/<query>_<suffix>.txt for each query.  The plan is the
FINAL returned DataFrame's formatted physical plan; for iterative
kernels the eager per-round jobs happen during query build and are
visible as LogicalRDD / cached-scan leaves in the final plan.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main() -> int:
    out_dir, suffix, names_csv = sys.argv[1], sys.argv[2], sys.argv[3]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = [n for n in names_csv.split(",") if n]
    os.makedirs(out_dir, exist_ok=True)

    from concurrent_etl_go_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="dump_plans",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    import concurrent_etl_go_spark.operators as ops
    from concurrent_etl_go_spark.operators.registry import release_caches

    for name in names:
        try:
            df = ops.QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 — capture what we can
            text = f"ERROR building {name}: {exc}\n"
        finally:
            release_caches()
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({len(text)} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Targeted driver-compare for NAMED registry queries.

The surgical companion to ``driver_dryrun.py``: run exactly the queries a
diff touched (comma-separated names) against their DuckDB oracles at any
sf dir, with the same hostile-timezone session and pandas canonicalization
the round driver applies.  Use after changing a shared helper to re-prove
every affected query at sf0.01 AND sf0.1 before rotating them into the
round window (the re-proof rule in ``__spark_entry__.py``).

    python scripts/check_queries.py <sf_dir> name1,name2,...

Exit 1 on any mismatch/error.  Rows-only queries execute + canonicalize
without a compare, like the driver.
"""

from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)
SCRIPTS = os.path.join(REPO_ROOT, "scripts")
if SCRIPTS not in sys.path:
    sys.path.insert(0, SCRIPTS)


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    from driver_dryrun import TABLES, canonicalize

    sf_dir = sys.argv[1]
    names = sys.argv[2].split(",")
    spark = (
        SparkSession.builder.master("local[8]")
        # hostile-TZ probe: the engine must pin UTC itself
        .config("spark.sql.session.timeZone", "America/New_York")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod
    from concurrent_etl_go_spark.operators.registry import release_caches

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 1
    failures = []
    for name in names:
        try:
            got = canonicalize(qs[name](spark, sf_dir).toPandas())
            release_caches()
            if name in oracles:
                exp = canonicalize(con.execute(oracles[name]).df())
                status = "HASH-OK" if got.equals(exp) else "MISMATCH"
                if status == "MISMATCH":
                    failures.append(name)
            else:
                status = f"rows-only({len(got)})"
        except Exception as exc:  # noqa: BLE001 — report, don't abort
            status = f"ERROR {type(exc).__name__}: {str(exc)[:120]}"
            failures.append(name)
        print(f"{name:40s} {status}", flush=True)
    print(f"\n{len(names)} checked, {len(failures)} failing: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

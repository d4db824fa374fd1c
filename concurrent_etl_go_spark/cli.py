"""Command-line front door: run registry queries, ad-hoc SQL, and plan
inspection without writing a script.

    python -m concurrent_etl_go_spark.cli list [--prefix agg_]
    python -m concurrent_etl_go_spark.cli run agg_pricing_summary \
        [--sf-dir /root/testdata/sf0.001] [--limit 20] [--explain]
    python -m concurrent_etl_go_spark.cli sql "SELECT count(*) FROM lineitem"
    python -m concurrent_etl_go_spark.cli explain join_q3_top_shipping
    python -m concurrent_etl_go_spark.cli table /path/to/tbl history
    python -m concurrent_etl_go_spark.cli table /path/to/tbl show [--version N]
    python -m concurrent_etl_go_spark.cli table /path/to/tbl restore 3
    python -m concurrent_etl_go_spark.cli table /path/to/tbl changes 1 [2]
    python -m concurrent_etl_go_spark.cli table /path/to/tbl vacuum
    python -m concurrent_etl_go_spark.cli table /src mirror /dst [--key id]

``sql`` registers every shared analytics table (region .. embeddings) as
a temp view first, so the reference's users get an ANSI-SQL surface over
the same data the named queries read. The generalization of the
reference's fixed main() pipeline (etl/main.go) into a reusable query
surface is the engine's whole point; the CLI is the thinnest shell over
``Engine``.
"""

from __future__ import annotations

import argparse
import sys

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="concurrent_etl_go_spark")
    p.add_argument(
        "--sf-dir", default=DEFAULT_SF_DIR, help="table directory (sf*)"
    )
    p.add_argument("--cpus", default="8", help="local[] parallelism")
    sub = p.add_subparsers(dest="cmd", required=True)

    lp = sub.add_parser("list", help="list registry queries")
    lp.add_argument("--prefix", default="", help="name prefix filter")

    rp = sub.add_parser("run", help="run a registry query")
    rp.add_argument("name")
    rp.add_argument("--limit", type=int, default=20)
    rp.add_argument("--explain", action="store_true")

    sp = sub.add_parser("sql", help="run ad-hoc SQL over the shared tables")
    sp.add_argument("statement")
    sp.add_argument("--limit", type=int, default=20)

    ep = sub.add_parser("explain", help="print a query's physical plan")
    ep.add_argument("name")

    tp = sub.add_parser(
        "table", help="manage a versioned table (sources/versioned.py)"
    )
    tp.add_argument("root", help="table root directory")
    tsub = tp.add_subparsers(dest="table_cmd", required=True)
    tsub.add_parser("history", help="list committed versions")
    th = tsub.add_parser("show", help="show latest (or --version) rows")
    th.add_argument("--version", type=int, default=None)
    th.add_argument("--limit", type=int, default=20)
    tr = tsub.add_parser("restore", help="roll back to a version (new commit)")
    tr.add_argument("version", type=int)
    tc = tsub.add_parser("changes", help="row-level diff between versions")
    tc.add_argument("from_version", type=int)
    tc.add_argument("to_version", type=int, nargs="?", default=None)
    tc.add_argument("--limit", type=int, default=20)
    tv = tsub.add_parser("vacuum", help="delete unreferenced data files")
    tv.add_argument("--keep-versions", type=int, default=1)
    tm = tsub.add_parser(
        "mirror", help="advance a downstream replica of this table"
    )
    tm.add_argument("dest", help="mirror table root")
    tm.add_argument(
        "--key", default=None,
        help="primary key enabling CDC catch-up across rewrites",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)

    if args.cmd == "list":
        # pure-registry command: no Spark session needed
        import concurrent_etl_go_spark.operators as ops
        from concurrent_etl_go_spark.operators.registry import SCALE_CLASS

        for name in sorted(ops.QUERIES):
            if not name.startswith(args.prefix):
                continue
            oracle = "oracle" if name in ops.ORACLES else "rows-only"
            print(f"{name}\t{SCALE_CLASS[name]}\t{oracle}")
        return 0

    if args.cmd == "table" and args.table_cmd in ("history", "restore", "vacuum"):
        # pure-filesystem manifest operations: no Spark session needed
        from concurrent_etl_go_spark.sources import versioned as vt

        if args.table_cmd == "history":
            for s in vt.history(args.root):
                batch = "" if s.batch_id is None else f"\tepoch={s.batch_id}"
                print(f"v{s.version}\t{s.op}\t{len(s.files)} file(s){batch}")
        elif args.table_cmd == "restore":
            snap = vt.restore_table(args.root, args.version)
            print(f"restored to v{args.version} as v{snap.version}")
        else:
            deleted = vt.vacuum(args.root, keep_versions=args.keep_versions)
            print(f"deleted {len(deleted)} file(s)")
        return 0

    from concurrent_etl_go_spark.engine import Engine
    from concurrent_etl_go_spark.session import get_spark

    spark = get_spark(
        app_name="cli",
        master=f"local[{args.cpus}]",
        shuffle_partitions=int(args.cpus),
    )
    engine = Engine(spark, sf_dir=args.sf_dir)

    if args.cmd == "run":
        df = engine.query(args.name)
        if args.explain:
            df.explain("formatted")
        df.show(args.limit, truncate=False)
        engine.release_caches()
        return 0

    if args.cmd == "sql":
        engine.sql(args.statement).show(args.limit, truncate=False)
        return 0

    if args.cmd == "explain":
        from concurrent_etl_go_spark.engine import explain_query

        print(explain_query(spark, args.sf_dir, args.name))
        return 0

    if args.cmd == "table":
        from concurrent_etl_go_spark.sources import versioned as vt

        if args.table_cmd == "show":
            vt.read_table_version(spark, args.root, args.version).show(
                args.limit, truncate=False
            )
        elif args.table_cmd == "changes":
            vt.table_changes(
                spark, args.root, args.from_version, args.to_version
            ).show(args.limit, truncate=False)
        elif args.table_cmd == "mirror":
            from concurrent_etl_go_spark.sources.mirror import mirror_table

            v, mode = mirror_table(spark, args.root, args.dest, key=args.key)
            print(f"mirror at src v{v} via {mode}")
        return 0

    return 2  # pragma: no cover — argparse enforces the choices


if __name__ == "__main__":
    sys.exit(main())

"""Command-line entry point: run any catalog query by name.

    python -m foglamp_filter_python35_spark list
    python -m foglamp_filter_python35_spark run pricing_summary
    python -m foglamp_filter_python35_spark run span_dedup --explain
    python -m foglamp_filter_python35_spark oracle pricing_summary

``run`` executes the named query against ``--sf-dir`` (default
``$SPARK_GRAFT_SF_DIR`` or ``/root/testdata/sf0.01``) and prints up to
``--limit`` rows; ``--explain`` prints the formatted physical plan
instead.  ``oracle`` prints the query's DuckDB oracle SQL (the portable
ANSI statement of its semantics).  ``list`` prints every query name with
its family module.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="foglamp_filter_python35_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list catalog queries")
    pr = sub.add_parser("run", help="run a query")
    pr.add_argument("name")
    pr.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
    )
    pr.add_argument("--limit", type=int, default=20)
    pr.add_argument("--explain", action="store_true")
    pr.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    po = sub.add_parser("oracle", help="print a query's oracle SQL")
    po.add_argument("name")
    args = p.parse_args(argv)

    from foglamp_filter_python35_spark.catalog import all_queries

    specs = all_queries()
    if args.cmd == "list":
        for name, spec in specs.items():
            print(f"{name}\t{spec.fn.__module__.rsplit('.', 1)[-1]}")
        return 0
    if args.name not in specs:
        print(f"unknown query {args.name!r}; `list` shows all", file=sys.stderr)
        return 2
    if args.cmd == "oracle":
        sql = specs[args.name].oracle
        print(sql if sql else "-- no SQL oracle (rows-only check)")
        return 0

    from foglamp_filter_python35_spark.session import get_spark

    spark = get_spark(
        app_name=f"run-{args.name}",
        master=f"local[{args.cpus}]",
        shuffle_partitions=int(args.cpus),
    )
    df = specs[args.name].fn(spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    else:
        df.show(args.limit, truncate=40)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

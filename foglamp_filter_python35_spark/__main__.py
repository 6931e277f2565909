"""Command-line entry point: run any catalog query by name.

    python -m foglamp_filter_python35_spark list
    python -m foglamp_filter_python35_spark run pricing_summary
    python -m foglamp_filter_python35_spark run span_dedup --explain
    python -m foglamp_filter_python35_spark oracle pricing_summary
    python -m foglamp_filter_python35_spark check span_dedup

``run`` executes the named query against ``--sf-dir`` (default
``$SPARK_GRAFT_SF_DIR`` or ``/root/testdata/sf0.01``) and prints up to
``--limit`` rows; ``--explain`` prints the formatted physical plan
instead.  ``oracle`` prints the query's DuckDB oracle SQL (the portable
ANSI statement of its semantics).  ``check`` runs the query on Spark AND
its oracle on DuckDB and compares row count + sorted columns +
stringified values — the driver's correctness gate, on demand.  ``list``
prints every query name with its family module.
"""

from __future__ import annotations

import argparse
import math
import os
import sys


def _spark_cell(v) -> str:
    """Normalize a Spark result cell for comparison.  SQL NULL arrives
    as None from Spark Rows.  A genuine float NaN is kept as a DISTINCT
    sentinel: a query that wrongly yields NaN must not silently match an
    oracle NULL (NaN-vs-NULL divergence stays visible)."""
    if v is None:
        return "<null>"
    if isinstance(v, float) and math.isnan(v):
        return "<nan>"
    return str(v)


def _oracle_cell(v) -> str:
    """Normalize a DuckDB result cell.  DuckDB results arrive through
    pandas, where SQL NULL is irrecoverably float NaN — only here is
    NaN→NULL coercion sound."""
    if v is None:
        return "<null>"
    if isinstance(v, float) and math.isnan(v):
        return "<null>"
    return str(v)


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
    pc = sub.add_parser("check", help="compare a query against its oracle")
    pc.add_argument("name")
    pc.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
    )
    pc.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "8"))
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
        app_name=f"{args.cmd}-{args.name}",
        master=f"local[{args.cpus}]",
        shuffle_partitions=int(args.cpus),
    )
    df = specs[args.name].fn(spark, args.sf_dir)
    if args.cmd == "check":
        sql = specs[args.name].oracle
        if not sql:
            print("no SQL oracle (rows-only query)")
            return 0
        import duckdb  # noqa: PLC0415

        cols = sorted(df.columns)
        got = sorted(
            tuple(_spark_cell(r[c]) for c in cols) for r in df.collect()
        )
        con = duckdb.connect()
        tables = (
            "region nation customer supplier part orders lineitem "
            "events documents embeddings"
        ).split()
        for t in tables:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{os.path.join(args.sf_dir, t)}.parquet')"
            )
        odf = con.execute(sql).df()
        want = sorted(
            tuple(_oracle_cell(odf[c][i]) for c in sorted(odf.columns))
            for i in range(len(odf))
        )
        ok = list(cols) == sorted(odf.columns) and got == want
        print(
            f"{'MATCH' if ok else 'MISMATCH'}: spark {len(got)} rows, "
            f"oracle {len(want)} rows, columns {cols}"
        )
        return 0 if ok else 1
    if args.explain:
        df.explain("formatted")
    else:
        df.show(args.limit, truncate=40)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

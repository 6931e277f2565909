"""Ad-hoc per-query timer for optimization work (r17).

Times a subset of catalog queries through the noop sink (same
methodology as bench.py: warm pass at sf0.001 to absorb codegen, then
min-of-N at the target sf), optionally dumping each query's
``explain("formatted")`` to a file.  Unlike bench.py this never writes
bench_last.json — it exists so before/after comparisons of ONE query
don't need a 7-minute full sweep.

Usage::

    python tools/qtime.py minhash_lsh_dedup dedup_ensemble --n 3
    python tools/qtime.py embedding_lsh_dup --plan plans/r17/embedding_lsh_dup_before.txt
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from foglamp_filter_python35_spark.catalog import all_queries  # noqa: E402
from foglamp_filter_python35_spark.functions import cache  # noqa: E402
from foglamp_filter_python35_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--warm-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--n", type=int, default=3, help="timed runs per query")
    ap.add_argument(
        "--plan",
        default=None,
        help="dump explain('formatted') of the FIRST query to this path",
    )
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    qs = all_queries()
    unknown = [n for n in args.names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    spark = get_spark(app_name="qtime")
    spark.sparkContext.setLogLevel("ERROR")

    if args.plan:
        from foglamp_filter_python35_spark.plans.explain import (  # noqa: PLC0415
            formatted_plan,
        )

        df = qs[args.names[0]].fn(spark, args.sf_dir)
        os.makedirs(os.path.dirname(args.plan) or ".", exist_ok=True)
        with open(args.plan, "w") as f:
            f.write(formatted_plan(df))
        print(f"plan -> {args.plan}")
        cache.release()

    out: dict[str, dict] = {}
    for name in args.names:
        spec = qs[name]
        spark.sparkContext.setJobDescription(f"qtime:{name}")
        if not args.no_warm:
            try:
                spec.fn(spark, args.warm_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as exc:  # noqa: BLE001
                print(f"{name}: warm FAILED {exc}", file=sys.stderr)
            cache.release(blocking=False)
        samples = []
        for _ in range(args.n):
            t0 = time.perf_counter()
            spec.fn(spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(round(time.perf_counter() - t0, 3))
            cache.release(blocking=False)
        spark.sparkContext.setJobDescription(None)
        out[name] = {"min": min(samples), "samples": samples}
        print(f"{name}: min {min(samples):.3f}s  {samples}")
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

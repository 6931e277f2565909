"""Benchmark harness: runs the headline catalog queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Each query is fully materialized through the ``noop`` sink (all work, no
collect/serialize cost on the driver).
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from foglamp_filter_python35_spark.catalog import all_queries  # noqa: E402
from foglamp_filter_python35_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        # informational metadata only — never abort the bench over a
        # dataset dir that isn't named sf<number>
        sf = float(base.removeprefix("sf")) if base.startswith("sf") else base
    except ValueError:
        sf = base
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    specs = [s for s in all_queries().values() if s.headline]
    # warm-up: run every headline query once at the smallest sf so JVM
    # classloading + whole-stage-codegen compilation are excluded from the
    # measured steady-state throughput
    warm_dir = "/root/testdata/sf0.001"
    for spec in specs:
        try:
            spec.fn(spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass

    times: dict[str, float | None] = {}
    for spec in specs:
        # min of 2 runs: a single sample is hostage to co-tenant load
        # spikes; the minimum is the best estimate of the plan's cost
        best = float("inf")
        try:
            for _ in range(2):
                t0 = time.perf_counter()
                spec.fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            times[spec.name] = round(best, 3)
        except Exception as exc:  # noqa: BLE001
            # one failing query must not discard the other timings or the
            # JSON line the harness consumes
            print(f"bench: {spec.name} FAILED: {exc}", file=sys.stderr)
            times[spec.name] = None

    total = round(sum(t for t in times.values() if t is not None), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

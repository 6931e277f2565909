"""Compare bench_last.json per-query timings against a git revision.

The box's documented noise envelope is ±40% with 4x single-sample
swings (SCALE.md), so eyeballing two JSON blobs misleads; this prints
the regressions/improvements with the run-count regime next to each so
a "2x slower" single unwarmed sample is not mistaken for a plan
regression.  The single-threaded reference sim (if present on both
sides) is printed first as the box-speed CONTROL — when it moved, the
whole column moved with it.

Usage::

    python tools/bench_diff.py                 # vs HEAD's bench_last.json
    python tools/bench_diff.py --rev 0ba1885   # vs a specific commit
    python tools/bench_diff.py --top 20
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rev", default="HEAD")
    ap.add_argument("--top", type=int, default=12)
    args = ap.parse_args()

    new = json.load(open(os.path.join(_REPO, "bench_last.json")))
    try:
        old = json.loads(
            subprocess.run(
                ["git", "-C", _REPO, "show", f"{args.rev}:bench_last.json"],
                capture_output=True,
                text=True,
                check=True,
            ).stdout
        )
    except subprocess.CalledProcessError as exc:
        print(f"cannot read bench_last.json at {args.rev}: {exc}", file=sys.stderr)
        return 2

    # box-speed control
    for side, d in (("old", old), ("new", new)):
        tp = d.get("python_filter_throughput") or {}
        sims = {
            k: v.get("reference_sim_rows_per_sec")
            for k, v in tp.items()
            if isinstance(v, dict)
        }
        print(f"{side} reference-sim control (rows/s): {sims}")
    print()

    na, oa = new.get("all_queries", {}), old.get("all_queries", {})
    nr, orr = new.get("all_queries_runs", {}), old.get("all_queries_runs", {})
    rows = []
    for k in na:
        if k in oa and na[k] and oa[k]:
            rows.append((na[k] - oa[k], oa[k], na[k], k))
    rows.sort(reverse=True)

    def show(title, sl):
        print(title)
        for d, o, n, k in sl:
            print(
                f"  {d:+7.2f}s  {o:7.2f} -> {n:7.2f}  {k}"
                f"  (runs {orr.get(k, '?')}→{nr.get(k, '?')})"
            )

    show(f"top {args.top} regressions:", rows[: args.top])
    print()
    show(f"top {args.top} improvements:", rows[::-1][: args.top])
    print()
    print(
        "totals: old"
        f" {old.get('all_queries_total_wall')}s ->"
        f" new {new.get('all_queries_total_wall')}s;"
        f" skipped new: {len(new.get('skipped_queries', []))};"
        f" partial new: {bool(new.get('partial'))}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

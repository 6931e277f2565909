"""Suggest the next round's driver window.

The round driver's CORRECTNESS gate verifies only the FIRST 50 entries
of ``queries()``.  This tool unions every ``CORRECTNESS_r*.json`` in the
repo, reports which catalog queries have (a) never been sampled, (b)
been sampled but never green, and prints a suggested
``_DRIVER_WINDOW_ORDER`` prefix for ``catalog/__init__.py`` —
never-sampled and never-green first (catalog order), then the
least-recently-verified green queries to re-confirm.

Usage: python tools/rotate_window.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

WINDOW = 50


def main() -> None:
    from foglamp_filter_python35_spark.catalog import all_queries

    names = list(all_queries())
    latest_green: dict[str, int] = {}
    sampled: set[str] = set()
    rounds = sorted(
        glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))
    )
    for path in rounds:
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        for name, row in json.load(open(path)).items():
            sampled.add(name)
            ok = (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") is not False
                and row.get("err") is None
            )
            if ok:
                latest_green[name] = max(latest_green.get(name, -1), rnd)

    never_sampled = [n for n in names if n not in sampled]
    never_green = [
        n for n in names if n in sampled and n not in latest_green
    ]
    # stale-first among the greens: oldest verification round first,
    # catalog order as tie-break
    greens = sorted(
        (n for n in names if n in latest_green),
        key=lambda n: (latest_green[n], names.index(n)),
    )
    suggestion = (never_green + never_sampled + greens)[:WINDOW]

    print(f"catalog queries: {len(names)}")
    print(f"ever sampled:    {len(sampled)}")
    print(f"never sampled:   {len(never_sampled)} -> {never_sampled}")
    print(f"sampled, never green: {len(never_green)} -> {never_green}")
    print("\nsuggested _DRIVER_WINDOW_ORDER (first %d):" % WINDOW)
    for n in suggestion:
        tag = (
            "NEVER-GREEN"
            if n in never_green
            else "NEVER-SAMPLED"
            if n in never_sampled
            else f"green r{latest_green[n]}"
        )
        print(f'    "{n}",  # {tag}')


if __name__ == "__main__":
    main()

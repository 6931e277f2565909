"""Measured file-pruned MERGE probe: is merge cost O(candidate files)?

`snapshot_table.merge_upsert` prunes its copy-on-write rewrite to the
files whose per-file stats can intersect the upsert's key hull.  This
probe produces the SCALE.md measurement for that claim:

- build KEY-CLUSTERED covered bases (per-file stats on ``k``,
  ``repartitionByRange`` so each file holds a tight key range) at
  1x / 10x / 100x rows with rows-per-file held constant, so the FILE
  COUNT grows with rows exactly like a streamed-in, compacted table;
- land an IDENTICAL 100-key tight-hull merge on each and measure wall
  (pruned path: candidates = the one file the hull intersects);
- as the control, run the same merge on an UNCOVERED clone of the 1x
  and 10x bases (no stats -> full-table rewrite), which SHOULD grow.

Expected: pruned merge ~flat across 100x of base rows; full rewrite
grows with rows.

Usage (run alone — co-tenant Spark sessions contaminate timings):
    python tools/merge_scale_probe.py            # /tmp/merge_probe
    python tools/merge_scale_probe.py --mults 1,10
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

ROOT = "/tmp/merge_probe"
BASE_ROWS = 1_000_000
ROWS_PER_FILE = 250_000
DELTA_KEYS = 100  # tight hull: [0, 99] — one clustered file


def _spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )


def _base_df(spark, n_rows: int):
    from pyspark.sql import functions as F

    n_files = max(1, n_rows // ROWS_PER_FILE)
    return (
        spark.range(n_rows)
        .select(
            F.col("id").alias("k"),
            ((F.col("id") * 37 % 1000) / 10.0).alias("v"),
        )
        .repartitionByRange(n_files, "k")
        .sortWithinPartitions("k")
    )


def _delta_df(spark):
    from pyspark.sql import functions as F

    return spark.range(DELTA_KEYS).select(
        F.col("id").alias("k"), F.lit(-1.0).alias("v")
    )


def _extreme_pair_df(spark, n_rows: int):
    """The r15 degenerate shape: an upsert touching the table's MIN and
    MAX keys.  Hull-only pruning marks EVERY file a candidate (full
    rewrite); per-file key-set pruning must keep candidates at the two
    files that actually hold those keys."""
    return spark.createDataFrame(
        [(0, -2.0), (n_rows - 1, -2.0)], ["k", "v"]
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mults", default="1,10,100")
    ap.add_argument("--control-mults", default="1,10")
    args = ap.parse_args()
    mults = [int(m) for m in args.mults.split(",")]
    control = {int(m) for m in args.control_mults.split(",") if m}

    from foglamp_filter_python35_spark.sources import (  # noqa: PLC0415
        snapshot_table as st,
    )

    spark = _spark()
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm-up
    shutil.rmtree(ROOT, ignore_errors=True)
    out: dict = {"metric": "merge_upsert_wall", "unit": "sec", "points": {}}
    for mult in mults:
        n = BASE_ROWS * mult
        covered = f"{ROOT}/covered_{mult}x"
        st.commit(_base_df(spark, n), covered, stats_cols=["k"])

        pruned_wall = None
        for _rep in range(2):
            t0 = time.monotonic()
            st.merge_upsert(_delta_df(spark), covered, key="k")
            w = time.monotonic() - t0
            pruned_wall = w if pruned_wall is None else min(pruned_wall, w)
        m = st._read_manifest(covered, st.current_version(covered))
        n_files = len(m["files"])
        assert m["operation"] == "merge", m["operation"]

        full_wall = None
        if mult in control:
            bare = f"{ROOT}/bare_{mult}x"
            st.commit(_base_df(spark, n), bare)  # no stats: full rewrite
            for _rep in range(2):
                t0 = time.monotonic()
                st.merge_upsert(_delta_df(spark), bare, key="k")
                w = time.monotonic() - t0
                full_wall = w if full_wall is None else min(full_wall, w)

        # correctness guard: the probe must not time a wrong answer
        got = dict(
            st.read_snapshot(spark, covered)
            .filter("k < 101")
            .select("k", "v")
            .collect()
        )
        assert all(got[k] == -1.0 for k in range(DELTA_KEYS))
        assert got[100] != -1.0

        # two-extreme-keys upsert (r15): hull covers every file, the
        # key set hits exactly two — candidates must stay O(touched)
        pre_files = st._read_manifest(covered, st.current_version(covered))[
            "files"
        ]
        t0 = time.monotonic()
        st.merge_upsert(_extreme_pair_df(spark, n), covered, key="k")
        extreme_wall = time.monotonic() - t0
        m2 = st._read_manifest(covered, st.current_version(covered))
        replaced = len([f for f in pre_files if f not in m2["files"]])
        assert replaced <= 2, (
            f"extreme-pair merge rewrote {replaced} files at {mult}x "
            f"(keyset pruning regressed to the hull)"
        )
        lo_probe = dict(
            st.read_snapshot(spark, covered)
            .filter("k <= 1")
            .select("k", "v")
            .collect()
        )
        assert lo_probe[0] == -2.0 and lo_probe[1] == -1.0

        out["points"][f"{mult}x"] = {
            "base_rows": n,
            "base_files": n_files,
            "pruned_merge_wall": round(pruned_wall, 3),
            "extreme_pair_wall": round(extreme_wall, 3),
            "extreme_pair_files_rewritten": replaced,
            "full_merge_wall": (
                round(full_wall, 3) if full_wall is not None else None
            ),
        }
        print(
            f"{mult}x: rows={n} files={n_files} "
            f"pruned={pruned_wall:.3f}s "
            f"extreme_pair={extreme_wall:.3f}s/{replaced}f "
            f"full={'%.3f' % full_wall + 's' if full_wall else 'n/a'}",
            flush=True,
        )

    p1 = out["points"].get("1x")
    pN = out["points"].get(f"{mults[-1]}x")
    if p1 and pN and p1 is not pN:
        out["pruned_growth"] = round(
            pN["pruned_merge_wall"] / p1["pruned_merge_wall"], 2
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()

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


def _table_bytes(st, path) -> int:
    m = st._read_manifest(path, st.current_version(path))
    return sum(
        os.path.getsize(os.path.join(path, f)) for f in m["files"]
    )


def adaptive_series(spark, st, mults: list[int]) -> None:
    """r16 verdict ask 1: measure the extreme-pair merge under BOTH
    forced paths (hull-only full-ish rewrite vs keyset pruning) on
    fresh covered clones at each scale, so the small-table threshold
    is a number read off a table, not a guess.  Also runs the SHIPPED
    adaptive gate and reports which path it chose."""
    out: dict = {
        "metric": "merge_adaptive_crossover",
        "unit": "sec",
        "threshold_bytes": st._MERGE_SMALL_TABLE_BYTES,
        "points": {},
    }
    for mult in mults:
        n = BASE_ROWS * mult
        walls: dict[str, float] = {}
        for flavor, floor in (("hull", 1 << 60), ("keyset", 0)):
            t = f"{ROOT}/adaptive_{flavor}_{mult}x"
            st.commit(_base_df(spark, n), t, stats_cols=["k"])
            st._MERGE_SMALL_TABLE_BYTES = floor
            w = None
            try:
                for _rep in range(2):
                    t0 = time.monotonic()
                    st.merge_upsert(_extreme_pair_df(spark, n), t, key="k")
                    w1 = time.monotonic() - t0
                    w = w1 if w is None else min(w, w1)
            finally:
                st._MERGE_SMALL_TABLE_BYTES = out["threshold_bytes"]
            walls[flavor] = round(w, 3)
        # the shipped gate's choice on a fresh clone
        t = f"{ROOT}/adaptive_ship_{mult}x"
        st.commit(_base_df(spark, n), t, stats_cols=["k"])
        tb = _table_bytes(st, t)
        chose = (
            "keyset"
            if st._keyset_probe_worthwhile(
                t, st._read_manifest(t, st.current_version(t))
            )
            else "hull"
        )
        t0 = time.monotonic()
        st.merge_upsert(_extreme_pair_df(spark, n), t, key="k")
        ship_wall = round(time.monotonic() - t0, 3)
        best = min(walls, key=walls.get)
        out["points"][f"{mult}x"] = {
            "base_rows": n,
            "table_bytes": tb,
            "hull_only_wall": walls["hull"],
            "keyset_wall": walls["keyset"],
            "shipped_gate_chose": chose,
            "shipped_wall": ship_wall,
            "faster_path": best,
        }
        print(
            f"adaptive {mult}x: rows={n} bytes={tb} "
            f"hull={walls['hull']}s keyset={walls['keyset']}s "
            f"faster={best} shipped_chose={chose} ({ship_wall}s)",
            flush=True,
        )
    print(json.dumps(out))


def wide_manifest_walk(st, n_files: int, n_keys: int) -> None:
    """r16 verdict ask 7: the per-merge driver keyset walk is
    O(files x log keys) best-case but O(files x keys) when stats are
    missing on the FIRST key column (full scan per file).  Measure
    both on a synthetic in-memory manifest — pure driver cost, no
    Spark."""
    keyset = sorted((i * 7, f"s{i % 97}") for i in range(n_keys))
    keys = ["k1", "k2"]
    span = n_keys * 7
    # best case: tight disjoint per-file ranges on the first column
    stats_tight = {
        f"data/x/f{i}.parquet": {
            "k1": [i * span // n_files, (i + 1) * span // n_files - 1],
            "k2": ["s0", "s99"],
        }
        for i in range(n_files)
    }
    # worst case: NO stats on k1 (bisect degenerates to a full scan),
    # k2 range that matches late or never
    stats_worst = {
        f"data/x/f{i}.parquet": {"k2": ["zz", "zzz"]}
        for i in range(n_files)
    }
    # budget-burner: per-column checks PASS on both columns but no
    # single tuple hits (k2 is "lo" on the low half of the key space,
    # the file ranges sit in the high half with k2="lo") — only the
    # tuple scan can answer, so this shape drains the walk budget and
    # then degrades to conservative True
    keyset_cross = sorted(
        (i, "lo" if i < n_keys // 2 else "hi") for i in range(n_keys)
    )
    stats_cross = {
        f"data/x/f{i}.parquet": {
            "k1": [n_keys // 2, n_keys // 2 + 5000],
            "k2": ["lo", "lo"],
        }
        for i in range(n_files)
    }
    out = {
        "metric": "keyset_walk_driver_wall",
        "unit": "sec",
        "n_files": n_files,
        "n_keys": n_keys,
        "points": {},
    }
    for label, ks, stats in (
        ("tight", keyset, stats_tight),
        ("stats_missing", keyset, stats_worst),
        ("cross_budget", keyset_cross, stats_cross),
    ):
        manifest = {"files": list(stats), "stats": stats}
        # the walk as _merge_candidate_files runs it: one _KeysetIndex
        # per walk (exact per-column bisect + work budget)
        t0 = time.monotonic()
        index = st._KeysetIndex(ks, keys)
        hits = sum(
            1
            for f in manifest["files"]
            if st._keyset_hits_file(ks, keys, stats[f], index=index)
        )
        out["points"][label] = {
            "wall": round(time.monotonic() - t0, 3),
            "candidate_files": hits,
            "budget_left": index.budget,
        }
        print(
            f"walk {label}: files={n_files} keys={n_keys} "
            f"wall={out['points'][label]['wall']}s hits={hits} "
            f"budget_left={index.budget}",
            flush=True,
        )
    print(json.dumps(out))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mults", default="1,10,100")
    ap.add_argument("--control-mults", default="1,10")
    ap.add_argument(
        "--adaptive",
        default=None,
        help="comma-separated mults for the adaptive-crossover series "
        "(e.g. 1,10,30); runs ONLY that series",
    )
    ap.add_argument(
        "--wide-manifest",
        action="store_true",
        help="measure the driver-side keyset walk on a synthetic "
        "10k-file manifest (no Spark); runs ONLY that probe",
    )
    args = ap.parse_args()
    mults = [int(m) for m in args.mults.split(",")]
    control = {int(m) for m in args.control_mults.split(",") if m}

    from foglamp_filter_python35_spark.sources import (  # noqa: PLC0415
        snapshot_table as st,
    )

    if args.wide_manifest:
        wide_manifest_walk(st, n_files=10_000, n_keys=100_000)
        return

    spark = _spark()
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm-up
    shutil.rmtree(ROOT, ignore_errors=True)

    if args.adaptive:
        adaptive_series(spark, st, [int(m) for m in args.adaptive.split(",")])
        return

    # continuity series (r14/r15 comparability): FORCE the keyset path —
    # the adaptive gate would legitimately choose hull-only below the
    # small-table threshold, which is measured by --adaptive instead
    st._MERGE_SMALL_TABLE_BYTES = 0
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

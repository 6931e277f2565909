"""Measured IVM scale probe: is refresh cost independent of base size?

The incremental-view-maintenance pitch (sources/materialized_view.py)
is that advancing a grouped aggregate by the change feed costs
O(changed rows + touched groups) — NOT O(base table).  Every other
100 TB claim in SCALE.md carries a probe measurement; this tool
produces the one for S8:

- build snapshot-table bases at 1x / 10x / 100x rows (same group
  cardinality, same file-size shape: rows-per-file held constant so the
  base's FILE COUNT grows with rows, exactly how a streamed-in table
  looks);
- create the count/sum agg view once per base;
- land an IDENTICAL append delta (fixed rows, fixed touched groups) on
  each base and measure ``refresh_agg_view`` wall;
- for contrast, measure the full recompute (``create_agg_view``) wall,
  which SHOULD grow with the base.

Expected: refresh ~flat across 100x of base (the delta window reads
only the appended files; the merge joins delta groups against the
stored view, whose size is the GROUP count, not the row count), while
recompute grows with rows.  Scope note: this measures APPEND deltas —
under the current copy-on-write ``merge_upsert`` a rewrite commit's
change feed touches every rewritten file, so rewrite-heavy workloads
pay O(rewritten files); the production refinement (file-pruned COW) is
documented in merge_upsert's docstring.

Usage (run alone — co-tenant Spark sessions contaminate timings):
    python tools/ivm_scale_probe.py                 # ~3 min, /tmp/ivm_probe
    python tools/ivm_scale_probe.py --mults 1,10
    python tools/ivm_scale_probe.py --optimize      # refresh over an
        # OPTIMIZE'd base: the base is committed with per-file stats and
        # Z-order-rewritten (which inherits+unions that stats coverage,
        # the r13 change) BEFORE the views are created, so every timed
        # refresh's change feed starts at a rewrite-produced manifest
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

ROOT = "/tmp/ivm_probe"
BASE_ROWS = 1_000_000  # 1x
N_GROUPS = 100
DELTA_ROWS = 10_000  # identical at every scale
ROWS_PER_FILE = 250_000  # constant file-size shape => file count ∝ rows


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

    return (
        spark.range(n_rows)
        .select(
            F.col("id").alias("rk"),
            F.concat(F.lit("g"), (F.col("id") % N_GROUPS)).alias("grp"),
            ((F.col("id") * 37 % 1000) / 10.0).alias("v"),
        )
        .repartition(max(1, n_rows // ROWS_PER_FILE))
    )


def _delta_df(spark, base_rows: int):
    from pyspark.sql import functions as F

    return (
        spark.range(base_rows, base_rows + DELTA_ROWS)
        .select(
            F.col("id").alias("rk"),
            F.concat(F.lit("g"), (F.col("id") % N_GROUPS)).alias("grp"),
            ((F.col("id") * 53 % 1000) / 10.0).alias("v"),
        )
        .repartition(1)
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mults", default="1,10,100")
    ap.add_argument("--optimize", action="store_true")
    args = ap.parse_args()
    mults = [int(m) for m in args.mults.split(",")]

    from foglamp_filter_python35_spark.sources import (  # noqa: PLC0415
        materialized_view as mv,
    )
    from foglamp_filter_python35_spark.sources import (  # noqa: PLC0415
        snapshot_table as st,
    )

    spark = _spark()
    # warm the session (JIT, codegen, Arrow init) so the 1x point is not
    # first-job overhead in disguise
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    shutil.rmtree(ROOT, ignore_errors=True)
    out: dict = {"metric": "ivm_refresh_wall", "unit": "sec", "points": {}}
    for mult in mults:
        n = BASE_ROWS * mult
        base = f"{ROOT}/base_{mult}x"
        view = f"{ROOT}/view_{mult}x"
        st.commit(
            _base_df(spark, n),
            base,
            stats_cols=["rk"] if args.optimize else None,
        )
        if args.optimize:
            # rewrite the whole base (inheriting + unioning the stats
            # coverage) so the timed refreshes below advance FROM a
            # rewrite-produced manifest — the post-OPTIMIZE shape
            st.optimize_zorder(
                spark, base, ["v"], target_files=max(1, n // ROWS_PER_FILE)
            )

        # a SECOND create on the same view path is an ivm@N idempotent
        # no-op (its wall is the txn lookup, not the recompute), so each
        # rep builds a fresh scratch path; the kept view is the last one
        recompute_wall = None
        for rep in range(2):
            scratch = view if rep == 1 else f"{view}_warm"
            t0 = time.monotonic()
            mv.create_agg_view(spark, base, scratch, ["grp"], "v")
            w = time.monotonic() - t0
            recompute_wall = w if recompute_wall is None else min(recompute_wall, w)

        refresh_wall = None
        for rep in range(2):
            st.commit(_delta_df(spark, n + rep * DELTA_ROWS), base, mode="append")
            t0 = time.monotonic()
            mv.refresh_agg_view(spark, base, view, ["grp"], "v", row_key="rk")
            w = time.monotonic() - t0
            refresh_wall = w if refresh_wall is None else min(refresh_wall, w)

        # the stats view's insert-only refresh must be O(delta) too (its
        # recompute branch is gated; commit 43e1279) — measure it on the
        # same base so a regression to an O(base) plan shape shows up as
        # growth here
        sview = f"{ROOT}/sview_{mult}x"
        mv.create_stats_view(spark, base, sview, ["grp"], "v")
        stats_refresh_wall = None
        for rep in range(2, 4):
            st.commit(_delta_df(spark, n + rep * DELTA_ROWS), base, mode="append")
            t0 = time.monotonic()
            mv.refresh_stats_view(spark, base, sview, ["grp"], "v", row_key="rk")
            w = time.monotonic() - t0
            stats_refresh_wall = (
                w if stats_refresh_wall is None else min(stats_refresh_wall, w)
            )

        # correctness guard: the probe must not time a wrong answer.
        # (catch the agg view up first — the stats section appended two
        # more deltas after the agg view's timed refreshes)
        mv.refresh_agg_view(spark, base, view, ["grp"], "v", row_key="rk")
        got = {
            r["grp"]: (r["n_rows"], r["sum_q"])
            for r in st.read_snapshot(spark, view).collect()
        }
        from pyspark.sql import functions as F  # noqa: PLC0415

        want = {
            r["grp"]: (r["n_rows"], r["sum_q"])
            for r in st.read_snapshot(spark, base)
            .groupBy("grp")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(
                    F.floor(F.col("v") * 1e6 + F.lit(0.5)).cast("bigint")
                ).alias("sum_q"),
            )
            .collect()
        }
        assert got == want, f"{mult}x: refreshed view != recompute"
        sgot = {
            r["grp"]: (r["n_rows"], r["sum_q"])
            for r in st.read_snapshot(spark, sview)
            .select("grp", "n_rows", "sum_q")
            .collect()
        }
        assert sgot == want, f"{mult}x: stats view != recompute"

        n_files = len(st._read_manifest(base, st.current_version(base))["files"])
        out["points"][f"{mult}x"] = {
            "base_rows": n,
            "base_files": n_files,
            "recompute_wall": round(recompute_wall, 3),
            "refresh_wall": round(refresh_wall, 3),
            "stats_refresh_wall": round(stats_refresh_wall, 3),
        }
        print(f"{mult}x: rows={n} files={n_files} "
              f"recompute={recompute_wall:.3f}s refresh={refresh_wall:.3f}s "
              f"stats_refresh={stats_refresh_wall:.3f}s",
              flush=True)

    p1 = out["points"].get("1x")
    pN = out["points"].get(f"{mults[-1]}x")
    if p1 and pN and p1 is not pN:
        out["refresh_growth"] = round(pN["refresh_wall"] / p1["refresh_wall"], 2)
        out["recompute_growth"] = round(
            pN["recompute_wall"] / p1["recompute_wall"], 2
        )
        out["stats_refresh_growth"] = round(
            pN["stats_refresh_wall"] / p1["stats_refresh_wall"], 2
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()

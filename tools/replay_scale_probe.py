"""Measured long-replay streaming-metadata probe (r14 verdict ask 7).

`_SnapshotStreamReader._added_files` claims its contiguous walk (each
iteration reuses the previous version's manifest as the next version's
parent) halves the driver-side manifest reads of a long offset-window
replay: a naive diff reads manifest v AND manifest v-1 for every
version in the window (2N reads); the walk reads each manifest once
(N, plus one for the first iteration's parent).  This probe measures
that claim at a ~1000-version replay and produces the SCALE.md row.

The table is built metadata-fast: one tiny pyarrow parquet file per
version registered through `commit_files` (no Spark session — the walk
under test is pure driver-side metadata).

Usage (run alone):
    python tools/replay_scale_probe.py              # 1000 versions
    python tools/replay_scale_probe.py --versions 200
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
import uuid

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

ROOT = "/tmp/replay_probe"


def _build_table(n_versions: int) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from foglamp_filter_python35_spark.sources import (  # noqa: PLC0415
        snapshot_table as st,
    )

    shutil.rmtree(ROOT, ignore_errors=True)
    t = os.path.join(ROOT, "tbl")
    for v in range(n_versions):
        d = os.path.join(t, "data", uuid.uuid4().hex)
        os.makedirs(d)
        rel = os.path.join(d, "part-0.parquet")
        pq.write_table(
            pa.table({"k": [v], "v": [float(v)]}), rel
        )
        st.commit_files(t, [rel], mode="append")
    return t


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--versions", type=int, default=1000)
    args = ap.parse_args()
    n = args.versions

    from foglamp_filter_python35_spark.sources import (  # noqa: PLC0415
        snapshot_source as ss,
    )

    t0 = time.monotonic()
    t = _build_table(n)
    build_wall = time.monotonic() - t0

    reads = {"n": 0}
    real_manifest = ss._manifest

    def counting_manifest(path, version):
        reads["n"] += 1
        return real_manifest(path, version)

    ss._manifest = counting_manifest
    try:
        reader = ss._SnapshotStreamReader.__new__(ss._SnapshotStreamReader)
        reader._path = t
        reader._ignore_changes = False

        # full-window replay: offset -1 -> head (N versions)
        reads["n"] = 0
        t0 = time.monotonic()
        files_full = reader._added_files(-1, n - 1)
        full_wall = time.monotonic() - t0
        full_reads = reads["n"]
        assert len(files_full) == n, (len(files_full), n)

        # mid-window replay: the checkpoint-lag shape (half the log)
        reads["n"] = 0
        t0 = time.monotonic()
        files_half = reader._added_files(n // 2 - 1, n - 1)
        half_wall = time.monotonic() - t0
        half_reads = reads["n"]
        assert len(files_half) == n - n // 2
    finally:
        ss._manifest = real_manifest

    naive_full = 2 * n - 1  # manifest v + parent v-1 per version, v0 has none
    out = {
        "metric": "replay_manifest_reads",
        "versions": n,
        "build_wall": round(build_wall, 2),
        "full_replay": {
            "manifest_reads": full_reads,
            "naive_reads": naive_full,
            "saved_pct": round(100 * (1 - full_reads / naive_full), 1),
            "wall": round(full_wall, 3),
        },
        "half_replay": {
            "manifest_reads": half_reads,
            "wall": round(half_wall, 3),
        },
    }
    # the claim itself: each manifest read at most once (+1 for the
    # first iteration's parent probe on the mid-window replay)
    assert full_reads <= n, (full_reads, n)
    assert half_reads <= n - n // 2 + 1, (half_reads, n)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""commit_files (bulk ingest) must be a first-class commit for every
incremental consumer — VERDICT r7 ask #4.

A metadata-only ``commit_files`` publish (the Iceberg ``add_files``
shape) creates a new table version without rewriting data.  Downstream,
nothing may distinguish it from a ``commit``:

- ``read_changes`` emits the bulk-ingested rows as inserts
- the ``snapshot_table`` streaming source delivers them as a micro-batch
- a running ``stream_stats_view`` / ``stream_agg_view`` wakes, refreshes
  incrementally, and equals a full recompute — exactly-once via the
  ``ivm@N`` marker, same as for ``commit`` epochs

At 100 TB this IS the ingest topology: a distributed job lands parquet
under ``data/<job-id>/``, one O(metadata) publish makes it visible, and
the silver aggregates follow from the changelog without a rescan.
"""

from __future__ import annotations

import os
import time
import uuid

import pytest
from pyspark.sql import functions as F

from foglamp_filter_python35_spark.sources import materialized_view as mv
from foglamp_filter_python35_spark.sources import snapshot_table as st
from foglamp_filter_python35_spark.sources.snapshot_source import (
    SnapshotTableDataSource,
)

_SCHEMA = "rk int, grp string, v double"


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(SnapshotTableDataSource)


def _kv(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def _land_files(spark, table_path: str, rows) -> list[str]:
    """Simulate the distributed-ingest half of the add_files contract:
    write parquet under ``data/<job-id>/`` WITHOUT publishing."""
    job_dir = os.path.join(table_path, "data", f"bulk-{uuid.uuid4().hex}")
    _kv(spark, rows).coalesce(1).write.parquet(job_dir)
    return [
        os.path.join(job_dir, f)
        for f in os.listdir(job_dir)
        if f.endswith(".parquet")
    ]


def _stats(spark, path):
    snap = st.read_snapshot(spark, path)
    return {
        r.grp: (r.n_rows, r.n_vals, r.sum_q, r.min_v, r.max_v)
        for r in snap.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("v").alias("n_vals"),
            F.coalesce(
                F.sum(
                    F.floor(F.col("v") * 1e6 + F.lit(0.5)).cast("bigint")
                ),
                F.lit(0).cast("bigint"),
            ).alias("sum_q"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )
        .collect()
    }


def _view(spark, view):
    return {
        r.grp: (r.n_rows, r.n_vals, r.sum_q, r.min_v, r.max_v)
        for r in st.read_snapshot(spark, view).collect()
    }


@pytest.mark.slow
def test_commit_files_rows_flow_to_read_changes(spark, tmp_path):
    base = str(tmp_path / "base")
    st.commit(_kv(spark, [(1, "a", 1.0)]), base)
    v0 = st.current_version(base)

    files = _land_files(spark, base, [(2, "b", 2.0), (3, "c", 3.0)])
    # invisible until published — snapshot isolation holds for bulk files
    assert st.read_snapshot(spark, base).count() == 1
    v1 = st.commit_files(base, files)
    assert v1 == v0 + 1

    feed = st.read_changes(spark, base, from_version=v0, key="rk")
    got = {
        (r.rk, r._change_type) for r in feed.collect()
    }
    assert got == {(2, "insert"), (3, "insert")}


@pytest.mark.slow
def test_commit_files_feeds_streaming_source(spark, tmp_path):
    base = str(tmp_path / "base")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    st.commit(_kv(spark, [(1, "a", 1.0)]), base)

    q = (
        spark.readStream.format("snapshot_table")
        .option("path", base)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .start()
    )
    try:
        files = _land_files(spark, base, [(2, "b", 2.0), (3, "b", 3.0)])
        st.commit_files(base, files)
        deadline = time.time() + 240  # loaded-box headroom; exits as soon as rows land
        want = {1, 2, 3}
        while time.time() < deadline:
            try:
                got = {
                    r.rk
                    for r in spark.read.schema(_SCHEMA)
                    .parquet(out)
                    .collect()
                }
            except Exception:
                got = set()
            if got == want:
                break
            time.sleep(0.25)
        assert got == want
    finally:
        q.stop()


@pytest.mark.slow
def test_commit_files_epochs_wake_stream_stats_view(spark, tmp_path):
    """The full interop: bulk-ingest epochs drive a running
    stream_stats_view; after each publish the view converges to a full
    recompute, and a replayed/duplicate publish (same txn) is a no-op."""
    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    st.commit(_kv(spark, [(1, "a", 1.0), (2, "b", 2.0)]), base)
    mv.create_stats_view(spark, base, view, ["grp"], "v")
    q = mv.stream_stats_view(
        spark,
        base,
        view,
        ["grp"],
        "v",
        row_key="rk",
        checkpoint_dir=str(tmp_path / "ck"),
    )

    def wait_maintained():
        target = st.current_version(base)
        deadline = time.time() + 240  # loaded-box headroom; exits as soon as rows land
        while time.time() < deadline:
            if mv.maintained_base_version(view) == target:
                return
            time.sleep(0.25)
        raise AssertionError(
            f"view stuck at {mv.maintained_base_version(view)}, "
            f"base at v{target}"
        )

    try:
        # epoch 1: bulk ingest extends an existing group AND adds a new
        # one (with a NULL measure, the stats-view edge case)
        f1 = _land_files(
            spark, base, [(3, "a", 7.0), (4, "c", None)]
        )
        st.commit_files(base, f1, txn="bulk-1")
        wait_maintained()
        assert _view(spark, view) == _stats(spark, base)

        # duplicate publish of the same job (retry after a lost ack)
        # must be a version no-op — and the view must not double-count
        v_before = st.current_version(base)
        assert st.commit_files(base, f1, txn="bulk-1") == v_before
        assert st.current_version(base) == v_before
        assert _view(spark, view) == _stats(spark, base)

        # epoch 2: a second bulk job, interleaved with a normal commit
        st.commit(_kv(spark, [(5, "b", 20.0)]), base, mode="append")
        f2 = _land_files(spark, base, [(6, "a", -1.0)])
        st.commit_files(base, f2, txn="bulk-2")
        wait_maintained()
        assert _view(spark, view) == _stats(spark, base)
    finally:
        q.stop()

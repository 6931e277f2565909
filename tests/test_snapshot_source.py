"""The snapshot table as a registered Spark data source (Python Data
Source API): batch read with time travel, and a streaming source that
tails the manifest log with version offsets."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from foglamp_filter_python35_spark.sources import snapshot_table as st
from foglamp_filter_python35_spark.sources.snapshot_source import (
    SnapshotTableDataSource,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(SnapshotTableDataSource)


def _df(spark, lo, hi):
    return spark.range(lo, hi).withColumnRenamed("id", "k")


def test_batch_format_matches_read_snapshot(spark, tmp_path):
    t = str(tmp_path / "tbl")
    st.commit(_df(spark, 0, 50), t)
    st.commit(_df(spark, 50, 80).withColumn("tag", F.lit("b")), t)

    got = spark.read.format("snapshot_table").option("path", t).load()
    assert sorted(r["k"] for r in got.collect()) == list(range(80))
    # evolved column null-filled on pre-evolution files
    tags = {r["k"]: r["tag"] for r in got.collect()}
    assert tags[0] is None and tags[79] == "b"

    # time travel via option
    v0 = (
        spark.read.format("snapshot_table")
        .option("path", t)
        .option("version", 0)
        .load()
    )
    assert v0.columns == ["k"]
    assert v0.count() == 50


@pytest.mark.slow
def test_streaming_source_tails_commits_exactly_once(spark, tmp_path):
    t = str(tmp_path / "tbl")
    st.commit(_df(spark, 0, 10), t)

    got: list[int] = []

    def start(ck):
        return (
            spark.readStream.format("snapshot_table")
            .option("path", t)
            .load()
            .writeStream.foreachBatch(
                lambda df, _e: got.extend(r["k"] for r in df.collect())
            )
            .option("checkpointLocation", ck)
            .start()
        )

    ck = str(tmp_path / "ck")
    q = start(ck)
    q.processAllAvailable()
    q.stop()
    assert sorted(got) == list(range(10))

    # two more commits land; a restarted stream picks up ONLY the delta
    st.commit(_df(spark, 10, 15), t)
    st.commit(_df(spark, 15, 20), t)
    got.clear()
    q = start(ck)
    q.processAllAvailable()
    q.stop()
    assert sorted(got) == list(range(10, 20))  # no re-delivery of v0


@pytest.mark.slow
def test_streaming_source_rejects_rewrites_without_optin(spark, tmp_path):
    t = str(tmp_path / "tbl")
    st.commit(_df(spark, 0, 5), t)
    st.commit(_df(spark, 100, 102), t, mode="overwrite")

    q = (
        spark.readStream.format("snapshot_table")
        .option("path", t)
        .load()
        .writeStream.format("memory")
        .queryName("snap_reject")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="ignoreChanges|STREAM_FAILED|overwrite"):
        q.awaitTermination(120)

    # with the opt-in, the rewrite's files flow
    q = (
        spark.readStream.format("snapshot_table")
        .option("path", t)
        .option("ignoreChanges", "true")
        .load()
        .writeStream.format("memory")
        .queryName("snap_accept")
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    ks = sorted(r["k"] for r in spark.sql("SELECT * FROM snap_accept").collect())
    assert ks == [0, 1, 2, 3, 4, 100, 101]


def test_ignore_changes_redelivers_only_rewritten_files(spark, tmp_path):
    """r14: a file-pruned MERGE is a PARTIAL rewrite — with
    ignoreChanges the stream re-delivers only the files the merge
    actually produced, never the whole table; and a rewrite whose
    PARENT manifest was vacuumed degrades to full-set re-delivery
    (more re-delivery, same contract) instead of crashing a
    previously-working resume."""
    t = str(tmp_path / "tbl")
    for lo, hi in ((0, 3), (3, 6), (6, 9)):
        st.commit(
            _df(spark, lo, hi).coalesce(1), t, mode="append",
            stats_cols=["k"],
        )
    ck = str(tmp_path / "ck")
    got: list[int] = []

    def drain():
        got.clear()
        q = (
            spark.readStream.format("snapshot_table")
            .option("path", t)
            .option("ignoreChanges", "true")
            .load()
            .writeStream.foreachBatch(
                lambda df, _e: got.extend(r["k"] for r in df.collect())
            )
            .option("checkpointLocation", ck)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        return sorted(got)

    assert drain() == list(range(9))
    # pruned merge: hull [4, 4] touches only the middle file, so the
    # resume re-delivers exactly that file's rows
    st.merge_upsert(spark.createDataFrame([(4,)], ["k"]), t, key="k")
    assert drain() == [3, 4, 5]

    # a rewrite whose parent manifest is then vacuumed: the diff is
    # impossible, so the resume degrades to the rewrite's full set
    st.compact(spark, t, target_files=1)
    st.vacuum(t, keep_versions=1)
    assert drain() == list(range(9))


def test_append_with_vacuumed_parent_fails_actionably(spark, tmp_path):
    """An APPEND whose parent manifest fell below the retention floor
    cannot identify its new files, and over-delivering would break
    append-only exactly-once — the resume must fail with the curated
    retention error naming the parent, not a bare open() error."""
    t = str(tmp_path / "tbl")
    st.commit(_df(spark, 0, 3), t)                     # v0
    st.commit(_df(spark, 3, 6), t, mode="append")      # v1
    ck = str(tmp_path / "ck")

    def start():
        return (
            spark.readStream.format("snapshot_table")
            .option("path", t)
            .load()
            .writeStream.foreachBatch(lambda df, _e: df.collect())
            .option("checkpointLocation", ck)
            .start()
        )

    q = start()
    q.processAllAvailable()
    q.stop()  # checkpoint now at v1

    st.commit(_df(spark, 6, 9), t, mode="append")      # v2
    st.vacuum(t, keep_versions=1)                      # expires v0, v1
    q = start()
    with pytest.raises(Exception, match="expired by vacuum|STREAM_FAILED"):
        q.processAllAvailable()
        q.awaitTermination(60)
    q.stop()


@pytest.mark.slow
def test_table_to_table_pipeline_is_exactly_once_across_restart(
    spark, tmp_path
):
    """The full loop: snapshot table A --streaming source--> transform
    --snapshot sink--> table B, stopped midway and restarted from the
    checkpoint.  Every source row lands in B exactly once, no matter
    where the stop fell."""
    src_t = str(tmp_path / "src_tbl")
    dst_t = str(tmp_path / "dst_tbl")
    ck = str(tmp_path / "ck_loop")
    st.commit(_df(spark, 0, 20), src_t)

    def run_once():
        q = (
            spark.readStream.format("snapshot_table")
            .option("path", src_t)
            .load()
            .withColumn("v", F.col("k") * 2)
            .writeStream.foreachBatch(
                st.snapshot_sink(dst_t, query_name="loop")
            )
            .option("checkpointLocation", ck)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run_once()
    # more commits while the stream is DOWN
    st.commit(_df(spark, 20, 30), src_t)
    st.commit(_df(spark, 30, 35), src_t)
    run_once()
    # replay the last epoch manually (simulates restart between sink
    # success and checkpoint advance): idempotent sink absorbs it
    run_once()

    out = st.read_snapshot(spark, dst_t)
    got = sorted((r["k"], r["v"]) for r in out.collect())
    assert got == [(k, 2 * k) for k in range(35)]


@pytest.mark.slow
def test_stream_behind_retention_floor_fails_actionably(spark, tmp_path):
    """A stream whose checkpoint lags behind vacuum's log retention must
    fail with the retention contract spelled out (keep_versions vs
    checkpoint lag), never a bare open() FileNotFoundError — the same
    treatment materialized_view._maintained_base_at got in r5."""
    t = str(tmp_path / "tbl")
    st.commit(_df(spark, 0, 10), t)  # v0

    ck = str(tmp_path / "ck")
    q = (
        spark.readStream.format("snapshot_table")
        .option("path", t)
        .load()
        .writeStream.foreachBatch(lambda df, _e: df.collect())
        .option("checkpointLocation", ck)
        .start()
    )
    q.processAllAvailable()  # checkpoint now holds offset v0
    q.stop()

    st.commit(_df(spark, 10, 15), t, mode="append")  # v1
    st.commit(_df(spark, 15, 20), t, mode="append")  # v2
    st.vacuum(t, keep_versions=1)  # expires manifests v0 and v1

    q = (
        spark.readStream.format("snapshot_table")
        .option("path", t)
        .load()
        .writeStream.foreachBatch(lambda df, _e: df.collect())
        .option("checkpointLocation", ck)
        .start()
    )
    with pytest.raises(Exception, match="expired by vacuum"):
        q.processAllAvailable()
    q.stop()


def test_vacuumed_data_file_mid_replay_fails_actionably(tmp_path):
    """The narrower race: the manifest scan succeeded but a vacuum
    deleted the data file before the replay read it — the reader names
    the retention contract instead of leaking pyarrow's error."""
    from pyspark.sql.types import StructType

    from foglamp_filter_python35_spark.sources.snapshot_source import (
        _SnapshotStreamReader,
    )

    reader = _SnapshotStreamReader(
        StructType.fromJson({"type": "struct", "fields": []}),
        {"path": str(tmp_path)},
    )
    with pytest.raises(FileNotFoundError, match="was vacuumed"):
        reader._rows(["data/gone/part-00000.parquet"])

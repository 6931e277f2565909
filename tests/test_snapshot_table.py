"""ACID contract tests for the manifest-based snapshot table — the
storage capability a 100 TB deployment expects (Delta/Iceberg are not
installable here; this is the same immutable-files + atomic-metadata
protocol with no dependency)."""

from __future__ import annotations

import os

import pytest

from foglamp_filter_python35_spark.sources import snapshot_table as st


def _df(spark, lo, hi):
    return spark.range(lo, hi).withColumnRenamed("id", "k")


def _keys(df):
    return sorted(r["k"] for r in df.collect())


def test_append_overwrite_history_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    v0 = st.commit(_df(spark, 0, 5), t, mode="append")
    v1 = st.commit(_df(spark, 5, 8), t, mode="append")
    v2 = st.commit(_df(spark, 100, 102), t, mode="overwrite")
    assert (v0, v1, v2) == (0, 1, 2)
    assert _keys(st.read_snapshot(spark, t)) == [100, 101]
    # time travel: every old snapshot is intact
    assert _keys(st.read_snapshot(spark, t, version=0)) == [0, 1, 2, 3, 4]
    assert _keys(st.read_snapshot(spark, t, version=1)) == list(range(8))
    ops = [h["operation"] for h in st.history(t)]
    assert ops == ["append", "append", "overwrite"]


def test_reader_is_snapshot_isolated_from_later_commits(spark, tmp_path):
    t = str(tmp_path / "tbl")
    st.commit(_df(spark, 0, 10), t)
    reader = st.read_snapshot(spark, t)  # resolves version 0 NOW
    st.commit(_df(spark, 10, 20), t, mode="append")
    st.commit(_df(spark, 900, 901), t, mode="overwrite")
    # the pre-commit reader still sees exactly version 0
    assert _keys(reader) == list(range(10))
    assert _keys(st.read_snapshot(spark, t)) == [900]


def test_failed_write_is_invisible(spark, tmp_path):
    """A job that dies after writing data files but before publishing a
    manifest must leave the table unchanged (atomicity)."""
    t = str(tmp_path / "tbl")
    st.commit(_df(spark, 0, 3), t)

    # simulate the death: write orphan data files with no manifest
    orphan = os.path.join(t, "data", "deadc0de")
    _df(spark, 50, 60).write.parquet(orphan)

    assert st.current_version(t) == 0
    assert _keys(st.read_snapshot(spark, t)) == [0, 1, 2]
    # vacuum reclaims the orphans without touching live files
    deleted = st.vacuum(t)
    assert deleted and all("deadc0de" in p for p in deleted)
    assert _keys(st.read_snapshot(spark, t)) == [0, 1, 2]


def test_commit_conflict_retries_on_new_parent(spark, tmp_path, monkeypatch):
    """Optimistic concurrency: a writer whose parent read went stale
    (another commit landed in between) hits FileExistsError on the
    manifest create, recomputes the parent, and lands on the next
    version — with BOTH writers' rows visible."""
    t = str(tmp_path / "tbl")
    st.commit(_df(spark, 0, 3), t)  # v0
    st.commit(_df(spark, 1000, 1001), t, mode="append")  # v1: the racer

    real = st.current_version
    calls = {"n": 0}

    def stale_once(path):
        calls["n"] += 1
        return 0 if calls["n"] == 1 else real(path)

    monkeypatch.setattr(st, "current_version", stale_once)
    # first attempt: stale parent v0 -> target v1 already exists ->
    # retry with the true parent v1 -> lands v2 including the racer's rows
    v = st.commit(_df(spark, 3, 6), t, mode="append")
    assert v == 2
    assert calls["n"] >= 2
    assert _keys(st.read_snapshot(spark, t)) == [0, 1, 2, 3, 4, 5, 1000]


def test_vacuum_expires_old_versions_but_keeps_retained(spark, tmp_path):
    t = str(tmp_path / "tbl")
    st.commit(_df(spark, 0, 4), t)
    st.commit(_df(spark, 200, 202), t, mode="overwrite")
    deleted = st.vacuum(t, keep_versions=1)
    # v0's files (overwritten away) are reclaimed, v1 intact
    assert deleted
    assert _keys(st.read_snapshot(spark, t)) == [200, 201]
    with pytest.raises(FileNotFoundError):
        st.read_snapshot(spark, t, version=0)


def test_read_empty_table_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        st.read_snapshot(spark, str(tmp_path / "nope"))


def test_txn_commit_is_idempotent(spark, tmp_path):
    """The exactly-once primitive: replaying a commit with the same txn
    id is a no-op returning the original version."""
    t = str(tmp_path / "tbl")
    v1 = st.commit(_df(spark, 0, 5), t, txn="epoch:0")
    v2 = st.commit(_df(spark, 0, 5), t, txn="epoch:0")  # replay
    assert v1 == v2 == 0
    assert _keys(st.read_snapshot(spark, t)) == [0, 1, 2, 3, 4]
    # a NEW txn still lands
    st.commit(_df(spark, 5, 7), t, txn="epoch:1")
    assert _keys(st.read_snapshot(spark, t)) == list(range(7))


def test_snapshot_sink_gives_streaming_exactly_once(spark, tmp_path):
    """run_micro_batch_pipeline -> snapshot_sink: a re-delivered epoch
    (sink called twice for the same epoch id, as happens on restart
    between sink success and checkpoint advance) must not duplicate
    rows."""
    t = str(tmp_path / "tbl")
    sink = st.snapshot_sink(t, query_name="q")
    sink(_df(spark, 0, 10), 0)
    sink(_df(spark, 0, 10), 0)  # epoch replay
    sink(_df(spark, 10, 15), 1)
    assert _keys(st.read_snapshot(spark, t)) == list(range(15))
    assert [h["version"] for h in st.history(t)] == [0, 1]


def test_additive_schema_evolution_on_append(spark):
    import tempfile

    from pyspark.sql import functions as F

    from foglamp_filter_python35_spark.sources.snapshot_table import (
        SchemaConflict,
    )

    with tempfile.TemporaryDirectory() as d:
        t = f"{d}/tbl"
        st.commit(_df(spark, 0, 3), t)
        # append with a NEW column: allowed; old rows read as null
        st.commit(
            _df(spark, 3, 5).withColumn("extra", F.lit("x")), t, mode="append"
        )
        snap = st.read_snapshot(spark, t)
        assert set(snap.columns) == {"k", "extra"}
        rows = {r["k"]: r["extra"] for r in snap.collect()}
        assert rows == {0: None, 1: None, 2: None, 3: "x", 4: "x"}
        # time travel to v0 keeps the ORIGINAL schema
        assert st.read_snapshot(spark, t, version=0).columns == ["k"]
        # type change is rejected before any manifest is written
        with pytest.raises(SchemaConflict):
            st.commit(
                _df(spark, 9, 10).withColumn("extra", F.lit(1.5)),
                t,
                mode="append",
            )
        assert st.current_version(t) == 1


def test_model_based_commit_sequences(spark, tmp_path):
    """Model check: a deterministic mix of appends/overwrites/replays
    must make every historical snapshot equal the Python-list model at
    that version — the whole-table analog of the per-feature tests."""
    import random

    rng = random.Random(42)
    t = str(tmp_path / "model_tbl")
    model: list[list[int]] = []  # model[v] = expected keys at version v
    next_key = 0
    for step in range(8):
        lo, hi = next_key, next_key + rng.randint(1, 5)
        next_key = hi
        batch = list(range(lo, hi))
        if rng.random() < 0.3 or not model:
            st.commit(_df(spark, lo, hi), t, mode="overwrite")
            model.append(batch)
        else:
            st.commit(_df(spark, lo, hi), t, mode="append")
            model.append(model[-1] + batch)
        if rng.random() < 0.3:
            # idempotent replay of an arbitrary txn never changes state
            v_before = st.current_version(t)
            st.commit(_df(spark, 0, 1), t, txn="replay-fixed")
            if v_before != st.current_version(t):
                model.append(model[-1] + [0])
    for v, expected in enumerate(model):
        assert _keys(st.read_snapshot(spark, t, version=v)) == sorted(
            expected
        ), f"version {v} diverged from model"


def test_merge_upsert_updates_and_inserts(spark, tmp_path):
    from pyspark.sql import functions as F

    t = str(tmp_path / "tbl")
    base = _df(spark, 0, 5).withColumn("v", F.col("k") * 10)
    st.commit(base, t)
    # update keys 2,3; insert key 7
    delta = spark.createDataFrame(
        [(2, 999), (3, 999), (7, 70)], ["k", "v"]
    )
    st.merge_upsert(delta, t, key="k")
    got = {r["k"]: r["v"] for r in st.read_snapshot(spark, t).collect()}
    assert got == {0: 0, 1: 10, 2: 999, 3: 999, 4: 40, 7: 70}
    # pre-merge snapshot intact (time travel)
    old = {r["k"]: r["v"] for r in st.read_snapshot(spark, t, version=0).collect()}
    assert old == {0: 0, 1: 10, 2: 20, 3: 30, 4: 40}


def test_merge_upsert_survives_concurrent_commit(spark, tmp_path, monkeypatch):
    """A commit landing between the merge's read and its publish forces
    a re-read + re-merge: both the racer's row and the merge land."""
    from pyspark.sql import functions as F

    t = str(tmp_path / "tbl")
    st.commit(_df(spark, 0, 3).withColumn("v", F.col("k")), t)

    real_read = st.read_snapshot
    raced = {"done": False}

    def read_and_race(spark_, path_, version=None):
        out = real_read(spark_, path_, version)
        if not raced["done"]:
            raced["done"] = True
            # racer appends key 50 AFTER the merge has read its snapshot
            st.commit(
                spark_.createDataFrame([(50, 50)], ["k", "v"]),
                path_,
                mode="append",
            )
        return out

    monkeypatch.setattr(st, "read_snapshot", read_and_race)
    st.merge_upsert(
        spark.createDataFrame([(1, 111)], ["k", "v"]), t, key="k"
    )
    got = {r["k"]: r["v"] for r in real_read(spark, t).collect()}
    assert got == {0: 0, 1: 111, 2: 2, 50: 50}


def test_stats_based_file_skipping(spark, tmp_path):
    """commit(stats_cols=...) records footer min/max in the manifest;
    read_snapshot(between=...) must open only files whose range can
    match — and still return exactly the matching rows."""
    t = str(tmp_path / "tbl")
    # three commits with disjoint key ranges; 1 file each
    for lo, hi in ((0, 100), (100, 200), (200, 300)):
        st.commit(
            _df(spark, lo, hi).coalesce(1), t, stats_cols=["k"]
        )
    full = st.read_snapshot(spark, t)
    assert len(full.inputFiles()) == 3

    pruned = st.read_snapshot(spark, t, between=("k", 120, 130))
    assert len(pruned.inputFiles()) == 1  # only the middle file opened
    assert _keys(pruned) == list(range(120, 131))

    # a commit WITHOUT stats is conservatively read, result still exact
    st.commit(_df(spark, 500, 501).coalesce(1), t)
    conservative = st.read_snapshot(spark, t, between=("k", 120, 130))
    assert len(conservative.inputFiles()) == 2  # middle + stats-less
    assert _keys(conservative) == list(range(120, 131))


def test_merge_upsert_reharvests_stats_coverage(spark, tmp_path):
    """A MERGE is a rewrite: it must re-harvest the parent manifest's
    stat columns exactly like compact/optimize_zorder (r14
    cross-protocol storm find — an un-inheriting merge_upsert silently
    destroyed the whole table's file-skipping metadata, because its
    rewritten files replace the covered ones)."""
    t = str(tmp_path / "tbl")
    for lo, hi in ((0, 100), (100, 200), (200, 300)):
        st.commit(_df(spark, lo, hi).coalesce(1), t, stats_cols=["k"])

    st.merge_upsert(spark.createDataFrame([(150,)], ["k"]), t, key="k")
    m = st._read_manifest(t, st.current_version(t))
    assert m["stats"], "merge_upsert dropped the per-file stats"
    assert set(m["stats"]) == set(m["files"])
    for per_file in m["stats"].values():
        assert "k" in per_file
    # reads stay exact and a follow-up OPTIMIZE still has coverage
    # to inherit (the composed chain the storm exercises)
    assert _keys(
        st.read_snapshot(spark, t, between=("k", 120, 130))
    ) == list(range(120, 131))
    st.compact(spark, t, target_files=2)
    assert st._read_manifest(t, st.current_version(t))["stats"]


def test_merge_upsert_file_pruned_rewrite(spark, tmp_path):
    """On a table whose per-file stats cover the key, MERGE must
    rewrite ONLY the files whose recorded range can match the upsert's
    key hull: untouched files carry into the child manifest verbatim,
    rows stay exact, the CDC feed shows just the touched keys, and —
    the strong form — a non-candidate file DELETED before the merge is
    never even planned as a read."""
    from pyspark.sql import functions as F2

    t = str(tmp_path / "tbl")
    for lo, hi in ((0, 100), (100, 200), (200, 300)):
        st.commit(
            _df(spark, lo, hi).withColumn("v", F2.col("k") * 2.0).coalesce(1),
            t,
            stats_cols=["k"],
        )
    pre = st.current_version(t)
    parent_files = st._read_manifest(t, pre)["files"]

    # hull [150, 160] intersects only the middle file
    st.merge_upsert(
        spark.createDataFrame([(150, -1.0), (160, -2.0)], ["k", "v"]),
        t,
        key="k",
    )
    m = st._read_manifest(t, st.current_version(t))
    assert m["operation"] == "merge"
    untouched = [f for f in parent_files if f in m["files"]]
    replaced = [f for f in parent_files if f not in m["files"]]
    assert len(untouched) == 2 and len(replaced) == 1
    assert set(m["stats"]) == set(m["files"])  # coverage re-harvested
    got = {r["k"]: r["v"] for r in st.read_snapshot(spark, t).collect()}
    assert len(got) == 300
    assert got[150] == -1.0 and got[160] == -2.0 and got[151] == 302.0
    # CDC from the pre-merge version: exactly the two updated keys
    # (identically rewritten neighbors key-cancel)
    feed = st.read_changes(spark, t, pre, key="k")
    by_key = {
        (r["k"], r["_change_type"]) for r in feed.collect()
    }
    assert by_key == {
        (150, "update_preimage"), (150, "update_postimage"),
        (160, "update_preimage"), (160, "update_postimage"),
    }

    # a hull outside every file is a PURE INSERT: nothing rewritten,
    # operation stays an append (streams need no ignoreChanges for it)
    before = set(st._read_manifest(t, st.current_version(t))["files"])
    st.merge_upsert(
        spark.createDataFrame([(500, 5.0)], ["k", "v"]), t, key="k"
    )
    m2 = st._read_manifest(t, st.current_version(t))
    assert m2["operation"] == "append"
    assert before <= set(m2["files"])
    assert st.read_snapshot(spark, t).count() == 301

    # additive schema evolution through the pruned path: the rewritten
    # candidates gain the new column, retained files null-fill
    st.merge_upsert(
        spark.createDataFrame([(150, -9.0, "x")], ["k", "v", "w"]),
        t,
        key="k",
    )
    snap = st.read_snapshot(spark, t)
    vals = {r["k"]: (r["v"], r["w"]) for r in snap.collect()}
    assert vals[150] == (-9.0, "x")
    assert vals[0] == (0.0, None)
    assert len(vals) == 301

    # the tripwire: delete a file the next merge must not touch — the
    # merge succeeds iff no plan ever references the non-candidate
    victims = [
        f for f, s in st._read_manifest(t, st.current_version(t))["stats"].items()
        if s.get("k") and s["k"][0] >= 200 and s["k"][1] <= 299
    ]
    assert victims
    os.remove(os.path.join(t, victims[0]))
    st.merge_upsert(
        spark.createDataFrame([(10, 0.5)], ["k", "v"]), t, key="k"
    )
    assert {
        r["k"]: r["v"]
        for r in st.read_snapshot(spark, t, between=("k", 0, 20)).collect()
    }[10] == 0.5


def test_merge_upsert_pruned_path_survives_concurrent_commit(
    spark, tmp_path, monkeypatch
):
    """The pruned merge's partial-rewrite publish pins require_parent:
    a commit landing between the manifest read and the publish forces a
    re-read (fresh candidates against the NEW parent), never a lost
    update or a stale retained-file list."""
    from pyspark.sql import functions as F2

    t = str(tmp_path / "tbl")
    st.commit(
        _df(spark, 0, 100).withColumn("v", F2.col("k") * 1.0).coalesce(1),
        t,
        stats_cols=["k"],
    )

    real_candidates = st._merge_candidate_files
    raced = {"done": False}

    def candidates_and_race(df_, manifest_, keys_, **kw):
        out = real_candidates(df_, manifest_, keys_, **kw)
        if not raced["done"]:
            raced["done"] = True
            st.commit(
                spark.createDataFrame([(500, 500.0)], ["k", "v"]),
                t,
                mode="append",
                stats_cols=["k"],
            )
        return out

    monkeypatch.setattr(st, "_merge_candidate_files", candidates_and_race)
    st.merge_upsert(
        spark.createDataFrame([(7, -7.0)], ["k", "v"]), t, key="k"
    )
    got = {r["k"]: r["v"] for r in st.read_snapshot(spark, t).collect()}
    assert got[7] == -7.0 and got[500] == 500.0 and len(got) == 101


def test_merge_cache_evicts_when_written_files_vanish(
    spark, tmp_path, monkeypatch
):
    """The write-once retry cache must never publish a manifest of
    deleted files: if a (mis-tuned) vacuum reclaims the
    written-but-unpublished merge output between retries, the next
    attempt detects it (the mtime-refresh probe fails), evicts the
    entry, and rebuilds."""
    from pyspark.sql import functions as F2

    t = str(tmp_path / "tbl")
    st.commit(
        _df(spark, 0, 100).withColumn("v", F2.col("k") * 1.0).coalesce(1),
        t,
        stats_cols=["k"],
    )

    real_publish = st._publish
    sabotage = {"armed": True, "victims": None}

    def publish_and_sabotage(path_, new_files, *args, **kwargs):
        if sabotage["armed"]:
            # simulate a vacuum racing the retry loop: the freshly
            # written (still unreferenced) merge output disappears and
            # the publish loses its serializable race
            sabotage["armed"] = False
            sabotage["victims"] = list(new_files)
            for rel in new_files:
                os.remove(os.path.join(path_, rel))
            raise st.CommitConflict("injected: rival landed, files reclaimed")
        return real_publish(path_, new_files, *args, **kwargs)

    monkeypatch.setattr(st, "_publish", publish_and_sabotage)
    st.merge_upsert(
        spark.createDataFrame([(7, -7.0)], ["k", "v"]), t, key="k"
    )
    got = {r["k"]: r["v"] for r in st.read_snapshot(spark, t).collect()}
    assert got[7] == -7.0 and len(got) == 100
    # the head manifest references none of the deleted first-attempt
    # files — the cache was evicted and rebuilt, not republished
    head_files = set(st._read_manifest(t, st.current_version(t))["files"])
    assert not head_files & set(sabotage["victims"])


def test_merge_upsert_pruned_matches_full_rewrite_model(spark, tmp_path):
    """Model check: a scripted mix of updates/inserts/extreme-movers on
    a covered table must leave exactly the state a dict model predicts
    — the pruned path may differ from the full rewrite only in COST."""
    from pyspark.sql import functions as F2

    t = str(tmp_path / "tbl")
    model = {k: float(k) for k in range(60)}
    st.commit(
        _df(spark, 0, 60).withColumn("v", F2.col("k").cast("double"))
        .repartition(4),
        t,
        stats_cols=["k"],
    )
    script = [
        [(5, 50.0)], [(5, -1.0), (59, 0.0)], [(100, 1.0), (101, 2.0)],
        [(0, 9.0), (30, 9.0), (100, 9.0)], [(200, 0.25)], [(59, 59.0)],
    ]
    for batch in script:
        st.merge_upsert(
            spark.createDataFrame(batch, ["k", "v"]), t, key="k"
        )
        model.update({k: v for k, v in batch})
        got = {r["k"]: r["v"] for r in st.read_snapshot(spark, t).collect()}
        assert got == model
    # coverage never degraded across the sequence
    m = st._read_manifest(t, st.current_version(t))
    assert set(m["stats"]) == set(m["files"])


@pytest.mark.slow
def test_zorder_gives_multi_column_file_skipping(spark):
    """Z-order rewrite: after clustering on (x, y), a narrow range probe
    on EITHER column must open strictly fewer files than the unclustered
    layout (where every file spans the full range of both)."""
    import tempfile

    from pyspark.sql import functions as F

    with tempfile.TemporaryDirectory() as d:
        t = f"{d}/tbl"
        n = 4096
        # x uniform; y independent (decorrelated via multiplicative hash)
        df = (
            spark.range(n)
            .withColumn("x", F.col("id").cast("double"))
            .withColumn("y", ((F.col("id") * 2654435761) % n).cast("double"))
            .repartition(8)  # random-ish layout: every file spans x AND y
        )
        st.commit(df, t, stats_cols=["x", "y"])
        probe_x = ("x", 100.0, 300.0)
        probe_y = ("y", 100.0, 300.0)
        before_x = len(st.read_snapshot(spark, t, between=probe_x).inputFiles())
        before_y = len(st.read_snapshot(spark, t, between=probe_y).inputFiles())
        assert before_x == 8 and before_y == 8  # no pruning possible

        st.optimize_zorder(spark, t, ["x", "y"], target_files=8)
        after_x = st.read_snapshot(spark, t, between=probe_x)
        after_y = st.read_snapshot(spark, t, between=probe_y)
        assert len(after_x.inputFiles()) < 8
        assert len(after_y.inputFiles()) < 8
        # pruning never changes results
        assert after_x.count() == 201 and after_y.count() == 201
        # rewrite is a normal commit: time travel to the pre-optimize
        # version still works
        assert st.read_snapshot(spark, t, version=0).count() == n


def test_compact_binpacks_epoch_files(spark, tmp_path):
    """After many per-epoch commits the table holds many small files;
    compact() rewrites them into the target count with identical rows
    and intact time travel."""
    t = str(tmp_path / "tbl")
    sink = st.snapshot_sink(t, query_name="q")
    for epoch in range(6):
        sink(_df(spark, epoch * 5, epoch * 5 + 5).coalesce(1), epoch)
    before = st.read_snapshot(spark, t)
    assert len(before.inputFiles()) >= 6

    v = st.compact(spark, t, target_files=2)
    after = st.read_snapshot(spark, t)
    assert len(after.inputFiles()) <= 2
    assert _keys(after) == list(range(30))
    # pre-compaction snapshot untouched
    assert _keys(st.read_snapshot(spark, t, version=v - 1)) == list(range(30))
    # vacuum now reclaims the small files
    assert st.vacuum(t)
    assert _keys(st.read_snapshot(spark, t)) == list(range(30))


def _kv(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


def test_read_changes_classifies_insert_update_delete(spark, tmp_path):
    t = str(tmp_path / "cdc")
    st.commit(_kv(spark, [(1, "a"), (2, "b"), (3, "c")]), t)  # v0
    st.merge_upsert(_kv(spark, [(2, "B"), (4, "d")]), t, key="k")  # v1
    ch = st.read_changes(spark, t, 0, 1, key="k")
    got = {(r.k, r.v, r._change_type) for r in ch.collect()}
    # untouched k=1,3 were rewritten by the copy-on-write merge but must
    # NOT appear — null-safe value equality cancels rewrite noise
    assert got == {
        (4, "d", "insert"),
        (2, "b", "update_preimage"),
        (2, "B", "update_postimage"),
    }
    snap = st.read_snapshot(spark, t).filter("k <> 1")
    st.commit(snap, t, mode="overwrite")  # v2: delete k=1
    ch2 = st.read_changes(spark, t, 1, 2, key="k")
    assert {(r.k, r.v, r._change_type) for r in ch2.collect()} == {
        (1, "a", "delete")
    }


def test_read_changes_compaction_is_noop(spark, tmp_path):
    t = str(tmp_path / "cdc2")
    st.commit(_kv(spark, [(1, "a")]), t, mode="append")
    st.commit(_kv(spark, [(2, "b")]), t, mode="append")
    v_pre = st.current_version(t)
    st.compact(spark, t, target_files=1)
    assert (
        st.read_changes(spark, t, v_pre, key="k").count() == 0
    ), "a pure rewrite must produce an empty change feed"


def test_read_changes_append_only_fast_path(spark, tmp_path):
    t = str(tmp_path / "cdc3")
    st.commit(_kv(spark, [(1, "a")]), t, mode="append")
    st.commit(_kv(spark, [(2, "b"), (3, "c")]), t, mode="append")
    ch = st.read_changes(spark, t, 0)  # key=None: file-level
    assert {(r.k, r._change_type) for r in ch.collect()} == {
        (2, "insert"),
        (3, "insert"),
    }


@pytest.mark.slow
def test_commit_under_real_thread_contention_loses_nothing(spark, tmp_path):
    """Optimistic concurrency under GENUINE contention (prior coverage
    staged conflicts via monkeypatch): four driver threads race 3
    appends each against one table.  The atomic create-if-absent
    publish must serialize all 12 commits — every row lands exactly
    once, the version chain is gap-free, and each thread's rows survive
    whichever parent won each race."""
    import threading

    from foglamp_filter_python35_spark.sources import snapshot_table as stab

    path = str(tmp_path / "contended")
    stab.commit(
        spark.createDataFrame([(-1, "seed")], "rk int, who string"), path
    )
    errors = []

    def worker(tid: int) -> None:
        try:
            for j in range(3):
                rows = [(100 * tid + 10 * j + k, f"t{tid}") for k in range(5)]
                stab.commit(
                    spark.createDataFrame(rows, "rk int, who string"),
                    path,
                    mode="append",
                )
        except Exception as exc:  # noqa: BLE001
            errors.append((tid, repr(exc)))

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == []
    snap = stab.read_snapshot(spark, path)
    assert snap.count() == 1 + 4 * 3 * 5
    assert snap.select("rk").distinct().count() == 61  # no duplicated rows
    assert stab.current_version(path) == 12  # gap-free version chain
    per_thread = {
        r["who"]: r["n"]
        for r in snap.groupBy("who").count().withColumnRenamed("count", "n").collect()
    }
    assert all(per_thread[f"t{t}"] == 15 for t in range(4))
    # the _last_checkpoint pointer survived the race usable: it may lag
    # the head (plain-read-then-replace racing writers), but it must
    # point at an existing manifest so resolution stays O(1)-correct
    hint = stab._read_last_checkpoint(path)
    assert hint is not None and 0 <= hint <= 12
    assert os.path.exists(
        os.path.join(stab._manifest_dir(path), f"v{hint}.json")
    )


def test_open_snapshot_of_retained_version_survives_vacuum(spark, tmp_path):
    """A DataFrame opened over a RETAINED version keeps reading after a
    concurrent vacuum (its frozen file list is still live); a reader of
    an EXPIRED version fails loudly instead of silently returning
    partial data — the documented retention contract."""
    import pytest as _pytest

    from foglamp_filter_python35_spark.sources import snapshot_table as stab

    t = str(tmp_path / "vac")
    stab.commit(
        spark.createDataFrame([(i,) for i in range(5)], "rk int"), t
    )  # v0
    stab.commit(
        spark.createDataFrame([(i,) for i in range(100, 103)], "rk int"),
        t,
        mode="overwrite",
    )  # v1: v0's files now only visible to the expired version
    reader_v1 = stab.read_snapshot(spark, t)  # frozen file list, retained
    reader_v0 = stab.read_snapshot(spark, t, version=0)  # will expire

    deleted = stab.vacuum(t, keep_versions=1)
    assert deleted  # v0's files were reclaimed

    assert reader_v1.count() == 3  # unaffected mid-flight
    with _pytest.raises(Exception):  # noqa: B017 — loud, not partial
        reader_v0.count()


# ---------------------------------------------------------------------------
# _last_checkpoint pointer (VERDICT r6 #5): O(1) version resolution
# ---------------------------------------------------------------------------


def test_last_checkpoint_gives_o1_version_resolution(
    spark, tmp_path, monkeypatch
):
    """Delta-style `_last_checkpoint`: after 500 commits, resolving the
    current snapshot costs ONE pointer read + ONE manifest read and
    never lists the manifest directory (the O(versions) cost at 10^4+
    commits).  The manifest dir stays the source of truth — the pointer
    is a verified hint."""
    t = str(tmp_path / "deep")
    row = spark.createDataFrame([(1,)], "rk int").coalesce(1)
    st.commit(row, t, mode="overwrite")  # v0: writes the data file
    seed = st._read_manifest(t, 0)["files"]
    for _ in range(499):
        # metadata-only commits of the same immutable file: 500 real
        # versions through the public API without 500 Spark writes
        st.commit_files(t, seed, mode="overwrite")
    assert st.current_version(t) == 499

    manifest_reads: list[int] = []
    real_read = st._read_manifest

    def counting_read(path, version):
        manifest_reads.append(version)
        return real_read(path, version)

    pointer_reads: list[str] = []
    real_cp = st._read_last_checkpoint

    def counting_cp(path):
        pointer_reads.append(path)
        return real_cp(path)

    mdir = st._manifest_dir(t)
    real_listdir = os.listdir

    def guarded_listdir(d):
        assert os.path.normpath(str(d)) != os.path.normpath(mdir), (
            "version resolution listed the manifest directory"
        )
        return real_listdir(d)

    monkeypatch.setattr(st, "_read_manifest", counting_read)
    monkeypatch.setattr(st, "_read_last_checkpoint", counting_cp)
    monkeypatch.setattr(st.os, "listdir", guarded_listdir)

    snap = st.read_snapshot(spark, t)
    assert snap.count() == 1
    assert manifest_reads == [499]
    assert len(pointer_reads) == 1


def test_stale_pointer_probes_forward_never_wrong(spark, tmp_path):
    """The pointer is best-effort: a reader racing a committer can see
    a pointer a few versions behind.  Resolution probes FORWARD from
    the hint, so a stale pointer costs extra existence checks, never a
    wrong (regressed) version."""
    import json as _json

    t = str(tmp_path / "stale")
    for lo in range(4):
        st.commit(_df(spark, lo, lo + 1), t, mode="append")
    with open(st._checkpoint_path(t), "w") as f:
        _json.dump({"version": 1}, f)  # simulate a lagging pointer
    assert st.current_version(t) == 3
    assert _keys(st.read_snapshot(spark, t)) == [0, 1, 2, 3]


def test_corrupt_or_missing_pointer_falls_back_to_listing(
    spark, tmp_path
):
    """A torn/garbage/absent pointer degrades to the full directory
    listing — resolution can never be WRONG because of the pointer."""
    t = str(tmp_path / "corrupt")
    for lo in range(3):
        st.commit(_df(spark, lo, lo + 1), t, mode="append")
    with open(st._checkpoint_path(t), "w") as f:
        f.write("{torn")
    assert st.current_version(t) == 2
    os.remove(st._checkpoint_path(t))
    assert st.current_version(t) == 2
    # pointer below the retention floor after vacuum: hinted manifest
    # is gone -> fallback still resolves the retained head
    import json as _json

    st.vacuum(t, keep_versions=1)
    with open(st._checkpoint_path(t), "w") as f:
        _json.dump({"version": 0}, f)  # v0's manifest was vacuumed
    assert st.current_version(t) == 2


def test_pointer_survives_vacuum_and_history_semantics(spark, tmp_path):
    """vacuum/history behave exactly as before the pointer existed."""
    t = str(tmp_path / "vach")
    st.commit(_df(spark, 0, 5), t)  # v0
    st.commit(_df(spark, 5, 8), t, mode="append")  # v1
    st.commit(_df(spark, 100, 102), t, mode="overwrite")  # v2
    assert [h["version"] for h in st.history(t)] == [0, 1, 2]
    deleted = st.vacuum(t, keep_versions=1)
    assert deleted
    assert st.current_version(t) == 2
    assert _keys(st.read_snapshot(spark, t)) == [100, 101]


# ---------------------------------------------------------------------------
# commit_files: metadata-only bulk ingest (register pre-written parquet)
# ---------------------------------------------------------------------------


def test_commit_files_registers_prewritten_data(spark, tmp_path):
    """The bulk-ingest path: a job writes parquet under data/<job-id>/
    (invisible), one metadata publish makes it appear atomically, with
    footer-derived schema and normal append semantics."""
    t = str(tmp_path / "bulk")
    st.commit(_df(spark, 0, 3), t)  # v0 via the data-writing path
    job_dir = os.path.join(t, "data", "bulkjob")
    _df(spark, 10, 13).coalesce(1).write.parquet(job_dir)
    files = [
        os.path.join(job_dir, f)
        for f in os.listdir(job_dir)
        if f.endswith(".parquet")
    ]
    # invisible until published
    assert _keys(st.read_snapshot(spark, t)) == [0, 1, 2]
    v = st.commit_files(t, files, mode="append")
    assert v == 1
    assert _keys(st.read_snapshot(spark, t)) == [0, 1, 2, 10, 11, 12]
    # schema came from the footer, nullable like any commit
    assert st.history(t)[-1]["operation"] == "append"


def test_commit_files_txn_idempotent_and_root_checked(spark, tmp_path):
    t = str(tmp_path / "bulk2")
    st.commit(_df(spark, 0, 2), t)
    seed = st._read_manifest(t, 0)["files"]
    v1 = st.commit_files(t, seed, mode="overwrite", txn="job-7")
    v2 = st.commit_files(t, seed, mode="overwrite", txn="job-7")
    assert v1 == v2 == 1  # replay is a no-op
    outside = str(tmp_path / "elsewhere.parquet")
    with open(outside, "w") as f:
        f.write("x")
    with pytest.raises(ValueError, match="outside the table root"):
        st.commit_files(t, [outside])
    with pytest.raises(FileNotFoundError):
        st.commit_files(t, [os.path.join(t, "data", "nope.parquet")])


def test_commit_files_schema_evolution_rules_apply(spark, tmp_path):
    """Footer-derived schemas obey the same additive-evolution contract
    as commit(): new columns OK, type changes rejected."""
    t = str(tmp_path / "bulk3")
    st.commit(_df(spark, 0, 2), t)  # k: long
    bad_dir = os.path.join(t, "data", "badjob")
    spark.createDataFrame([("x",)], "k string").coalesce(1).write.parquet(
        bad_dir
    )
    bad = [
        os.path.join(bad_dir, f)
        for f in os.listdir(bad_dir)
        if f.endswith(".parquet")
    ]
    with pytest.raises(st.SchemaConflict):
        st.commit_files(t, bad, mode="append")
    ok_dir = os.path.join(t, "data", "okjob")
    from pyspark.sql import functions as F

    spark.range(5, 7).withColumnRenamed("id", "k").withColumn(
        "extra", F.lit(0).cast("long")
    ).coalesce(1).write.parquet(ok_dir)
    ok = [
        os.path.join(ok_dir, f)
        for f in os.listdir(ok_dir)
        if f.endswith(".parquet")
    ]
    v = st.commit_files(t, ok, mode="append", stats_cols=["k"])
    snap = st.read_snapshot(spark, t)
    assert sorted(r["k"] for r in snap.collect()) == [0, 1, 5, 6]
    # vacuum reclaims bulk-ingested files like any other when expired
    st.commit(_df(spark, 100, 101), t, mode="overwrite")
    deleted = st.vacuum(t, keep_versions=1)
    assert any("okjob" in d for d in deleted)


def test_history_after_vacuum_shows_retained_versions_only(
    spark, tmp_path
):
    """history() over a vacuumed table lists the retained tail instead
    of crashing on the first expired manifest (the Delta DESCRIBE
    HISTORY truncation contract)."""
    t = str(tmp_path / "hist")
    st.commit(_df(spark, 0, 2), t)  # v0
    st.commit(_df(spark, 2, 4), t, mode="append")  # v1
    st.commit(_df(spark, 100, 101), t, mode="overwrite")  # v2
    st.vacuum(t, keep_versions=2)  # drops manifest v0
    assert [h["version"] for h in st.history(t)] == [1, 2]


def test_pointer_valid_json_but_wrong_shape_falls_back(spark, tmp_path):
    """r8 hardening: a pointer that parses as JSON but is not an object
    with a non-negative int version (`5`, `[1]`, `"x"`, bool true) is
    treated as corrupt — fall back to listing, never raise and never
    resolve a wrong version."""
    t = str(tmp_path / "shapes")
    for lo in range(2):
        st.commit(_df(spark, lo, lo + 1), t, mode="append")
    for garbage in ("5", "[1]", '"x"', "null", '{"version": true}',
                    '{"version": -1}', '{"version": "2"}'):
        with open(st._checkpoint_path(t), "w") as f:
            f.write(garbage)
        assert st.current_version(t) == 1, garbage
        assert _keys(st.read_snapshot(spark, t)) == [0, 1]


def test_vacuum_reclaims_leaked_pointer_tmp_files(spark, tmp_path):
    """r8 hardening: a committer that dies between writing the pointer
    temp file and os.replace leaks `_last_checkpoint.<uuid>.tmp`;
    vacuum sweeps them (best-effort) without touching live metadata."""
    t = str(tmp_path / "tmps")
    st.commit(_df(spark, 0, 2), t)
    st.commit(_df(spark, 2, 4), t, mode="append")
    mdir = st._manifest_dir(t)
    leaked = [
        os.path.join(mdir, f"_last_checkpoint.{i}deadbeef.tmp")
        for i in range(3)
    ]
    for p in leaked:
        with open(p, "w") as f:
            f.write('{"version": 0}')
    st.vacuum(t, keep_versions=1)
    for p in leaked:
        assert not os.path.exists(p), p
    # live pointer + retained manifest untouched, table still reads
    assert st.current_version(t) == 1
    assert _keys(st.read_snapshot(spark, t)) == [0, 1, 2, 3]


@pytest.mark.slow
def test_restart_storm_committers_vacuum_and_pinned_reader(spark, tmp_path):
    """r12 verdict stretch: the optimistic-concurrency claim under a
    RESTART STORM — prior coverage raced at most two parties.  Here:
    4 committer threads (each commit replayed with its txn id, plus two
    pairs of threads racing the SAME txn concurrently, the true restart
    shape), 2 vacuum threads looping with the in-flight retention guard,
    and a reader pinned at an early version.  Assert full
    serializability (gap-free chain, every txn exactly once, every row
    exactly once), the pinned snapshot never changes underneath the
    reader, the mid-storm vacuum deletes EXACTLY the backdated orphan,
    and the final quiescent vacuum leaves zero unreferenced files and
    zero expired manifests."""
    import glob
    import threading
    import time as _time

    t = str(tmp_path / "storm")
    # seed history: v0..v2 (the reader pins v1)
    st.commit(_df(spark, 0, 10), t)                       # v0
    st.commit(_df(spark, 10, 20), t, mode="append")       # v1
    st.commit(_df(spark, 20, 30), t, mode="append")       # v2
    pinned_version = 1
    pinned_keys = _keys(st.read_snapshot(spark, t, version=pinned_version))
    assert pinned_keys == list(range(20))

    # a dead job's orphan: unreferenced parquet backdated past retention
    orphan_dir = os.path.join(st._data_dir(t), "deadbeefdeadbeef")
    os.makedirs(orphan_dir)
    orphan = os.path.join(orphan_dir, "part-00000-dead.parquet")
    with open(orphan, "wb") as fh:
        fh.write(b"not really parquet")
    old = _time.time() - 3600
    os.utime(orphan, (old, old))
    os.utime(orphan_dir, (old, old))

    stop = threading.Event()
    errors: list = []
    storm_deleted: list = []
    reader_rounds = {"n": 0}

    def committer(tid: int) -> None:
        try:
            for j in range(3):
                base = 1000 + 100 * tid + 10 * j
                df = _df(spark, base, base + 5)
                txn = f"storm-t{tid}-{j}"
                v1 = st.commit(df, t, mode="append", txn=txn)
                # restart replay: same txn must be a no-op same-version
                v2 = st.commit(df, t, mode="append", txn=txn)
                assert v2 == v1, f"txn {txn} double-committed: {v1}/{v2}"
        except Exception as exc:  # noqa: BLE001
            errors.append(("committer", tid, repr(exc)))

    def same_txn_racer(pair: int, side: int, barrier) -> None:
        # two threads race ONE txn: a restarted driver whose first
        # attempt is still running — exactly one version may land
        try:
            base = 5000 + 10 * pair
            df = _df(spark, base, base + 5)
            barrier.wait(timeout=120)
            st.commit(df, t, mode="append", txn=f"storm-shared-{pair}")
        except Exception as exc:  # noqa: BLE001
            errors.append(("racer", (pair, side), repr(exc)))

    def vacuumer(vid: int) -> None:
        try:
            while not stop.is_set():
                storm_deleted.extend(
                    st.vacuum(t, keep_versions=1000, min_age_seconds=300)
                )
                _time.sleep(0.05)
        except Exception as exc:  # noqa: BLE001
            errors.append(("vacuum", vid, repr(exc)))

    def pinned_reader() -> None:
        try:
            while not stop.is_set():
                got = _keys(st.read_snapshot(spark, t, version=pinned_version))
                assert got == pinned_keys, "pinned snapshot changed"
                reader_rounds["n"] += 1
        except Exception as exc:  # noqa: BLE001
            errors.append(("reader", 0, repr(exc)))

    barriers = [threading.Barrier(2), threading.Barrier(2)]
    workers = (
        [threading.Thread(target=committer, args=(i,)) for i in range(4)]
        + [
            threading.Thread(target=same_txn_racer, args=(p, s, barriers[p]))
            for p in range(2)
            for s in range(2)
        ]
    )
    # the vacuumers and the reader loop until stop: keep them OUT of the
    # joined worker list (joining them before stop.set() deadlocks)
    loopers = [threading.Thread(target=vacuumer, args=(v,)) for v in range(2)]
    loopers.append(threading.Thread(target=pinned_reader))
    for th in loopers:
        th.start()
    for th in workers:
        th.start()
    for th in workers:
        th.join(timeout=300)
    stop.set()
    for th in loopers:
        th.join(timeout=60)
    assert not any(th.is_alive() for th in workers + loopers)

    assert errors == []
    assert reader_rounds["n"] > 0

    # serializability: gap-free chain, every commit exactly once
    head = st.current_version(t)
    assert head == 2 + 4 * 3 + 2  # seed v0-v2 + 12 txn commits + 2 races
    for v in range(head + 1):
        assert os.path.exists(
            os.path.join(st._manifest_dir(t), f"v{v}.json")
        ), f"manifest gap at v{v}"
    # every txn landed exactly ONCE (the restart replays were no-ops)
    txn_versions: dict = {}
    for v in range(head + 1):
        txn = st._read_manifest(t, v).get("txn")
        if txn is not None:
            assert txn not in txn_versions, f"txn {txn} committed twice"
            txn_versions[txn] = v
    assert len(txn_versions) == 12 + 2
    # every row exactly once
    snap = st.read_snapshot(spark, t)
    keys = _keys(snap)
    expected = list(range(30))
    for tid in range(4):
        for j in range(3):
            expected += range(1000 + 100 * tid + 10 * j,
                              1000 + 100 * tid + 10 * j + 5)
    expected += list(range(5000, 5005)) + list(range(5010, 5015))
    assert keys == sorted(expected)

    # the storm vacuums deleted EXACTLY the backdated orphan — never a
    # live or in-flight file (the retention guard is what kept the
    # same-txn losers' fresh orphans safe mid-storm)
    assert storm_deleted == [os.path.normpath(orphan)]

    # quiescent final vacuum: the same-txn losers' data dirs are now
    # deletable orphans; afterwards the table holds zero unreferenced
    # parquet and zero expired manifests, and the head still reads
    st.vacuum(t, keep_versions=1, min_age_seconds=0)
    live = {
        os.path.normpath(os.path.join(t, f))
        for f in st._read_manifest(t, head)["files"]
    }
    on_disk = {
        os.path.normpath(p)
        for p in glob.glob(os.path.join(st._data_dir(t), "**", "*.parquet"),
                           recursive=True)
    }
    assert on_disk == live, (
        f"orphans or missing files after vacuum: "
        f"{on_disk.symmetric_difference(live)}"
    )
    manifests = sorted(
        f for f in os.listdir(st._manifest_dir(t)) if f.endswith(".json")
    )
    assert manifests == [f"v{head}.json"]
    assert _keys(st.read_snapshot(spark, t)) == sorted(expected)


def test_time_travel_below_retention_floor_names_vacuum(spark, tmp_path):
    """read_snapshot(version=N) / read_changes on a vacuumed version
    must say WHY the manifest is gone (retention floor, head version),
    not raise a bare open() error."""
    t = str(tmp_path / "tbl")
    st.commit(_df(spark, 0, 5), t)                    # v0
    st.commit(_df(spark, 5, 10), t, mode="append")    # v1
    st.commit(_df(spark, 10, 15), t, mode="append")   # v2
    st.vacuum(t, keep_versions=1)                     # expires v0, v1

    with pytest.raises(FileNotFoundError, match="expired by vacuum"):
        st.read_snapshot(spark, t, version=0)
    with pytest.raises(FileNotFoundError, match="expired by vacuum"):
        st.read_changes(spark, t, 0, 2)
    # a version that never existed names the head, not the floor
    with pytest.raises(FileNotFoundError, match="head is v2"):
        st.read_snapshot(spark, t, version=99)


def test_manifest_gap_below_head_not_blamed_on_vacuum(spark, tmp_path):
    """A manifest HOLE (older manifests still exist below it) cannot be
    vacuum's doing — vacuum retains a contiguous suffix.  The error must
    not assert a cause the surviving files contradict (r13 advice)."""
    t = str(tmp_path / "tbl")
    st.commit(_df(spark, 0, 5), t)                    # v0
    st.commit(_df(spark, 5, 10), t, mode="append")    # v1
    st.commit(_df(spark, 10, 15), t, mode="append")   # v2
    os.remove(os.path.join(st._manifest_dir(t), "v1.json"))

    with pytest.raises(
        FileNotFoundError, match="removed outside the table protocol"
    ):
        st.read_snapshot(spark, t, version=1)
    # the contiguous-truncation shape still (hedged) names vacuum —
    # v0 is the oldest manifest, so nothing below it contradicts that
    os.remove(os.path.join(st._manifest_dir(t), "v0.json"))
    with pytest.raises(FileNotFoundError, match="most likely expired"):
        st.read_snapshot(spark, t, version=0)


def test_pruning_survives_optimize_with_inherited_stats(spark, tmp_path):
    """Tripwire for the OPTIMIZE stats-inheritance change (r13): after a
    Z-order rewrite, range probes must STILL prune files — proven the
    strong way, by deleting an output file outside the probed range and
    asserting the pruned read never references it."""
    t = str(tmp_path / "tbl")
    for lo, hi in ((0, 100), (100, 200), (200, 300), (300, 400)):
        st.commit(_df(spark, lo, hi).coalesce(1), t, mode="append",
                  stats_cols=["k"])
    st.optimize_zorder(spark, t, ["k"], target_files=4)

    head = st._read_manifest(t, st.current_version(t))
    pruned = st.read_snapshot(spark, t, between=("k", 10, 20))
    assert len(pruned.inputFiles()) == 1, "zorder output did not prune"

    # delete an output file whose k-range cannot intersect [10, 20]
    victim = None
    for f, per_file in head["stats"].items():
        lo, hi = per_file["k"]
        if lo > 20 or hi < 10:
            victim = f
            break
    assert victim is not None
    os.remove(os.path.join(t, victim))
    got = _keys(st.read_snapshot(spark, t, between=("k", 10, 20)))
    assert got == list(range(10, 21))


@pytest.mark.slow
def test_compaction_storm_racing_committers_and_vacuum(spark, tmp_path):
    """OPTIMIZE under concurrency — the one rewrite surface the restart
    storm didn't race: a looping compactor (alternating bin-pack compact
    and Z-order rewrites, riding through CommitConflict losses exactly
    as a production OPTIMIZE loop would) races two appending committers
    and a retention-guarded vacuum.  Post-storm: every appended row
    exactly once, gap-free manifest chain, txns exactly once, and the
    key-cancelled CDC feed from the seed version classifies the whole
    storm as pure inserts — rewrite commits contribute ZERO change rows
    (the read_changes rewrite-noise contract, now proven against
    rewrites that interleaved arbitrarily with appends)."""
    import threading
    import time as _time

    from pyspark.sql import functions as F2

    t = str(tmp_path / "ctbl")
    st.commit(
        spark.range(0, 20)
        .withColumnRenamed("id", "k")
        .withColumn("x", (F2.col("k") * 37 % 101).cast("double"))
        .withColumn("y", (F2.col("k") * 53 % 97).cast("double")),
        t,
    )  # v0 seed
    seed_version = st.current_version(t)

    stop = threading.Event()
    errors: list = []
    compactions = {"landed": 0, "lost": 0}

    def committer(tid: int) -> None:
        try:
            for j in range(5):
                lo = 1000 + 100 * tid + 10 * j
                st.commit(
                    spark.range(lo, lo + 5)
                    .withColumnRenamed("id", "k")
                    .withColumn("x", (F2.col("k") * 37 % 101).cast("double"))
                    .withColumn("y", (F2.col("k") * 53 % 97).cast("double")),
                    t,
                    mode="append",
                    txn=f"cstorm-t{tid}-{j}",
                )
                _time.sleep(0.6)
        except Exception as exc:  # noqa: BLE001
            errors.append(("committer", tid, repr(exc)))

    def compactor() -> None:
        try:
            i = 0
            while not stop.is_set():
                try:
                    if i % 2 == 0:
                        st.compact(spark, t, target_files=2)
                    else:
                        st.optimize_zorder(
                            spark, t, ["x", "y"], target_files=4
                        )
                    compactions["landed"] += 1
                except st.CommitConflict:
                    compactions["lost"] += 1  # loud, expected under race
                i += 1
                _time.sleep(0.02)
        except Exception as exc:  # noqa: BLE001
            errors.append(("compactor", 0, repr(exc)))

    def vacuumer() -> None:
        try:
            while not stop.is_set():
                st.vacuum(t, keep_versions=1000, min_age_seconds=300)
                _time.sleep(0.05)
        except Exception as exc:  # noqa: BLE001
            errors.append(("vacuum", 0, repr(exc)))

    workers = [threading.Thread(target=committer, args=(i,)) for i in range(2)]
    loopers = [
        threading.Thread(target=compactor),
        threading.Thread(target=vacuumer),
    ]
    for th in loopers:
        th.start()
    for th in workers:
        th.start()
    for th in workers:
        th.join(timeout=300)
    # grace window: under saturated append traffic every rewrite cycle
    # loses its require_parent race (the documented starvation tradeoff
    # of optimistic OPTIMIZE); after traffic stops the loop must land
    deadline = _time.time() + 120
    while compactions["landed"] == 0 and _time.time() < deadline:
        _time.sleep(0.2)
    stop.set()
    for th in loopers:
        th.join(timeout=120)
    assert not any(th.is_alive() for th in workers + loopers)
    assert errors == []
    assert compactions["landed"] > 0  # rewrites really interleaved
    assert compactions["lost"] > 0    # and really raced (lost loudly)

    # every appended row exactly once, regardless of rewrite interleaving
    expected = list(range(20))
    for tid in range(2):
        for j in range(5):
            lo = 1000 + 100 * tid + 10 * j
            expected += range(lo, lo + 5)
    assert _keys(st.read_snapshot(spark, t)) == sorted(expected)

    # gap-free chain, every committer txn exactly once
    head = st.current_version(t)
    seen: set = set()
    for v in range(head + 1):
        m = st._read_manifest(t, v)
        txn = m.get("txn")
        if txn is not None:
            assert txn not in seen, f"txn {txn} committed twice"
            seen.add(txn)
    assert len(seen) == 10

    # CDC with key cancellation: the whole storm is pure inserts — the
    # interleaved compact/zorder rewrites contribute zero change rows
    feed = st.read_changes(spark, t, seed_version, head, key="k")
    by_type = {
        r["_change_type"]: r["n"]
        for r in feed.groupBy("_change_type").agg(F2.count("*").alias("n")).collect()
    }
    assert by_type == {"insert": 50}, by_type
    # one quiescent compact lands and bin-packs to the target
    st.compact(spark, t, target_files=2)
    assert len(st._read_manifest(t, st.current_version(t))["files"]) == 2


def test_concurrent_appends_evolving_different_columns_both_survive(
    spark, tmp_path
):
    """Two racing appends each introduce a DIFFERENT new column; the
    publish loop re-merges against whichever parent wins, so the head
    schema must carry BOTH columns whatever the landing order, with
    null-fill on every file that predates each column."""
    import threading

    t = str(tmp_path / "tbl")
    st.commit(_df(spark, 0, 5), t)  # schema: k

    from pyspark.sql import functions as F2

    barrier = threading.Barrier(2)
    errors: list = []

    def add(col: str, lo: int) -> None:
        try:
            df = _df(spark, lo, lo + 3).withColumn(col, F2.lit(1.5))
            barrier.wait(timeout=60)
            st.commit(df, t, mode="append")
        except Exception as exc:  # noqa: BLE001
            errors.append(repr(exc))

    ts = [
        threading.Thread(target=add, args=("a_note", 10)),
        threading.Thread(target=add, args=("b_flag", 20)),
    ]
    for th in ts:
        th.start()
    for th in ts:
        th.join(timeout=120)
    assert errors == []

    snap = st.read_snapshot(spark, t)
    assert {"k", "a_note", "b_flag"} <= set(snap.columns)
    rows = {r["k"]: (r["a_note"], r["b_flag"]) for r in snap.collect()}
    assert rows[0] == (None, None)       # seed rows: both null-filled
    assert rows[10][0] == 1.5 and rows[10][1] is None
    assert rows[20][1] == 1.5 and rows[20][0] is None


def test_concurrent_appends_conflicting_column_type_loser_is_loud(
    spark, tmp_path
):
    """Two racing appends introduce the SAME new column with different
    types.  The pre-write validation saw a parent without the column,
    so only the publish-loop RE-MERGE can catch the conflict: exactly
    one commit lands, the other raises SchemaConflict (never a silent
    last-writer-wins on the type), and the loser's orphaned data files
    are reclaimable by a quiescent vacuum."""
    import threading

    t = str(tmp_path / "tbl")
    st.commit(_df(spark, 0, 5), t)

    from pyspark.sql import functions as F2

    barrier = threading.Barrier(2)
    outcomes: dict = {}

    def add(tag: str, col_val) -> None:
        try:
            df = _df(spark, 10, 13).withColumn("z", F2.lit(col_val))
            barrier.wait(timeout=60)
            st.commit(df, t, mode="append")
            outcomes[tag] = "ok"
        except st.SchemaConflict:
            outcomes[tag] = "conflict"
        except Exception as exc:  # noqa: BLE001
            outcomes[tag] = repr(exc)

    ts = [
        threading.Thread(target=add, args=("dbl", 1.5)),
        threading.Thread(target=add, args=("str", "x")),
    ]
    for th in ts:
        th.start()
    for th in ts:
        th.join(timeout=120)
    assert sorted(outcomes.values()) == ["conflict", "ok"], outcomes

    # the winner's type is the table's type; the head still reads
    snap = st.read_snapshot(spark, t)
    assert "z" in snap.columns
    assert snap.count() == 8
    # the loser's data dir is an unreferenced orphan; vacuum reclaims it
    deleted = st.vacuum(t, keep_versions=1, min_age_seconds=0)
    assert any(p.endswith(".parquet") for p in deleted)
    assert st.read_snapshot(spark, t).count() == 8


@pytest.mark.slow
def test_change_feed_applied_to_old_snapshot_reproduces_new(spark, tmp_path):
    """The CDC contract itself, as a row-level model check: for random
    op sequences (append / upsert / delete / compact / zorder), applying
    ``read_changes(i, j, key)`` to snapshot(i) must reproduce
    snapshot(j) exactly — for every adjacent version pair AND the full
    (first, head) span.  The MV suite verifies this indirectly through
    maintained aggregates; this pins the row-level invariant the
    aggregates are built on, including rewrite-noise cancellation when
    a compaction/Z-order landed inside the span."""
    import random

    from pyspark.sql import functions as F2

    rng = random.Random(20260816)

    def kv(rows):
        return spark.createDataFrame(rows, "k long, v double")

    def snap_dict(version):
        return {
            r["k"]: r["v"]
            for r in st.read_snapshot(spark, t, version=version).collect()
        }

    def apply_feed(old: dict, vi: int, vj: int) -> dict:
        feed = st.read_changes(spark, t, vi, vj, key="k").collect()
        new = dict(old)
        pre = {r["k"] for r in feed if r["_change_type"] == "update_preimage"}
        post = {r["k"] for r in feed if r["_change_type"] == "update_postimage"}
        assert pre == post, "unpaired update pre/postimages"
        for r in feed:
            if r["_change_type"] in ("delete", "update_preimage"):
                assert r["k"] in new, f"retraction of absent key {r['k']}"
                if r["_change_type"] == "delete":
                    del new[r["k"]]
        for r in feed:
            if r["_change_type"] in ("insert", "update_postimage"):
                new[r["k"]] = r["v"]
        return new

    for seq in range(2):
        t = str(tmp_path / f"t{seq}")
        next_k = [100]
        st.commit(kv([(k, float(k)) for k in range(6)]), t)
        versions = [st.current_version(t)]
        for _ in range(6):
            op = rng.choice(
                ["append", "upsert", "delete", "compact", "zorder"]
            )
            if op == "append":
                rows = [(next_k[0] + i, rng.uniform(0, 9)) for i in range(3)]
                next_k[0] += 3
                st.commit(kv(rows), t, mode="append")
            elif op == "upsert":
                existing = sorted(snap_dict(st.current_version(t)))
                picks = rng.sample(existing, min(2, len(existing)))
                st.merge_upsert(
                    kv([(k, rng.uniform(10, 19)) for k in picks]), t, key="k"
                )
            elif op == "delete":
                cur = snap_dict(st.current_version(t))
                if len(cur) > 3:
                    victim = rng.choice(sorted(cur))
                    keep = st.read_snapshot(spark, t).filter(
                        F2.col("k") != victim
                    )
                    st.commit(keep, t, mode="overwrite")
            elif op == "compact":
                st.compact(spark, t, target_files=1)
            else:
                st.optimize_zorder(spark, t, ["k", "v"], target_files=2)
            versions.append(st.current_version(t))

        # adjacent pairs + the full span
        pairs = list(zip(versions, versions[1:])) + [
            (versions[0], versions[-1])
        ]
        for vi, vj in pairs:
            if vi == vj:
                continue
            got = apply_feed(snap_dict(vi), vi, vj)
            assert got == snap_dict(vj), (
                f"seq {seq}: feed {vi}->{vj} does not reproduce snapshot"
            )


def test_read_changes_never_touches_files_shared_by_both_manifests(
    spark, tmp_path
):
    """The incremental-consumer cost claim, pinned structurally: a CDC
    read between two versions may only reference the files that DIFFER
    between their manifests.  Tripwire: delete a file present in BOTH
    manifests — the diff across that span must still succeed (same
    technique as the IVM insert-only tripwire)."""
    import os

    t = str(tmp_path / "tbl")
    st.commit(_df(spark, 0, 10), t)                   # v0
    st.commit(_df(spark, 10, 15), t, mode="append")   # v1
    st.commit(_df(spark, 15, 20), t, mode="append")   # v2

    shared = st._read_manifest(t, 0)["files"][0]
    os.remove(os.path.join(t, shared))

    rows = st.read_changes(spark, t, 1, 2, key="k").collect()
    assert sorted(r["k"] for r in rows) == list(range(15, 20))
    assert {r["_change_type"] for r in rows} == {"insert"}


def test_compact_inherits_parent_stats_coverage(spark, tmp_path):
    """OPTIMIZE must never silently degrade file skipping: a bare
    compact() on a stats-carrying table re-harvests the SAME stat
    columns (r13 probe found the old default dropped them — a pruned
    1-file read silently became a full scan)."""
    t = str(tmp_path / "tbl")
    for lo, hi in ((0, 100), (100, 200), (200, 300)):
        st.commit(_df(spark, lo, hi).coalesce(1), t, stats_cols=["k"])
    assert len(
        st.read_snapshot(spark, t, between=("k", 120, 130)).inputFiles()
    ) == 1

    st.compact(spark, t, target_files=3)  # no stats_cols: inherit
    head = st._read_manifest(t, st.current_version(t))
    assert head["stats"], "compaction dropped the per-file stats"
    # bin-packing round-robins rows, so the re-harvested ranges are
    # WIDE (each file spans the key space) — they cannot prune this
    # probe, but they are correct, present for every file, and a later
    # zorder unions them into real skipping again
    assert set(head["stats"]) == set(head["files"])
    for per_file in head["stats"].values():
        assert "k" in per_file
    pruned = st.read_snapshot(spark, t, between=("k", 120, 130))
    assert _keys(pruned) == list(range(120, 131))  # exact under wide stats

    # explicit [] deliberately drops coverage (the old behavior, opt-in)
    st.compact(spark, t, target_files=3, stats_cols=[])
    assert not st._read_manifest(t, st.current_version(t))["stats"]


def test_zorder_unions_cols_with_parent_stats(spark, tmp_path):
    """A Z-order pass on column x must keep the parent's stats coverage
    of k as well — rewrites only ever widen skipping metadata."""
    from pyspark.sql import functions as F2

    t = str(tmp_path / "tbl")
    df = _df(spark, 0, 300).withColumn("x", (F2.col("k") * 7 % 100).cast("double"))
    st.commit(df.coalesce(3), t, stats_cols=["k"])
    st.optimize_zorder(spark, t, ["x"], target_files=3)
    head = st._read_manifest(t, st.current_version(t))
    covered = set()
    for per_file in head["stats"].values():
        covered.update(per_file)
    assert covered == {"k", "x"}


def test_merge_keyset_prunes_extreme_pair(spark, tmp_path, monkeypatch):
    """r15 verdict ask 2: an upsert touching the table's MIN and MAX
    keys must rewrite only the two files that actually hold those keys
    — per-file key-SET pruning (Delta dynamic-file-pruning shape),
    where the single [min, max] hull used pre-r15 made every file a
    candidate and degenerated to a full-table rewrite.  (The adaptive
    small-table gate would skip the keyset on a table this tiny — the
    threshold is zeroed so this pins the keyset machinery itself.)"""
    from pyspark.sql import functions as F2

    monkeypatch.setattr(st, "_MERGE_SMALL_TABLE_BYTES", 0)

    t = str(tmp_path / "tbl")
    for lo, hi in ((0, 100), (100, 200), (200, 300), (300, 400)):
        st.commit(
            _df(spark, lo, hi).withColumn("v", F2.col("k") * 2.0).coalesce(1),
            t,
            stats_cols=["k"],
        )
    parent_files = st._read_manifest(t, st.current_version(t))["files"]
    assert len(parent_files) == 4

    # hull [0, 399] covers every file; the KEY SET {0, 399} hits two
    st.merge_upsert(
        spark.createDataFrame([(0, -1.0), (399, -2.0)], ["k", "v"]),
        t,
        key="k",
    )
    m = st._read_manifest(t, st.current_version(t))
    replaced = [f for f in parent_files if f not in m["files"]]
    assert len(replaced) == 2, (
        f"extreme-pair upsert rewrote {len(replaced)} files, want 2"
    )
    got = {r["k"]: r["v"] for r in st.read_snapshot(spark, t).collect()}
    assert got[0] == -1.0 and got[399] == -2.0
    assert got[150] == 300.0 and len(got) == 400
    assert set(m["stats"]) == set(m["files"])  # coverage re-harvested

    # a key BETWEEN files (gap hull overlaps nothing): pure insert
    before = set(m["files"])
    st.merge_upsert(
        spark.createDataFrame([(0, 0.5), (1000, 9.0)], ["k", "v"]),
        t,
        key="k",
    )
    m2 = st._read_manifest(t, st.current_version(t))
    # key 0 rewrites its (already-rewritten) file; 1000 is a pure
    # insert landing in the new file — exactly one parent file replaced
    assert len(before - set(m2["files"])) == 1
    got = {r["k"]: r["v"] for r in st.read_snapshot(spark, t).collect()}
    assert got[0] == 0.5 and got[1000] == 9.0 and len(got) == 401


def test_merge_keyset_prunes_multi_column_key(spark, tmp_path, monkeypatch):
    """Key-set pruning with a COMPOSITE key: a file survives only if
    some (k1, k2) tuple fits BOTH of its per-column ranges — the
    per-column hull alone cannot see that (1, 'z') and (9, 'a') never
    hit a file whose ranges are k1 in [1, 1] and k2 in ['a', 'a'].
    Small-table threshold zeroed: this pins the keyset machinery."""
    monkeypatch.setattr(st, "_MERGE_SMALL_TABLE_BYTES", 0)
    t = str(tmp_path / "tbl")
    rows1 = [(1, "a", 1.0), (1, "b", 2.0)]
    rows2 = [(9, "y", 3.0), (9, "z", 4.0)]
    df1 = spark.createDataFrame(rows1, ["k1", "k2", "v"]).coalesce(1)
    df2 = spark.createDataFrame(rows2, ["k1", "k2", "v"]).coalesce(1)
    st.commit(df1, t, stats_cols=["k1", "k2"])
    st.commit(df2, t, mode="append", stats_cols=["k1", "k2"])
    parent_files = st._read_manifest(t, st.current_version(t))["files"]
    assert len(parent_files) == 2

    # cross tuples: (1,'z') and (9,'a') — per-column hulls cover both
    # files (k1 in [1,9], k2 in ['a','z']) but NO tuple hits either
    # file's joint ranges: a pure insert, nothing rewritten
    st.merge_upsert(
        spark.createDataFrame([(1, "z", -1.0), (9, "a", -2.0)],
                              ["k1", "k2", "v"]),
        t,
        key=["k1", "k2"],
    )
    m = st._read_manifest(t, st.current_version(t))
    assert m["operation"] == "append"  # pure insert: no file matched
    assert set(parent_files) <= set(m["files"])
    got = {(r["k1"], r["k2"]): r["v"]
           for r in st.read_snapshot(spark, t).collect()}
    assert got[(1, "z")] == -1.0 and got[(9, "a")] == -2.0
    assert len(got) == 6

    # a REAL tuple hit rewrites exactly its file
    before = set(m["files"])
    st.merge_upsert(
        spark.createDataFrame([(1, "a", 7.0)], ["k1", "k2", "v"]),
        t,
        key=["k1", "k2"],
    )
    m2 = st._read_manifest(t, st.current_version(t))
    assert m2["operation"] == "merge"
    got = {(r["k1"], r["k2"]): r["v"]
           for r in st.read_snapshot(spark, t).collect()}
    assert got[(1, "a")] == 7.0 and len(got) == 6
    # only the file holding (1,'a') (plus the tuple-miss insert file
    # containing (1,'z') whose joint ranges DO cover (1,'a')? no —
    # that file's k2 range is ['a','z'] wide but k1 range [1,9] wide
    # too, so it IS a candidate; accept 1 or 2 replaced, never 3)
    assert 1 <= len(before - set(m2["files"])) <= 2


def test_publish_pre_link_guard_is_loud(spark, tmp_path):
    """A manifest may never be linked over vanished data files: if a
    (contract-violating) vacuum reclaims not-yet-referenced files
    between a committer's write and its link, the publish must abort
    with CommitConflict — a manifest of deleted files is silent
    corruption (ADVICE r15 / verdict ask 1)."""
    t = str(tmp_path / "tbl")
    st.commit(_df(spark, 0, 10).coalesce(1), t)
    m = st._read_manifest(t, 0)

    before = st.PUBLISH_GUARD_TRIPS["vanished_before_link"]
    with pytest.raises(st.CommitConflict, match="vanished before publish"):
        st._publish(
            t,
            ["data/deadbeef/part-00000-gone.parquet"],
            m["schema"],
            "append",
            3,
            None,
            None,
            None,
        )
    assert st.PUBLISH_GUARD_TRIPS["vanished_before_link"] == before + 1
    # the table is untouched: same head, no torn manifest, readable
    assert st.current_version(t) == 0
    assert _keys(st.read_snapshot(spark, t)) == list(range(10))
    assert not [
        f
        for f in os.listdir(st._manifest_dir(t))
        if f.endswith(".tmp")
    ]


def test_merge_broadcast_gate_is_bytes_aware(spark):
    """The forced-broadcast gate must consider key WIDTH, not row count
    alone: 2M wide-string keys are hundreds of MB (ADVICE r15).  Pinned
    at the estimator level: a string key's estimated row width lowers
    the effective row cap ~6x vs a bigint key."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    long_schema = StructType([StructField("k", LongType())])
    str_schema = StructType(
        [StructField("a", StringType()), StructField("b", StringType())]
    )
    w_long = st._estimate_key_row_bytes(long_schema, ["k"])
    w_str2 = st._estimate_key_row_bytes(str_schema, ["a", "b"])
    # widths + the same per-row overhead _keyset_bytes charges (the
    # two sizings of identical data must not diverge downward)
    assert w_long == 8 + st._KEY_VALUE_OVERHEAD
    assert w_str2 == 96 + st._KEY_VALUE_OVERHEAD
    # 2M bigint keys fit the byte budget; 2M two-string keys do not
    assert 2_000_000 * w_long <= st._MERGE_BROADCAST_BYTES_LIMIT
    assert 2_000_000 * w_str2 > st._MERGE_BROADCAST_BYTES_LIMIT


def test_vacuum_races_mid_retry_merge_live(spark, tmp_path, monkeypatch):
    """r15 verdict ask 1, the LIVE interleaving the r14 storm only
    simulated: a retention-guarded vacuum loops CONCURRENTLY with
    merges stalled between publish retries under rival appends, racing
    the mtime refresh in the merge's write-once cache.

    Variant A — vacuum VIOLATES the min_age contract (0.1s, below the
    stretched 0.35s publish latency): the pre-link guard must trip at
    least once, every failure is a loud CommitConflict, and NO
    manifest ever references a reclaimed file (checked live by a
    walker thread and post-storm over the full retained chain).  Once
    the vacuum stops, the same merge lands — loud degradation, full
    recovery.

    Variant B — vacuum RESPECTS the contract (min_age 3s, above the
    0.25s publish latency): bounded rival appends stretch the merge's
    retry loop PAST the 3s retention, so without the per-attempt mtime
    refresh the vacuum would reclaim the write-once cache; with it,
    every merge lands once the appends drain and the guard never
    fires."""
    import threading
    import time as _time

    from pyspark.sql import functions as F2

    real_publish = st._publish
    stall = {"s": 0.0}

    def stalling_publish(path_, new_files, *args, **kwargs):
        # stretch ONLY the pruned-merge partial-rewrite publish (the
        # path whose output sits unreferenced across retries); plain
        # appends keep their millisecond write-to-link gap
        if kwargs.get("replace_files") is not None:
            _time.sleep(stall["s"])
        return real_publish(path_, new_files, *args, **kwargs)

    monkeypatch.setattr(st, "_publish", stalling_publish)

    def build(table: str) -> list[str]:
        for lo, hi in ((0, 100), (100, 200), (200, 300)):
            st.commit(
                _df(spark, lo, hi)
                .withColumn("v", F2.col("k") * 1.0)
                .coalesce(1),
                table,
                stats_cols=["k"],
            )
        return st._read_manifest(table, st.current_version(table))["files"]

    def run_storm(
        table: str,
        min_age: float,
        rounds: int,
        strict: bool,
        retries: int,
        append_sleep: float,
        max_appends: int | None = None,
    ):
        stop = threading.Event()
        errors: list = []
        landed = {"merge": 0, "append": 0}
        trips0 = st.PUBLISH_GUARD_TRIPS["vanished_before_link"]

        def trips() -> int:
            return st.PUBLISH_GUARD_TRIPS["vanished_before_link"] - trips0

        def merger() -> None:
            try:
                j = 0
                while not stop.is_set() and j < rounds:
                    df = spark.createDataFrame(
                        [(150, -float(j + 1))], ["k", "v"]
                    )
                    try:
                        st.merge_upsert(
                            df, table, key="k", max_retries=retries
                        )
                        landed["merge"] += 1
                    except st.CommitConflict:
                        pass  # exhausted retries: loud, acceptable
                    except Exception:  # noqa: BLE001
                        # a contract-violating vacuum can reclaim even
                        # the rebuild's in-progress write temp files —
                        # a loud Spark write error, never corruption.
                        # Only tolerated in the violating variant.
                        if strict:
                            raise
                    j += 1
            except Exception as exc:  # noqa: BLE001
                errors.append(("merger", repr(exc)))

        def appender() -> None:
            # variant A bounds the rival appends: a rival landing
            # DURING the stalled publish fails the require_parent
            # check before the pre-link guard is ever reached, so the
            # guard only fires on conflict-free stalls — the appends
            # provide the mid-retry contention, then drain
            try:
                j = 0
                while not stop.is_set() and (
                    max_appends is None or landed["append"] < max_appends
                ):
                    df = spark.createDataFrame(
                        [(10_000 + j, 0.0)], ["k", "v"]
                    )
                    try:
                        st.commit(
                            df, table, mode="append", stats_cols=["k"]
                        )
                        landed["append"] += 1
                    except st.CommitConflict:
                        pass  # guard-aborted append: retry next loop
                    except Exception:  # noqa: BLE001
                        if strict:
                            raise  # same write-temp reclaim tolerance
                    j += 1
                    _time.sleep(append_sleep)
            except Exception as exc:  # noqa: BLE001
                errors.append(("appender", repr(exc)))

        def vacuumer() -> None:
            try:
                while not stop.is_set():
                    st.vacuum(
                        table, keep_versions=1000, min_age_seconds=min_age
                    )
                    _time.sleep(0.02)
            except Exception as exc:  # noqa: BLE001
                errors.append(("vacuum", repr(exc)))

        def walker() -> None:
            # the serializable-history invariant, LIVE on the newest
            # manifests (the window a racing vacuum could corrupt);
            # the FULL retained chain is walked post-storm.  Checking
            # every manifest here re-parses hundreds of growing JSON
            # files per tick — a GIL hog that starves the writers.
            try:
                while not stop.is_set():
                    head = st.current_version(table)
                    for v in range(max(0, head - 3), head + 1):
                        m = st._read_manifest(table, v)
                        for f in m["files"]:
                            assert os.path.exists(os.path.join(table, f)), (
                                f"manifest v{v} references reclaimed {f}"
                            )
                    _time.sleep(0.1)
            except Exception as exc:  # noqa: BLE001
                errors.append(("walker", repr(exc)))

        threads = [
            threading.Thread(target=merger),
            threading.Thread(target=appender),
            threading.Thread(target=vacuumer),
            threading.Thread(target=walker),
        ]
        for th in threads:
            th.start()
        threads[0].join(timeout=240)  # merger bounds the storm
        stop.set()
        for th in threads:
            th.join(timeout=60)
        assert not any(th.is_alive() for th in threads)
        assert errors == []
        return landed, trips()

    # ---- Variant A: contract-violating vacuum --------------------
    ta = str(tmp_path / "violating")
    build(ta)
    # the stall (3.0s) must EXCEED min_age (1.5s) so the write-once
    # output becomes vacuum-eligible mid-publish, while min_age still
    # exceeds one Spark write's duration (so the data write itself
    # usually survives; when it doesn't, that loud failure is
    # tolerated non-strictly)
    stall["s"] = 3.0
    landed_a, trips_a = run_storm(
        ta,
        min_age=1.5,
        rounds=1,
        strict=False,
        retries=3,
        append_sleep=0.2,
        max_appends=3,
    )
    assert trips_a > 0, "the pre-link guard never fired under a 0.1s vacuum"
    # loud degradation, zero corruption: the full retained chain is
    # healthy and every snapshot readable
    head = st.current_version(ta)
    for v in range(head + 1):
        m = st._read_manifest(ta, v)
        for f in m["files"]:
            assert os.path.exists(os.path.join(ta, f))
    # recovery: with the vacuum stopped, the SAME merge lands
    stall["s"] = 0.0
    st.merge_upsert(
        spark.createDataFrame([(150, 555.0)], ["k", "v"]), ta, key="k"
    )
    got = {r["k"]: r["v"] for r in st.read_snapshot(spark, ta).collect()}
    assert got[150] == 555.0
    assert got[0] == 0.0 and len(got) == 300 + landed_a["append"]

    # ---- Variant B: contract-respecting vacuum -------------------
    tb = str(tmp_path / "respecting")
    build(tb)
    stall["s"] = 0.25
    landed_b, trips_b = run_storm(
        tb,
        min_age=3.0,
        rounds=2,
        strict=True,
        retries=50,
        append_sleep=0.25,
        max_appends=8,
    )
    assert trips_b == 0, "guard fired under a contract-respecting vacuum"
    assert landed_b["merge"] == 2, (
        f"only {landed_b['merge']}/2 merges landed under a 3s vacuum"
    )
    got = {r["k"]: r["v"] for r in st.read_snapshot(spark, tb).collect()}
    assert got[150] == -2.0
    assert len(got) == 300 + landed_b["append"]


def test_merge_keyset_from_file_backed_upsert(spark, tmp_path, monkeypatch):
    """A file-backed upsert through the uniform probe path (hull
    aggregate + approx-distinct sketch first, bounded key collect
    second — never a distinct-key shuffle up front) must still
    key-set-prune: the same two-extreme-keys shape touches 2 of 4
    files.  Small-table threshold zeroed to exercise the keyset path."""
    from pyspark.sql import functions as F2

    monkeypatch.setattr(st, "_MERGE_SMALL_TABLE_BYTES", 0)

    t = str(tmp_path / "tbl")
    for lo, hi in ((0, 100), (100, 200), (200, 300), (300, 400)):
        st.commit(
            _df(spark, lo, hi).withColumn("v", F2.col("k") * 2.0).coalesce(1),
            t,
            stats_cols=["k"],
        )
    parent_files = st._read_manifest(t, st.current_version(t))["files"]

    src = str(tmp_path / "upsert_src")
    spark.createDataFrame([(0, -1.0), (399, -2.0)], ["k", "v"]).write.parquet(
        src
    )
    upsert = spark.read.parquet(src)
    assert not upsert.isLocal()
    p = st._merge_key_probe(upsert, ["k"])
    assert p.bounds == {"k": (0, 399)} and p.n_keys == 2
    assert p.keyset == [(0,), (399,)]
    assert p.n_rows == 2 and p.key_bytes > 0

    st.merge_upsert(upsert, t, key="k")
    m = st._read_manifest(t, st.current_version(t))
    replaced = [f for f in parent_files if f not in m["files"]]
    assert len(replaced) == 2
    got = {r["k"]: r["v"] for r in st.read_snapshot(spark, t).collect()}
    assert got[0] == -1.0 and got[399] == -2.0 and len(got) == 400


def test_merge_nan_keys_never_prune_and_still_match(spark, tmp_path):
    """NaN-neutral hulls (r15 review find): Spark joins treat
    NaN = NaN as TRUE, so a NaN upsert key CAN match stored rows — but
    parquet writer conventions for NaN stats vary, so no file may be
    pruned on a key column whose upsert hull contains NaN.  Python's
    min/max are order-dependent under NaN (min([nan, 1.0]) is nan but
    min([1.0, nan]) is 1.0), so the driver-side hull must neutralize,
    never compute through, NaN."""
    t = str(tmp_path / "tbl")
    st.commit(
        spark.createDataFrame(
            [(5.0, 1.0), (9.0, 2.0)], "k double, v double"
        ).coalesce(1),
        t,
        stats_cols=["k"],
    )
    st.commit(
        spark.createDataFrame(
            [(100.0, 3.0), (float("nan"), 4.0)], "k double, v double"
        ).coalesce(1),
        t,
        mode="append",
        stats_cols=["k"],
    )
    m = st._read_manifest(t, st.current_version(t))

    # probe: keyset discarded, hull NaN-neutralized per column
    upsert = spark.createDataFrame(
        [(1.0, -1.0), (float("nan"), -4.0)], "k double, v double"
    )
    p = st._merge_key_probe(upsert, ["k"])
    bounds = p.bounds
    assert p.keyset is None and p.n_keys == 2
    lo, hi = bounds["k"]
    assert lo != lo and hi != hi  # (NaN, NaN): compares False everywhere

    # no file is pruned — including the stats-covered [5, 9] file that
    # an order-dependent (1.0, 1.0) hull would wrongly mark disjoint
    cands = st._merge_candidate_files(upsert, m, ["k"], bounds=bounds)
    assert cands is not None and set(cands) == set(m["files"])

    # end-to-end: the NaN upsert key REPLACES the stored NaN row
    # (Spark's NaN = NaN join semantics), no duplicate, no stale value
    st.merge_upsert(upsert, t, key="k")
    rows = st.read_snapshot(spark, t).collect()
    by_nan = [r["v"] for r in rows if r["k"] != r["k"]]
    assert by_nan == [-4.0], f"NaN key mishandled: {by_nan}"
    got = {r["k"]: r["v"] for r in rows if r["k"] == r["k"]}
    assert got == {5.0: 1.0, 9.0: 2.0, 100.0: 3.0, 1.0: -1.0}


# ---------------------------------------------------------------------------
# r16: adaptive merge path choice + measured broadcast byte gate


def test_merge_small_table_skips_keyset_collect(spark, tmp_path, monkeypatch):
    """r16 verdict ask 1: on a table below the small-table byte
    threshold the merge must NOT pay the keyset collect job (hull-only
    pruning, the pre-r15 tax-free path) — while staying exactly as
    correct, and keeping a pure insert an append-labeled commit (the
    streaming-compatibility contract the short-circuit must not
    break)."""
    from pyspark.sql import functions as F2

    calls: list[bool] = []
    real = st._merge_key_probe

    def spy(df, keys, *, collect_keyset=True, row_cache=None):
        calls.append(collect_keyset)
        return real(
            df, keys, collect_keyset=collect_keyset, row_cache=row_cache
        )

    monkeypatch.setattr(st, "_merge_key_probe", spy)

    t = str(tmp_path / "tbl")
    for lo, hi in ((0, 100), (100, 200), (200, 300), (300, 400)):
        st.commit(
            _df(spark, lo, hi).withColumn("v", F2.col("k") * 2.0).coalesce(1),
            t,
            stats_cols=["k"],
        )
    pm = st._read_manifest(t, st.current_version(t))
    assert st._keyset_probe_worthwhile(t, pm) is False

    # extreme-pair upsert: hull-only rewrites all 4 files (that is the
    # accepted small-table tradeoff — the whole table is cheaper than
    # the collect job) but the ANSWER is identical
    st.merge_upsert(
        spark.createDataFrame([(0, -1.0), (399, -2.0)], ["k", "v"]),
        t,
        key="k",
    )
    assert calls and all(c is False for c in calls), calls
    got = {r["k"]: r["v"] for r in st.read_snapshot(spark, t).collect()}
    assert got[0] == -1.0 and got[399] == -2.0
    assert got[150] == 300.0 and len(got) == 400

    # a key outside every file range: still detected as a pure insert
    # (hull misses every file) and committed as an APPEND
    st.merge_upsert(
        spark.createDataFrame([(1000, 9.0)], ["k", "v"]), t, key="k"
    )
    m2 = st._read_manifest(t, st.current_version(t))
    assert m2["operation"] == "append"
    assert all(c is False for c in calls)


def test_keyset_probe_worthwhile_gate(spark, tmp_path, monkeypatch):
    """The adaptive gate itself: byte threshold, file-count
    short-circuit, and the vanished-file conservative answer."""
    from pyspark.sql import functions as F2

    t = str(tmp_path / "tbl")
    st.commit(
        _df(spark, 0, 100).withColumn("v", F2.col("k") * 2.0).coalesce(1),
        t,
        stats_cols=["k"],
    )
    pm = st._read_manifest(t, st.current_version(t))

    assert st._keyset_probe_worthwhile(t, pm) is False  # tiny table
    monkeypatch.setattr(st, "_MERGE_SMALL_TABLE_BYTES", 0)
    assert st._keyset_probe_worthwhile(t, pm) is True  # 0-byte floor

    # file-count short-circuit fires before any getsize walk
    monkeypatch.setattr(st, "_MERGE_SMALL_TABLE_BYTES", 1 << 60)
    monkeypatch.setattr(st, "_MERGE_SMALL_TABLE_FILES", 0)
    assert st._keyset_probe_worthwhile(t, pm) is True

    # a file the OS can no longer stat makes the size unknowable:
    # answer True (performance-conservative; correctness lives in the
    # publish guard, not here)
    monkeypatch.setattr(st, "_MERGE_SMALL_TABLE_FILES", 512)
    pm_gone = {**pm, "files": [*pm["files"], "data/none/gone.parquet"]}
    assert st._keyset_probe_worthwhile(t, pm_gone) is True


def test_merge_broadcast_gate_measures_key_width(spark):
    """ADVICE r16 (medium): the broadcast byte gate must use MEASURED
    key widths, not a flat 48B guess — ~1.3M distinct 500B-average
    keys pass a flat-estimate gate and force a ~650MB broadcast, the
    exact OOM the gate exists to prevent."""
    from pyspark.sql import functions as F2

    up = spark.range(200).select(
        F2.concat(F2.lit("u" * 500), F2.col("id").cast("string")).alias("k"),
        F2.lit(1.0).alias("v"),
    )

    # hull-only probe (no collected keyset): bytes from the measured
    # avg(octet_length), never the flat guess
    p = st._merge_key_probe(up, ["k"], collect_keyset=False)
    assert p.keyset is None
    per_row = p.key_bytes / max(p.n_keys, 1)
    assert per_row >= 500  # measured, not 48
    assert 1_300_000 * per_row > st._MERGE_BROADCAST_BYTES_LIMIT
    assert 1_300_000 * 48 <= st._MERGE_BROADCAST_BYTES_LIMIT  # the old hole

    # collected keyset: ACTUAL payload bytes of the tuples in hand
    p2 = st._merge_key_probe(up, ["k"])
    assert p2.keyset is not None and p2.n_keys == 200
    assert p2.key_bytes >= sum(
        len(t[0].encode()) for t in p2.keyset
    )

    # the estimator keeps its pessimistic default when unmeasured, and
    # honors a measurement when given one
    from pyspark.sql.types import StringType, StructField, StructType

    s = StructType([StructField("k", StringType())])
    assert st._estimate_key_row_bytes(s, ["k"]) == 48 + st._KEY_VALUE_OVERHEAD
    assert st._estimate_key_row_bytes(s, ["k"], {"k": 500.0}) >= 500


def test_merge_byte_gate_duplicate_skew_uses_max_width(spark):
    """Review r16: the broadcast frame is the DISTINCT key frame, so a
    duplicate-heavy upsert (hot narrow key across most rows, wide rare
    keys) must size the gate from the MAX key width, not the
    row-weighted average the hot key drags down."""
    from pyspark.sql import functions as F2

    # 10k rows of an 8-byte hot key + 50 rows of ~500B keys: row-avg
    # width ~10B, distinct-frame avg ~100B, max ~503B
    hot = spark.range(10_000).select(
        F2.lit("hotkey01").alias("k"), F2.lit(1.0).alias("v")
    )
    wide = spark.range(50).select(
        F2.concat(F2.lit("w" * 500), F2.col("id").cast("string")).alias("k"),
        F2.lit(2.0).alias("v"),
    )
    up = hot.unionAll(wide)

    # hull-only probe (the estimate path): dup-heavy -> max width
    p = st._merge_key_probe(up, ["k"], collect_keyset=False)
    assert p.keyset is None
    per_row = p.key_bytes / max(p.n_keys, 1)
    assert per_row >= 500, f"row-avg leaked into a dup-heavy gate: {per_row}"


def test_keyset_hits_file_matches_brute_reference():
    """r16 verdict ask 3: the bisect walk in ``_keyset_hits_file``
    (first-column duplicate extension past bisect_right, incomparable
    fallback to full scan, missing-stat pass-through) must agree with
    the obvious brute-force reference on random keysets x random
    per-file stats."""
    from hypothesis import given, settings
    from hypothesis import strategies as hst

    def brute(keyset, keys, per_file):
        def within(t):
            for i, k in enumerate(keys):
                rng = per_file.get(k)
                if rng is None:
                    continue
                try:
                    if t[i] < rng[0] or t[i] > rng[1]:
                        return False
                except TypeError:
                    continue
            return True

        return any(within(t) for t in keyset)

    int_vals = hst.integers(min_value=0, max_value=8)
    str_vals = hst.sampled_from(list("abcdef"))

    @hst.composite
    def case(draw):
        n_cols = draw(hst.integers(min_value=1, max_value=3))
        col_types = [draw(hst.booleans()) for _ in range(n_cols)]
        vals = [int_vals if is_int else str_vals for is_int in col_types]
        tuples = draw(
            hst.lists(
                hst.tuples(*vals), min_size=1, max_size=30, unique=True
            )
        )
        keys = [f"k{i}" for i in range(n_cols)]
        per_file = {}
        for i, k in enumerate(keys):
            mode = draw(hst.integers(min_value=0, max_value=3))
            if mode == 0:
                continue  # stats missing for this column
            if mode == 1:
                # INCOMPARABLE stat type for this column (exercises the
                # TypeError fallback): swap int<->str domains
                other = str_vals if col_types[i] else int_vals
                a, b = draw(other), draw(other)
            else:
                a, b = draw(vals[i]), draw(vals[i])
            per_file[k] = (min(a, b), max(a, b))
        return sorted(tuples), keys, per_file

    @settings(max_examples=400, deadline=None)
    @given(case())
    def check(c):
        keyset, keys, per_file = c
        want = brute(keyset, keys, per_file)
        assert st._keyset_hits_file(keyset, keys, per_file) == want
        # the indexed fast path (per-column bisect + work budget) must
        # agree exactly while its budget lasts
        index = st._KeysetIndex(keyset, keys)
        assert (
            st._keyset_hits_file(keyset, keys, per_file, index=index)
            == want
        )

    check()


def test_keyset_walk_budget_degrades_conservatively():
    """r16: once the walk-wide budget is spent, a big slice returns
    True (the file stays a candidate — never a wrong False), while the
    exact per-column bisect check still prunes provably-disjoint files
    for free."""
    # k2 is "lo" on the first half of the key space, "hi" on the rest:
    # a file over k1 in [600, 700] with k2 = "lo" passes every
    # PER-COLUMN check (both columns overlap the keyset's value sets)
    # but no single TUPLE hits it — only the slice scan can see that
    keyset = sorted(
        (i, "lo" if i < 500 else "hi") for i in range(1000)
    )
    keys = ["k1", "k2"]
    cross_file = {"k1": (600, 700), "k2": ("lo", "lo")}
    assert st._keyset_hits_file(keyset, keys, cross_file) is False  # exact

    index = st._KeysetIndex(keyset, keys)
    index.budget = 0  # force exhaustion
    # with no budget the slice scan is skipped — conservative True,
    # never a wrong False
    assert st._keyset_hits_file(
        keyset, keys, cross_file, index=index
    ) is True

    # ...but exact pruning that needs NO tuple scan still fires with
    # budget 0: per-column disjointness (k2 below every value) and the
    # first-column bisect miss
    assert st._keyset_hits_file(
        keyset, keys, {"k2": ("a", "b")}, index=index
    ) is False
    assert st._keyset_hits_file(
        keyset, keys, {"k1": (5000, 6000)}, index=index
    ) is False

    # with budget available the indexed path is exact on the same file
    fresh = st._KeysetIndex(keyset, keys)
    assert st._keyset_hits_file(
        keyset, keys, cross_file, index=fresh
    ) is False
    assert fresh.budget < st._KEYSET_WALK_BUDGET  # the scan was paid for


def test_keyset_walk_budget_charges_actual_iterations():
    """ADVICE r16: the walk budget must pay for iterations actually
    EXECUTED, not the whole narrowed span — the scan usually
    early-exits on a hit, and pre-charging the span drained the budget
    other files still needed, degrading them to conservative
    candidates (extra rewrite I/O) sooner than necessary."""
    keyset = sorted((i, "lo" if i < 500 else "hi") for i in range(1000))
    keys = ["k1", "k2"]

    # early hit: k1 unconstrained (span = all 1000 tuples), first
    # tuple (0, "lo") matches immediately -> exactly 1 iteration paid
    index = st._KeysetIndex(keyset, keys)
    start = index.budget
    hit_file = {"k1": (0, 2000), "k2": ("lo", "lo")}
    assert st._keyset_hits_file(keyset, keys, hit_file, index=index)
    assert start - index.budget == 1, (
        f"early hit charged {start - index.budget}, want 1"
    )

    # full miss: the narrowed span [600, 700] scans end to end
    # (per-column checks pass — both value sets overlap — but no
    # TUPLE matches) -> the whole 101-tuple span is paid
    miss_file = {"k1": (600, 700), "k2": ("lo", "lo")}
    before = index.budget
    assert not st._keyset_hits_file(keyset, keys, miss_file, index=index)
    assert before - index.budget == 101, (
        f"full miss charged {before - index.budget}, want 101"
    )


@pytest.mark.slow
def test_merge_tunables_honor_env(monkeypatch):
    """r16 verdict ask 3: the two measured-default merge knobs
    (_MERGE_SMALL_TABLE_BYTES, _KEYSET_WALK_BUDGET) are deployment
    tunables read from the DRIVER environment at import, and a
    malformed override fails loudly at import instead of being
    silently ignored (a typo'd override that falls back to the default
    is worse than a crash)."""
    import subprocess
    import sys

    code = (
        "import foglamp_filter_python35_spark.sources.snapshot_table as s;"
        "print(s._MERGE_SMALL_TABLE_BYTES, s._KEYSET_WALK_BUDGET)"
    )
    env = {
        **os.environ,
        "FSP_MERGE_SMALL_TABLE_BYTES": "12345",
        "FSP_KEYSET_WALK_BUDGET": "777",
    }
    out = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        capture_output=True,
        text=True,
        check=True,
        cwd="/root/repo",
    )
    assert out.stdout.split() == ["12345", "777"]

    bad = {**os.environ, "FSP_MERGE_SMALL_TABLE_BYTES": "64MiB"}
    r = subprocess.run(
        [sys.executable, "-c", code],
        env=bad,
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert r.returncode != 0
    assert "FSP_MERGE_SMALL_TABLE_BYTES" in r.stderr

    # parse-level contract: absent -> default; negative -> loud
    assert st._env_int("FSP_ABSENT_KNOB_XYZ", 42) == 42
    monkeypatch.setenv("FSP_TEST_KNOB", "-5")
    with pytest.raises(ValueError):
        st._env_int("FSP_TEST_KNOB", 1)


def test_merge_hull_candidate_recheck_skips_collect(
    spark, tmp_path, monkeypatch
):
    """ADVICE r16: the keyset's payoff is bounded by the bytes of the
    files SURVIVING the hull pass, not total table bytes — a table
    past the total-bytes threshold whose hull already prunes to one
    small file must not pay the distinct-collect job.  The same table
    under a wide-hull upsert (every file survives) re-passes the
    re-check and the collect runs, pruning the rewrite to the real
    key hits."""
    from pyspark.sql import functions as F2

    calls: list[bool] = []
    real = st._merge_key_probe

    def spy(df, keys, *, collect_keyset=True, row_cache=None):
        calls.append(collect_keyset)
        return real(
            df, keys, collect_keyset=collect_keyset, row_cache=row_cache
        )

    monkeypatch.setattr(st, "_merge_key_probe", spy)

    t = str(tmp_path / "tbl")
    for lo, hi in ((0, 100), (100, 200), (200, 300), (300, 400)):
        st.commit(
            _df(spark, lo, hi).withColumn("v", F2.col("k") * 2.0).coalesce(1),
            t,
            stats_cols=["k"],
        )
    pm = st._read_manifest(t, st.current_version(t))
    sizes = [os.path.getsize(os.path.join(t, f)) for f in pm["files"]]
    # threshold one byte past the biggest single file: the TOTAL gate
    # passes (4 files sum past it) but no single-file candidate set can
    monkeypatch.setattr(st, "_MERGE_SMALL_TABLE_BYTES", max(sizes) + 1)
    assert st._keyset_probe_worthwhile(t, pm) is True

    # narrow-hull upsert -> one candidate file -> collect skipped
    st.merge_upsert(
        spark.createDataFrame([(150, -1.0), (160, -2.0)], ["k", "v"]),
        t,
        key="k",
    )
    assert calls and all(c is False for c in calls), calls
    got = {r["k"]: r["v"] for r in st.read_snapshot(spark, t).collect()}
    assert got[150] == -1.0 and got[160] == -2.0 and got[0] == 0.0

    # wide-hull upsert (extreme pair): every file survives the hull,
    # candidate bytes reach the threshold -> the collect RUNS and the
    # keyset prunes the rewrite to the two files holding the keys
    calls.clear()
    parent_files = st._read_manifest(t, st.current_version(t))["files"]
    st.merge_upsert(
        spark.createDataFrame([(0, 5.0), (399, 6.0)], ["k", "v"]),
        t,
        key="k",
    )
    assert True in calls, calls
    m = st._read_manifest(t, st.current_version(t))
    replaced = [f for f in parent_files if f not in m["files"]]
    assert len(replaced) == 2, (
        f"extreme-pair rewrote {len(replaced)} files, want 2"
    )
    got = {r["k"]: r["v"] for r in st.read_snapshot(spark, t).collect()}
    assert got[0] == 5.0 and got[399] == 6.0 and got[150] == -1.0


@pytest.mark.slow
def test_merge_probe_nan_keys_yield_no_keyset(spark):
    """r16 verdict ask 4: the bisect walk needs a TOTAL ORDER, and
    float NaN breaks it — pin, at the probe level, that an upsert
    whose surviving (NULL-free) keys contain a NaN always yields
    keyset=None with a NaN-neutral hull (per column: (NaN, NaN) when
    any value is NaN, which compares False against every file range —
    never disjoint, never a wrong prune), and that a keyset the probe
    DOES return never carries a NaN.  Property-generated so the
    total-order precondition is mechanical, not an upstream accident."""
    from hypothesis import given, settings
    from hypothesis import strategies as hst

    nan = float("nan")
    finite = hst.floats(min_value=-100, max_value=100, allow_nan=False)
    val = hst.one_of(hst.just(nan), finite, hst.none())

    @hst.composite
    def upsert(draw):
        n_cols = draw(hst.integers(min_value=1, max_value=2))
        rows = draw(
            hst.lists(
                hst.tuples(*[val] * n_cols), min_size=1, max_size=6
            )
        )
        if not any(v is not None and v != v for t in rows for v in t):
            i = draw(hst.integers(min_value=0, max_value=len(rows) - 1))
            t = list(rows[i])
            t[0] = nan
            rows[i] = tuple(t)
        return n_cols, rows

    @settings(max_examples=12, deadline=None)
    @given(upsert())
    def check(c):
        n_cols, rows = c
        keys = [f"k{i}" for i in range(n_cols)]
        schema = ", ".join(f"{k} double" for k in keys)
        df = spark.createDataFrame(rows, schema=schema)
        p = st._merge_key_probe(df, keys)
        survivors = [t for t in rows if all(v is not None for v in t)]
        nan_cols = [
            any(t[i] != t[i] for t in survivors) for i in range(n_cols)
        ]
        if p.keyset:
            # a returned keyset must uphold the walk's precondition
            assert not any(v != v for t in p.keyset for v in t)
            assert not any(nan_cols)
        if any(nan_cols):
            assert not p.keyset  # NaN survivor -> hull-only pruning
            assert p.bounds is not None  # survivors exist
            for i, k in enumerate(keys):
                lo, hi = p.bounds[k]
                vals = [t[i] for t in survivors]
                if nan_cols[i]:
                    assert lo != lo and hi != hi  # (NaN, NaN)
                else:
                    assert lo == min(vals) and hi == max(vals)

    check()

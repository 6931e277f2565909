"""Incremental view maintenance == full recompute, across arbitrary
commit sequences (the IVM counting-algorithm contract)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from foglamp_filter_python35_spark.sources import materialized_view as mv
from foglamp_filter_python35_spark.sources import snapshot_table as st
from foglamp_filter_python35_spark.sources.snapshot_source import (
    SnapshotTableDataSource,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(SnapshotTableDataSource)


def _kv(spark, rows):
    return spark.createDataFrame(rows, "rk int, grp string, v double")


def _agg_cols():
    """The stored agg-view columns, recomputed from scratch: row count,
    non-NULL value count, and the 0-based quantized sum."""
    return [
        F.count(F.lit(1)).alias("n_rows"),
        F.count("v").alias("n_vals"),
        F.coalesce(
            F.sum(F.floor(F.col("v") * 1e6 + F.lit(0.5)).cast("bigint")),
            F.lit(0).cast("bigint"),
        ).alias("sum_q"),
    ]


def _recompute(spark, base):
    snap = st.read_snapshot(spark, base)
    return {
        (r.grp): (r.n_rows, r.n_vals, r.sum_q)
        for r in snap.groupBy("grp").agg(*_agg_cols()).collect()
    }


def _view(spark, view):
    return {
        (r.grp): (r.n_rows, r.n_vals, r.sum_q)
        for r in st.read_snapshot(spark, view).collect()
    }


@pytest.mark.slow
def test_ivm_tracks_appends_updates_deletes_and_compaction(spark, tmp_path):
    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    st.commit(
        _kv(spark, [(1, "a", 1.5), (2, "a", 2.5), (3, "b", 10.0)]), base
    )
    mv.create_agg_view(spark, base, view, ["grp"], "v")
    assert _view(spark, view) == _recompute(spark, base)

    # two commits, one refresh spanning both: append + upsert
    st.commit(_kv(spark, [(4, "c", 7.0)]), base, mode="append")
    st.merge_upsert(
        _kv(spark, [(2, "a", 20.0), (5, "b", 1.0)]), base, key="rk"
    )
    mv.refresh_agg_view(spark, base, view, ["grp"], "v", row_key="rk")
    assert _view(spark, view) == _recompute(spark, base)

    # delete an entire group -> it must drop out of the view
    snap = st.read_snapshot(spark, base).filter("grp <> 'c'")
    st.commit(snap, base, mode="overwrite")
    mv.refresh_agg_view(spark, base, view, ["grp"], "v", row_key="rk")
    got = _view(spark, view)
    assert got == _recompute(spark, base)
    assert "c" not in got

    # compaction-only commit: refresh advances the marker, changes nothing
    st.compact(spark, base, target_files=1)
    before = got
    mv.refresh_agg_view(spark, base, view, ["grp"], "v", row_key="rk")
    assert _view(spark, view) == before
    assert mv.maintained_base_version(view) == st.current_version(base)


def test_ivm_refresh_is_idempotent_per_base_version(spark, tmp_path):
    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    st.commit(_kv(spark, [(1, "a", 1.0)]), base)
    mv.create_agg_view(spark, base, view, ["grp"], "v")
    st.commit(_kv(spark, [(2, "a", 2.0)]), base, mode="append")
    v1 = mv.refresh_agg_view(spark, base, view, ["grp"], "v", row_key="rk")
    # replaying the same refresh (crash recovery) must be a no-op commit
    v2 = mv.refresh_agg_view(spark, base, view, ["grp"], "v", row_key="rk")
    assert v1 == v2
    assert _view(spark, view) == _recompute(spark, base)


def test_ivm_noop_when_current(spark, tmp_path):
    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    st.commit(_kv(spark, [(1, "a", 1.0)]), base)
    mv.create_agg_view(spark, base, view, ["grp"], "v")
    v_before = st.current_version(view)
    assert (
        mv.refresh_agg_view(spark, base, view, ["grp"], "v", row_key="rk")
        == v_before
    )


@pytest.mark.slow
def test_streaming_fed_base_keeps_view_consistent_across_replay(
    spark, tmp_path
):
    """Streaming loop + IVM: a snapshot-table stream feeds the base via
    the exactly-once sink; the view refreshes after each drain.  Replayed
    epochs and replayed refreshes are both absorbed (idempotent sink +
    ivm@N markers), so view == recompute at every observation point."""
    src = str(tmp_path / "src")
    base = str(tmp_path / "base")
    ck = str(tmp_path / "ck")
    view = str(tmp_path / "view")

    def srows(lo, hi):
        return spark.createDataFrame(
            [(k, f"g{k % 3}", k * 1.0) for k in range(lo, hi)],
            "rk long, grp string, v double",
        )

    st.commit(srows(0, 20), src)

    def drain():
        q = (
            spark.readStream.format("snapshot_table")
            .option("path", src)
            .load()
            .writeStream.foreachBatch(st.snapshot_sink(base, query_name="ivm"))
            .option("checkpointLocation", ck)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    drain()
    mv.create_agg_view(spark, base, view, ["grp"], "v")
    assert _view(spark, view) == _recompute(spark, base)

    st.commit(srows(20, 31), src, mode="append")
    drain()
    drain()  # replayed drain: idempotent sink absorbs it
    mv.refresh_agg_view(spark, base, view, ["grp"], "v", row_key="rk")
    mv.refresh_agg_view(spark, base, view, ["grp"], "v", row_key="rk")
    assert _view(spark, view) == _recompute(spark, base)
    n = st.read_snapshot(spark, base).count()
    assert n == 31  # exactly once end to end


@pytest.mark.slow
def test_ivm_random_commit_sequences_match_recompute(spark, tmp_path):
    """Model-based: random append/upsert/delete/compact sequences with a
    refresh after EVERY op — the incrementally maintained view must be
    bit-identical to a full recompute at each step (the IVM counting
    algorithm has no order-sensitive state)."""
    import random

    rng = random.Random(20240814)
    for seq in range(3):
        base = str(tmp_path / f"b{seq}")
        view = str(tmp_path / f"v{seq}")
        next_rk = [0]

        def fresh(n, grps=("a", "b", "c")):
            rows = [
                (
                    next_rk[0] + i,
                    rng.choice(grps),
                    None
                    if rng.random() < 0.25
                    else round(rng.uniform(0, 9), 3),
                )
                for i in range(n)
            ]
            next_rk[0] += n
            return _kv(spark, rows)

        st.commit(fresh(6), base)
        mv.create_agg_view(spark, base, view, ["grp"], "v")
        for _ in range(4):
            op = rng.choice(["append", "upsert", "delete", "compact"])
            if op == "append":
                st.commit(fresh(3), base, mode="append")
            elif op == "upsert":
                existing = [
                    r.rk for r in st.read_snapshot(spark, base).collect()
                ]
                upd = [
                    (
                        rk,
                        rng.choice(("a", "b", "c")),
                        None
                        if rng.random() < 0.25
                        else round(rng.uniform(0, 9), 3),
                    )
                    for rk in rng.sample(existing, min(2, len(existing)))
                ]
                st.merge_upsert(_kv(spark, upd), base, key="rk")
            elif op == "delete":
                snap = st.read_snapshot(spark, base)
                keep = [r.rk for r in snap.collect()]
                if len(keep) > 2:
                    drop = set(rng.sample(keep, 2))
                    st.commit(
                        snap.filter(~F.col("rk").isin(*drop)),
                        base,
                        mode="overwrite",
                    )
            else:
                st.compact(spark, base, target_files=1)
            mv.refresh_agg_view(spark, base, view, ["grp"], "v", row_key="rk")
            assert _view(spark, view) == _recompute(spark, base), (
                f"seq {seq} diverged after {op}"
            )


def test_ivm_refresh_survives_concurrent_refresh(spark, tmp_path, monkeypatch):
    """A competing refresh landing between our view read and our commit
    must NOT double-apply the shared delta prefix: require_parent forces
    a re-read, which then sees the base already maintained and no-ops."""
    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    st.commit(_kv(spark, [(1, "a", 1.0), (2, "b", 2.0)]), base)
    mv.create_agg_view(spark, base, view, ["grp"], "v")
    st.commit(_kv(spark, [(3, "a", 5.0)]), base, mode="append")  # base v1

    real_read = st.read_snapshot
    raced = {"done": False}

    def read_and_race(spark_, path_, version=None, **kw):
        out = real_read(spark_, path_, version, **kw)
        if path_ == view and not raced["done"]:
            raced["done"] = True
            # competing refresh publishes the CORRECT post-delta view
            correct = real_read(spark_, base).groupBy("grp").agg(*_agg_cols())
            st.commit(
                correct, view, mode="overwrite",
                txn=f"ivm@{st.current_version(base)}",
            )
        return out

    monkeypatch.setattr(st, "read_snapshot", read_and_race)
    mv.refresh_agg_view(spark, base, view, ["grp"], "v", row_key="rk")
    monkeypatch.setattr(st, "read_snapshot", real_read)
    # group a must count 2 rows summing 6.0 — NOT the double-applied 3/11
    assert _view(spark, view) == _recompute(spark, base)
    assert _view(spark, view)["a"] == (2, 2, 6_000_000)


def test_ivm_refresh_toctou_competitor_right_after_version_read(
    spark, tmp_path, monkeypatch
):
    """Regression for the r4 TOCTOU finding: refresh used to read the
    maintained base version and the view's current version SEPARATELY,
    so a competitor committing between the two reads was silently
    absorbed — require_parent equalled the post-competitor version and
    the shared delta prefix was double-applied.  The fix derives both
    from ONE ``current_version`` read; a competitor landing immediately
    after that read must now hit CommitConflict and retry into a no-op.
    This test fires the competitor from inside the version read itself,
    the tightest interleaving the protocol admits."""
    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    st.commit(_kv(spark, [(1, "a", 1.0), (2, "b", 2.0)]), base)
    mv.create_agg_view(spark, base, view, ["grp"], "v")
    st.commit(_kv(spark, [(3, "a", 5.0)]), base, mode="append")  # base v1

    real_cv = st.current_version
    raced = {"done": False}

    def version_read_then_race(path_):
        out = real_cv(path_)
        if path_ == view and not raced["done"]:
            raced["done"] = True
            # the competitor applies the SAME deltas and publishes the
            # correct post-delta view before our commit lands
            correct = (
                st.read_snapshot(spark, base).groupBy("grp").agg(*_agg_cols())
            )
            st.commit(
                correct, view, mode="overwrite",
                txn=f"ivm@{real_cv(base)}",
            )
        return out

    monkeypatch.setattr(st, "current_version", version_read_then_race)
    mv.refresh_agg_view(spark, base, view, ["grp"], "v", row_key="rk")
    monkeypatch.setattr(st, "current_version", real_cv)
    # the old double-read code double-applied rk=3: a -> (3, 11.0)
    assert _view(spark, view) == _recompute(spark, base)
    assert _view(spark, view)["a"] == (2, 2, 6_000_000)
    assert mv.maintained_base_version(view) == st.current_version(base)


# --- multi-aggregate (count+sum+min+max) stats view -----------------------


def _stats_cols():
    return _agg_cols() + [
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
    ]


def _recompute_stats(spark, base):
    snap = st.read_snapshot(spark, base)
    return {
        (r.grp): (r.n_rows, r.n_vals, r.sum_q, r.min_v, r.max_v)
        for r in snap.groupBy("grp").agg(*_stats_cols()).collect()
    }


def _stats_view(spark, view):
    return {
        (r.grp): (r.n_rows, r.n_vals, r.sum_q, r.min_v, r.max_v)
        for r in st.read_snapshot(spark, view).collect()
    }


def test_stats_view_min_max_survive_retraction_of_the_extreme(spark, tmp_path):
    """Deleting the current MIN/MAX row must trigger the documented
    recompute-touched-groups fallback and surface the runner-up."""
    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    st.commit(
        _kv(spark, [(1, "a", 1.0), (2, "a", 5.0), (3, "a", 9.0), (4, "b", 2.0)]),
        base,
    )
    mv.create_stats_view(spark, base, view, ["grp"], "v")
    assert _stats_view(spark, view) == _recompute_stats(spark, base)

    # delete a's min AND max in one commit -> runner-up 5.0 both sides
    snap = st.read_snapshot(spark, base).filter(~F.col("rk").isin(1, 3))
    st.commit(snap, base, mode="overwrite")
    mv.refresh_stats_view(spark, base, view, ["grp"], "v", row_key="rk")
    got = _stats_view(spark, view)
    assert got == _recompute_stats(spark, base)
    assert got["a"] == (1, 1, 5_000_000, 5.0, 5.0)
    # b untouched by the retraction: merged monotonically, not recomputed
    assert got["b"] == (1, 1, 2_000_000, 2.0, 2.0)


@pytest.mark.slow
def test_stats_view_insert_only_refresh_merges_monotonically(spark, tmp_path):
    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    st.commit(_kv(spark, [(1, "a", 3.0)]), base)
    mv.create_stats_view(spark, base, view, ["grp"], "v")
    st.commit(_kv(spark, [(2, "a", 1.0), (3, "b", 7.0)]), base, mode="append")
    mv.refresh_stats_view(spark, base, view, ["grp"], "v", row_key="rk")
    got = _stats_view(spark, view)
    assert got == _recompute_stats(spark, base)
    assert got["a"] == (2, 2, 4_000_000, 1.0, 3.0)
    assert got["b"] == (1, 1, 7_000_000, 7.0, 7.0)  # brand-new group


@pytest.mark.slow
def test_stats_view_idempotent_and_noop(spark, tmp_path):
    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    st.commit(_kv(spark, [(1, "a", 1.0)]), base)
    mv.create_stats_view(spark, base, view, ["grp"], "v")
    st.commit(_kv(spark, [(2, "a", 2.0)]), base, mode="append")
    v1 = mv.refresh_stats_view(spark, base, view, ["grp"], "v", row_key="rk")
    v2 = mv.refresh_stats_view(spark, base, view, ["grp"], "v", row_key="rk")
    assert v1 == v2
    assert _stats_view(spark, view) == _recompute_stats(spark, base)


@pytest.mark.slow
def test_stats_view_random_commit_sequences_match_recompute(spark, tmp_path):
    """Model-based twin of the count/sum test, now over all four
    aggregates: random append/upsert/delete/compact sequences with a
    refresh after every op must stay bit-identical to a recompute —
    including upserts, which retract the preimage (possibly the extreme)
    and insert the postimage in one delta window."""
    import random

    rng = random.Random(20250814)
    for seq in range(3):
        base = str(tmp_path / f"b{seq}")
        view = str(tmp_path / f"v{seq}")
        next_rk = [0]

        def fresh(n, grps=("a", "b", "c")):
            rows = [
                (
                    next_rk[0] + i,
                    rng.choice(grps),
                    None
                    if rng.random() < 0.25
                    else round(rng.uniform(0, 9), 3),
                )
                for i in range(n)
            ]
            next_rk[0] += n
            return _kv(spark, rows)

        st.commit(fresh(6), base)
        mv.create_stats_view(spark, base, view, ["grp"], "v")
        for _ in range(4):
            op = rng.choice(["append", "upsert", "delete", "compact"])
            if op == "append":
                st.commit(fresh(3), base, mode="append")
            elif op == "upsert":
                existing = [
                    r.rk for r in st.read_snapshot(spark, base).collect()
                ]
                upd = [
                    (
                        rk,
                        rng.choice(("a", "b", "c")),
                        None
                        if rng.random() < 0.25
                        else round(rng.uniform(0, 9), 3),
                    )
                    for rk in rng.sample(existing, min(2, len(existing)))
                ]
                st.merge_upsert(_kv(spark, upd), base, key="rk")
            elif op == "delete":
                snap = st.read_snapshot(spark, base)
                keep = [r.rk for r in snap.collect()]
                if len(keep) > 2:
                    drop = set(rng.sample(keep, 2))
                    st.commit(
                        snap.filter(~F.col("rk").isin(*drop)),
                        base,
                        mode="overwrite",
                    )
            else:
                st.compact(spark, base, target_files=1)
            mv.refresh_stats_view(spark, base, view, ["grp"], "v", row_key="rk")
            assert _stats_view(spark, view) == _recompute_stats(spark, base), (
                f"seq {seq} diverged after {op}"
            )


@pytest.mark.slow
def test_stats_view_refresh_survives_concurrent_refresh(
    spark, tmp_path, monkeypatch
):
    """The stats view uses the same pinned-version protocol as the agg
    view: a competitor landing right after our single view-version read
    must force CommitConflict -> retry -> no-op, never a double-apply
    (which would corrupt count/sum AND leave stale min/max)."""
    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    st.commit(_kv(spark, [(1, "a", 1.0), (2, "a", 9.0)]), base)
    mv.create_stats_view(spark, base, view, ["grp"], "v")
    st.commit(_kv(spark, [(3, "a", 5.0)]), base, mode="append")

    real_cv = st.current_version
    raced = {"done": False}

    def version_read_then_race(path_):
        out = real_cv(path_)
        if path_ == view and not raced["done"]:
            raced["done"] = True
            correct = (
                st.read_snapshot(spark, base)
                .groupBy("grp")
                .agg(*_stats_cols())
            )
            st.commit(
                correct, view, mode="overwrite",
                txn=f"ivm@{real_cv(base)}",
            )
        return out

    monkeypatch.setattr(st, "current_version", version_read_then_race)
    mv.refresh_stats_view(spark, base, view, ["grp"], "v", row_key="rk")
    monkeypatch.setattr(st, "current_version", real_cv)
    got = _stats_view(spark, view)
    assert got == _recompute_stats(spark, base)
    assert got["a"] == (3, 3, 15_000_000, 1.0, 9.0)


@pytest.mark.slow
def test_stats_view_retracting_one_of_a_duplicated_extreme(spark, tmp_path):
    """Two rows share the group minimum; deleting ONE of them must keep
    the min (the recompute fallback sees the surviving duplicate —
    a delta-only min-merge would have no way to know one remains)."""
    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    st.commit(
        _kv(spark, [(1, "a", 1.0), (2, "a", 1.0), (3, "a", 8.0)]), base
    )
    mv.create_stats_view(spark, base, view, ["grp"], "v")
    snap = st.read_snapshot(spark, base).filter("rk <> 1")
    st.commit(snap, base, mode="overwrite")
    mv.refresh_stats_view(spark, base, view, ["grp"], "v", row_key="rk")
    got = _stats_view(spark, view)
    assert got == _recompute_stats(spark, base)
    assert got["a"] == (2, 2, 9_000_000, 1.0, 8.0)  # min survives


@pytest.mark.slow
def test_stats_view_upsert_moves_extreme_between_groups(spark, tmp_path):
    """An upsert whose preimage was group a's max and whose postimage
    becomes group b's min touches BOTH groups in one delta window:
    a retracts (recompute fallback), b inserts (monotonic merge)."""
    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    st.commit(
        _kv(spark, [(1, "a", 2.0), (2, "a", 9.0), (3, "b", 5.0)]), base
    )
    mv.create_stats_view(spark, base, view, ["grp"], "v")
    st.merge_upsert(_kv(spark, [(2, "b", 1.0)]), base, key="rk")
    mv.refresh_stats_view(spark, base, view, ["grp"], "v", row_key="rk")
    got = _stats_view(spark, view)
    assert got == _recompute_stats(spark, base)
    assert got["a"] == (1, 1, 2_000_000, 2.0, 2.0)  # max 9.0 left the group
    assert got["b"] == (2, 2, 6_000_000, 1.0, 5.0)  # new min arrived


@pytest.mark.slow
def test_stats_view_refresh_plan_semi_joins_touched_groups(
    spark, tmp_path, monkeypatch
):
    """The retraction fallback must reach the base through a LeftSemi
    join on the touched group keys (partition-prunable at scale) and the
    refresh plan must contain no cartesian product."""
    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    st.commit(
        _kv(spark, [(i, f"g{i % 3}", float(i)) for i in range(30)]), base
    )
    mv.create_stats_view(spark, base, view, ["grp"], "v")
    snap = st.read_snapshot(spark, base).filter("rk <> 0")
    st.commit(snap, base, mode="overwrite")

    real_commit = st.commit
    captured = {}

    def spy_commit(df, path, **kw):
        if path == view and "require_parent" in kw:
            captured["plan"] = (
                df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
            )
        return real_commit(df, path, **kw)

    monkeypatch.setattr(st, "commit", spy_commit)
    mv.refresh_stats_view(spark, base, view, ["grp"], "v", row_key="rk")
    monkeypatch.setattr(st, "commit", real_commit)
    plan = captured["plan"]
    assert "LeftSemi" in plan
    assert "Cartesian" not in plan
    assert _stats_view(spark, view) == _recompute_stats(spark, base)


def test_read_stats_view_decodes_sum(spark, tmp_path):
    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    st.commit(_kv(spark, [(1, "a", 1.25), (2, "a", 2.25)]), base)
    mv.create_stats_view(spark, base, view, ["grp"], "v")
    row = mv.read_stats_view(spark, view).collect()[0]
    assert row["value_sum"] == 3.5
    assert (row["min_v"], row["max_v"]) == (1.25, 2.25)


@pytest.mark.slow
def test_stats_view_hypothesis_sequences_match_recompute(spark, tmp_path):
    """Hypothesis-driven twin of the model-based stats test: generated
    op sequences (append / upsert / delete-by-index / compact) with
    values drawn to collide (few distinct values -> duplicated extremes
    are common) must keep the 4-aggregate view bit-identical to a
    recompute after every refresh.  Examples capped low — each op costs
    a Spark round-trip."""
    from hypothesis import given, settings, strategies as hst

    counter = [0]

    @settings(max_examples=4, deadline=None)
    @given(
        ops=hst.lists(
            hst.tuples(
                hst.sampled_from(["append", "upsert", "delete", "compact"]),
                hst.lists(
                    hst.tuples(
                        hst.sampled_from(["a", "b"]),
                        # tiny value domain: extremes collide on purpose
                        hst.sampled_from([0.0, 1.0, 1.0, 2.5, -3.0, None]),
                    ),
                    min_size=1,
                    max_size=3,
                ),
            ),
            min_size=1,
            max_size=4,
        )
    )
    def run(ops):
        counter[0] += 1
        base = str(tmp_path / f"hb{counter[0]}")
        view = str(tmp_path / f"hv{counter[0]}")
        next_rk = [0]

        def mk(rows):
            out = [(next_rk[0] + i, g, v) for i, (g, v) in enumerate(rows)]
            next_rk[0] += len(rows)
            return _kv(spark, out)

        st.commit(mk([("a", 1.0), ("a", 1.0), ("b", -3.0)]), base)
        mv.create_stats_view(spark, base, view, ["grp"], "v")
        for op, rows in ops:
            if op == "append":
                st.commit(mk(rows), base, mode="append")
            elif op == "upsert":
                existing = [
                    r.rk for r in st.read_snapshot(spark, base).collect()
                ]
                upd = [
                    (existing[i % len(existing)], g, v)
                    for i, (g, v) in enumerate(rows)
                ]
                # keys must be unique within one upsert batch
                upd = list({rk: (rk, g, v) for rk, g, v in upd}.values())
                st.merge_upsert(_kv(spark, upd), base, key="rk")
            elif op == "delete":
                snap = st.read_snapshot(spark, base)
                keep = sorted(r.rk for r in snap.collect())
                if len(keep) > 1:
                    drop = {keep[i % len(keep)] for i, _ in enumerate(rows)}
                    if len(drop) < len(keep):  # never empty the table
                        st.commit(
                            snap.filter(~F.col("rk").isin(*drop)),
                            base,
                            mode="overwrite",
                        )
            else:
                st.compact(spark, base, target_files=1)
            mv.refresh_stats_view(spark, base, view, ["grp"], "v", row_key="rk")
            assert _stats_view(spark, view) == _recompute_stats(spark, base)

    run()


@pytest.mark.slow
def test_streaming_fed_base_keeps_stats_view_consistent(spark, tmp_path):
    """Streaming loop + the 4-aggregate view: snapshot-table stream ->
    exactly-once sink -> refresh_stats_view after each drain; replayed
    drains and replayed refreshes are absorbed and view == recompute."""
    src = str(tmp_path / "src")
    base = str(tmp_path / "base")
    ck = str(tmp_path / "ck")
    view = str(tmp_path / "view")

    def srows(lo, hi):
        return spark.createDataFrame(
            [(k, f"g{k % 3}", float(k % 7) - 3.0) for k in range(lo, hi)],
            "rk long, grp string, v double",
        )

    st.commit(srows(0, 15), src)

    def drain():
        q = (
            spark.readStream.format("snapshot_table")
            .option("path", src)
            .load()
            .writeStream.foreachBatch(
                st.snapshot_sink(base, query_name="ivm-stats")
            )
            .option("checkpointLocation", ck)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    drain()
    mv.create_stats_view(spark, base, view, ["grp"], "v")
    assert _stats_view(spark, view) == _recompute_stats(spark, base)

    st.commit(srows(15, 26), src, mode="append")
    drain()
    drain()  # replayed drain absorbed by the idempotent sink
    mv.refresh_stats_view(spark, base, view, ["grp"], "v", row_key="rk")
    mv.refresh_stats_view(spark, base, view, ["grp"], "v", row_key="rk")
    assert _stats_view(spark, view) == _recompute_stats(spark, base)
    assert st.read_snapshot(spark, base).count() == 26


@pytest.mark.slow
def test_refresh_under_real_thread_contention(spark, tmp_path):
    """Two driver threads refresh the SAME view concurrently, repeatedly,
    while a third appends to the base between waves — no monkeypatch,
    the genuine interleavings the pinned-version protocol must survive.
    After every wave the view equals a recompute (double-apply would
    inflate counts; lost updates would lag the maintained version)."""
    import threading

    base, view = str(tmp_path / "cbase"), str(tmp_path / "cview")
    st.commit(_kv(spark, [(i, f"g{i % 3}", float(i)) for i in range(9)]), base)
    mv.create_stats_view(spark, base, view, ["grp"], "v")
    next_rk = [9]

    for wave in range(3):
        rows = [
            (next_rk[0] + i, f"g{(next_rk[0] + i) % 3}", float(i) - 1.5)
            for i in range(4)
        ]
        next_rk[0] += 4
        st.commit(_kv(spark, rows), base, mode="append")

        errors = []

        def refresher():
            try:
                mv.refresh_stats_view(
                    spark, base, view, ["grp"], "v", row_key="rk"
                )
            except Exception as exc:  # noqa: BLE001
                errors.append(repr(exc))

        ts = [threading.Thread(target=refresher) for _ in range(2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert errors == [], f"wave {wave}: {errors}"
        assert _stats_view(spark, view) == _recompute_stats(spark, base), (
            f"wave {wave} diverged"
        )
        assert mv.maintained_base_version(view) == st.current_version(base)


@pytest.mark.slow
def test_refresh_spans_additive_base_schema_evolution(spark, tmp_path):
    """An append that ADDS a column to the base must not break a view
    keyed on the original columns: the change feed spans the evolution
    and the view keeps matching a recompute (new column ignored)."""
    from pyspark.sql import functions as F2

    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    st.commit(_kv(spark, [(1, "a", 1.0), (2, "b", 2.0)]), base)
    mv.create_stats_view(spark, base, view, ["grp"], "v")
    st.commit(
        _kv(spark, [(3, "a", 7.0)]).withColumn("note", F2.lit("x")),
        base,
        mode="append",
    )
    mv.refresh_stats_view(spark, base, view, ["grp"], "v", row_key="rk")
    got = _stats_view(spark, view)
    assert got == _recompute_stats(spark, base)
    assert got["a"] == (2, 2, 8_000_000, 1.0, 7.0)


def test_vacuumed_maintenance_history_fails_loudly(spark, tmp_path):
    """Round-5 advice: `_maintained_base_at` scanned manifests linearly
    and a vacuumed manifest partway down raised a bare FileNotFoundError
    mid-scan.  The scan now stops at the log-retention floor with a
    clear, actionable error naming the rebuild path."""
    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    st.commit(_kv(spark, [(1, "a", 1.0), (2, "b", 2.0)]), base)
    mv.create_agg_view(spark, base, view, ["grp"], "v")  # view v0: ivm@0

    # interleave non-ivm commits on the view path (a user writing to the
    # view directly), then vacuum past the ivm@0 marker
    snap = st.read_snapshot(spark, view)
    st.commit(snap, view, mode="overwrite")  # v1, no ivm marker
    st.commit(snap, view, mode="overwrite")  # v2, no ivm marker
    st.vacuum(view, keep_versions=1)  # drops manifests v0 (ivm@0) and v1

    st.commit(_kv(spark, [(3, "c", 3.0)]), base, mode="append")
    with pytest.raises(FileNotFoundError, match="create_agg_view"):
        mv.refresh_agg_view(spark, base, view, ["grp"], "v", row_key="rk")


def test_vacuumed_stats_history_names_stats_rebuild(spark, tmp_path):
    """ADVICE r6: the retention-floor error reached via the STATS-view
    refresh must hint `create_stats_view()` — the agg-view hint would
    rebuild the wrong schema."""
    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    st.commit(_kv(spark, [(1, "a", 1.0), (2, "b", 2.0)]), base)
    mv.create_stats_view(spark, base, view, ["grp"], "v")  # view v0: ivm@0

    snap = st.read_snapshot(spark, view)
    st.commit(snap, view, mode="overwrite")  # v1, no ivm marker
    st.commit(snap, view, mode="overwrite")  # v2, no ivm marker
    st.vacuum(view, keep_versions=1)  # drops manifests v0 (ivm@0) and v1

    st.commit(_kv(spark, [(3, "c", 3.0)]), base, mode="append")
    with pytest.raises(FileNotFoundError, match="create_stats_view"):
        mv.refresh_stats_view(spark, base, view, ["grp"], "v", row_key="rk")


def test_txn_marker_forgotten_past_retention_floor(spark, tmp_path):
    """`_txn_version` stops at the retention floor instead of raising:
    idempotency markers older than the retained log are forgotten (the
    Delta setTransaction retention caveat), never a mid-scan crash."""
    base = str(tmp_path / "base")
    st.commit(_kv(spark, [(1, "a", 1.0)]), base, txn="job@1")  # v0
    st.commit(_kv(spark, [(2, "b", 2.0)]), base, mode="append")  # v1
    st.commit(_kv(spark, [(3, "c", 3.0)]), base, mode="append")  # v2
    assert st._txn_version(base, "job@1") == 0
    st.vacuum(base, keep_versions=1)  # manifests v0, v1 expired
    assert st._txn_version(base, "job@1") is None


# --- SQL NULL-measure semantics (n_vals third aggregate) -------------------


@pytest.mark.slow
def test_agg_view_null_measures_follow_sql_sum(spark, tmp_path):
    """SUM over a group whose values are all NULL must surface NULL —
    incrementally: a group can be born all-NULL, gain a value (sum
    appears), and lose it again (sum returns to NULL), with the stored
    view bit-identical to a recompute at every step."""
    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    st.commit(
        _kv(spark, [(1, "a", None), (2, "a", None), (3, "b", 1.5),
                    (4, "b", None)]),
        base,
    )
    mv.create_agg_view(spark, base, view, ["grp"], "v")
    assert _view(spark, view) == _recompute(spark, base)
    decoded = {
        r.grp: (r.n_rows, r.n_vals, r.value_sum)
        for r in mv.read_agg_view(spark, view).collect()
    }
    assert decoded["a"] == (2, 0, None)  # SQL: SUM of no values is NULL
    assert decoded["b"] == (2, 1, 1.5)  # NULL contributed nothing

    # the all-NULL group gains its first value -> sum appears
    st.commit(_kv(spark, [(5, "a", 4.25)]), base, mode="append")
    mv.refresh_agg_view(spark, base, view, ["grp"], "v", row_key="rk")
    assert _view(spark, view) == _recompute(spark, base)
    decoded = {
        r.grp: r.value_sum for r in mv.read_agg_view(spark, view).collect()
    }
    assert decoded["a"] == 4.25

    # ...and loses it again -> sum reverts to NULL, rows remain
    snap = st.read_snapshot(spark, base).filter("rk <> 5")
    st.commit(snap, base, mode="overwrite")
    mv.refresh_agg_view(spark, base, view, ["grp"], "v", row_key="rk")
    assert _view(spark, view) == _recompute(spark, base)
    decoded = {
        r.grp: (r.n_rows, r.value_sum)
        for r in mv.read_agg_view(spark, view).collect()
    }
    assert decoded["a"] == (2, None)


def test_stats_view_all_null_group_has_null_extremes(spark, tmp_path):
    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    st.commit(_kv(spark, [(1, "a", None), (2, "b", 3.0)]), base)
    mv.create_stats_view(spark, base, view, ["grp"], "v")
    got = _stats_view(spark, view)
    assert got == _recompute_stats(spark, base)
    assert got["a"] == (1, 0, 0, None, None)
    row = {
        r.grp: r.value_sum for r in mv.read_stats_view(spark, view).collect()
    }
    assert row["a"] is None and row["b"] == 3.0


def test_stats_view_null_retraction_keeps_group_unretracted(spark, tmp_path):
    """Deleting a NULL-valued row cannot dislodge MIN/MAX (they ignore
    NULLs), so the refresh marks no group retracted — the recompute
    fallback's touched-group set is empty at runtime — and the merged
    view still matches a recompute exactly."""
    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    st.commit(
        _kv(spark, [(1, "a", None), (2, "a", 2.0), (3, "a", 8.0)]), base
    )
    mv.create_stats_view(spark, base, view, ["grp"], "v")
    snap = st.read_snapshot(spark, base).filter("rk <> 1")
    st.commit(snap, base, mode="overwrite")
    mv.refresh_stats_view(spark, base, view, ["grp"], "v", row_key="rk")
    got = _stats_view(spark, view)
    assert got == _recompute_stats(spark, base)
    assert got["a"] == (2, 2, 10_000_000, 2.0, 8.0)


def test_pre_nvals_view_fails_with_actionable_error(spark, tmp_path):
    """A view stored by the pre-n_vals module version must fail loudly
    with a rebuild hint on read AND refresh — not with an
    UNRESOLVED_COLUMN AnalysisException from inside the merge plan."""
    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    st.commit(_kv(spark, [(1, "a", 1.0)]), base)
    # hand-write an old-schema view (n_rows, sum_q only) with the marker
    old_schema = (
        st.read_snapshot(spark, base)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.floor(F.col("v") * 1e6 + F.lit(0.5)).cast("bigint")
            ).alias("sum_q"),
        )
    )
    st.commit(old_schema, view, mode="overwrite", txn="ivm@0")
    st.commit(_kv(spark, [(2, "b", 2.0)]), base, mode="append")

    with pytest.raises(ValueError, match="create_agg_view"):
        mv.read_agg_view(spark, view)
    with pytest.raises(ValueError, match="create_agg_view"):
        mv.refresh_agg_view(spark, base, view, ["grp"], "v", row_key="rk")
    with pytest.raises(ValueError, match="create_stats_view"):
        mv.refresh_stats_view(spark, base, view, ["grp"], "v", row_key="rk")


@pytest.mark.slow
def test_stream_fed_stats_view_tracks_changelog(spark, tmp_path):
    """VERDICT r6 #6: drive the stats view from the snapshot table's
    manifest-log stream — append, upsert, and delete commits each wake
    one incremental refresh, and the view equals a full recompute at
    every epoch.  Exactly-once rides the ivm@N txn marker, not the
    stream offsets (a replayed epoch is a no-op)."""
    import time

    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    ck = str(tmp_path / "ck")
    st.commit(
        _kv(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "a", 9.0)]), base
    )
    mv.create_stats_view(spark, base, view, ["grp"], "v")
    q = mv.stream_stats_view(
        spark,
        base,
        view,
        ["grp"],
        "v",
        row_key="rk",
        checkpoint_dir=ck,
    )

    def wait_maintained():
        target = st.current_version(base)
        deadline = time.time() + 240  # loaded-box headroom; exits as soon as rows land
        while time.time() < deadline:
            if mv.maintained_base_version(view) == target:
                return
            time.sleep(0.25)
        raise AssertionError(
            f"stream never advanced the view to base v{target} "
            f"(at {mv.maintained_base_version(view)})"
        )

    try:
        # epoch 1: append (with a NULL measure)
        st.commit(
            _kv(spark, [(4, "a", 7.0), (5, "c", None)]),
            base,
            mode="append",
        )
        wait_maintained()
        assert _stats_view(spark, view) == _recompute_stats(spark, base)

        # epoch 2: upsert (update one row, insert another)
        st.merge_upsert(
            _kv(spark, [(2, "b", 20.0), (6, "b", 1.0)]), base, key="rk"
        )
        wait_maintained()
        assert _stats_view(spark, view) == _recompute_stats(spark, base)

        # epoch 3: delete the current min AND max of group a — forces
        # the recompute-touched-groups retraction path
        snap = st.read_snapshot(spark, base).filter(
            ~F.col("rk").isin(1, 3)
        )
        st.commit(snap, base, mode="overwrite")
        wait_maintained()
        assert _stats_view(spark, view) == _recompute_stats(spark, base)
    finally:
        q.stop()


@pytest.mark.slow
def test_stream_fed_view_resumes_from_marker_chain(spark, tmp_path):
    """Commits that land while no stream is running are picked up on
    restart: the refresh window comes from the ivm@N marker chain, the
    stream is only the wake-up."""
    import time

    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    st.commit(_kv(spark, [(1, "a", 1.0)]), base)
    mv.create_stats_view(spark, base, view, ["grp"], "v")
    # two commits with NO stream running
    st.commit(_kv(spark, [(2, "b", 2.0)]), base, mode="append")
    st.commit(_kv(spark, [(3, "a", 3.0)]), base, mode="append")

    q = mv.stream_stats_view(
        spark,
        base,
        view,
        ["grp"],
        "v",
        row_key="rk",
        checkpoint_dir=str(tmp_path / "ck"),
    )
    try:
        target = st.current_version(base)
        deadline = time.time() + 240  # loaded-box headroom; exits as soon as rows land
        while time.time() < deadline:
            if mv.maintained_base_version(view) == target:
                break
            time.sleep(0.25)
        assert mv.maintained_base_version(view) == target
        assert _stats_view(spark, view) == _recompute_stats(spark, base)
    finally:
        q.stop()


@pytest.mark.slow
def test_stream_fed_agg_view_tracks_changelog(spark, tmp_path):
    """stream_agg_view (the count/sum twin) follows the changelog with
    the same exactly-once contract."""
    import time

    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    st.commit(_kv(spark, [(1, "a", 1.0), (2, "b", 2.0)]), base)
    mv.create_agg_view(spark, base, view, ["grp"], "v")
    q = mv.stream_agg_view(
        spark,
        base,
        view,
        ["grp"],
        "v",
        row_key="rk",
        checkpoint_dir=str(tmp_path / "ck"),
    )
    try:
        st.commit(_kv(spark, [(3, "c", 7.0)]), base, mode="append")
        st.merge_upsert(_kv(spark, [(2, "b", 20.0)]), base, key="rk")
        target = st.current_version(base)
        deadline = time.time() + 240  # loaded-box headroom; exits as soon as rows land
        while time.time() < deadline:
            if mv.maintained_base_version(view) == target:
                break
            time.sleep(0.25)
        assert mv.maintained_base_version(view) == target
        assert _view(spark, view) == _recompute(spark, base)
    finally:
        q.stop()


@pytest.mark.slow
def test_ivm_restart_storm_committers_refreshers_and_vacuum(spark, tmp_path):
    """r13 stretch, modeled on the snapshot table's restart storm
    (test_snapshot_table.py): the IVM serializability claim with EVERY
    party live at once — prior coverage raced refreshers only between
    commit waves.  Here: 2 base committers (appends plus extreme-moving
    merge_upserts, so the stats retraction/recompute path fires
    mid-storm), 3 refreshers split across an agg view and a stats view
    of the SAME base (one refresher replays every refresh immediately,
    the restarted-driver shape), looping vacuums on the base AND both
    view paths with the in-flight retention guard, and a checker that
    repeatedly pins the stats view's head version and asserts it equals
    a recompute of the EXACT base version its ivm@N marker names — the
    serializable-history invariant, checked while the history is being
    made.  CommitConflict after exhausted retries is an acceptable
    (loud) outcome for a refresher under storm; anything else fails."""
    import threading
    import time as _time

    base = str(tmp_path / "sbase")
    aview = str(tmp_path / "saggview")
    sview = str(tmp_path / "sstatsview")
    st.commit(_kv(spark, [(i, f"g{i % 4}", float(i)) for i in range(16)]), base)
    mv.create_agg_view(spark, base, aview, ["grp"], "v")
    mv.create_stats_view(spark, base, sview, ["grp"], "v")

    stop = threading.Event()
    errors: list = []
    checker_rounds = {"n": 0}

    def committer(tid: int) -> None:
        try:
            for j in range(5):
                lo = 100 + 100 * tid + 10 * j
                st.commit(
                    _kv(spark, [(k, f"g{k % 4}", float(k)) for k in range(lo, lo + 4)]),
                    base,
                    mode="append",
                    txn=f"storm-c{tid}-{j}",
                )
                # move an original extreme DOWN: update_preimage retracts
                # the group's max, forcing the recompute fallback
                # default max_retries=5 is too few under storm (the rival
                # lands several fast appends per slow merge cycle): losing
                # loudly 5 times IS the documented contract, but the storm
                # committers must ride through it
                st.merge_upsert(
                    _kv(spark, [(15 - tid, f"g{(15 - tid) % 4}", -1.0 * j)]),
                    base,
                    key="rk",
                    max_retries=50,
                )
        except Exception as exc:  # noqa: BLE001
            errors.append(("committer", tid, repr(exc)))

    def refresher(which: str, rid: int, replay: bool) -> None:
        try:
            while not stop.is_set():
                try:
                    if which == "agg":
                        v1 = mv.refresh_agg_view(
                            spark, base, aview, ["grp"], "v", row_key="rk"
                        )
                        if replay:  # restarted driver re-runs the refresh
                            v2 = mv.refresh_agg_view(
                                spark, base, aview, ["grp"], "v", row_key="rk"
                            )
                            assert v2 >= v1, f"view version went back: {v1}->{v2}"
                    else:
                        mv.refresh_stats_view(
                            spark, base, sview, ["grp"], "v", row_key="rk"
                        )
                except st.CommitConflict:
                    pass  # exhausted retries under storm: loud, acceptable
                _time.sleep(0.02)
        except Exception as exc:  # noqa: BLE001
            errors.append(("refresher", (which, rid), repr(exc)))

    def vacuumer(path: str) -> None:
        try:
            while not stop.is_set():
                st.vacuum(path, keep_versions=1000, min_age_seconds=300)
                _time.sleep(0.05)
        except Exception as exc:  # noqa: BLE001
            errors.append(("vacuum", path, repr(exc)))

    def checker() -> None:
        # serializable-history invariant, mid-storm: whatever stats-view
        # version is head RIGHT NOW must equal a recompute of the base
        # version its own ivm@N marker names (both sides are immutable
        # snapshots, so the comparison is race-free under the guard).
        try:
            while not stop.is_set():
                vv = st.current_version(sview)
                bb = mv._maintained_base_at(sview, vv)
                got = {
                    (r.grp): (r.n_rows, r.n_vals, r.sum_q, r.min_v, r.max_v)
                    for r in st.read_snapshot(spark, sview, version=vv).collect()
                }
                want = {
                    (r.grp): (r.n_rows, r.n_vals, r.sum_q, r.min_v, r.max_v)
                    for r in st.read_snapshot(spark, base, version=bb)
                    .groupBy("grp")
                    .agg(*_stats_cols())
                    .collect()
                }
                assert got == want, (
                    f"stats view v{vv} (ivm@{bb}) diverged from recompute"
                )
                checker_rounds["n"] += 1
        except Exception as exc:  # noqa: BLE001
            errors.append(("checker", 0, repr(exc)))

    workers = [threading.Thread(target=committer, args=(i,)) for i in range(2)]
    loopers = (
        [
            threading.Thread(target=refresher, args=("agg", 0, True)),
            threading.Thread(target=refresher, args=("stats", 1, False)),
            threading.Thread(target=refresher, args=("stats", 2, False)),
            threading.Thread(target=checker),
        ]
        + [threading.Thread(target=vacuumer, args=(p,)) for p in (base, aview, sview)]
    )
    for th in loopers:
        th.start()
    for th in workers:
        th.start()
    for th in workers:
        th.join(timeout=300)
    stop.set()
    for th in loopers:
        th.join(timeout=120)
    assert not any(th.is_alive() for th in workers + loopers)
    assert errors == []
    assert checker_rounds["n"] > 0

    # quiesce: one final refresh of each view, then full bit-identity
    mv.refresh_agg_view(spark, base, aview, ["grp"], "v", row_key="rk")
    mv.refresh_stats_view(spark, base, sview, ["grp"], "v", row_key="rk")
    head = st.current_version(base)
    assert mv.maintained_base_version(aview) == head
    assert mv.maintained_base_version(sview) == head
    assert _view(spark, aview) == _recompute(spark, base)
    assert _stats_view(spark, sview) == _recompute_stats(spark, base)

    # every base commit landed exactly once (committer txns unique) and
    # each view's ivm@N marker chain never repeats a base version
    seen_txn: set = set()
    for v in range(head + 1):
        txn = st._read_manifest(base, v).get("txn")
        if txn is not None:
            assert txn not in seen_txn, f"base txn {txn} committed twice"
            seen_txn.add(txn)
    for vp in (aview, sview):
        markers = []
        for v in range(st.current_version(vp) + 1):
            txn = st._read_manifest(vp, v).get("txn") or ""
            if txn.startswith("ivm@"):
                markers.append(int(txn.split("@", 1)[1]))
        assert markers == sorted(set(markers)), (
            f"{vp}: ivm marker chain not strictly increasing: {markers}"
        )


@pytest.mark.slow
def test_ivm_streaming_maintainer_restart_storm(spark, tmp_path):
    """The streaming maintainer under the restart-storm treatment: a
    live ``stream_stats_view`` races a looping BATCH refresher on the
    same view (the real operational shape — an operator runs a manual
    refresh while the continuous pipeline is up) while a committer
    drives appends / extreme-moving upserts / a delete-by-overwrite into
    the base, vacuums loop on both table paths under the retention
    guard, and a SUPERVISOR thread kills and restarts the stream from
    the same checkpoint twice mid-storm (plus restarting it if it ever
    dies on its own — e.g. a refresh losing the serializable race
    inside foreachBatch, which surfaces as a failed query, the
    documented loud outcome).  Exactly-once must ride the ivm@N marker
    chain through every restart: final view bit-identical to recompute,
    marker chain strictly increasing, no version ever maintained
    twice."""
    import threading
    import time as _time

    base, view = str(tmp_path / "mbase"), str(tmp_path / "mview")
    ck = str(tmp_path / "mck")
    st.commit(_kv(spark, [(i, f"g{i % 3}", float(i)) for i in range(9)]), base)
    mv.create_stats_view(spark, base, view, ["grp"], "v")

    stop = threading.Event()
    errors: list = []
    restarts = {"forced": 0, "crash": 0}

    def start_stream():
        return mv.stream_stats_view(
            spark, base, view, ["grp"], "v", row_key="rk",
            checkpoint_dir=ck, query_name="ivm-storm",
        )

    q_box = {"q": start_stream()}
    q_lock = threading.Lock()

    def supervisor() -> None:
        # the restart storm itself: two deliberate kill+restarts, plus
        # revival whenever the query dies on its own
        try:
            forced_left = 2
            while not stop.is_set():
                _time.sleep(0.8)
                with q_lock:
                    q = q_box["q"]
                    if not q.isActive:
                        restarts["crash"] += 1
                        q_box["q"] = start_stream()
                    elif forced_left > 0:
                        q.stop()
                        forced_left -= 1
                        restarts["forced"] += 1
                        q_box["q"] = start_stream()
        except Exception as exc:  # noqa: BLE001
            errors.append(("supervisor", 0, repr(exc)))

    def committer() -> None:
        try:
            for j in range(8):
                if j % 3 == 2:
                    # delete the current min of one group (retraction)
                    snap = st.read_snapshot(spark, base)
                    keep = snap.filter(F.col("rk") != j)
                    st.commit(keep, base, mode="overwrite")
                elif j % 3 == 1:
                    st.merge_upsert(
                        _kv(spark, [(8, "g2", 100.0 + j), (50 + j, "g0", -5.0 * j)]),
                        base, key="rk", max_retries=50,
                    )
                else:
                    lo = 200 + 10 * j
                    st.commit(
                        _kv(spark, [(k, f"g{k % 3}", float(k)) for k in range(lo, lo + 4)]),
                        base, mode="append", txn=f"mstorm-{j}",
                    )
                _time.sleep(0.3)
        except Exception as exc:  # noqa: BLE001
            errors.append(("committer", 0, repr(exc)))

    def batch_refresher() -> None:
        try:
            while not stop.is_set():
                try:
                    mv.refresh_stats_view(
                        spark, base, view, ["grp"], "v", row_key="rk"
                    )
                except st.CommitConflict:
                    pass  # loud, acceptable under storm
                _time.sleep(0.05)
        except Exception as exc:  # noqa: BLE001
            errors.append(("batch_refresher", 0, repr(exc)))

    def vacuumer(path: str) -> None:
        try:
            while not stop.is_set():
                st.vacuum(path, keep_versions=1000, min_age_seconds=300)
                _time.sleep(0.07)
        except Exception as exc:  # noqa: BLE001
            errors.append(("vacuum", path, repr(exc)))

    worker = threading.Thread(target=committer)
    loopers = [
        threading.Thread(target=supervisor),
        threading.Thread(target=batch_refresher),
        threading.Thread(target=vacuumer, args=(base,)),
        threading.Thread(target=vacuumer, args=(view,)),
    ]
    try:
        for th in loopers:
            th.start()
        worker.start()
        worker.join(timeout=300)
        stop.set()
        for th in loopers:
            th.join(timeout=120)
        assert not worker.is_alive() and not any(th.is_alive() for th in loopers)
    finally:
        stop.set()
        with q_lock:
            try:
                q_box["q"].stop()
            except Exception:  # noqa: BLE001
                pass

    assert errors == []
    assert restarts["forced"] == 2  # both deliberate restarts happened

    # quiesce and verify exactly-once through every restart
    mv.refresh_stats_view(spark, base, view, ["grp"], "v", row_key="rk")
    assert mv.maintained_base_version(view) == st.current_version(base)
    assert _stats_view(spark, view) == _recompute_stats(spark, base)
    markers = []
    for v in range(st.current_version(view) + 1):
        txn = st._read_manifest(view, v).get("txn") or ""
        if txn.startswith("ivm@"):
            markers.append(int(txn.split("@", 1)[1]))
    assert markers == sorted(set(markers)), (
        f"ivm marker chain not strictly increasing: {markers}"
    )


@pytest.mark.slow
def test_cross_protocol_storm_on_one_table(spark, tmp_path):
    """r14 verdict ask: every protocol that shares a table's manifest
    metadata, composed on ONE base — prior storms raced each protocol
    separately, and the r13 OPTIMIZE stats-inheritance change touched
    exactly the metadata these parties hand each other.  Live at once:

    - 2 snapshot committers: txn appends (each replayed immediately,
      the restarted-driver shape) plus extreme-moving merge_upserts so
      the stats retraction/recompute path fires mid-storm;
    - an OPTIMIZE loop alternating bin-pack compact and Z-order
      rewrites (inheriting/unioning the base's stats coverage), riding
      CommitConflict losses as a production OPTIMIZE loop would;
    - an IVM batch refresher AND the streaming stats maintainer on the
      SAME view (the operational race), with a reviver that restarts
      the stream if a lost serializable race inside foreachBatch kills
      it (the documented loud outcome);
    - retention-guarded vacuums looping on base and view;
    - a checker asserting the serializable-history invariant WHILE the
      history is being made: the current view head must equal a
      recompute of the exact base version its ivm@N marker names.

    Post-storm: full serializability (gap-free chain, txns exactly
    once, every appended row exactly once), view bit-identical to
    recompute, ivm marker chain strictly increasing, and the manifest
    stats coverage seeded at v0 survived every rewrite interleaving."""
    import threading
    import time as _time

    base = str(tmp_path / "xbase")
    view = str(tmp_path / "xview")
    ck = str(tmp_path / "xck")
    st.commit(
        _kv(spark, [(i, f"g{i % 4}", float(i)) for i in range(16)]),
        base,
        stats_cols=["rk"],
    )
    mv.create_stats_view(spark, base, view, ["grp"], "v")

    stop = threading.Event()
    errors: list = []
    rewrites = {"landed": 0, "lost": 0}
    checker_rounds = {"n": 0}
    revived = {"n": 0}

    def committer(tid: int) -> None:
        try:
            for j in range(4):
                lo = 100 + 100 * tid + 10 * j
                df = _kv(
                    spark,
                    [(k, f"g{k % 4}", float(k)) for k in range(lo, lo + 4)],
                )
                txn = f"xstorm-t{tid}-{j}"
                # covered-table writers maintain coverage: a stats-less
                # appended file is conservatively a candidate of EVERY
                # merge (correct but it invalidates the merge's
                # write-once retry cache each time, re-creating the
                # starvation the fairness fix exists to prevent)
                v1 = st.commit(
                    df, base, mode="append", txn=txn, stats_cols=["rk"]
                )
                v2 = st.commit(
                    df, base, mode="append", txn=txn, stats_cols=["rk"]
                )  # replay
                assert v2 == v1, f"txn {txn} double-committed: {v1}/{v2}"
                # retract a seed extreme: forces the recompute fallback
                st.merge_upsert(
                    _kv(spark, [(15 - tid, f"g{(15 - tid) % 4}", -1.0 * j)]),
                    base,
                    key="rk",
                    max_retries=50,
                )
        except Exception as exc:  # noqa: BLE001
            errors.append(("committer", tid, repr(exc)))

    def rewriter() -> None:
        # cadence note (instrumented in r14): a full-table rewrite
        # invalidates EVERY merge candidate, and on this box a merge
        # attempt costs ~1-3s under storm load while a rewrite pass
        # lands every ~0.6s — so an UNBOUNDED hot rewriter starves the
        # committers' merges by construction, in any optimistic table
        # format (Delta's logical conflict detection would flag the
        # same file overlaps).  Appends can no longer starve merges
        # (write-once/republish fairness in merge_upsert), but total
        # rewrites always can: the rewriter therefore races a bounded
        # burst of passes — the production shape, where OPTIMIZE is
        # periodic maintenance, not a spin loop — staying live past the
        # burst only until one pass has LANDED mid-storm.
        try:
            i = 0
            while not stop.is_set() and (
                i < 12 or rewrites["landed"] == 0
            ):
                try:
                    if i % 2 == 0:
                        st.compact(spark, base, target_files=2)
                    else:
                        st.optimize_zorder(spark, base, ["v"], target_files=4)
                    rewrites["landed"] += 1
                except st.CommitConflict:
                    rewrites["lost"] += 1
                i += 1
                _time.sleep(0.25)
        except Exception as exc:  # noqa: BLE001
            errors.append(("rewriter", 0, repr(exc)))

    def batch_refresher() -> None:
        try:
            while not stop.is_set():
                try:
                    mv.refresh_stats_view(
                        spark, base, view, ["grp"], "v", row_key="rk"
                    )
                except st.CommitConflict:
                    pass  # exhausted retries under storm: loud, acceptable
                _time.sleep(0.05)
        except Exception as exc:  # noqa: BLE001
            errors.append(("batch_refresher", 0, repr(exc)))

    def start_stream():
        return mv.stream_stats_view(
            spark, base, view, ["grp"], "v", row_key="rk",
            checkpoint_dir=ck, query_name="xstorm",
        )

    q_box = {"q": start_stream()}

    def reviver() -> None:
        try:
            while not stop.is_set():
                _time.sleep(0.5)
                if not q_box["q"].isActive:
                    revived["n"] += 1
                    q_box["q"] = start_stream()
        except Exception as exc:  # noqa: BLE001
            errors.append(("reviver", 0, repr(exc)))

    def vacuumer(path: str) -> None:
        try:
            while not stop.is_set():
                st.vacuum(path, keep_versions=1000, min_age_seconds=300)
                _time.sleep(0.05)
        except Exception as exc:  # noqa: BLE001
            errors.append(("vacuum", path, repr(exc)))

    def checker() -> None:
        try:
            while not stop.is_set():
                vv = st.current_version(view)
                bb = mv._maintained_base_at(view, vv)
                got = {
                    (r.grp): (r.n_rows, r.n_vals, r.sum_q, r.min_v, r.max_v)
                    for r in st.read_snapshot(spark, view, version=vv).collect()
                }
                want = {
                    (r.grp): (r.n_rows, r.n_vals, r.sum_q, r.min_v, r.max_v)
                    for r in st.read_snapshot(spark, base, version=bb)
                    .groupBy("grp")
                    .agg(*_stats_cols())
                    .collect()
                }
                assert got == want, (
                    f"view v{vv} (ivm@{bb}) diverged from recompute"
                )
                checker_rounds["n"] += 1
        except Exception as exc:  # noqa: BLE001
            errors.append(("checker", 0, repr(exc)))

    workers = [threading.Thread(target=committer, args=(i,)) for i in range(2)]
    loopers = [
        threading.Thread(target=rewriter),
        threading.Thread(target=batch_refresher),
        threading.Thread(target=reviver),
        threading.Thread(target=checker),
        threading.Thread(target=vacuumer, args=(base,)),
        threading.Thread(target=vacuumer, args=(view,)),
    ]
    try:
        for th in loopers:
            th.start()
        for th in workers:
            th.start()
        for th in workers:
            th.join(timeout=300)
        # grace window: under saturated traffic every rewrite cycle can
        # lose its require_parent race; after traffic stops it must land
        deadline = _time.time() + 120
        while rewrites["landed"] == 0 and _time.time() < deadline:
            _time.sleep(0.2)
        stop.set()
        for th in loopers:
            th.join(timeout=120)
        assert not any(th.is_alive() for th in workers + loopers)
    finally:
        stop.set()
        try:
            q_box["q"].stop()
        except Exception:  # noqa: BLE001
            pass

    assert errors == []
    assert checker_rounds["n"] > 0   # the invariant really ran mid-storm
    assert rewrites["landed"] > 0    # rewrites really interleaved

    # quiesce: view catches up and is bit-identical to recompute
    mv.refresh_stats_view(spark, base, view, ["grp"], "v", row_key="rk")
    head = st.current_version(base)
    assert mv.maintained_base_version(view) == head
    assert _stats_view(spark, view) == _recompute_stats(spark, base)

    # serializability: gap-free chain, every committer txn exactly once
    seen_txn: set = set()
    for v in range(head + 1):
        m = st._read_manifest(base, v)  # raises on any gap
        txn = m.get("txn")
        if txn is not None and txn.startswith("xstorm-"):
            assert txn not in seen_txn, f"txn {txn} committed twice"
            seen_txn.add(txn)
    assert len(seen_txn) == 8
    # every appended row exactly once (upserts only touched seed keys)
    expected = list(range(16))
    for tid in range(2):
        for j in range(4):
            lo = 100 + 100 * tid + 10 * j
            expected += range(lo, lo + 4)
    got_keys = sorted(
        r.rk for r in st.read_snapshot(spark, base).select("rk").collect()
    )
    assert got_keys == sorted(expected)

    # ivm marker chain strictly increasing through batch+stream races
    markers = []
    for v in range(st.current_version(view) + 1):
        txn = st._read_manifest(view, v).get("txn") or ""
        if txn.startswith("ivm@"):
            markers.append(int(txn.split("@", 1)[1]))
    assert markers == sorted(set(markers)), (
        f"ivm marker chain not strictly increasing: {markers}"
    )

    # the v0 stats coverage survived every rewrite interleaving: one
    # quiescent compact inherits, and every file carries rk stats
    st.compact(spark, base, target_files=2)
    m = st._read_manifest(base, st.current_version(base))
    assert set(m["stats"]) == set(m["files"])
    for per_file in m["stats"].values():
        assert "rk" in per_file
    probe = st.read_snapshot(spark, base, between=("rk", 100, 110))
    assert sorted(r.rk for r in probe.collect()) == [
        k for k in sorted(expected) if 100 <= k <= 110
    ]


def test_insert_only_stats_refresh_never_references_the_base(spark, tmp_path):
    """The S8 cost claim, pinned structurally: an INSERT-ONLY stats
    refresh must cost O(delta) — its plan may not reference the base
    table at all (the retraction-recompute branch is gated on an
    O(touched-groups) check).  Tripwire: delete an ORIGINAL base data
    file after the append; the change-feed read touches only the delta
    files, so the refresh succeeds iff no base scan is even
    constructed — before the r13 fix this died at analysis with
    PATH_NOT_FOUND."""
    import os

    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    st.commit(_kv(spark, [(i, f"g{i % 3}", float(i)) for i in range(9)]), base)
    mv.create_stats_view(spark, base, view, ["grp"], "v")
    st.commit(
        _kv(spark, [(100, "g0", 50.0), (101, "g1", -7.0)]),
        base,
        mode="append",
    )

    victim = os.path.join(base, st._read_manifest(base, 0)["files"][0])
    os.remove(victim)  # any base reference now fails loudly

    mv.refresh_stats_view(spark, base, view, ["grp"], "v", row_key="rk")
    got = _stats_view(spark, view)
    # expected: seed groups g0={0,3,6}, g1={1,4,7}, g2={2,5,8} plus the
    # two inserts — monotonic min/max merge, signed count/sum deltas
    assert got["g0"] == (4, 4, 59_000_000, 0.0, 50.0)
    assert got["g1"] == (4, 4, 5_000_000, -7.0, 7.0)
    assert got["g2"] == (3, 3, 15_000_000, 2.0, 8.0)

    # a NULL-valued insert is still insert-only (no extreme can move)
    st.commit(_kv(spark, [(102, "g2", None)]), base, mode="append")
    mv.refresh_stats_view(spark, base, view, ["grp"], "v", row_key="rk")
    assert _stats_view(spark, view)["g2"] == (4, 3, 15_000_000, 2.0, 8.0)


def test_stats_refresh_frees_checkpoint_blocks(spark, tmp_path):
    """The deltas localCheckpoint must not leak storage: each refresh
    attempt persists one small RDD, and the refresh frees it once the
    commit (or conflict) has consumed it.  Before the r14 fix, blocks
    lingered until driver GC — one extra copy per CommitConflict
    retry."""
    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    st.commit(_kv(spark, [(i, f"g{i % 3}", float(i)) for i in range(9)]), base)
    mv.create_stats_view(spark, base, view, ["grp"], "v")

    jsc = spark.sparkContext._jsc.sc()
    before = {info.id() for info in jsc.getRDDStorageInfo()}
    for j in range(3):
        st.commit(
            _kv(spark, [(100 + j, "g0", 50.0 + j)]), base, mode="append"
        )
        mv.refresh_stats_view(spark, base, view, ["grp"], "v", row_key="rk")
    after = {info.id() for info in jsc.getRDDStorageInfo()}
    assert after - before == set(), (
        "refresh_stats_view leaked localCheckpoint blocks"
    )
    assert _stats_view(spark, view) == _recompute_stats(spark, base)


def test_insert_only_refresh_over_optimized_base_stays_o_changes(
    spark, tmp_path
):
    """Tripwire for the OPTIMIZE stats-inheritance change (r13): after a
    compact + Z-order rewrite of the base, an insert-only refresh must
    STILL cost O(changes) — its plan may not reference any base file,
    including the rewrite's own output files.  Technique as the r13
    O(base) find: delete a base data file the plan must not need and
    let any accidental reference fail loudly at analysis."""
    import os

    base, view = str(tmp_path / "obase"), str(tmp_path / "oview")
    st.commit(
        _kv(spark, [(i, f"g{i % 3}", float(i)) for i in range(12)]),
        base,
        stats_cols=["rk"],
    )
    mv.create_stats_view(spark, base, view, ["grp"], "v")

    # the rewrites the r13 change touched: bin-pack then Z-order
    st.compact(spark, base, target_files=2)
    st.optimize_zorder(spark, base, ["v"], target_files=2)
    # a refresh whose feed spans the rewrites: key cancellation makes
    # the net change empty, and the view must still equal recompute
    mv.refresh_stats_view(spark, base, view, ["grp"], "v", row_key="rk")
    assert mv.maintained_base_version(view) == st.current_version(base)
    assert _stats_view(spark, view) == _recompute_stats(spark, base)

    # now the probe: append after OPTIMIZE, delete one of the
    # OPTIMIZE's output files — the insert-only refresh reads only the
    # append delta, so it succeeds iff no base scan is constructed
    st.commit(
        _kv(spark, [(200, "g0", 99.0), (201, "g1", -3.0)]),
        base,
        mode="append",
    )
    opt_head = st.current_version(base) - 1  # the zorder commit
    victim = os.path.join(base, st._read_manifest(base, opt_head)["files"][0])
    os.remove(victim)

    mv.refresh_stats_view(spark, base, view, ["grp"], "v", row_key="rk")
    got = _stats_view(spark, view)
    # seed g0={0,3,6,9}, g1={1,4,7,10}, g2={2,5,8,11} plus the inserts
    assert got["g0"] == (5, 5, 117_000_000, 0.0, 99.0)
    assert got["g1"] == (5, 5, 19_000_000, -3.0, 10.0)
    assert got["g2"] == (4, 4, 26_000_000, 2.0, 11.0)


def test_stats_refresh_tracks_file_pruned_merges(spark, tmp_path):
    """IVM over the file-pruned MERGE: a covered base's merge rewrites
    only candidate files, so the change feed the refresh consumes is
    the candidates' diff — updates (incl. extreme retractions) and
    inserts must still reconcile the view exactly against recompute."""
    base, view = str(tmp_path / "pbase"), str(tmp_path / "pview")
    st.commit(
        _kv(spark, [(i, f"g{i % 3}", float(i)) for i in range(30)]),
        base,
        stats_cols=["rk"],
    )
    mv.create_stats_view(spark, base, view, ["grp"], "v")

    # extreme-mover update (retraction path), tight-hull update, and a
    # pure-insert merge (hull outside every file)
    for batch in (
        [(29, "g2", -5.0)],            # retract g2's max
        [(3, "g0", 100.0)],            # push g0's max up
        [(500, "g1", 7.5), (501, "g2", None)],  # pure insert, one NULL
    ):
        st.merge_upsert(_kv(spark, batch), base, key="rk")
        mv.refresh_stats_view(spark, base, view, ["grp"], "v", row_key="rk")
        assert _stats_view(spark, view) == _recompute_stats(spark, base)
    assert mv.maintained_base_version(view) == st.current_version(base)


def test_retraction_refresh_still_recomputes_touched_groups(spark, tmp_path):
    """The other side of the gate: a delta WITH a retraction must still
    run the recompute fallback and surface the runner-up extreme."""
    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    st.commit(
        _kv(spark, [(1, "a", 1.0), (2, "a", 9.0), (3, "b", 4.0)]), base
    )
    mv.create_stats_view(spark, base, view, ["grp"], "v")
    # retract group a's max via upsert (update_preimage retraction)
    st.merge_upsert(_kv(spark, [(2, "a", 5.0)]), base, key="rk")
    mv.refresh_stats_view(spark, base, view, ["grp"], "v", row_key="rk")
    got = _stats_view(spark, view)
    assert got["a"] == (2, 2, 6_000_000, 1.0, 5.0)  # max fell 9 -> 5
    assert got == _recompute_stats(spark, base)

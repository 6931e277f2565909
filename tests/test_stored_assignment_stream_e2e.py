"""Streaming stored-assignment ingest, end-to-end — the S7 x X3
composition VERDICT r9 named as the last untested one.

tests/test_stored_assignment_e2e.py pins the ingest-ONCE shape; at
100 TB the corpus doesn't arrive once — it streams in.  The deployment
topology under test:

- raw embeddings land in an ACID snapshot table (S7), commit by commit
- the ``snapshot_table`` streaming source turns each commit into a
  micro-batch (changelog-fed, no rescans)
- ``foreachBatch`` quantizes ONLY the increment against the FROZEN
  centroids (``ivf_assign`` — train once, assign forever) and appends
  (vec_id, embedding, cid) to the assignment table via the idempotent
  epoch-keyed commit (``txn=``), so a replayed epoch can't double-write

Pinned properties:

- incremental identity: after N raw commits, the streamed assignment
  table == one-shot ``ivf_assign`` over the full corpus, and
  stored-assignment ``ivf_topk`` / ``ivf_cell_pairs`` over it == the
  inline-quantization path
- exactly-once growth: every raw commit yields its rows exactly once
  (count == distinct vec_id count == raw corpus size at each step)
- restart safety: the consumer is STOPPED while a raw commit lands,
  then restarted on the same checkpoint — it catches up from the
  committed offset without dropping or double-assigning rows (the
  epoch-keyed ``txn`` absorbs any replayed batch)

Reference parity anchor: the reference has no vector path at all — this
is §2 X3 extension surface (SURVEY.md §2.5) composed with S7.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from foglamp_filter_python35_spark.catalog import load
from foglamp_filter_python35_spark.functions import similarity as S
from foglamp_filter_python35_spark.sources import snapshot_table as st
from foglamp_filter_python35_spark.sources.snapshot_source import (
    SnapshotTableDataSource,
)

_SF = "/root/testdata/sf0.001"  # 500 embedding rows
_K_CELLS = 16
_THRESHOLD = 0.4
_QUERY_ID = 7
_SLICES = ((None, 200), (200, 350), (350, None))  # three raw commits


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(SnapshotTableDataSource)


def _slice(emb, lo, hi):
    cond = F.lit(True)
    if lo is not None:
        cond = cond & (F.col("vec_id") >= lo)
    if hi is not None:
        cond = cond & (F.col("vec_id") < hi)
    return emb.filter(cond)


def _ann_rows(spark, ann_path: str) -> int:
    try:
        return st.read_snapshot(spark, ann_path).count()
    except FileNotFoundError:
        return 0


def _wait_rows(spark, ann_path: str, want: int) -> None:
    # generous: on a heavily co-tenanted box a single micro-batch
    # (assign + snapshot commit) has been observed to stall past 90s
    # (r12 full-suite flake); the loop exits as soon as rows land
    deadline = time.time() + 240
    while time.time() < deadline:
        if _ann_rows(spark, ann_path) == want:
            return
        time.sleep(0.25)
    raise AssertionError(
        f"assignment table stuck at {_ann_rows(spark, ann_path)} rows, "
        f"want {want}"
    )


@pytest.mark.slow
def test_streamed_assignment_matches_one_shot_ingest(spark, tmp_path):
    raw_path = str(tmp_path / "raw_embeddings")
    ann_path = str(tmp_path / "ann")
    ck = str(tmp_path / "ck")

    emb = load(spark, _SF, "embeddings").select("vec_id", "embedding")
    slices = [_slice(emb, lo, hi) for lo, hi in _SLICES]
    counts = [s.count() for s in slices]
    assert all(counts) and sum(counts) == emb.count()

    # raw v0 lands; centroids are trained ONCE on it and frozen — the
    # production shape (retraining per increment would re-assign the
    # whole corpus, which is exactly what the stored path avoids)
    st.commit(slices[0], raw_path)
    cents = S.seed_centroids(slices[0], _K_CELLS).localCheckpoint()

    def assign_increment(batch_df, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        inc = batch_df.select("vec_id", "embedding")
        assigned = inc.join(S.ivf_assign(inc, cents), "vec_id")
        st.commit(
            assigned, ann_path, mode="append", txn=f"ann:{epoch_id}"
        )

    def start_stream():
        return (
            spark.readStream.format("snapshot_table")
            .option("path", raw_path)
            .load()
            .writeStream.foreachBatch(assign_increment)
            .option("checkpointLocation", ck)
            .start()
        )

    # v0 arrives as the initial snapshot micro-batch, waited out so
    # micro-batch boundaries (and therefore the exactly-once row
    # counts) are deterministic
    q = start_stream()
    try:
        _wait_rows(spark, ann_path, counts[0])
    finally:
        q.stop()

    # the consumer is DOWN while the corpus grows — the production
    # failure shape; restart on the same checkpoint must catch up from
    # the committed offset, neither dropping v1 nor replaying v0
    st.commit(slices[1], raw_path, mode="append")
    q = start_stream()
    try:
        _wait_rows(spark, ann_path, counts[0] + counts[1])
        st.commit(slices[2], raw_path, mode="append")
        _wait_rows(spark, ann_path, sum(counts))
    finally:
        q.stop()

    tbl = st.read_snapshot(spark, ann_path)
    # exactly-once: no duplicate assignments across increments
    assert tbl.select("vec_id").distinct().count() == sum(counts)

    # incremental identity: streamed assignment == one-shot ivf_assign
    # over the full corpus with the same frozen centroids
    one_shot = {
        (r.vec_id, r.cid) for r in S.ivf_assign(emb, cents).collect()
    }
    streamed = {
        (r.vec_id, r.cid)
        for r in tbl.select("vec_id", "cid").collect()
    }
    assert streamed == one_shot

    # and the stored-assignment query paths serve from it, identical to
    # inline quantization (zero quantization work per query — plan gate
    # pinned in the batch e2e twin)
    stored_emb = tbl.select("vec_id", "embedding")
    stored_assign = tbl.select("vec_id", "cid")
    inline_topk = [
        (r.vec_id, r.score)
        for r in S.ivf_topk(emb, cents, query_id=_QUERY_ID, k=5).collect()
    ]
    stored_topk = [
        (r.vec_id, r.score)
        for r in S.ivf_topk(
            stored_emb, None, query_id=_QUERY_ID, k=5, assign=stored_assign
        ).collect()
    ]
    assert inline_topk == stored_topk and len(stored_topk) == 5

    inline_pairs = {
        (r.id_a, r.id_b)
        for r in S.ivf_cell_pairs(emb, cents, _THRESHOLD).collect()
    }
    stored_pairs = {
        (r.id_a, r.id_b)
        for r in S.ivf_cell_pairs(
            stored_emb, None, _THRESHOLD, assign=stored_assign
        ).collect()
    }
    assert stored_pairs == inline_pairs and stored_pairs

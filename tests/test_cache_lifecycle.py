"""Registered cached intermediates are released, not accumulated.

Round-4 advice: `ivf_topk*`, `minhash_accuracy`, `source_vocab_divergence`
and `bloom_filter_audit` persist a shared intermediate and never
unpersisted it, so a long interactive session accumulated executor
storage until LRU eviction.  Every persist now routes through
``functions.cache.register`` and ``cache.release()`` frees them all —
asserted here via the JVM cache manager across repeated calls.
"""


from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from foglamp_filter_python35_spark.functions import cache
from foglamp_filter_python35_spark.functions import similarity as S


def _cached_ids(spark) -> set[int]:
    """Ids of currently persisted RDDs.  Tests compare ID SETS, not
    counts: localCheckpoint blocks from EARLIER tests (CC star keeps
    them until the async ContextCleaner collects the JVM RDD — measured:
    neither DataFrame.unpersist nor an explicit GC frees them promptly)
    can be cleaned at any moment, so a raw count can legitimately DROP
    mid-test; what must never happen is a NEW id surviving release."""
    it = spark.sparkContext._jsc.getPersistentRDDs().keySet().iterator()  # noqa: SLF001
    ids = set()
    while it.hasNext():
        ids.add(it.next())
    return ids


def _emb(spark):
    rows = [(i, [float((i * 7 + d) % 5) - 2.0 for d in range(4)]) for i in range(40)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _centroids(spark):
    rows = [(c, [float(c + d) for d in range(4)]) for c in range(3)]
    return spark.createDataFrame(rows, "cid long, cv array<double>")


@pytest.mark.slow
def test_repeated_ivf_calls_do_not_accumulate_cached_rdds(spark):
    cache.release()
    base = _cached_ids(spark)
    emb, cents = _emb(spark), _centroids(spark)
    for qid in (0, 1, 2):
        S.ivf_topk(emb, cents, query_id=qid, k=3).collect()
        S.ivf_topk_multiprobe(emb, cents, query_id=qid, k=3, nprobe=2).collect()
        n = cache.release()
        assert n >= 2  # both calls registered their assignment frames
        assert _cached_ids(spark) - base == set(), (
            "cache manager grew across released ivf calls"
        )


@pytest.mark.slow
def test_release_before_action_is_correctness_safe(spark):
    """Unpersisting a registered frame BEFORE its plan's action runs must
    not change results — the shared subtree just recomputes."""
    emb, cents = _emb(spark), _centroids(spark)
    plan = S.ivf_topk(emb, cents, query_id=5, k=3)
    cache.release()  # released before the action
    eager = S.ivf_topk(emb, cents, query_id=5, k=3).collect()
    cache.release()
    assert plan.collect() == eager


def test_register_returns_same_frame_and_release_counts(spark):
    df = spark.range(10).withColumn("x", F.col("id") * 2)
    out = cache.register(df)
    assert out is df
    assert df.storageLevel.useMemory
    assert cache.release() == 1
    assert not df.storageLevel.useMemory
    assert cache.release() == 0  # registry cleared


def test_concurrent_register_release_drops_nothing(spark):
    """Round-5 advice: a register() landing between release()'s iterate
    and clear() was dropped without unpersist, and two concurrent
    release() calls could double-unpersist.  The registry now swaps the
    list under a lock: with REAL threads hammering register and release
    concurrently, every registered frame is eventually unpersisted
    (releases are exhaustive) and the total released count equals the
    total registered count (no frame freed twice or lost)."""
    import threading

    cache.release()
    base = _cached_ids(spark)
    n_threads, per_thread = 4, 8
    released = []
    barrier = threading.Barrier(n_threads * 2)

    def registrar(t: int) -> None:
        barrier.wait()
        for i in range(per_thread):
            cache.register(
                spark.range(5 + t * per_thread + i).selectExpr("id * 2 AS x")
            )

    def releaser() -> None:
        barrier.wait()
        for _ in range(per_thread):
            released.append(cache.release())

    threads = [
        threading.Thread(target=registrar, args=(t,)) for t in range(n_threads)
    ] + [threading.Thread(target=releaser) for _ in range(n_threads)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    released.append(cache.release())  # drain anything the racers left

    assert sum(released) == n_threads * per_thread
    assert _cached_ids(spark) - base == set(), (
        "a registered frame leaked unpersisted"
    )

"""Explicit lifecycle for persisted intermediates.

A handful of catalog queries persist a shared intermediate (IVF cell
assignments, MinHash doc-set frames, tokenized corpora) because it
feeds several consumers within one returned plan.  The persist is lazy
— no job at plan-build time — but Spark's cache manager holds the
cached partitions until an explicit ``unpersist``, so a long-lived
interactive session running many catalog queries would accumulate
storage until LRU eviction.

Every such persist in this package is registered here, and callers
that complete an action (``bench.py``, the CLI ``check`` command,
tests) call :func:`release` afterwards.  Releasing is always safe:
unpersisting before a plan's action simply makes the shared subtree
recompute per consumer — correctness is unaffected.

At 100 TB the registered frames are stored tables (cell-assignment
columns, shingle tables), not per-query caches; this registry is the
interactive-session analog of that storage lifecycle (see SCALE.md).
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_ACTIVE: list[DataFrame] = []
_LOCK = threading.Lock()


def register(df: DataFrame) -> DataFrame:
    """Persist ``df`` (lazily) and track it for spec-level cleanup."""
    df.persist()
    with _LOCK:
        _ACTIVE.append(df)
    return df


def release(blocking: bool = True) -> int:
    """Unpersist every registered frame; returns how many were held.

    ``blocking=True`` waits for block removal so tests can assert the
    cache manager is empty immediately after the call.

    The registry swap happens under a lock so a ``register()`` racing
    with ``release()`` is either drained by this call or left for the
    next one — never dropped without unpersist — and two concurrent
    ``release()`` calls cannot double-unpersist the same frame.
    """
    with _LOCK:
        frames = _ACTIVE[:]
        _ACTIVE.clear()
    for df in frames:
        try:
            df.unpersist(blocking)
        except Exception:  # session already stopped — nothing to free
            pass
    return len(frames)

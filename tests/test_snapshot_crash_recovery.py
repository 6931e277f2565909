"""S7 crash-recovery e2e: a REAL writer process is SIGKILLed between
the data write and the manifest publish (the commit protocol's one
window where durable garbage can exist — data files on disk, no
manifest referencing them).  Previous rounds exercised this window only
by unit-level mocking inside one process; here a subprocess driver with
its own vanilla SparkSession dies by actual SIGKILL — no atexit, no
finally, exactly the failure a preempted executor host or OOM-killed
driver produces — and the parent verifies the ACID contract on the
shared table directory:

- reader isolation: the table stays at the pre-crash version and a
  reader never sees the orphaned files;
- vacuum reclamation: the orphan data files are reclaimable garbage,
  and reclaiming them does not disturb any committed snapshot;
- idempotent retry: re-running the dead writer's logical commit (same
  ``txn``) lands exactly once.

Reference parity anchor: the reference degrades a failed filter call by
logging + passing data through (python35_filter.cpp:263-301); the
storage-layer analog at 100 TB is "a dead writer must never corrupt or
partially expose a table".
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import textwrap
import time

import pytest

from foglamp_filter_python35_spark.sources import snapshot_table as st

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The child: vanilla SparkSession, one clean commit, then a second
# commit whose publish step is replaced by SIGKILL-self AFTER the data
# write has hit disk.  It records its JVM pid first so the parent can
# reap the orphaned gateway (SIGKILL gives py4j no chance to shut it
# down — that leak is part of the crash being simulated).
_CHILD = textwrap.dedent(
    """
    import os, signal, sys

    sys.path.insert(0, {repo!r})
    from pyspark.sql import SparkSession

    from foglamp_filter_python35_spark.sources import snapshot_table as st

    table, marker = sys.argv[1], sys.argv[2]
    spark = (
        SparkSession.builder.master("local[2]")
        .appName("crash-writer")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    jvm_pid = spark._jvm.java.lang.ProcessHandle.current().pid()

    df = spark.range(0, 10).withColumnRenamed("id", "k")
    v0 = st.commit(df, table, txn="epoch-0")
    assert v0 == 0

    real_publish = st._publish

    def die_before_publish(*args, **kwargs):
        # the data write in commit() has already completed; dying here
        # leaves orphan parquet with no manifest — the crash window
        with open(marker, "w") as fh:
            fh.write(f"{{jvm_pid}}\\nABOUT_TO_DIE")
            fh.flush()
            os.fsync(fh.fileno())
        os.kill(os.getpid(), signal.SIGKILL)

    st._publish = die_before_publish
    st.commit(
        spark.range(10, 20).withColumnRenamed("id", "k"), table, txn="epoch-1"
    )
    raise SystemExit("unreachable: SIGKILL did not fire")
    """
)


def _commit_dirs(table: str) -> set[str]:
    ddir = os.path.join(table, "data")
    return set(os.listdir(ddir)) if os.path.isdir(ddir) else set()


@pytest.mark.slow
def test_sigkill_between_data_write_and_publish(spark, tmp_path):
    table = str(tmp_path / "tbl")
    marker = str(tmp_path / "marker")
    script = tmp_path / "crash_writer.py"
    script.write_text(_CHILD.format(repo=_REPO))

    env = {**os.environ, "PYTHONPATH": _REPO}
    proc = subprocess.run(
        [sys.executable, str(script), table, marker],
        env=env,
        timeout=300,
        capture_output=True,
        text=True,
    )
    jvm_pid = None
    try:
        # the child must have died by SIGKILL, after the crash window
        # marker was durably written
        assert proc.returncode == -signal.SIGKILL, proc.stderr[-2000:]
        lines = open(marker).read().splitlines()
        jvm_pid = int(lines[0])
        assert lines[1] == "ABOUT_TO_DIE"

        # --- on-disk state: v0 committed, epoch-1's data orphaned ---
        assert st.current_version(table) == 0
        dirs = _commit_dirs(table)
        v0_files = st._read_manifest(table, 0)["files"]
        live_dirs = {f.split(os.sep)[1] for f in v0_files}
        orphan_dirs = dirs - live_dirs
        assert len(orphan_dirs) == 1  # the dead writer's data write
        orphan = next(iter(orphan_dirs))
        assert st._list_parquet(os.path.join(table, "data", orphan))

        # --- reader isolation: the orphan is invisible ---
        assert sorted(
            r["k"] for r in st.read_snapshot(spark, table).collect()
        ) == list(range(10))
        assert st._txn_version(table, "epoch-1") is None
        assert len(st.history(table)) == 1

        # --- vacuum reclaims the orphan, committed data untouched ---
        deleted = st.vacuum(table)
        assert deleted, "vacuum must reclaim the orphaned files"
        assert all(os.sep + orphan + os.sep in p for p in deleted)
        assert orphan not in _commit_dirs(table)
        assert sorted(
            r["k"] for r in st.read_snapshot(spark, table).collect()
        ) == list(range(10))

        # --- the retried logical commit lands exactly once ---
        retry_df = spark.range(10, 20).withColumnRenamed("id", "k")
        v1 = st.commit(retry_df, table, txn="epoch-1")
        assert v1 == 1
        # a second replay of the same epoch is a no-op (exactly-once)
        assert st.commit(retry_df, table, txn="epoch-1") == 1
        assert sorted(
            r["k"] for r in st.read_snapshot(spark, table).collect()
        ) == list(range(20))
    finally:
        # reap the dead child's orphaned JVM gateway (SIGKILL means
        # py4j never got to stop it)
        if jvm_pid is not None:
            try:
                os.kill(jvm_pid, signal.SIGKILL)
                deadline = time.monotonic() + 10
                while time.monotonic() < deadline:
                    try:
                        os.kill(jvm_pid, 0)
                        time.sleep(0.2)
                    except ProcessLookupError:
                        break
            except ProcessLookupError:
                pass

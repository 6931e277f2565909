"""G34/T10 crash-recovery e2e: a REAL streaming driver is SIGKILLed
MID-TRIGGER on an ``applyInPandasWithState`` deadband stream, then the
query is restarted from its checkpoint — the last exactly-once claim
whose failure mode was previously only unit-tested (r11 verdict stretch
ask).

The child process runs a file-source -> stream_deadband -> parquet-sink
query with its own vanilla SparkSession.  A poison ``mapInPandas``
stage writes a kill marker the moment the THIRD micro-batch's rows
enter the trigger and then stalls the batch; a watchdog thread SIGKILLs
the driver within ~50 ms — no atexit, no finally, exactly what an
OOM-killed driver produces.  The parent then verifies:

- sink isolation at the crash point: the parquet sink's metadata log
  exposes exactly the two committed micro-batches, none of the
  in-flight batch's rows, and equals the batch deadband over the
  committed prefix;
- checkpoint recovery: a restarted query (new driver — the parent's
  session) replays the in-flight batch from the WAL offsets with the
  deadband state recovered from the state store, so the final sink
  equals the batch operator over the full input;
- no duplicate emission: ids in the sink are unique (the replayed
  batch lands exactly once).

Reference parity anchor: the reference's filter chain is restarted by
the service supervisor after a crash and must not re-emit readings it
already forwarded (plugin.cpp:226-352's ingest contract); the Spark
analog is checkpoint + idempotent sink.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import textwrap
import time
from datetime import datetime, timedelta

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCHEMA = "asset_code string, id long, user_ts timestamp, value double"

_CHILD = textwrap.dedent(
    """
    import os, signal, sys, threading, time

    sys.path.insert(0, {repo!r})
    from pyspark.sql import SparkSession

    from foglamp_filter_python35_spark.streaming.pipeline import (
        stream_deadband,
    )

    src, sink, ckpt, marker, killfile = sys.argv[1:6]
    spark = (
        SparkSession.builder.master("local[2]")
        .appName("crash-stream-driver")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    jvm_pid = spark._jvm.java.lang.ProcessHandle.current().pid()
    with open(marker, "w") as fh:
        fh.write(str(jvm_pid))
        fh.flush()
        os.fsync(fh.fileno())

    def watch():
        while True:
            if os.path.exists(killfile):
                os.kill(os.getpid(), signal.SIGKILL)
            time.sleep(0.05)

    threading.Thread(target=watch, daemon=True).start()

    def poison(batches):
        # executor-side: the moment the third file's rows (id >= 200)
        # enter a trigger, arm the watchdog and stall the batch so the
        # SIGKILL lands MID-trigger, never at a batch boundary
        for pdf in batches:
            if (pdf["id"] >= 200).any():
                with open(killfile, "w") as fh:
                    fh.write("die")
                time.sleep(60)
            yield pdf

    stream = (
        spark.readStream.schema({schema!r})
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stream_deadband(
        stream.mapInPandas(poison, {schema!r}), tolerance=50.0
    )
    q = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.awaitTermination(180)
    raise SystemExit("unreachable: SIGKILL did not fire")
    """
)


def _sink_rows(spark, sink: str) -> list[tuple[int, float]]:
    try:
        return sorted(
            (r.id, r.value)
            for r in spark.read.parquet(sink).collect()
        )
    except Exception:  # empty sink dir before first commit
        return []


@pytest.mark.slow
def test_sigkill_mid_trigger_then_checkpoint_recovery(spark, tmp_path):
    from foglamp_filter_python35_spark.functions.signal import deadband
    from foglamp_filter_python35_spark.streaming.pipeline import (
        stream_deadband,
    )

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    marker = str(tmp_path / "marker")
    killfile = str(tmp_path / "killfile")
    os.makedirs(src)
    t0 = datetime(2024, 1, 1)

    def write(batch: int, vals: list[float]) -> None:
        rows = [
            ("a", batch * 100 + i, t0 + timedelta(minutes=batch * 100 + i), v)
            for i, v in enumerate(vals)
        ]
        spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    # three files = three triggers; deadband(tol=50) emission pattern:
    # b0 [0,100,101] -> 0,100; b1 [102,300] -> 300; b2 [301,500] -> 500
    write(0, [0.0, 100.0, 101.0])
    write(1, [102.0, 300.0])
    write(2, [301.0, 500.0])

    script = tmp_path / "crash_stream_driver.py"
    script.write_text(_CHILD.format(repo=_REPO, schema=_SCHEMA))
    env = {**os.environ, "PYTHONPATH": _REPO}
    proc = subprocess.run(
        [sys.executable, str(script), src, sink, ckpt, marker, killfile],
        env=env,
        timeout=300,
        capture_output=True,
        text=True,
    )
    jvm_pid = None
    try:
        assert proc.returncode == -signal.SIGKILL, proc.stderr[-2000:]
        jvm_pid = int(open(marker).read())
        assert os.path.exists(killfile), "poison batch never entered a trigger"

        # reap the orphaned JVM FIRST: its executor threads may still be
        # holding the stalled batch's tasks
        os.kill(jvm_pid, signal.SIGKILL)
        deadline = time.monotonic() + 10
        while time.monotonic() < deadline:
            try:
                os.kill(jvm_pid, 0)
                time.sleep(0.2)
            except ProcessLookupError:
                break
        jvm_pid = None

        # --- crash-point sink state: exactly the two committed batches,
        # none of the in-flight batch's rows (metadata-log isolation) ---
        committed = _sink_rows(spark, sink)
        prefix = spark.createDataFrame(
            [("a", 0, t0, 0.0), ("a", 1, t0 + timedelta(minutes=1), 100.0),
             ("a", 2, t0 + timedelta(minutes=2), 101.0),
             ("a", 100, t0 + timedelta(minutes=100), 102.0),
             ("a", 101, t0 + timedelta(minutes=101), 300.0)],
            _SCHEMA,
        )
        want_prefix = sorted(
            (r.id, r.value)
            for r in deadband(
                prefix, "value", "asset_code", ["user_ts", "id"], 50.0
            ).collect()
        )
        assert committed == want_prefix  # [0.0, 100.0, 300.0]
        assert all(i < 200 for i, _ in committed)

        # --- restart from the checkpoint: a NEW driver (this session)
        # replays the in-flight batch with recovered deadband state ---
        def passthrough(batches):
            yield from batches

        stream = (
            spark.readStream.schema(_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out = stream_deadband(
            stream.mapInPandas(passthrough, _SCHEMA), tolerance=50.0
        )
        q = (
            out.writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        got = _sink_rows(spark, sink)
        want = sorted(
            (r.id, r.value)
            for r in deadband(
                spark.read.parquet(src),
                "value", "asset_code", ["user_ts", "id"], 50.0,
            ).collect()
        )
        # stream == batch across the crash/restart boundary: 301 must
        # stay suppressed against the RECOVERED last-emitted 300, and
        # the replayed batch must land exactly once
        assert got == want
        assert [v for _, v in got] == [0.0, 100.0, 300.0, 500.0]
        ids = [i for i, _ in got]
        assert len(ids) == len(set(ids)), "duplicate emission after replay"
    finally:
        if jvm_pid is not None:
            try:
                os.kill(jvm_pid, signal.SIGKILL)
            except ProcessLookupError:
                pass

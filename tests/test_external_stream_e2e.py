"""External unbounded source -> registered transforms -> snapshot sink.

The Kafka reader is environment-gated (no connector jar in this
container), so these are the LIVE analogs of that S1 variant:

* a real localhost TCP server driven through the socket source — the
  full network-ingest -> registered filter -> ACID sink path executes
  end-to-end;
* the rate source (replayable offsets, like Kafka's) restarted from its
  checkpoint mid-stream — the snapshot table must hold every generated
  row exactly once across the restart (epoch-keyed idempotent commits
  absorb the replayed epoch).
"""

from __future__ import annotations

import json
import socket
import threading
import time

import pytest

from foglamp_filter_python35_spark.config import FilterConfig
from foglamp_filter_python35_spark.registry import REGISTRY
from foglamp_filter_python35_spark.sources import readers
from foglamp_filter_python35_spark.sources import snapshot_table as st
from foglamp_filter_python35_spark.streaming.pipeline import (
    run_micro_batch_pipeline,
)

import foglamp_filter_python35_spark.operators.readings  # noqa: F401 (registers)


class _LineServer:
    """One-shot localhost TCP server: accepts a single client (the Spark
    socket source) and sends it newline-delimited payloads on demand."""

    def __init__(self) -> None:
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind(("localhost", 0))
        self._srv.listen(1)
        self.port = self._srv.getsockname()[1]
        self._conn: socket.socket | None = None
        self._accepted = threading.Event()
        threading.Thread(target=self._accept, daemon=True).start()

    def _accept(self) -> None:
        self._conn, _ = self._srv.accept()
        self._accepted.set()

    def send_lines(self, lines: list[str], timeout: float = 30.0) -> None:
        assert self._accepted.wait(timeout), "socket source never connected"
        self._conn.sendall(("\n".join(lines) + "\n").encode())

    def close(self) -> None:
        for s in (self._conn, self._srv):
            if s is not None:
                try:
                    s.close()
                except OSError:
                    pass


def _reading_line(i: int) -> str:
    return json.dumps(
        {
            "id": i,
            "asset_code": f"asset{i % 3}",
            "ts": 1_700_000_000 + i,
            "user_ts": 1_700_000_000 + i,
            "reading": {"value": float(i)},
            "reading_str": {},
        }
    )


def _scale_stage():
    return REGISTRY.stage(
        "scale",
        FilterConfig("scale", enable=True, params={"scale": 5, "offset": 10}),
    )


def _wait_for(predicate, timeout: float = 60.0, poll: float = 0.5):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        v = predicate()
        if v:
            return v
        time.sleep(poll)
    return None


@pytest.mark.slow
def test_socket_source_through_pipeline_into_snapshot_sink(spark, tmp_path):
    """A real localhost TCP stream (JSONL readings, one malformed line)
    flows through the registered scale filter into the ACID snapshot
    table; the malformed line is dropped by the PERMISSIVE parse."""
    server = _LineServer()
    table = str(tmp_path / "sock_tbl")
    q = None
    try:
        stream = readers.stream_socket_readings(
            spark, "localhost", server.port
        )
        q = run_micro_batch_pipeline(
            stream,
            [_scale_stage()],
            sink=st.snapshot_sink(table, query_name="sock"),
            checkpoint_dir=str(tmp_path / "ck_sock"),
        )
        server.send_lines(
            [_reading_line(i) for i in range(20)] + ["{not json"]
        )

        def landed():
            try:
                return st.read_snapshot(spark, table).count() >= 20
            except FileNotFoundError:
                return False

        assert _wait_for(landed), "socket rows never reached the sink"
    finally:
        if q is not None:
            q.stop()
        server.close()

    snap = st.read_snapshot(spark, table)
    rows = {r["id"]: r for r in snap.collect()}
    assert set(rows) == set(range(20))  # malformed line dropped, no dupes
    for i, r in rows.items():
        assert r["reading"]["value"] == pytest.approx(i * 5 + 10)
        assert r["asset_code"] == f"asset{i % 3}"


@pytest.mark.slow
def test_rate_source_restart_is_exactly_once_into_snapshot_sink(
    spark, tmp_path
):
    """Rate source (replayable offsets — the Kafka-like property) ->
    scale filter -> snapshot sink, STOPPED MID-STREAM and restarted from
    the same checkpoint: the table must hold ids 0..max exactly once —
    nothing lost at the cut, the replayed epoch absorbed by the
    epoch-keyed commit."""
    table = str(tmp_path / "rate_tbl")
    ck = str(tmp_path / "ck_rate")

    def start():
        return run_micro_batch_pipeline(
            readers.stream_rate_readings(spark, rows_per_second=200),
            [_scale_stage()],
            sink=st.snapshot_sink(table, query_name="rate"),
            checkpoint_dir=ck,
        )

    def table_count():
        try:
            return st.read_snapshot(spark, table).count()
        except FileNotFoundError:
            return 0

    q = start()
    assert _wait_for(lambda: table_count() >= 100), "no rows before stop"
    q.stop()
    n_cut = table_count()

    q = start()  # resumes from the checkpointed offset
    assert _wait_for(lambda: table_count() >= n_cut + 100), (
        "no progress after restart"
    )
    q.stop()

    ids = [r["id"] for r in st.read_snapshot(spark, table).collect()]
    assert len(ids) == len(set(ids)), "duplicate rows across restart"
    assert sorted(ids) == list(range(max(ids) + 1)), (
        "gap in the id sequence: rows lost at the restart cut"
    )
    # and the transform really ran on both sides of the restart
    sample = st.read_snapshot(spark, table).limit(5).collect()
    for r in sample:
        assert r["reading"]["value"] == (r["id"] % 500) * 5 + 10

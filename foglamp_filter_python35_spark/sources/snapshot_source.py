"""Spark Data Source for the snapshot table (Python Data Source API,
Spark 4): ``spark.read.format("snapshot_table")`` and
``spark.readStream.format("snapshot_table")`` over a table written by
:mod:`snapshot_table`.

* **Batch**: one input partition per data file, rows produced as Arrow
  RecordBatches (zero row-at-a-time Python).  Missing columns from
  before an additive schema evolution are null-filled to the manifest
  schema.  NOTE: for large tables prefer ``snapshot_table.read_snapshot``
  — it is a native JVM parquet scan; this reader exists so the table
  behaves like any registered format (and to carry options like
  ``version`` for time travel uniformly).
* **Streaming**: the manifest log IS the changelog — each committed
  version is an offset, and a micro-batch is exactly the files ADDED
  between two versions, which makes replay deterministic
  (``readBetweenOffsets``) and delivery exactly-once end-to-end when
  paired with a checkpointed sink.  Non-append commits (overwrite /
  merge rewrites) are rejected unless ``ignoreChanges=true``, the same
  contract Delta's streaming source applies.

The streaming reader uses the Simple (driver-side) API — appropriate
for change-log tailing where a micro-batch is one commit's files; the
batch reader is partition-parallel.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

from foglamp_filter_python35_spark.sources import snapshot_table as st


def _manifest(path: str, version: int) -> dict:
    # route through snapshot_table's reader so batch time travel to a
    # vacuumed version gets the same actionable retention-floor message
    return st._read_manifest(path, version)


def _arrow_batches(file_path: str, schema: StructType):
    """RecordBatches from one parquet file, column-aligned and
    null-filled to the manifest schema."""
    import pyarrow as pa  # noqa: PLC0415
    import pyarrow.parquet as pq  # noqa: PLC0415
    from pyspark.sql.pandas.types import to_arrow_schema  # noqa: PLC0415

    tbl = pq.read_table(file_path)
    arrow_schema = to_arrow_schema(schema)
    n = tbl.num_rows
    cols = [
        tbl.column(field.name).cast(field.type)
        if field.name in tbl.column_names
        else pa.nulls(n, type=field.type)
        for field in arrow_schema
    ]
    aligned = pa.table(cols, schema=arrow_schema)
    yield from aligned.to_batches(max_chunksize=10_000)


class _FilePartition(InputPartition):
    def __init__(self, file_path: str) -> None:
        self.file_path = file_path


class _SnapshotBatchReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict) -> None:
        self._schema = schema
        self._path = options["path"]
        self._version = (
            int(options["version"]) if "version" in options else None
        )

    def partitions(self) -> list[InputPartition]:
        v = (
            st.current_version(self._path)
            if self._version is None
            else self._version
        )
        if v is None:
            return []
        m = _manifest(self._path, v)
        return [
            _FilePartition(os.path.join(self._path, f))
            for f in m["files"]
        ]

    def read(self, partition: _FilePartition):
        yield from _arrow_batches(partition.file_path, self._schema)


class _SnapshotStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict) -> None:
        self._schema = schema
        self._path = options["path"]
        self._ignore_changes = (
            str(options.get("ignorechanges", "false")).lower() == "true"
        )

    def initialOffset(self) -> dict:
        return {"version": -1}

    def _added_files(self, sv: int, ev: int) -> list[str]:
        files: list[str] = []
        prev: dict | None = None  # v-1's manifest from the last iteration
        for v in range(sv + 1, ev + 1):
            try:
                m = _manifest(self._path, v)
            except FileNotFoundError:
                # the log-retention floor: vacuum(keep_versions=K)
                # expired this manifest while the stream's checkpoint
                # still pointed below it — fail with the contract
                # spelled out instead of a bare open() error (the same
                # treatment materialized_view._maintained_base_at got)
                raise FileNotFoundError(
                    f"{self._path!r}: manifest v{v} was expired by "
                    f"vacuum while this stream's checkpoint lagged at "
                    f"v{sv} (the retention-vs-streaming contract in "
                    f"snapshot_table.vacuum) — size keep_versions above "
                    f"the stream's maximum checkpoint lag, and re-seed "
                    f"this stream from a fresh batch read"
                ) from None
            if v == 0 or m["parent"] is None:
                added = m["files"]
            else:
                # the walk is contiguous (parent is always v-1), so the
                # previous iteration's manifest serves as the parent —
                # halving the driver-side metadata reads of a long
                # offset-window replay; only the FIRST iteration (or a
                # non-linear parent, which this log never produces)
                # pays a read, and only that read can sit below the
                # retention floor
                if prev is not None and m["parent"] == v - 1:
                    parent_files = set(prev["files"])
                else:
                    try:
                        parent_files = set(
                            _manifest(self._path, m["parent"])["files"]
                        )
                    except FileNotFoundError:
                        parent_files = None
                if m["operation"] == "append":
                    if parent_files is None:
                        # without the parent list an append's new files
                        # are unidentifiable, and over-delivering would
                        # break append-only exactly-once: the curated
                        # retention error, naming the parent
                        raise FileNotFoundError(
                            f"{self._path!r}: manifest v{m['parent']} "
                            f"(parent of v{v}) was expired by vacuum "
                            f"while this stream's checkpoint lagged at "
                            f"v{sv} (the retention-vs-streaming contract "
                            f"in snapshot_table.vacuum) — size "
                            f"keep_versions above the stream's maximum "
                            f"checkpoint lag, and re-seed this stream "
                            f"from a fresh batch read"
                        ) from None
                    added = [f for f in m["files"] if f not in parent_files]
                elif self._ignore_changes:
                    # rewrite commit: re-deliver the files it actually
                    # produced (for a partial rewrite like a file-pruned
                    # MERGE that is just the rewritten candidates; a
                    # full overwrite re-delivers everything) — the
                    # documented ignoreChanges tradeoff.  A vacuumed
                    # parent degrades to the full file set: MORE
                    # re-delivery, still inside the same contract,
                    # never a crash on a previously-working resume
                    if parent_files is None:
                        added = m["files"]
                    else:
                        added = [
                            f for f in m["files"] if f not in parent_files
                        ]
                else:
                    raise ValueError(
                        f"version {v} is a {m['operation']!r} commit; "
                        "streaming a rewritten table re-delivers rows — "
                        "pass ignoreChanges=true to accept that"
                    )
            files.extend(added)
            prev = m
        return files

    def _rows(self, files: list[str]) -> list[tuple]:
        # materialized (not a generator): the Simple stream API pickles
        # the rows for its prefetch cache — driver-side by design, sized
        # to one commit's files per micro-batch
        import pyarrow.parquet as pq  # noqa: PLC0415

        names = [f.name for f in self._schema.fields]
        out: list[tuple] = []
        for rel in files:
            try:
                tbl = pq.read_table(os.path.join(self._path, rel))
            except FileNotFoundError:
                # a vacuum won the race between the manifest-diff scan
                # and this read: the replayed offset window's data file
                # is gone — same retention contract, same actionable
                # error (loud, never silent row loss)
                raise FileNotFoundError(
                    f"{self._path!r}: data file {rel!r} was vacuumed "
                    f"while the stream replayed an old offset window "
                    f"(the retention-vs-streaming contract in "
                    f"snapshot_table.vacuum) — size keep_versions above "
                    f"the stream's maximum checkpoint lag, and re-seed "
                    f"this stream from a fresh batch read"
                ) from None
            have = set(tbl.column_names)
            cols = [
                tbl.column(n).to_pylist() if n in have else [None] * tbl.num_rows
                for n in names
            ]
            out.extend(zip(*cols))
        return out

    def read(self, start: dict):
        # a LIST iterator specifically: the engine's prefetch cache both
        # copy.copy()s it (generators can't) and next()s it (lists can't)
        cur = st.current_version(self._path)
        sv = start["version"]
        if cur is None or cur <= sv:
            return iter([]), start
        return (
            iter(self._rows(self._added_files(sv, cur))),
            {"version": cur},
        )

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return iter(
            self._rows(self._added_files(start["version"], end["version"]))
        )

    def commit(self, end: dict) -> None:
        pass  # offsets are durable in the manifest log itself


class SnapshotTableDataSource(DataSource):
    """``format("snapshot_table")`` — options: ``path`` (required),
    ``version`` (batch time travel), ``ignoreChanges`` (streaming)."""

    @classmethod
    def name(cls) -> str:
        return "snapshot_table"

    def schema(self) -> StructType:
        path = self.options["path"]
        v = (
            int(self.options["version"])
            if "version" in self.options
            else st.current_version(path)
        )
        if v is None:
            raise FileNotFoundError(f"no committed version at {path!r}")
        return StructType.fromJson(_manifest(path, v)["schema"])

    def reader(self, schema: StructType) -> DataSourceReader:
        return _SnapshotBatchReader(schema, dict(self.options))

    def simpleStreamReader(
        self, schema: StructType
    ) -> SimpleDataSourceStreamReader:
        return _SnapshotStreamReader(schema, dict(self.options))

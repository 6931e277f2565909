"""Incremental materialized-view maintenance over the snapshot table's
change feed.

The capability that makes a 100 TB lakehouse usable interactively: a
grouped aggregate (per-key row count + sum) kept current by applying the
CDF DELTA between two base-table versions, instead of rescanning the
base.  Count and sum are self-maintainable aggregates — each change row
contributes a signed unit: ``insert``/``update_postimage`` add, ``delete``/
``update_preimage`` subtract — so the refresh cost is O(changed rows +
touched groups), independent of base-table size.  This is the classic
incremental view maintenance (IVM) algorithm (counting algorithm for
distributive aggregates), the same machinery behind Delta Live Tables /
Materialize-style view upkeep.

Determinism: the view stores the sum as a QUANTIZED INTEGER
(``floor(v * 1e6 + 0.5)`` summed as BIGINT — the catalog's ``dsum``
policy), so delta application is exact integer arithmetic and an
incrementally maintained view is BIT-IDENTICAL to a full recompute, in
any refresh order.  The maintained base version rides the view table's
idempotent-commit marker (``txn = "ivm@{base_version}"``), which makes
``refresh`` itself exactly-once: a crashed-and-replayed refresh of the
same base version is a no-op.

Reference framing: the reference buffers readings across calls for
aggregation (plugin.cpp:113-116); this is that contract at table scale —
the aggregate survives restarts and advances by deltas.

NULL measures follow SQL semantics exactly.  The view carries a third
self-maintainable aggregate, ``n_vals`` (count of NON-NULL values): a
NULL measure contributes a signed unit to ``n_rows`` but zero to both
``n_vals`` and the stored sum, and the readers decode ``value_sum`` as
NULL precisely when ``n_vals = 0`` — SQL's "SUM over no values is
NULL" convention, maintained incrementally (the stored ``sum_q`` is
kept 0-based so delta application stays pure integer arithmetic).
MIN/MAX in the stats view ignore NULLs natively on every path (initial
build, monotonic insert merge, and the retraction recompute all use
``F.min``/``F.max``, which skip NULLs), so an all-NULL group surfaces
NULL extremes just as SQL would.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from foglamp_filter_python35_spark.sources import snapshot_table as st

_Q = 1_000_000  # sum quantization: exact for |sum| < 2^63 / 1e6


def _qsum(col: str):
    # 0-based (not SQL-NULL) so signed-delta merges stay pure integer
    # arithmetic; the NULL surface is reconstructed at read time from
    # n_vals (see read_agg_view / read_stats_view).
    return F.coalesce(
        F.sum(
            F.floor(F.col(col) * F.lit(float(_Q)) + F.lit(0.5)).cast("bigint")
        ),
        F.lit(0).cast("bigint"),
    )


def _decode_sum(df: DataFrame) -> DataFrame:
    """Decode the quantized sum, surfacing SQL NULL-sum semantics:
    ``value_sum`` is NULL iff the group holds no non-NULL values."""
    return df.withColumn(
        "value_sum",
        F.when(
            F.col("n_vals") > 0,
            F.col("sum_q").cast("double") / F.lit(float(_Q)),
        ),
    )


def _require_ivm_schema(
    df: DataFrame, view_path: str, rebuild: str
) -> DataFrame:
    """Catch stored views written by the pre-``n_vals`` version of this
    module with an actionable error (the raw alternative is an
    UNRESOLVED_COLUMN AnalysisException deep inside the merge plan)."""
    if "n_vals" not in df.columns:
        raise ValueError(
            f"{view_path!r} predates NULL-sum maintenance (stored columns"
            f" {df.columns} lack n_vals, the non-NULL value count) —"
            f" rebuild it with {rebuild}()"
        )
    return df


def _signed(change_col: str):
    return F.when(
        F.col(change_col).isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))


def _free_local_checkpoint(df: DataFrame) -> None:
    """Best-effort release of a ``localCheckpoint``'s stored blocks.

    ``localCheckpoint`` persists the plan's internal RDD and Spark only
    frees those blocks when the RDD object is GC'd, so each attempt of
    the CommitConflict retry loop would otherwise leave its own copy
    pinned until a driver GC.  The checkpointed DataFrame's analyzed
    plan is a ``LogicalRDD`` whose ``rdd()`` is exactly the persisted
    RDD — unpersist it once the attempt's commit (or conflict) has
    consumed it.  Call ONLY after the DataFrame will never be read
    again: a localCheckpoint truncates lineage, so freed blocks cannot
    be recomputed.  Failure here is harmless (blocks fall back to
    GC-based cleanup), hence the blanket except."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:  # noqa: BLE001 - cleanup must never mask the refresh
        pass


def _maintained_base_at(
    view_path: str, view_version: int, rebuild: str = "create_agg_view"
) -> int | None:
    """The base-table version the view reflected AS OF ``view_version``
    (newest ``ivm@N`` commit marker at or below that version).  Taking
    the view version as an explicit argument lets the refresh derive the
    delta window from the same snapshot it pins with ``require_parent``
    — reading "current version" twice would race a concurrent refresh
    committing in between (the delta window would then start before the
    snapshot's maintained base and double-apply the shared prefix).

    Every ivm commit stamps its OWN manifest with ``ivm@N``, so on a
    view maintained only through this module the scan hits at
    ``i == view_version`` immediately; it only walks deeper when non-ivm
    commits were interleaved on the view path.  A manifest missing below
    ``view_version`` is the log-retention floor (``vacuum`` dropped it):
    the scan stops there with a clear error instead of propagating a
    bare FileNotFoundError partway down the chain."""
    for i in range(view_version, -1, -1):
        try:
            m = st._read_manifest(view_path, i)
        except FileNotFoundError:
            raise FileNotFoundError(
                f"{view_path!r}: no ivm@N marker between the retention "
                f"floor (manifest v{i} vacuumed) and view version "
                f"{view_version}; the view's maintenance history was "
                f"expired — rebuild it with {rebuild}()"
            ) from None
        txn = m.get("txn")
        if txn and txn.startswith("ivm@"):
            return int(txn.split("@", 1)[1])
    return None


def maintained_base_version(view_path: str) -> int | None:
    """The base-table version the view currently reflects (from the
    newest ``ivm@N`` commit marker in the view's manifest log)."""
    v = st.current_version(view_path)
    if v is None:
        return None
    return _maintained_base_at(view_path, v)


def create_agg_view(
    spark: SparkSession,
    base_path: str,
    view_path: str,
    keys: list[str],
    value_col: str,
) -> int:
    """Full initial build of the (keys -> n_rows, sum_q) view from the
    base table's CURRENT snapshot; records which base version it
    reflects.  Returns the view's committed version."""
    base_v = st.current_version(base_path)
    if base_v is None:
        raise FileNotFoundError(f"no committed version at {base_path!r}")
    snap = st.read_snapshot(spark, base_path, version=base_v)
    view = snap.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(value_col).alias("n_vals"),
        _qsum(value_col).alias("sum_q"),
    )
    return st.commit(
        view, view_path, mode="overwrite", txn=f"ivm@{base_v}"
    )


def refresh_agg_view(
    spark: SparkSession,
    base_path: str,
    view_path: str,
    keys: list[str],
    value_col: str,
    row_key: str | list[str],
) -> int:
    """Advance the view to the base table's current version by applying
    the change feed since the last maintained version.

    Reads only the manifest-diff files (``read_changes``), aggregates
    signed per-group deltas, and full-outer merges them into the stored
    view: groups whose count reaches zero drop out; untouched groups are
    carried through unchanged.  Exactly-once per base version via the
    ``ivm@N`` idempotent commit marker, and SERIALIZABLE against
    concurrent refreshes: the merge commit pins ``require_parent`` to
    the view version it read, so an overlapping refresh that landed in
    between forces a re-read + re-merge instead of double-applying the
    shared delta prefix (the ``merge_upsert`` protocol applied to view
    upkeep).  No-op (returns the current view version) when the view is
    already current.
    """
    for _ in range(5):
        # Pin the view version FIRST, then derive the maintained base
        # version from that same version's manifest chain.  The delta
        # window (last..cur) and the require_parent guard below thus
        # describe the same view snapshot; a concurrent refresh that
        # commits after this read makes the commit raise CommitConflict
        # (and we retry) instead of silently double-applying deltas.
        view_v = st.current_version(view_path)
        if view_v is None:
            raise FileNotFoundError(
                f"{view_path!r} is not an ivm view (no committed version)"
            )
        last = _maintained_base_at(view_path, view_v)
        if last is None:
            raise FileNotFoundError(
                f"{view_path!r} is not an ivm view (no ivm@N marker)"
            )
        cur = st.current_version(base_path)
        if cur == last:
            return view_v

        changes = st.read_changes(spark, base_path, last, cur, key=row_key)
        deltas = (
            changes.withColumn("_sign", _signed("_change_type"))
            .groupBy(*keys)
            .agg(
                F.sum("_sign").cast("bigint").alias("d_rows"),
                # a NULL measure contributes sign*NULL = NULL, which SUM
                # skips — exactly the "zero contribution" SQL assigns it
                F.sum(
                    F.when(F.col(value_col).isNotNull(), F.col("_sign"))
                )
                .cast("bigint")
                .alias("d_vals"),
                F.sum(
                    F.col("_sign")
                    * F.floor(
                        F.col(value_col) * F.lit(float(_Q)) + F.lit(0.5)
                    ).cast("bigint")
                ).alias("d_sum_q"),
            )
        )
        old = _require_ivm_schema(
            st.read_snapshot(spark, view_path, version=view_v),
            view_path,
            "create_agg_view",
        )
        merged = (
            old.join(deltas, keys, "full_outer")
            .select(
                *keys,
                (
                    F.coalesce(F.col("n_rows"), F.lit(0))
                    + F.coalesce(F.col("d_rows"), F.lit(0))
                ).alias("n_rows"),
                (
                    F.coalesce(F.col("n_vals"), F.lit(0))
                    + F.coalesce(F.col("d_vals"), F.lit(0))
                ).alias("n_vals"),
                (
                    F.coalesce(F.col("sum_q"), F.lit(0))
                    + F.coalesce(F.col("d_sum_q"), F.lit(0))
                ).alias("sum_q"),
            )
            .filter(F.col("n_rows") > 0)
        )
        try:
            return st.commit(
                merged,
                view_path,
                mode="overwrite",
                txn=f"ivm@{cur}",
                require_parent=view_v,
            )
        except st.CommitConflict:
            continue  # a concurrent refresh landed; re-read and re-merge
    raise st.CommitConflict(
        f"view refresh lost the serializable race 5 times on {view_path!r}"
    )


def read_agg_view(spark: SparkSession, view_path: str) -> DataFrame:
    """The view with the quantized sum decoded back to a double (one
    deterministic division); ``value_sum`` is NULL for groups whose
    values are all NULL (SQL SUM semantics)."""
    return _decode_sum(
        _require_ivm_schema(
            st.read_snapshot(spark, view_path), view_path, "create_agg_view"
        )
    )


# ---------------------------------------------------------------------------
# Multi-aggregate view: count + sum + MIN + MAX in one refresh.
#
# Count and sum are self-maintainable (every change row contributes a
# signed unit).  MIN/MAX are NOT: an insert only ever tightens them
# (min' = least(min, inserted min) — monotonic, delta-only), but a
# retraction (delete / update_preimage) may remove the current extreme,
# and the view alone cannot know the runner-up.  The classic fallback:
# groups touched by a retraction are RECOMPUTED from the base snapshot
# — cost O(rows of retract-touched groups), not O(base).  At 100 TB the
# base is partitioned/clustered by the group keys, so the recompute scan
# partition-prunes to exactly those groups.  MIN/MAX over doubles are
# order-independent selections (no quantization needed), so the
# maintained view stays BIT-IDENTICAL to a full recompute in any
# refresh order — the same exactly-once (txn ivm@N) + serializable
# (require_parent) protocol as the count/sum view.
# ---------------------------------------------------------------------------

_STATS_COLS = ("n_rows", "n_vals", "sum_q", "min_v", "max_v")


def _stats_agg(value_col: str) -> list:
    return [
        F.count(F.lit(1)).alias("n_rows"),
        F.count(value_col).alias("n_vals"),
        _qsum(value_col).alias("sum_q"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
    ]


def create_stats_view(
    spark: SparkSession,
    base_path: str,
    view_path: str,
    keys: list[str],
    value_col: str,
) -> int:
    """Full initial build of the (keys -> n_rows, sum_q, min_v, max_v)
    view from the base table's current snapshot."""
    base_v = st.current_version(base_path)
    if base_v is None:
        raise FileNotFoundError(f"no committed version at {base_path!r}")
    snap = st.read_snapshot(spark, base_path, version=base_v)
    view = snap.groupBy(*keys).agg(*_stats_agg(value_col))
    return st.commit(view, view_path, mode="overwrite", txn=f"ivm@{base_v}")


def refresh_stats_view(
    spark: SparkSession,
    base_path: str,
    view_path: str,
    keys: list[str],
    value_col: str,
    row_key: str | list[str],
) -> int:
    """Advance the multi-aggregate view by the change feed since the
    maintained base version.

    * count/sum: signed-delta merge (identical to ``refresh_agg_view``);
    * min/max: inserts merge monotonically (``least``/``greatest`` with
      the stored extreme); any group touched by a retraction is
      recomputed from the base's CURRENT snapshot, semi-joined down to
      exactly the touched groups.

    Same pinned-version serializable protocol as ``refresh_agg_view``:
    the view version is read ONCE, the maintained base version is
    derived from that same version's manifest chain, and the commit pins
    ``require_parent`` to it — a concurrent refresh forces a retry, never
    a silent double-apply.
    """
    for _ in range(5):
        view_v = st.current_version(view_path)
        if view_v is None:
            raise FileNotFoundError(
                f"{view_path!r} is not an ivm view (no committed version)"
            )
        last = _maintained_base_at(
            view_path, view_v, rebuild="create_stats_view"
        )
        if last is None:
            raise FileNotFoundError(
                f"{view_path!r} is not an ivm view (no ivm@N marker)"
            )
        cur = st.current_version(base_path)
        if cur == last:
            return view_v

        changes = st.read_changes(spark, base_path, last, cur, key=row_key)
        is_add = F.col("_change_type").isin("insert", "update_postimage")
        deltas = (
            changes.withColumn("_sign", _signed("_change_type"))
            .groupBy(*keys)
            .agg(
                F.sum("_sign").cast("bigint").alias("d_rows"),
                F.sum(
                    F.when(F.col(value_col).isNotNull(), F.col("_sign"))
                )
                .cast("bigint")
                .alias("d_vals"),
                F.sum(
                    F.col("_sign")
                    * F.floor(
                        F.col(value_col) * F.lit(float(_Q)) + F.lit(0.5)
                    ).cast("bigint")
                ).alias("d_sum_q"),
                F.min(F.when(is_add, F.col(value_col))).alias("ins_min"),
                F.max(F.when(is_add, F.col(value_col))).alias("ins_max"),
                # only a NON-NULL retraction can remove an extreme
                # (MIN/MAX ignore NULLs), so NULL deletes skip the
                # recompute fallback entirely
                F.max(
                    F.when(
                        (~is_add) & F.col(value_col).isNotNull(), F.lit(1)
                    ).otherwise(F.lit(0))
                )
                .cast("boolean")
                .alias("retracted"),
            )
        )
        # One row per touched group — tiny.  Materialize it eagerly so
        # (a) the change-feed scan runs ONCE (deltas feeds both the
        # merge and the touched-group set), and (b) the retraction
        # check below is an O(touched groups) driver-side peek, not a
        # second pass over the feed.  localCheckpoint blocks are
        # NON-reliable (executor loss mid-refresh fails the attempt
        # instead of recomputing — acceptable for this local-mode
        # engine; a multi-executor deployment would use
        # ``checkpoint()`` against reliable storage here), and they are
        # freed explicitly after each attempt so retries don't stack
        # copies until GC.
        deltas = deltas.localCheckpoint(eager=True)
        any_retraction = (
            deltas.filter(F.col("retracted")).limit(1).count() > 0
        )
        old = _require_ivm_schema(
            st.read_snapshot(spark, view_path, version=view_v),
            view_path,
            "create_stats_view",
        )
        merged = (
            old.join(deltas, keys, "full_outer")
            .select(
                *keys,
                (
                    F.coalesce(F.col("n_rows"), F.lit(0))
                    + F.coalesce(F.col("d_rows"), F.lit(0))
                ).alias("n_rows"),
                (
                    F.coalesce(F.col("n_vals"), F.lit(0))
                    + F.coalesce(F.col("d_vals"), F.lit(0))
                ).alias("n_vals"),
                (
                    F.coalesce(F.col("sum_q"), F.lit(0))
                    + F.coalesce(F.col("d_sum_q"), F.lit(0))
                ).alias("sum_q"),
                # monotonic merge; only valid when the group saw no
                # retraction (patched below otherwise)
                F.least(
                    F.coalesce(F.col("min_v"), F.col("ins_min")),
                    F.coalesce(F.col("ins_min"), F.col("min_v")),
                ).alias("min_v"),
                F.greatest(
                    F.coalesce(F.col("max_v"), F.col("ins_max")),
                    F.coalesce(F.col("ins_max"), F.col("max_v")),
                ).alias("max_v"),
                F.coalesce(F.col("retracted"), F.lit(False)).alias(
                    "_retracted"
                ),
            )
            .filter(F.col("n_rows") > 0)
        )
        if any_retraction:
            touched = deltas.filter(F.col("retracted")).select(*keys)
            recomputed = (
                st.read_snapshot(spark, base_path, version=cur)
                .join(touched, keys, "left_semi")
                .groupBy(*keys)
                .agg(
                    F.min(value_col).alias("r_min"),
                    F.max(value_col).alias("r_max"),
                )
            )
            final = (
                merged.join(recomputed, keys, "left")
                .select(
                    *keys,
                    "n_rows",
                    "n_vals",
                    "sum_q",
                    F.when(F.col("_retracted"), F.col("r_min"))
                    .otherwise(F.col("min_v"))
                    .alias("min_v"),
                    F.when(F.col("_retracted"), F.col("r_max"))
                    .otherwise(F.col("max_v"))
                    .alias("max_v"),
                )
            )
        else:
            # insert-only delta: the monotonic least/greatest merge is
            # exact and the plan must not reference the base AT ALL —
            # the dominant streaming shape (append micro-batches) then
            # costs O(delta files), never O(base), which is the S8
            # claim (a deleted-old-base-file tripwire test pins this)
            final = merged.drop("_retracted")
        try:
            return st.commit(
                final,
                view_path,
                mode="overwrite",
                txn=f"ivm@{cur}",
                require_parent=view_v,
            )
        except st.CommitConflict:
            continue  # a concurrent refresh landed; re-read and re-merge
        finally:
            # the attempt is over either way (committed, conflicted, or
            # failed) and `final` has been fully evaluated or abandoned
            _free_local_checkpoint(deltas)
    raise st.CommitConflict(
        f"view refresh lost the serializable race 5 times on {view_path!r}"
    )


def read_stats_view(spark: SparkSession, view_path: str) -> DataFrame:
    """The stats view with the quantized sum decoded back to a double
    (min/max are stored raw — order-independent selections need no
    quantization); ``value_sum`` is NULL for all-NULL groups, matching
    the NULL min/max those groups already carry."""
    return _decode_sum(
        _require_ivm_schema(
            st.read_snapshot(spark, view_path), view_path, "create_stats_view"
        )
    )


def stream_stats_view(
    spark: SparkSession,
    base_path: str,
    view_path: str,
    keys: list[str],
    value_col: str,
    row_key: str | list[str],
    checkpoint_dir: str,
    query_name: str = "ivm-stats",
    trigger: dict | None = None,
):
    """Continuously-maintained stats view: tail the base table's
    manifest changelog (S7's ``snapshot_table`` streaming source) and
    run one incremental ``refresh_stats_view`` per discovered commit.

    The stream is only the WAKE-UP signal — each refresh derives its
    own delta window from the ``ivm@N`` marker chain and commits with
    the idempotent ``ivm@{base_version}`` txn, so a replayed epoch
    (crash between refresh and stream checkpoint commit) is a no-op and
    the view is exactly-once per base version regardless of stream
    offset semantics.  ``ignoreChanges=true`` is required because
    upsert/delete/compaction are rewrite commits; the re-delivered rows
    are discarded (only the notification matters), so the usual
    ignoreChanges duplication caveat does not apply here.

    At 100 TB this is the Delta-style "streaming CDC into a silver
    aggregate" topology: refresh cost stays O(changed rows + touched
    groups) per micro-batch, independent of base-table size, and the
    view table itself is snapshot-isolated for concurrent readers.
    Returns the :class:`StreamingQuery`; stop it to pause maintenance —
    a later batch ``refresh_stats_view`` (or a restarted stream) picks
    up from the marker chain.
    """

    def do_refresh() -> None:
        refresh_stats_view(
            spark, base_path, view_path, keys, value_col, row_key
        )

    return _stream_refresh(
        spark, base_path, checkpoint_dir, query_name, trigger, do_refresh
    )


def stream_agg_view(
    spark: SparkSession,
    base_path: str,
    view_path: str,
    keys: list[str],
    value_col: str,
    row_key: str | list[str],
    checkpoint_dir: str,
    query_name: str = "ivm-agg",
    trigger: dict | None = None,
):
    """``stream_stats_view``'s twin for the count/sum agg view — one
    incremental ``refresh_agg_view`` per discovered base commit, with
    the same wake-up-only stream and ``ivm@N`` exactly-once contract
    (see ``stream_stats_view`` for the full semantics)."""

    def do_refresh() -> None:
        refresh_agg_view(
            spark, base_path, view_path, keys, value_col, row_key
        )

    return _stream_refresh(
        spark, base_path, checkpoint_dir, query_name, trigger, do_refresh
    )


def _stream_refresh(
    spark: SparkSession,
    base_path: str,
    checkpoint_dir: str,
    query_name: str,
    trigger: dict | None,
    do_refresh,
):
    """Shared wake-up plumbing: manifest-log stream -> foreachBatch ->
    one incremental refresh.  Batch rows are deliberately ignored — the
    refresh re-reads the manifest-diff window itself, exactly once per
    base version via the ivm@N marker."""
    from foglamp_filter_python35_spark.sources.snapshot_source import (  # noqa: PLC0415
        SnapshotTableDataSource,
    )

    try:
        spark.dataSource.register(SnapshotTableDataSource)
    except Exception:
        pass  # already registered in this session

    stream = (
        spark.readStream.format("snapshot_table")
        .option("path", base_path)
        .option("ignoreChanges", "true")
        .load()
    )

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        do_refresh()

    writer = (
        stream.writeStream.foreachBatch(process)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()

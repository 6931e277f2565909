"""Semantics tests for the signal-processing operator family
(functions/signal.py): deadband statefulness, LOCF, change detection
first-row pass, threshold tagging, resample aggregates."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from foglamp_filter_python35_spark.functions import signal as S

_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
    ]
)


def _readings(spark, values, asset="a"):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, asset, base + dt.timedelta(seconds=i), float(v))
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(rows, _SCHEMA)


def test_deadband_tracks_last_emitted_not_last_seen(spark):
    # values drift by small steps that individually stay inside the
    # tolerance but cumulatively leave it.  0 emits (first), 6 suppressed
    # (|6-0|<=10), 12 emits (|12-0|>10), then 18/21/22 all suppressed —
    # each within 10 of the last EMITTED value 12, even though 22 is far
    # from 0.  A lag-based filter would decide differently.
    df = _readings(spark, [0, 6, 12, 18, 21, 22])
    out = S.deadband(df, "value", "event_type", ["ts", "event_id"], 10.0)
    kept = sorted(r.value for r in out.collect())
    assert kept == [0.0, 12.0]


def test_deadband_vs_python_reference(spark):
    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0, 5.0]
    df = _readings(spark, vals)
    out = S.deadband(df, "value", "event_type", ["ts", "event_id"], 2.5)
    got = sorted(r.event_id for r in out.collect())

    keep, last = [], None
    for i, v in enumerate(vals):
        if last is None or abs(v - last) > 2.5:
            keep.append(i)
            last = v
    assert got == keep


def test_deadband_state_is_per_asset(spark):
    a = _readings(spark, [0, 1, 2], asset="a")
    b = _readings(spark, [100, 101, 200], asset="b")
    df = a.union(b)
    out = S.deadband(df, "value", "event_type", ["ts", "event_id"], 10.0)
    by_asset = {
        (r.event_type, r.value) for r in out.collect()
    }
    assert by_asset == {("a", 0.0), ("b", 100.0), ("b", 200.0)}


def test_change_detect_first_row_passes(spark):
    df = _readings(spark, [50.0, 50.5, 200.0, 199.0])
    out = S.change_detect(df, "value", ["event_type"], ["ts", "event_id"], 10.0)
    assert sorted(r.value for r in out.collect()) == [50.0, 200.0]


def test_locf_carries_last_non_null(spark):
    df = _readings(spark, [1, 2, 3, 4]).withColumn(
        "v",
        F.when(F.col("event_id").isin(1, 2), F.lit(None)).otherwise(
            F.col("value")
        ),
    )
    out = S.locf(df, "v", ["event_type"], ["ts", "event_id"])
    filled = [r.filled for r in out.orderBy("event_id").collect()]
    assert filled == [1.0, 1.0, 1.0, 4.0]


def test_threshold_alarm_tags_bounds(spark):
    df = _readings(spark, [0.5, 50.0, 500.0])
    out = S.threshold_alarm(df, "value", 1.0, 400.0)
    got = {(r.value, r.alarm) for r in out.collect()}
    assert got == {(0.5, "low"), (500.0, "high")}


def test_moving_average_partial_warmup(spark):
    df = _readings(spark, [10.0, 20.0, 30.0])
    out = S.moving_average(df, "value", ["event_type"], ["ts", "event_id"], 3)
    avgs = [r.moving_avg for r in out.orderBy("event_id").collect()]
    assert avgs == [10.0, 15.0, 20.0]


def test_delta_and_dt(spark):
    df = _readings(spark, [10.0, 25.0])
    out = S.delta(df, "value", ["event_type"], ["ts", "event_id"]).orderBy(
        "event_id"
    )
    rows = out.collect()
    assert rows[0].value_delta is None
    assert rows[1].value_delta == 15.0
    assert rows[1].dt_micros == 1_000_000


def test_resample_hour_buckets(spark):
    base = dt.datetime(2024, 1, 1, 0, 30)
    rows = [
        (1, "a", base, 10.0),
        (2, "a", base + dt.timedelta(minutes=10), 30.0),
        (3, "a", base + dt.timedelta(hours=1), 7.0),
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    out = S.resample(df, "value", "event_type", "ts", every="hour")
    got = {
        (r.bucket.hour, r.n, r.avg_value, r.min_value, r.max_value)
        for r in out.collect()
    }
    assert got == {(0, 2, 20.0, 10.0, 30.0), (1, 1, 7.0, 7.0, 7.0)}


def test_deadband_null_reading_does_not_poison_state(spark):
    # a null value must be dropped WITHOUT updating last-emitted state;
    # the NaN-poisoning variant would suppress the asset forever
    base = dt.datetime(2024, 1, 1)
    rows = [
        (0, "a", base, None),
        (1, "a", base + dt.timedelta(seconds=1), 100.0),
        (2, "a", base + dt.timedelta(seconds=2), 100.5),
        (3, "a", base + dt.timedelta(seconds=3), 200.0),
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    out = S.deadband(df, "value", "event_type", ["ts", "event_id"], 10.0)
    assert sorted(r.event_id for r in out.collect()) == [1, 3]


def _chunked_vs_plain(spark, rows, tolerance, chunk_micros):
    df = spark.createDataFrame(rows, _SCHEMA)
    order = ["ts", "event_id"]
    plain = S.deadband(df, "value", "event_type", order, tolerance)
    chunked = S.deadband_chunked(
        df, "value", "event_type", order, tolerance,
        ts_col="ts", chunk_micros=chunk_micros,
    )
    a = sorted(tuple(r) for r in plain.collect())
    b = sorted(tuple(r) for r in chunked.collect())
    assert a == b
    return a


@pytest.mark.slow
def test_deadband_chunked_matches_plain_adversarial(spark):
    # monotone ramps (every changepoint is a prefix-extreme), plateaus,
    # random walk, nulls, NaNs, and ts ties across three assets; chunk
    # interval small enough that state crosses many chunk boundaries
    import numpy as np

    rng = np.random.default_rng(13)
    base = dt.datetime(2024, 1, 1)
    rows = []
    for asset in ("a", "b", "hot"):
        n = 900 if asset == "hot" else 250
        vals = np.cumsum(rng.normal(0, 40, n))
        vals[50:150] = np.arange(100) * 7.0
        vals[200:240] = 42.0
        for i in range(n):
            v = float(vals[i])
            if i % 83 == 0:
                v = None
            elif i % 71 == 0:
                v = float("nan")
            ts = base + dt.timedelta(seconds=(i // 3) * 700)
            rows.append((i, asset, ts, v))
    kept = _chunked_vs_plain(spark, rows, 55.0, 3600 * 1_000_000)
    assert len(kept) > 0


def test_deadband_chunked_state_crosses_quiet_chunks(spark):
    # chunks 2..3 never cross the tolerance: incoming state must flow
    # through them unchanged and still suppress chunk 4's first reading
    base = dt.datetime(2024, 1, 1)
    vals = [0.0, 100.0,            # chunk 0: emits 0, then 100
            101.0, 102.0,          # chunk 1: inside band of 100
            103.0, 104.0,          # chunk 2: still inside
            105.0, 300.0]          # chunk 3: 105 suppressed, 300 emits
    rows = [
        (i, "a", base + dt.timedelta(hours=i // 2), v)
        for i, v in enumerate(vals)
    ]
    kept = _chunked_vs_plain(spark, rows, 50.0, 3600 * 1_000_000)
    assert [r[3] for r in kept] == [0.0, 100.0, 300.0]


def test_deadband_chunked_null_asset_state_crosses_chunks(spark):
    # deadband groups null-asset rows into one real group; the chunked
    # state join must be null-safe or every chunk of the null group
    # restarts with no incoming state and over-emits (and null-ts rows,
    # whose _chunk is null, must join their stitched state the same way)
    base = dt.datetime(2024, 1, 1)
    rows = [
        (0, None, base, 0.0),
        (1, None, base + dt.timedelta(hours=7), 5.0),   # next chunk, in band
        (2, None, base + dt.timedelta(hours=14), 80.0),  # crosses
        (3, None, None, 81.0),                           # null ts: null chunk
        (4, "a", base, 1.0),
        (5, "a", base + dt.timedelta(hours=7), 2.0),
    ]
    kept = _chunked_vs_plain(spark, rows, 50.0, 6 * 3600 * 1_000_000)
    assert [r[0] for r in kept] == [0, 2, 4]


@pytest.mark.slow
def test_deadband_chunked_hot_asset_parallelizes(spark):
    # one asset spanning many chunk intervals: the rescan stage must have
    # one group per (asset, chunk) — >1 task utilized for a single asset
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, "hot", base + dt.timedelta(minutes=i * 30), float(i % 7) * 40.0)
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    n_chunks = (
        df.select(F.expr(f"unix_micros(ts) div {6 * 3600 * 1_000_000}"))
        .distinct()
        .count()
    )
    assert n_chunks > 1
    _chunked_vs_plain(spark, rows, 55.0, 6 * 3600 * 1_000_000)


def test_ema_recurrence_hand_checked(spark):
    from foglamp_filter_python35_spark.functions.signal import ema

    rows = [(i, "a", float(v)) for i, v in enumerate([10.0, 20.0, 0.0, 40.0])]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    got = {
        r.event_id: r.ema
        for r in ema(df, "value", "event_type", ["event_id"], 0.25).collect()
    }
    want = {0: 10.0}
    y = 10.0
    for i, v in [(1, 20.0), (2, 0.0), (3, 40.0)]:
        y = 0.25 * v + 0.75 * y
        want[i] = y
    assert got == want  # exact equality: same fp recurrence

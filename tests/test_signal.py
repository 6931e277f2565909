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

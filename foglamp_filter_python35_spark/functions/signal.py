"""Signal-processing operators over readings streams.

The reference's contract lets a filter script implement any per-reading /
cross-reading transform (plugin.cpp:29-53, :113-116 — modify, drop,
buffer).  The transforms users actually ship on that surface are the
classic sensor-pipeline family: smoothing, rate-of-change, deadband
change suppression, threshold alarms, downsampling, gap fill.  This
module provides each as a first-class Catalyst-native operator — window
functions and hash aggregates, no Python in the hot path — except true
deadband, whose running "last emitted" state is inherently sequential
per asset and runs as a grouped Arrow-batched kernel.

Scale posture: every window partitions by asset (``partition_cols``) so
state never crosses asset boundaries — at 100 TB the shuffle is one
hash-partition by asset, each window evaluated locally, no global sort.
Ordering inside a partition is (ts, id) so results are deterministic
under ties.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _window(partition_cols: Iterable[str], order_cols: Iterable[str]):
    return Window.partitionBy(*partition_cols).orderBy(*order_cols)


def _dec(c: Column, scale: int = 6) -> Column:
    return c.cast(f"decimal(38,{scale})")


def moving_average(
    df: DataFrame,
    value_col: str,
    partition_cols: Iterable[str],
    order_cols: Iterable[str],
    n: int,
    out_col: str = "moving_avg",
) -> DataFrame:
    """Trailing n-row mean per asset (smoothing filter).

    The mean is computed as exact-decimal frame sum / frame count so the
    result is bit-identical across engines and partitionings (see
    catalog.dsum rationale).
    """
    w = _window(partition_cols, order_cols).rowsBetween(-(n - 1), 0)
    mean = (
        F.sum(_dec(F.col(value_col))).over(w).cast("double")
        / F.count(F.col(value_col)).over(w)
    )
    return df.withColumn(out_col, mean)


def delta(
    df: DataFrame,
    value_col: str,
    partition_cols: Iterable[str],
    order_cols: Iterable[str],
    ts_col: str = "ts",
) -> DataFrame:
    """Per-asset difference vs the previous reading: value delta plus the
    elapsed microseconds (rate = delta / dt is the caller's division so a
    zero dt stays visible instead of becoming inf)."""
    w = _window(partition_cols, order_cols)
    prev_v = F.lag(F.col(value_col)).over(w)
    prev_t = F.lag(F.unix_micros(F.col(ts_col))).over(w)
    return df.withColumn("value_delta", F.col(value_col) - prev_v).withColumn(
        "dt_micros", F.unix_micros(F.col(ts_col)) - prev_t
    )


def change_detect(
    df: DataFrame,
    value_col: str,
    partition_cols: Iterable[str],
    order_cols: Iterable[str],
    threshold: float,
) -> DataFrame:
    """Stateless change detector: keep readings whose value moved by more
    than ``threshold`` vs the immediately previous reading of the same
    asset (first reading of each asset always passes — the reference's
    filters emit on first sight).  For the stateful last-*emitted*
    variant see ``deadband``."""
    w = _window(partition_cols, order_cols)
    prev_v = F.lag(F.col(value_col)).over(w)
    return df.withColumn("_prev", prev_v).filter(
        F.col("_prev").isNull()
        | (F.abs(F.col(value_col) - F.col("_prev")) > threshold)
    ).drop("_prev")


def threshold_alarm(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
) -> DataFrame:
    """Out-of-band alarm rows: readings outside [lo, hi] tagged with the
    violated bound.  A plain pushed-down filter — at scale this prunes at
    the parquet scan."""
    v = F.col(value_col)
    return df.filter((v < lo) | (v > hi)).withColumn(
        "alarm", F.when(v < lo, F.lit("low")).otherwise(F.lit("high"))
    )


def zscore_anomaly(
    df: DataFrame,
    value_col: str,
    partition_cols: Iterable[str],
    order_cols: Iterable[str],
    n: int,
    z: float = 2.0,
) -> DataFrame:
    """Readings > z trailing-window standard deviations from the trailing
    mean.  Mean and mean-of-squares are exact decimal sums over the frame
    (order-free); the variance/sqrt arithmetic is then plain IEEE-754 on
    identical operands, so the flag is engine-deterministic.
    Requires a full window of n readings (the warm-up rows never flag)."""
    w = _window(partition_cols, order_cols).rowsBetween(-(n - 1), 0)
    v = F.col(value_col)
    cnt = F.count(v).over(w)
    # scale 6 keeps the scaled integer sum < 2^53, so the decimal->double
    # cast is exact in every engine; at scale 12 the cast itself rounds
    # and engines disagree in the last bit
    mean = F.sum(_dec(v)).over(w).cast("double") / cnt
    msq = F.sum(_dec(v * v, 6)).over(w).cast("double") / cnt
    # materialize the window expressions first: Spark rejects window
    # functions inside WHERE, so the filter references the columns
    return (
        df.withColumn("_n", cnt)
        .withColumn("win_mean", mean)
        .withColumn("win_var", msq - F.col("win_mean") * F.col("win_mean"))
        .filter(
            (F.col("_n") == n)
            & (F.col("win_var") > 0.0)
            & (
                F.abs(v - F.col("win_mean"))
                > F.lit(z) * F.sqrt(F.col("win_var"))
            )
        )
        .drop("_n")
    )


def resample(
    df: DataFrame,
    value_col: str,
    asset_col: str,
    ts_col: str,
    every: str = "hour",
) -> DataFrame:
    """Downsample to one row per (asset, time bucket): count / exact-mean
    / min / max.  One hash aggregate with map-side partials — the
    canonical 100 TB rollup shape."""
    v = F.col(value_col)
    return (
        df.groupBy(
            F.col(asset_col),
            F.date_trunc(every, F.col(ts_col)).alias("bucket"),
        )
        .agg(
            F.count(v).alias("n"),
            (F.sum(_dec(v)).cast("double") / F.count(v)).alias("avg_value"),
            F.min(v).alias("min_value"),
            F.max(v).alias("max_value"),
        )
    )


def locf(
    df: DataFrame,
    value_col: str,
    partition_cols: Iterable[str],
    order_cols: Iterable[str],
    out_col: str = "filled",
) -> DataFrame:
    """Gap fill by last observation carried forward: nulls take the most
    recent non-null value of the same asset.  last(ignorenulls) over a
    running frame — no loop, no state, one window pass."""
    w = (
        _window(partition_cols, order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(
        out_col, F.last(F.col(value_col), ignorenulls=True).over(w)
    )


def deadband(
    df: DataFrame,
    value_col: str,
    asset_col: str,
    order_cols: Iterable[str],
    tolerance: float,
) -> DataFrame:
    """TRUE deadband suppression: emit a reading only when it differs from
    the last *emitted* reading of the same asset by more than
    ``tolerance`` (first reading per asset always emits).

    The running last-emitted value makes each row's fate depend on an
    unbounded prefix — not expressible as a window function — so this is
    the one operator in the family that runs as a grouped Arrow kernel:
    hash-partition by asset, sort within group, one linear numpy pass.
    State never crosses assets, so at 100 TB each group streams through
    one task; skewed assets are the caller's salting decision.
    """
    order_cols = list(order_cols)
    schema = df.schema

    def _scan(pdf):
        import math  # noqa: PLC0415

        pdf = pdf.sort_values(order_cols, kind="mergesort")
        vals = pdf[value_col].to_numpy()
        keep = [False] * len(vals)
        last = None
        for i, v in enumerate(vals):
            # null readings (NaN after Arrow) are dropped WITHOUT touching
            # state — otherwise abs(v - NaN) > tol is permanently False and
            # one null would silently suppress the asset forever
            if v is None or (isinstance(v, float) and math.isnan(v)):
                continue
            if last is None or abs(v - last) > tolerance:
                keep[i] = True
                last = v
        return pdf[keep]

    return df.groupBy(asset_col).applyInPandas(_scan, schema=schema)

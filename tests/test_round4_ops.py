"""Semantic invariants for the round-4 additions (G91–G96) beyond the
oracle gate: exactness on constructed inputs, robustness, partitioning
independence, and distribution effects the hash check can't express.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from foglamp_filter_python35_spark.functions import signal as SIG

_T0 = dt.datetime(2024, 1, 1)


def _series(spark, vals, step_s=64):
    """One asset, evenly spaced readings (power-of-two seconds so lerp
    fractions are exact binary)."""
    rows = [
        (i, "a", _T0 + dt.timedelta(seconds=i * step_s), v)
        for i, v in enumerate(vals)
    ]
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def test_interp_recovers_linear_signal_exactly(spark):
    """Gaps inside a linear ramp are reconstructed bit-exactly (the lerp
    of exact endpoints at exact binary fractions is exact); leading and
    trailing gaps degrade to nearest observation."""
    # ramp value = 2*i, with nulls at i = 0 (leading), 3, 4 (interior), 7
    vals = [None, 2.0, 4.0, None, None, 10.0, 12.0, None]
    df = _series(spark, vals)
    out = SIG.interp(
        df, "value", "ts", ["event_type"], ["ts", "event_id"]
    ).orderBy("event_id")
    filled = [r.filled for r in out.collect()]
    assert filled == [2.0, 2.0, 4.0, 6.0, 8.0, 10.0, 12.0, 12.0]
    # partitioning-independent
    again = [
        r.filled
        for r in SIG.interp(
            df.repartition(7), "value", "ts", ["event_type"], ["ts", "event_id"]
        )
        .orderBy("event_id")
        .collect()
    ]
    assert again == filled


def test_interp_tied_timestamps_fall_back_to_prev(spark):
    rows = [
        (0, "a", _T0, 1.0),
        (1, "a", _T0 + dt.timedelta(seconds=1), None),
        (2, "a", _T0 + dt.timedelta(seconds=1), None),
        # next non-null shares ts with the gap rows -> t_next == t_prev
        # never happens here; construct the degenerate case directly:
        (3, "a", _T0 + dt.timedelta(seconds=1), 5.0),
    ]
    schema = "event_id long, event_type string, ts timestamp, value double"
    df = spark.createDataFrame(rows, schema)
    out = (
        SIG.interp(df, "value", "ts", ["event_type"], ["ts", "event_id"])
        .orderBy("event_id")
        .collect()
    )
    # gap rows sit at t == 1s; bracketing non-nulls are t=0s and t=1s,
    # so the lerp fraction is exactly 1 -> next value, no div-by-zero
    assert all(r.filled is not None for r in out)


def test_winsorize_bounds_and_identity(spark):
    from foglamp_filter_python35_spark.catalog.signal import q_winsorize_clip

    out = q_winsorize_clip(spark, "/root/testdata/sf0.001").collect()
    assert out, "winsorize returned no rows"
    for r in out:
        assert r.lo_fence <= r.clipped <= r.hi_fence
        if r.lo_fence <= r.value <= r.hi_fence:
            assert r.clipped == r.value  # in-band rows pass through


def test_correlation_sign_on_constructed_series(spark, tmp_path):
    """y = 2x hourly cells -> r = +1; y = -2x -> r = -1 (quantized
    moment sums keep the algebra near-exact)."""
    from foglamp_filter_python35_spark.catalog.signal import (
        q_asset_correlation,
    )

    rows = []
    for h in range(50):
        ts = _T0 + dt.timedelta(hours=h)
        x = float(h % 13) + 1.0
        rows.append((3 * h, "a", ts, x))
        rows.append((3 * h + 1, "b", ts, 2.0 * x))
        rows.append((3 * h + 2, "c", ts, 100.0 - 2.0 * x))
    schema = "event_id long, event_type string, ts timestamp, value double"
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    got = {
        (r.type_a, r.type_b): r.corr
        for r in q_asset_correlation(spark, str(tmp_path)).collect()
    }
    assert abs(got[("a", "b")] - 1.0) < 1e-9
    assert abs(got[("a", "c")] + 1.0) < 1e-9
    assert abs(got[("b", "c")] + 1.0) < 1e-9


def test_mad_flags_spike_and_median_stays_robust(spark, tmp_path):
    from foglamp_filter_python35_spark.catalog.signal import q_mad_outliers

    rows = [
        (i, "a", _T0 + dt.timedelta(seconds=i), 10.0 + float(i % 5))
        for i in range(100)
    ]
    rows.append((100, "a", _T0 + dt.timedelta(seconds=100), 1e6))  # spike
    schema = "event_id long, event_type string, ts timestamp, value double"
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    out = q_mad_outliers(spark, str(tmp_path)).collect()
    flagged = {r.event_id for r in out}
    assert 100 in flagged  # the spike is caught
    # the spike cannot drag the median fence: med within the bulk range
    assert all(10.0 <= r.med <= 14.0 for r in out)


def test_pca_power_finds_dominant_axis(spark, tmp_path):
    """Variance concentrated on dim 2 -> |loading| peaks there after two
    rounds, and the direction is unit-norm."""
    from foglamp_filter_python35_spark.catalog.vector import (
        q_embedding_pca_power,
    )

    rows = []
    for i in range(200):
        vec = [0.01 * ((i * p) % 7 - 3) for p in range(1, 9)]  # 8 dims noise
        vec[2] = 0.5 if i % 2 == 0 else -0.5  # dominant axis
        rows.append((i, [float(x) for x in vec], i % 3))
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    )
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    out = {r.dim: r.loading for r in q_embedding_pca_power(spark, str(tmp_path)).collect()}
    assert len(out) == 8
    dominant = max(out, key=lambda d: abs(out[d]))
    assert dominant == 2
    assert abs(sum(v * v for v in out.values()) - 1.0) < 1e-6


def test_rebalance_shrinks_head_language_share(spark):
    from foglamp_filter_python35_spark.catalog import load
    from foglamp_filter_python35_spark.catalog.pipeline import (
        q_corpus_rebalance,
    )

    sf = "/root/testdata/sf0.01"
    orig = {
        r.lang: r.n
        for r in load(spark, sf, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    kept = {}
    for r in q_corpus_rebalance(spark, sf).collect():
        kept[r.lang] = kept.get(r.lang, 0) + 1
        assert r.lang_rank <= r.target_n
    head = max(orig, key=orig.get)
    n_orig, n_kept = sum(orig.values()), sum(kept.values())
    # temperature sampling flattens the mix: the head language's share
    # strictly drops, tail languages' shares rise
    assert kept[head] / n_kept < orig[head] / n_orig
    for lang in orig:
        if lang != head:
            assert kept[lang] / n_kept >= orig[lang] / n_orig

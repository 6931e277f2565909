"""Semantic invariants for the round-4b operators (G99–G111) beyond the
oracle gate: exactness on constructed inputs and distribution properties
the hash check can't express."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from foglamp_filter_python35_spark.catalog.dedup import q_minhash_accuracy
from foglamp_filter_python35_spark.catalog.pipeline import (
    q_span_dedup,
    q_top_session_paths,
    q_value_drift_chi2,
)
from foglamp_filter_python35_spark.catalog.signal import q_spc_control_chart
from foglamp_filter_python35_spark.catalog.vector import q_ivf_recall_audit

_T0 = dt.datetime(2024, 1, 1)


def _write_docs(spark, tmp_path, texts):
    rows = [(i, t, "en", "src") for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _write_events(spark, tmp_path, rows):
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def test_span_dedup_cuts_repeated_passage_keeps_first(spark, tmp_path):
    span_a = " ".join(f"a{i}" for i in range(8))  # shared boilerplate
    uniq_1 = " ".join(f"b{i}" for i in range(8))
    uniq_2 = " ".join(f"c{i}" for i in range(8))
    sf = _write_docs(
        spark,
        tmp_path,
        [f"{span_a} {uniq_1}", f"{span_a} {uniq_2}"],
    )
    out = {r.doc_id: r for r in q_span_dedup(spark, sf).collect()}
    assert out[0].n_spans == 2 and out[0].n_kept == 2
    assert out[0].clean_text == f"{span_a} {uniq_1}"  # first occurrence intact
    assert out[1].n_spans == 2 and out[1].n_kept == 1
    assert out[1].clean_text == uniq_2  # boilerplate copy removed


def test_span_dedup_every_distinct_span_survives_exactly_once(
    spark, tmp_path
):
    texts = [
        " ".join(f"t{j}" for j in range(k, k + 24)) for k in (0, 8, 16, 40)
    ]
    sf = _write_docs(spark, tmp_path, texts)
    out = q_span_dedup(spark, sf)
    total_kept = out.agg(F.sum("n_kept")).collect()[0][0]
    docs = spark.read.parquet(str(tmp_path / "documents.parquet"))
    distinct_spans = (
        docs.select(
            F.posexplode(
                F.expr(
                    "transform(sequence(0, int(ceil(size(split(text,' '))/8.0))-1),"
                    " i -> array_join(slice(split(text,' '), i*8+1, 8), ' '))"
                )
            )
        )
        .select("col")
        .distinct()
        .count()
    )
    assert total_kept == distinct_spans


def test_value_drift_chi2_zero_when_halves_identical(spark, tmp_path):
    rows = []
    eid = 0
    for half_start in (_T0, dt.datetime(2024, 1, 20)):
        for i, v in enumerate([1.0, 2.0, 3.0, 4.0] * 5):
            rows.append(
                (eid, half_start + dt.timedelta(minutes=i), 1, "click", v, "{}")
            )
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    out = q_value_drift_chi2(spark, sf).collect()
    assert len(out) == 1
    assert out[0].chi2 == 0.0  # identical per-bin shares cancel exactly
    assert out[0].n_ref == 20 and out[0].n_cur == 20


def test_top_session_paths_orders_and_splits_sessions(spark, tmp_path):
    rows = []
    # user 1: A->B then (after 1h gap) A->B ; user 2: A->B — path "A>B" x3
    eid = 0
    for user, start in ((1, _T0), (1, _T0 + dt.timedelta(hours=2)), (2, _T0)):
        for j, et in enumerate(["A", "B"]):
            rows.append(
                (eid, start + dt.timedelta(minutes=j), user, et, 0.0, "{}")
            )
            eid += 1
    # user 3: B->A once (order matters: distinct from A>B)
    for j, et in enumerate(["B", "A"]):
        rows.append((eid, _T0 + dt.timedelta(minutes=j), 3, et, 0.0, "{}"))
        eid += 1
    sf = _write_events(spark, tmp_path, rows)
    got = {r.path: (r.n_sessions, r.n_events) for r in
           q_top_session_paths(spark, sf).collect()}
    assert got == {"A>B": (3, 6), "B>A": (1, 2)}


def test_spc_flags_shift_as_rule1_and_rule4(spark, tmp_path):
    rows = []
    # train week: alternating 0/1 -> center 0.5, sigma 0.5
    for i in range(100):
        rows.append(
            (i, _T0 + dt.timedelta(minutes=i), 1, "m", float(i % 2), "{}")
        )
    # apply window: 8 consecutive at 10.0 (rule 1 AND one >=8 run), then
    # 4 alternating in-control points
    t1 = dt.datetime(2024, 1, 10)
    for j in range(8):
        rows.append(
            (100 + j, t1 + dt.timedelta(minutes=j), 1, "m", 10.0, "{}")
        )
    for j in range(4):
        rows.append(
            (
                108 + j,
                t1 + dt.timedelta(minutes=8 + j),
                1,
                "m",
                float(j % 2),
                "{}",
            )
        )
    sf = _write_events(spark, tmp_path, rows)
    out = q_spc_control_chart(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r.center == 0.5 and r.sigma == 0.5
    assert r.n_points == 12
    assert r.n_rule1 == 8  # |10 - 0.5| > 1.5
    assert r.n_runs8 == 1  # exactly one 8-long same-side run


def test_minhash_accuracy_error_definition_and_range(spark, sf_smoke):
    rows = q_minhash_accuracy(spark, sf_smoke).collect()
    assert rows, "sf0.001 corpus must surface at least one candidate pair"
    for r in rows:
        assert 0.0 <= r.est_jaccard <= 1.0
        assert 0.0 <= r.jaccard <= 1.0
        assert r.abs_err == abs(r.est_jaccard - r.jaccard)


def test_ivf_recall_audit_bounds_and_self_hit(spark, sf_smoke):
    rows = q_ivf_recall_audit(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        # query's own cell is probe #1, so its own vector always hits
        assert 1 <= r.n_hits <= 10
        assert r.recall_at_k == r.n_hits / 10.0


def test_bloom_filter_never_false_negative(spark, sf_smoke):
    """G108: the defining Bloom property — every probe whose fingerprint
    IS in the member set must test maybe-present (n_maybe >= n_present),
    and the FP rate is a valid proportion."""
    from foglamp_filter_python35_spark.catalog.pipeline import (
        q_bloom_filter_audit,
    )

    r = q_bloom_filter_audit(spark, sf_smoke).collect()[0]
    assert r.n_probes > 0
    assert r.n_maybe >= r.n_present  # no false negatives, ever
    assert 0.0 <= r.fp_rate <= 1.0
    assert r.n_false_pos == r.n_maybe - r.n_present


def test_ab_readout_detects_constructed_lift(spark, tmp_path):
    """G109: two md5-parity groups with a constructed spend gap — the
    readout must report the gap and a positive z when B spends more."""
    import hashlib

    rows = []
    eid = 0
    for uid in range(1, 401):
        grp = int(hashlib.md5(str(uid).encode()).hexdigest()[0], 16) % 2
        # group B (grp 1) spends 10 + jitter, group A spends 5 + jitter
        base = 10.0 if grp == 1 else 5.0
        rows.append(
            (
                eid,
                _T0 + dt.timedelta(minutes=uid),
                uid,
                "purchase",
                base + (uid % 7) * 0.25,
                "{}",
            )
        )
        eid += 1
    sf = _write_events(spark, tmp_path, rows)
    from foglamp_filter_python35_spark.catalog.pipeline import (
        q_ab_test_readout,
    )

    r = q_ab_test_readout(spark, sf).collect()[0]
    assert r.n_a + r.n_b == 400
    assert 4.5 < r.mean_a < 6.5 and 9.5 < r.mean_b < 11.5
    assert r.lift == r.mean_b - r.mean_a
    assert r.zscore > 10.0  # unmistakable separation


def test_value_drift_constant_type_degrades_to_one_bin(spark, tmp_path):
    """A constant-valued event type (vmax == vmin) must produce chi2 = 0
    in one bin, not an ANSI divide-by-zero."""
    rows = [
        (i, _T0 + dt.timedelta(days=i), 1, "flat", 7.0, "{}")
        for i in range(20)
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = q_value_drift_chi2(spark, sf).collect()
    assert len(out) == 1 and out[0].chi2 == 0.0


def test_ab_readout_zero_variance_reports_null_z(spark, tmp_path):
    """Identical spend everywhere -> se = 0 -> zscore NULL, no crash."""
    from foglamp_filter_python35_spark.catalog.pipeline import (
        q_ab_test_readout,
    )

    rows = [
        (i, _T0 + dt.timedelta(minutes=i), i, "purchase", 5.0, "{}")
        for i in range(1, 101)
    ]
    sf = _write_events(spark, tmp_path, rows)
    r = q_ab_test_readout(spark, sf).collect()[0]
    assert r.lift == 0.0
    assert r.zscore is None


def test_value_drift_one_sided_type_reports_null(spark, tmp_path):
    """A type whose events all fall AFTER the split (tot_ref = 0) has
    undefined drift: chi2 NULL, not a 0/0 crash or a silent 0.0."""
    rows = [
        (i, dt.datetime(2024, 1, 20) + dt.timedelta(minutes=i), 1,
         "newtype", float(i % 5), "{}")
        for i in range(20)
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = q_value_drift_chi2(spark, sf).collect()
    assert len(out) == 1
    assert out[0].n_ref == 0 and out[0].n_cur == 20
    assert out[0].chi2 is None


def test_ab_readout_near_constant_spend_clamps_variance(spark, tmp_path):
    """Spends 0.1 / 0.1004 make the E[x^2]-mean^2 form cancel negative
    at the s2 quantization scale; the clamp must yield se=0 -> NULL z
    (DuckDB would otherwise ERROR on sqrt(negative))."""
    from foglamp_filter_python35_spark.catalog.pipeline import (
        q_ab_test_readout,
    )

    rows = [
        (i, _T0 + dt.timedelta(minutes=i), i, "purchase",
         0.1 if i % 2 else 0.1004, "{}")
        for i in range(1, 201)
    ]
    sf = _write_events(spark, tmp_path, rows)
    r = q_ab_test_readout(spark, sf).collect()[0]
    assert r.n_a > 0 and r.n_b > 0
    assert r.mean_a is not None and r.mean_b is not None
    assert r.zscore is None  # clamped variance -> se == 0 -> NULL


def test_trigram_lm_conditional_probabilities(spark, tmp_path):
    """G110: constructed corpus pins the conditional table: after 'a b',
    c appears twice and d once -> P = 2/3, 1/3 with deterministic ranks."""
    from foglamp_filter_python35_spark.catalog.pipeline import q_trigram_lm

    sf = _write_docs(spark, tmp_path, ["a b c", "a b c", "a b d", "x y"])
    rows = q_trigram_lm(spark, sf).collect()
    got = {(r.ctx, r.nxt): (r.n_ctx, r.n, r.prob, r.rank) for r in rows}
    assert got[("a b", "c")] == (3, 2, 2.0 / 3.0, 1)
    assert got[("a b", "d")] == (3, 1, 1.0 / 3.0, 2)
    assert all(ctx != "x y" for ctx, _ in got)  # 2-token doc contributes none


def test_event_disorder_audit_finds_late_events(spark, tmp_path):
    """G111: an event 90.9s behind the running max must size the
    watermark as CEIL -> 91s (a 90s watermark would drop it); the late
    branch is also cross-checked against the DuckDB oracle here because
    the shipped fixtures are perfectly ordered (n_late = 0 corpus-wide),
    which would leave this branch oracle-unexercised."""
    from foglamp_filter_python35_spark.catalog.pipeline import (
        O_EVENT_DISORDER_AUDIT,
        q_event_disorder_audit,
    )
    from tests.oracle_utils import compare_spark_vs_oracle

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [
        (1, _T0 + dt.timedelta(seconds=0), 1, "m", 0.0, "{}"),
        (2, _T0 + dt.timedelta(seconds=120, microseconds=900000), 1, "m",
         0.0, "{}"),
        (3, _T0 + dt.timedelta(seconds=30), 1, "m", 0.0, "{}"),  # 90.9s late
        (4, _T0 + dt.timedelta(seconds=180), 1, "m", 0.0, "{}"),
    ]
    # single-FILE parquet (driver testdata layout) so the DuckDB oracle
    # can read the same path the Spark side loads
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=schema),
        str(tmp_path / "events.parquet"),
    )
    sf = str(tmp_path)
    r = q_event_disorder_audit(spark, sf).collect()[0]
    assert (r.n_events, r.n_late, r.max_disorder_s) == (4, 1, 91)
    assert r.late_rate == 0.25
    compare_spark_vs_oracle(
        spark, q_event_disorder_audit, O_EVENT_DISORDER_AUDIT, sf
    )

"""Property-based tests (hypothesis) for the contracts that matter most:

* T9 python-filter runner == applying the same function locally to the
  wire list, for arbitrary readings and a shape-changing transform;
* true deadband == the serial Python reference scan, for arbitrary series;
* salted aggregation == plain aggregation, for arbitrary skewed frames;
* MinHash-LSH verified pairs are a SUBSET of exact n-gram-Jaccard pairs
  with identical jaccard values (verification makes precision exact; only
  recall is probabilistic).

Spark round-trips cost ~100ms per example, so examples are capped low —
these are contract probes, not fuzzing marathons.
"""


from __future__ import annotations

import pytest

import datetime as dt
import math

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from foglamp_filter_python35_spark.config import FilterConfig
from foglamp_filter_python35_spark.datamodel import READING_SCHEMA
from foglamp_filter_python35_spark.functions import dedup as D
from foglamp_filter_python35_spark.functions import signal as SIG
from foglamp_filter_python35_spark.functions.skew import salted_agg
from foglamp_filter_python35_spark.operators.python_filter import (
    run_python_filter,
)

_SETTINGS = dict(max_examples=8, deadline=None)

# --- strategies -----------------------------------------------------------

_finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)

_reading = st.fixed_dictionaries(
    {
        "id": st.integers(min_value=0, max_value=2**40),
        "asset_code": st.sampled_from(["a", "b", "c"]),
        "values": st.dictionaries(
            st.sampled_from(["x", "y", "z"]), _finite, min_size=0, max_size=3
        ),
    }
)


def _readings_df(spark, readings):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (
            r["id"],
            r["asset_code"],
            base + dt.timedelta(seconds=i),
            base + dt.timedelta(seconds=i),
            r["values"],
            {},
        )
        for i, r in enumerate(readings)
    ]
    return spark.createDataFrame(rows, READING_SCHEMA)


# --- T9: runner == local application --------------------------------------


def _transform(batch):
    """Shape-changing reference-contract filter: scale x by 2, drop
    readings whose asset is 'c', rename y -> y2."""
    out = []
    for r in batch:
        if r["asset_code"] == "c":
            continue
        new = {}
        for k, v in r["reading"].items():
            if k == "x":
                new["x"] = v * 2.0
            elif k == "y":
                new["y2"] = v
            else:
                new[k] = v
        r["reading"] = new
        out.append(r)
    return out


@settings(**_SETTINGS)
@given(st.lists(_reading, min_size=0, max_size=12))
@pytest.mark.slow
def test_python_filter_matches_local_application(spark, readings):
    # unique ids keep the comparison well-defined
    seen = set()
    readings = [
        r for r in readings if r["id"] not in seen and not seen.add(r["id"])
    ]
    df = _readings_df(spark, readings)
    out = run_python_filter(df, _transform, FilterConfig(enable=True))
    got = {
        (r["id"], r["asset_code"], tuple(sorted((r["reading"] or {}).items())))
        for r in out.collect()
    }

    wire = [
        {
            "id": r["id"],
            "asset_code": r["asset_code"],
            "reading": dict(r["values"]),
        }
        for r in readings
    ]
    expected = {
        (r["id"], r["asset_code"], tuple(sorted(r["reading"].items())))
        for r in _transform(wire)
        if r["reading"]  # empty payloads are dropped (T6)
    }
    assert got == expected


# --- deadband == serial reference ------------------------------------------


@settings(**_SETTINGS)
@given(
    st.lists(_finite, min_size=0, max_size=30),
    st.floats(min_value=0.1, max_value=100.0),
)
@pytest.mark.slow
def test_deadband_matches_serial_scan(spark, values, tol):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, "a", base + dt.timedelta(seconds=i), float(v))
        for i, v in enumerate(values)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp, value double"
    )
    out = SIG.deadband(df, "value", "event_type", ["ts", "event_id"], tol)
    got = sorted(r.event_id for r in out.collect())

    keep, last = [], None
    for i, v in enumerate(values):
        if last is None or abs(v - last) > tol:
            keep.append(i)
            last = v
    assert got == keep


# --- salted agg == plain agg ------------------------------------------------


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.sampled_from(["hot", "k1", "k2"]), _finite),
        min_size=1,
        max_size=40,
    )
)
@pytest.mark.slow
def test_salted_agg_matches_plain_agg(spark, rows):
    df = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(rows)],
        "id long, k string, v double",
    )
    plain = {
        r.k: (r.n, r.lo, r.hi)
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }
    salted = {
        r.k: (r.n, r.lo, r.hi)
        for r in salted_agg(
            df,
            ["k"],
            {
                "n": ("count", F.lit(1)),
                "lo": ("min", "v"),
                "hi": ("max", "v"),
            },
            n_salts=4,
            entropy_cols=["id"],
        ).collect()
    }
    assert plain == salted


# --- MinHash precision vs exact Jaccard -------------------------------------

_vocab = st.sampled_from(["red", "green", "blue", "cyan", "teal"])


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.lists(_vocab, min_size=5, max_size=12).map(" ".join),
        min_size=2,
        max_size=8,
    )
)
@pytest.mark.slow
def test_minhash_pairs_subset_of_exact_with_equal_jaccard(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    thr = 0.5
    lsh = {
        (r.id_a, r.id_b): r.jaccard
        for r in D.minhash_lsh_near_dups(docs, threshold=thr).collect()
    }
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in D.ngram_jaccard_pairs(docs, threshold=thr).collect()
    }
    # every LSH-verified pair exists in the exact result with the same score
    for pair, j in lsh.items():
        assert pair in exact
        assert math.isclose(j, exact[pair], rel_tol=0, abs_tol=0)


def test_chunk_tokens_covers_tail_exactly_once(spark):
    # every token index is inside >=1 chunk; the final chunk ends at the
    # last token; no chunk is fully contained in its predecessor
    from foglamp_filter_python35_spark.functions.text import chunk_tokens

    rows = [
        (n, " ".join(f"t{i}" for i in range(n)))
        for n in (1, 49, 50, 51, 90, 91, 130)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_tokens(df, "doc_id", "text", window=50, stride=40).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for n, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        covered = set()
        for r in chunks:
            start = r.chunk_idx * 40
            covered |= set(range(start, start + r.n_chunk_tokens))
        assert covered == set(range(n)), f"gap for n={n}"
        last = chunks[-1]
        assert last.chunk_idx * 40 + last.n_chunk_tokens == n
        if len(chunks) > 1:  # tail chunk must add new tokens
            prev_end = chunks[-2].chunk_idx * 40 + 50
            assert last.chunk_idx * 40 + last.n_chunk_tokens > prev_end - 10


def test_hash_split_is_deterministic_and_partitions(spark):
    from foglamp_filter_python35_spark.functions.text import hash_split

    df = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    out = df.select("doc_id", hash_split("doc_id").alias("split"))
    a = {r.doc_id: r.split for r in out.collect()}
    b = {r.doc_id: r.split for r in out.repartition(13).collect()}
    assert a == b  # pure function of the id, partitioning-independent
    frac = {s: sum(1 for v in a.values() if v == s) / len(a) for s in set(a.values())}
    assert set(frac) == {"train", "val", "test"}
    assert 0.7 < frac["train"] < 0.9 and frac["val"] < 0.2


def test_fuzzy_block_cap_not_binding_at_test_scale(spark):
    # the block-size cap in name_fuzzy_match is a structural guard against
    # vocabulary-keyed blocks growing with the corpus; at the test SFs no
    # block may reach it, so the cap provably does not change results
    from foglamp_filter_python35_spark.catalog import load
    from foglamp_filter_python35_spark.catalog.relational import (
        _FUZZY_MAX_BLOCK,
    )

    part = load(spark, "/root/testdata/sf0.01", "part")
    biggest = (
        part.select("p_name")
        .distinct()
        .groupBy(F.element_at(F.split("p_name", " "), -1).alias("block"))
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert biggest < _FUZZY_MAX_BLOCK


def test_stratified_sample_rates_and_determinism(spark):
    from foglamp_filter_python35_spark.functions.text import (
        stratified_sample_pct,
    )

    df = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 8, "en").otherwise("de").alias("lang"),
    )
    out = stratified_sample_pct(df, "lang", "doc_id", {"en": 20}, 100)
    rows = out.collect()
    again = set(r.doc_id for r in out.repartition(7).collect())
    assert set(r.doc_id for r in rows) == again  # partitioning-independent
    n_en = sum(1 for r in rows if r.lang == "en")
    n_de = sum(1 for r in rows if r.lang == "de")
    assert n_de == 800  # default rate keeps every non-en row
    assert 0.12 < n_en / 3200 < 0.28  # ~20% of the en stratum


def test_norm_outlier_fence_is_engine_exact_on_tie(spark, tmp_path):
    """A norm sitting EXACTLY on the Tukey fence must get identical
    membership in Spark and DuckDB (r3 ADVICE: interpolated percentiles
    were only ~1-ULP-compatible across engines; `ordstat_quantile` makes
    the fence arithmetic bit-identical).

    Construction: single-dim vectors with dyadic norms 0..29 plus two
    appended values whose ranks exceed every quantile rank, so quantiles
    are known exactly: n=32 -> p25=7.75, p50=15.5, p75=23.25, upper
    fence = 15.5 + 1.5*(23.25-7.75) = 38.75.  Vector 30 sits exactly ON
    the fence (strictly-greater -> excluded); vector 31 at 39.0 is the
    single outlier."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from foglamp_filter_python35_spark.catalog.vector import (
        O_EMBEDDING_NORM_OUTLIERS,
        q_embedding_norm_outliers,
    )
    from tests.oracle_utils import compare_spark_vs_oracle

    norms = [float(i) for i in range(30)] + [38.75, 39.0]
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(norms)), type=pa.int64()),
            "embedding": pa.array(
                [[v] for v in norms], type=pa.list_(pa.float32())
            ),
            "label": pa.array([0] * len(norms), type=pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))

    got = q_embedding_norm_outliers(spark, str(tmp_path)).collect()
    assert [r["vec_id"] for r in got] == [31], (
        f"expected only the above-fence vector, got {got}"
    )
    # and the oracle agrees bit-for-bit (membership AND p50 value)
    compare_spark_vs_oracle(
        spark,
        q_embedding_norm_outliers,
        O_EMBEDDING_NORM_OUTLIERS,
        str(tmp_path),
    )


def test_dsum_is_tie_safe_cross_engine(spark, tmp_path):
    """The quantized-integer dsum/davg must agree with the DuckDB twins
    on dyadic values whose scaled fraction is EXACTLY .5 — the tie the
    old DECIMAL(38,6) casts resolved half-up in Spark but half-even in
    DuckDB.  0.0078125 = 1/128 scales to 7812.5 at 1e6: decimal casts
    disagree (7813 vs 7812), the IEEE floor(x*1e6+0.5) agrees by
    construction."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from foglamp_filter_python35_spark.catalog import (
        davg,
        dsum,
        o_davg,
        o_dsum,
    )

    # 0.1983642578125 is a float32 dyadic whose scaled value at 1e12 is
    # exactly ...812.5 — the documented real-world tie case
    ties = [0.1983642578125, -0.1983642578125, 3.0234375, 1.5, -7.5]
    pq.write_table(
        pa.table({"v": pa.array(ties, type=pa.float64())}),
        str(tmp_path / "ties.parquet"),
    )
    got = (
        spark.read.parquet(str(tmp_path / "ties.parquet"))
        .agg(dsum("v", "s", scale=12), davg("v", "a", scale=12))
        .collect()[0]
    )
    con = duckdb.connect()
    want_s, want_a = con.execute(
        f"SELECT {o_dsum('v', 's', scale=12)}, {o_davg('v', 'a', scale=12)} "
        f"FROM read_parquet('{tmp_path}/ties.parquet')"
    ).fetchone()
    con.close()
    assert got["s"] == want_s, (got["s"], want_s)
    assert got["a"] == want_a, (got["a"], want_a)
    # and the old decimal behavior WOULD have diverged here: at scale 12
    # the ...812.5 tie rounds half-up in Spark (...813) but half-even in
    # DuckDB (...812) — the divergence the new mechanism removed
    pq.write_table(
        pa.table({"v": pa.array([0.1983642578125], type=pa.float64())}),
        str(tmp_path / "tie1.parquet"),
    )
    con = duckdb.connect()
    (duck_dec,) = con.execute(
        "SELECT CAST(SUM(CAST(v AS DECIMAL(38,12))) AS DOUBLE) "
        f"FROM read_parquet('{tmp_path}/tie1.parquet')"
    ).fetchone()
    con.close()
    spark_dec = (
        spark.read.parquet(str(tmp_path / "tie1.parquet"))
        .agg(F.sum(F.col("v").cast("decimal(38,12)")).cast("double"))
        .collect()[0][0]
    )
    assert spark_dec != duck_dec, (
        "expected the decimal casts to disagree on the scale-12 tie — if "
        "they now agree, the engines changed their rounding and this "
        "test should be revisited"
    )


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=30
        ),
        min_size=1,
        max_size=5,
    )
)
def test_span_dedup_keeps_each_distinct_span_exactly_once(
    spark, tmp_path_factory, token_lists
):
    """G99 conservation law on arbitrary corpora (tiny alphabet forces
    heavy span collisions): kept spans == distinct spans, and the cut
    count is exactly the duplicate surplus."""
    import math as _m

    from foglamp_filter_python35_spark.catalog.pipeline import q_span_dedup

    tmp = tmp_path_factory.mktemp("span_prop")
    texts = [" ".join(toks) for toks in token_lists]
    spark.createDataFrame(
        [(i, t, "en", "s") for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string",
    ).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))
    out = q_span_dedup(spark, str(tmp)).collect()

    spans = set()
    total = 0
    for toks in token_lists:
        n = _m.ceil(len(toks) / 8)
        total += n
        for i in range(n):
            spans.add(" ".join(toks[i * 8 : i * 8 + 8]))
    assert sum(r.n_kept for r in out) == len(spans)
    assert sum(r.n_spans for r in out) == total


@given(n=st.integers(min_value=1, max_value=10**12))
@settings(max_examples=200, deadline=None)
def test_sizing_rules_invariants(n):
    """The measured sizing rules hold their contracts over the whole
    input domain: 4 bands of >=4 bits with expected bucket volume at
    most the target once past the floor; IVF cell volume bounded by
    the target; both monotone (checked pairwise vs n+1)."""
    from foglamp_filter_python35_spark.functions.similarity import (
        _SKETCH_TARGET_VOLUME,
        ivf_cell_count,
        lsh_config,
    )

    n_planes, bits = lsh_config(n)
    assert n_planes == 4 * bits and bits >= 4
    if bits > 4:  # above the floor the volume bound is tight
        assert n / (1 << bits) <= _SKETCH_TARGET_VOLUME + 1e-9
    cells = ivf_cell_count(n)
    assert cells >= 16
    if cells > 16:
        assert n / cells <= _SKETCH_TARGET_VOLUME + 1e-9
    # monotone non-decreasing
    assert lsh_config(n + 1)[1] >= bits
    assert ivf_cell_count(n + 1) >= cells


def test_last_checkpoint_pointer_survives_write_race(tmp_path):
    """Pure-filesystem race on _write_last_checkpoint: 8 threads write
    interleaved versions.  The pointer may lag (documented) but must
    always parse and point at an existing manifest — never torn, never
    a crash."""
    import json as _json
    import os as _os
    import threading

    from foglamp_filter_python35_spark.sources import snapshot_table as stab

    t = str(tmp_path / "ptr")
    mdir = stab._manifest_dir(t)
    _os.makedirs(mdir)
    for v in range(40):
        with open(_os.path.join(mdir, f"v{v}.json"), "w") as f:
            _json.dump({"version": v, "parent": v - 1 if v else None,
                        "operation": "append", "files": [],
                        "schema": {"fields": []}, "txn": None}, f)

    def writer(tid):
        for v in range(tid, 40, 8):
            stab._write_last_checkpoint(t, v, n_files=v)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(8)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    hint = stab._read_last_checkpoint(t)
    assert hint is not None and 0 <= hint < 40
    assert _os.path.exists(_os.path.join(mdir, f"v{hint}.json"))
    # resolution is correct regardless of where the race left the hint
    assert stab.current_version(t) == 39

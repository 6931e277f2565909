"""Fast vector mode: Arrow-batched numpy dot vs the exact left-fold.

The exact path (Catalyst higher-order functions) is bit-compatible with
DuckDB and stays the default; fast mode is the 100 TB hot path (the
round-6 scale probe measured interpreted folds dominating the tuned
pair-verify).  These tests pin (a) value agreement to float tolerance,
(b) identical pair/top-k SETS away from razor-edge thresholds, (c) the
exact path's NULL semantics for ragged/NULL rows, (d) toggle hygiene.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from foglamp_filter_python35_spark.catalog import load
from foglamp_filter_python35_spark.functions import similarity as S

_SF = "/root/testdata/sf0.001"


def test_exact_is_the_default():
    assert S.fast_vector_enabled() is False


def test_dot_values_agree_to_float_tolerance(spark):
    emb = load(spark, _SF, "embeddings").limit(50)
    pairs = emb.alias("a").crossJoin(emb.alias("b")).select(
        F.col("a.vec_id").alias("ia"),
        F.col("b.vec_id").alias("ib"),
        S.dot(F.col("a.embedding"), F.col("b.embedding")).alias("d"),
    )
    exact = {(r.ia, r.ib): r.d for r in pairs.collect()}
    with S.fast_vector_mode():
        fast_pairs = emb.alias("a").crossJoin(emb.alias("b")).select(
            F.col("a.vec_id").alias("ia"),
            F.col("b.vec_id").alias("ib"),
            S.dot(F.col("a.embedding"), F.col("b.embedding")).alias("d"),
        )
        fast = {(r.ia, r.ib): r.d for r in fast_pairs.collect()}
    assert S.fast_vector_enabled() is False  # context restored
    assert exact.keys() == fast.keys()
    for k, v in exact.items():
        assert fast[k] == pytest.approx(v, rel=1e-9, abs=1e-9)


def test_ivf_cell_pairs_same_set_in_fast_mode(spark):
    emb = load(spark, _SF, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    exact = {
        (r.id_a, r.id_b)
        for r in S.ivf_cell_pairs(emb, cents, 0.4).collect()
    }
    with S.fast_vector_mode():
        fast = {
            (r.id_a, r.id_b)
            for r in S.ivf_cell_pairs(emb, cents, 0.4).collect()
        }
    # test corpus has no pair within 1e-9 of the 0.4 threshold, so the
    # last-bit rounding difference cannot flip membership
    assert exact == fast
    assert exact  # non-vacuous


def test_brute_force_topk_same_ids(spark):
    emb = load(spark, _SF, "embeddings")
    query = emb.filter(F.col("vec_id") == 3).select(
        F.col("embedding").alias("qv")
    )
    exact = [r.vec_id for r in S.brute_force_topk(emb, query, k=10).collect()]
    with S.fast_vector_mode():
        fast = [
            r.vec_id for r in S.brute_force_topk(emb, query, k=10).collect()
        ]
    assert exact == fast


def test_null_and_ragged_rows_propagate_null(spark):
    df = spark.createDataFrame(
        [
            (1, [1.0, 2.0], [3.0, 4.0]),  # 11.0
            (2, None, [1.0, 1.0]),  # NULL side
            (3, [1.0, 2.0, 3.0], [1.0, 1.0]),  # ragged dims
        ],
        "i long, a array<float>, b array<float>",
    )
    with S.fast_vector_mode():
        got = {r.i: r.d for r in df.select("i", S.dot("a", "b").alias("d")).collect()}
    assert got[1] == pytest.approx(11.0)
    assert got[2] is None
    assert got[3] is None
    # exact path agrees on the NULL semantics
    exact = {r.i: r.d for r in df.select("i", S.dot("a", "b").alias("d")).collect()}
    assert exact[2] is None and exact[3] is None


def test_corrupt_element_contract(spark):
    """ADVICE r6: a NULL *element* inside a correctly-dimensioned vector.

    Arrow delivers it to the fast kernel as NaN (indistinguishable from a
    genuine NaN element), so fast mode canonicalizes NaN dots to NULL —
    ``score >= threshold`` filters then DROP corrupt rows.  Exact mode:
    NULL element -> NULL (agrees), NaN element -> NaN, which Spark orders
    above all doubles (the documented divergence — exact mode accepts
    NaN-element rows)."""
    import math

    df = spark.createDataFrame(
        [
            (1, [1.0, None, 3.0], [1.0, 2.0, 3.0]),  # NULL element
            (2, [1.0, float("nan"), 3.0], [1.0, 2.0, 3.0]),  # NaN element
            (3, [1.0, 2.0, 3.0], [1.0, 2.0, 3.0]),  # clean: 14.0
        ],
        "i long, a array<double>, b array<double>",
    )
    def sel():
        # mode is bound when the expression is BUILT, not collected
        return df.select(
            "i",
            S.dot("a", "b").alias("d"),
            (S.dot("a", "b") >= F.lit(0.0)).alias("passes"),
        )

    with S.fast_vector_mode():
        fast = {r.i: r for r in sel().collect()}
    assert fast[1].d is None and fast[1].passes is None  # dropped by filter
    assert fast[2].d is None and fast[2].passes is None  # dropped by filter
    assert fast[3].d == pytest.approx(14.0) and fast[3].passes is True
    exact = {r.i: r for r in sel().collect()}
    assert exact[1].d is None and exact[1].passes is None
    # the documented exact-mode divergence: NaN element -> NaN score,
    # and Spark's NaN-is-largest ordering lets it pass the filter
    assert math.isnan(exact[2].d) and exact[2].passes is True
    assert exact[3].d == pytest.approx(14.0)


def test_fast_sketch_matches_exact_bands(spark):
    emb = load(spark, _SF, "embeddings").limit(100)
    planes = S.random_hyperplanes(16, 64)
    exact_df = emb.select(
        "vec_id", S.rp_lsh_sketch(F.col("embedding"), planes, 4).alias("b")
    )
    exact = {r.vec_id: list(r.b) for r in exact_df.collect()}
    with S.fast_vector_mode():
        fast_df = emb.select(
            "vec_id",
            S.rp_lsh_sketch(F.col("embedding"), planes, 4).alias("b"),
        )
        # same element type both modes (nullability differs: UDF columns
        # are always nullable, Catalyst literals are not)
        assert (
            fast_df.schema.simpleString() == exact_df.schema.simpleString()
        )
        fast = {r.vec_id: list(r.b) for r in fast_df.collect()}
    assert exact == fast


@pytest.mark.slow
def test_fast_lsh_near_dups_same_pairs(spark):
    emb = load(spark, _SF, "embeddings")
    exact = {
        (r.id_a, r.id_b)
        for r in S.rp_lsh_near_dups(emb, 0.4, dim=64).collect()
    }
    with S.fast_vector_mode():
        fast = {
            (r.id_a, r.id_b)
            for r in S.rp_lsh_near_dups(emb, 0.4, dim=64).collect()
        }
    assert exact == fast
    assert exact  # non-vacuous


def test_fast_sketch_null_and_ragged_rows_match_exact(spark):
    """Degenerate vectors (NULL, wrong dimensionality) must produce the
    SAME band values in both modes: the exact fold turns their NULL
    plane dots into bit 0 via when/otherwise, so fast mode must emit
    all-zero bands too — not a NULL array, and never a task crash."""
    planes = S.random_hyperplanes(8, 3)
    df = spark.createDataFrame(
        [
            (1, [0.5, -0.2, 0.9]),
            (2, None),  # NULL vector
            (3, [1.0, 2.0]),  # too short
            (4, [1.0, 2.0, 3.0, 4.0]),  # too long
        ],
        "vec_id int, embedding array<double>",
    )
    exact_df = df.select(
        "vec_id", S.rp_lsh_sketch(F.col("embedding"), planes, 4).alias("b")
    )
    exact = {r.vec_id: list(r.b) for r in exact_df.collect()}
    with S.fast_vector_mode():
        fast = {
            r.vec_id: list(r.b)
            for r in df.select(
                "vec_id",
                S.rp_lsh_sketch(F.col("embedding"), planes, 4).alias("b"),
            ).collect()
        }
    assert exact == fast
    assert exact[2] == [0, 0]  # NULL row: all-zero bands, both modes
    assert exact[3] == [0, 0] and exact[4] == [0, 0]


def test_fast_sketch_drops_remainder_planes_like_exact(spark):
    """len(planes) % bits_per_band != 0: the exact loop silently uses
    only the first n_bands*bits planes; the fast matmul must truncate
    identically instead of dying in reshape."""
    planes = S.random_hyperplanes(10, 3)  # 10 planes, bits=4 -> 2 bands
    df = spark.createDataFrame(
        [(1, [0.5, -0.2, 0.9]), (2, [-1.0, 0.3, 0.1])],
        "vec_id int, embedding array<double>",
    )
    exact = {
        r.vec_id: list(r.b)
        for r in df.select(
            "vec_id",
            S.rp_lsh_sketch(F.col("embedding"), planes, 4).alias("b"),
        ).collect()
    }
    with S.fast_vector_mode():
        fast = {
            r.vec_id: list(r.b)
            for r in df.select(
                "vec_id",
                S.rp_lsh_sketch(F.col("embedding"), planes, 4).alias("b"),
            ).collect()
        }
    assert exact == fast
    assert all(len(v) == 2 for v in exact.values())

"""Skew-mitigation rewrites (functions/skew.py) must be algebraically
invisible: salted results == unsalted results, always."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from foglamp_filter_python35_spark.functions.skew import (
    salted_agg,
    salted_join,
    with_salt,
)


@pytest.fixture()
def skewed(spark):
    # one hot key with 900 rows, 10 cold keys with 10 each
    rows = [(i, "hot", float(i % 7)) for i in range(900)]
    rows += [(1000 + i, f"cold{i % 10}", float(i)) for i in range(100)]
    return spark.createDataFrame(rows, "id long, k string, v double")


@pytest.fixture()
def dim(spark):
    keys = ["hot"] + [f"cold{i}" for i in range(10)]
    return spark.createDataFrame(
        [(k, f"label_{k}") for k in keys], "k string, label string"
    )


def test_salted_join_equals_plain_join(skewed, dim):
    plain = skewed.join(dim, "k").select("id", "k", "v", "label")
    salted = salted_join(skewed, dim, "k", n_salts=4).select(
        "id", "k", "v", "label"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_join_left_preserves_unmatched(spark, dim):
    big = spark.createDataFrame(
        [(1, "hot", 1.0), (2, "nokey", 2.0)], "id long, k string, v double"
    )
    out = salted_join(big, dim, "k", n_salts=4, how="left")
    got = {(r.id, r.label) for r in out.collect()}
    assert got == {(1, "label_hot"), (2, None)}


def test_salted_agg_equals_plain_agg(skewed):
    plain = skewed.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("total"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    )
    salted = salted_agg(
        skewed,
        ["k"],
        {
            "n": ("count", F.lit(1)),
            "total": ("sum", "v"),
            "lo": ("min", "v"),
            "hi": ("max", "v"),
        },
        n_salts=4,
        entropy_cols=["id"],
    )
    p = {r.k: (r.n, r.total, r.lo, r.hi) for r in plain.collect()}
    s = {r.k: (r.n, r.total, r.lo, r.hi) for r in salted.collect()}
    assert p == s


def test_salt_spreads_hot_key(skewed):
    n = (
        with_salt(skewed, 4, ["id"])
        .filter(F.col("k") == "hot")
        .select("__salt")
        .distinct()
        .count()
    )
    assert n == 4


def test_salted_agg_rejects_non_algebraic(skewed):
    with pytest.raises(ValueError, match="unsupported"):
        salted_agg(skewed, ["k"], {"bad": ("avg", "v")})


def test_salted_join_rejects_small_side_preserving_joins(skewed, dim):
    with pytest.raises(ValueError, match="salted_join supports"):
        salted_join(skewed, dim, "k", how="full")
    with pytest.raises(ValueError, match="salted_join supports"):
        salted_join(skewed, dim, "k", how="right")


def test_salting_requires_non_key_entropy(spark, dim):
    keys_only = spark.createDataFrame([("hot",)], "k string")
    with pytest.raises(ValueError, match="entropy"):
        salted_join(keys_only, dim, "k")
    with pytest.raises(ValueError, match="entropy"):
        salted_agg(keys_only, ["k"], {"n": ("count", F.lit(1))})

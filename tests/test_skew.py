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


def test_quota_sample_exact_under_skew(spark):
    # G49's two-phase trim must equal the plain per-source window even
    # when one domain has 100x the rows of the others
    from pyspark.sql import Window

    from foglamp_filter_python35_spark.catalog.pipeline import quota_sample

    rows = [(i, "hot") for i in range(5000)]
    rows += [(10_000 + i, f"cold{i % 5}") for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")

    got = quota_sample(docs, 10, salt=8).collect()
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ref = (
        docs.withColumn("pick_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("pick_rank") <= 10)
        .select("doc_id", "source", "pick_rank")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, ref))
    hot_ranks = sorted(r.pick_rank for r in got if r.source == "hot")
    assert hot_ranks == list(range(1, 11))


def test_quota_sample_phase1_bounds_hot_domain(spark):
    # the exact trim's input is bounded by salt x quota rows per source
    # regardless of skew, and the hot domain spreads over every salt
    from pyspark.sql import Window

    docs = spark.createDataFrame(
        [(i, "hot") for i in range(5000)], "doc_id long, source string"
    )
    salt, quota = 8, 10
    w1 = Window.partitionBy("source", "salt").orderBy("pick_key", "doc_id")
    surv = (
        docs.select(
            "doc_id",
            "source",
            F.md5(F.col("doc_id").cast("string")).alias("pick_key"),
            F.pmod(F.hash("doc_id"), F.lit(salt)).alias("salt"),
        )
        .withColumn("r", F.row_number().over(w1))
        .filter(F.col("r") <= quota)
    )
    assert surv.count() <= salt * quota
    assert surv.select("salt").distinct().count() == salt


def test_salting_requires_non_key_entropy(spark, dim):
    keys_only = spark.createDataFrame([("hot",)], "k string")
    with pytest.raises(ValueError, match="entropy"):
        salted_join(keys_only, dim, "k")
    with pytest.raises(ValueError, match="entropy"):
        salted_agg(keys_only, ["k"], {"n": ("count", F.lit(1))})

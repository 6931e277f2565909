"""Unit + cross-validation tests for the dedup library (X1/X2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from foglamp_filter_python35_spark.catalog.dedup import (
    q_minhash_lsh_dedup,
    q_ngram_jaccard_pairs,
    q_simhash_dedup,
)
from foglamp_filter_python35_spark.functions import dedup as D


def test_minhash_equals_exact_on_this_corpus(spark, sf_correct):
    """At J>=0.8 with 6 bands x 2 rows, LSH recall on the planted near-dups
    is ~1; verify the probabilistic pipeline returns exactly the exact
    prefix-filtered answer on this corpus."""
    mh = {(r.id_a, r.id_b) for r in q_minhash_lsh_dedup(spark, sf_correct).collect()}
    exact = {
        (r.id_a, r.id_b) for r in q_ngram_jaccard_pairs(spark, sf_correct).collect()
    }
    assert mh == exact and len(exact) > 0


def test_simhash_subset_of_near_dups(spark, sf_correct):
    sim = {(r.id_a, r.id_b) for r in q_simhash_dedup(spark, sf_correct).collect()}
    mh = {(r.id_a, r.id_b) for r in q_minhash_lsh_dedup(spark, sf_correct).collect()}
    assert len(sim) > 0
    # hamming<=3 on 32 bits is stricter than J>=0.8; allow no strays
    assert sim <= mh


def test_shingles_and_signature_shape(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d"), (3, "x y"), (4, "q w e")],
        ["doc_id", "text"],
    )
    sh = D.shingles(df)
    got = {
        (r.doc_id, r.shingle) for r in sh.collect()
    }
    assert (1, "a b c") in got and (1, "b c d") in got
    assert not any(d == 3 for d, _ in got)  # too short for 3-grams
    sigs = D.minhash_signatures(sh, "doc_id", 4)
    rows = {r.doc_id: (r.s0, r.s1, r.s2, r.s3) for r in sigs.collect()}
    assert rows[1] == rows[2]  # identical docs -> identical signatures
    assert rows[1] != rows[4]


def test_ivf_multiprobe_recall_improves_and_converges(spark, sf_smoke):
    """nprobe is the recall dial: probing more cells can only add
    candidates, and probing every cell IS brute force."""
    from pyspark.sql import functions as F

    from foglamp_filter_python35_spark.catalog import load
    from foglamp_filter_python35_spark.functions.similarity import (
        brute_force_topk,
        ivf_topk_multiprobe,
    )

    emb = load(spark, sf_smoke, "embeddings")
    n_cents = 8
    cents = emb.filter(F.col("vec_id") < n_cents).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv")
    )
    exact = [r.vec_id for r in brute_force_topk(emb, qv, 10).collect()]

    def recall(nprobe):
        got = {
            r.vec_id
            for r in ivf_topk_multiprobe(
                emb, cents, query_id=0, k=10, nprobe=nprobe
            ).collect()
        }
        return len(got & set(exact)) / len(exact)

    r1, r3, rall = recall(1), recall(3), recall(n_cents)
    assert r1 <= r3 <= rall
    assert rall == 1.0  # probing every cell == exact


def test_word_ngrams_short_doc_is_empty_not_crash(spark):
    from foglamp_filter_python35_spark.functions.dedup import word_ngrams

    df = spark.createDataFrame([("a b",), ("x y z",)], "text string")
    out = df.select(
        F.size(word_ngrams(F.split("text", " "), 3)).alias("n")
    ).collect()
    assert sorted(r.n for r in out) == [0, 1]


def test_lsh_bands_rejects_ragged_banding(spark):
    from foglamp_filter_python35_spark.functions.dedup import (
        lsh_bands,
        minhash_signatures,
        shingles,
    )

    docs = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    sigs = minhash_signatures(shingles(docs), "doc_id", 12)
    with pytest.raises(ValueError, match="not divisible"):
        lsh_bands(sigs, "doc_id", 12, 5)


def test_cosine_zero_vector_is_null_not_crash(spark):
    from foglamp_filter_python35_spark.functions.similarity import (
        brute_force_topk,
    )

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 0.0]), (2, [0.5, 0.5])],
        "vec_id long, embedding array<double>",
    )
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv")
    )
    rows = {r.vec_id: r.score for r in brute_force_topk(emb, qv, 3).collect()}
    assert rows[1] is None  # degenerate vector excluded, job survives
    assert rows[0] == 1.0


def test_rp_lsh_pairs_subset_of_brute_force_with_equal_scores(spark, sf_correct):
    from foglamp_filter_python35_spark.catalog import load
    from foglamp_filter_python35_spark.functions.similarity import (
        cosine_pairs,
        rp_lsh_near_dups,
    )

    emb = load(spark, sf_correct, "embeddings")
    thr = 0.4
    lsh = {
        (r.id_a, r.id_b): r.score
        for r in rp_lsh_near_dups(emb, threshold=thr).collect()
    }
    exact = {
        (r.id_a, r.id_b): r.score
        for r in cosine_pairs(emb, thr).collect()
    }
    assert len(lsh) > 0  # the operator finds real pairs on this corpus
    for pair, s in lsh.items():
        assert pair in exact and s == exact[pair]

from __future__ import annotations

import importlib.util
import os

from tests.conftest import REPO_ROOT


def _load_entry_module():
    spec = importlib.util.spec_from_file_location(
        "spark_entry", os.path.join(REPO_ROOT, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_returns_rows(spark):
    mod = _load_entry_module()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"asset_code", "n_readings", "sum_scaled"}


def test_queries_and_oracles_aligned(spark):
    mod = _load_entry_module()
    qs = mod.queries()
    os_ = mod.oracle_sql()
    assert qs, "queries() must not be empty"
    # every oracle refers to a declared query
    assert set(os_) <= set(qs)


def test_driver_window_order_is_pinned():
    """The driver verifies only the first 50 entries of queries().
    The round-18 window is change-aware (tools/rotate_window.py): this
    round's expression/shape changes force-include every query whose
    EXECUTION SHAPE changed (pair-verify repartition, ensemble persist)
    and the expr-ified minhash/simhash/ngram/vector families; the
    remaining slots go to the stalest greens.  Guard the ordering so an
    innocent module reshuffle can't silently evict them."""
    from foglamp_filter_python35_spark.catalog import (
        _DRIVER_WINDOW_ORDER,
        all_queries,
    )

    names = list(all_queries())
    assert names[: len(_DRIVER_WINDOW_ORDER)] == list(_DRIVER_WINDOW_ORDER)
    window = names[:50]
    for fam, members in {
        "shape-changed-r18": ("embedding_lsh_dup", "embedding_cosine_dup",
                              "semantic_dedup", "dedup_ensemble"),
        "dedup-expr-r18": ("dedup_exact", "minhash_lsh_dedup",
                           "ngram_jaccard_pairs", "doc_containment",
                           "simhash_dedup", "dedup_clusters",
                           "dedup_apply", "incremental_dedup"),
        "vector-expr-r18": ("embedding_norm_outliers", "embedding_topk",
                            "embedding_ivf_topk", "embedding_knn_join",
                            "embedding_centroids", "embedding_quantize",
                            "knn_label_purity", "embedding_dim_stats",
                            "ivf_cell_histogram"),
        "text-r18": ("text_stats", "token_fertility", "quality_score",
                     "language_id", "token_count_total", "doc_fingerprint",
                     "tfidf_top_terms", "bigram_topk", "train_test_split"),
        "stale-r14-r15": ("lang_mix_gini", "dup_rate_by_source",
                          "split_leakage", "bloom_filter_audit",
                          "ab_test_readout", "hll_distinct_audit",
                          "source_vocab_divergence", "value_drift_chi2",
                          "vocab_coverage", "ngram_novelty",
                          "corpus_pipeline_e2e"),
    }.items():
        for q in members:
            assert q in window, f"{fam} query {q} fell out of the driver window"



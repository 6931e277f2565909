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
    Cumulative r1-r16 evidence covers all 153 queries, so the round-17
    window is purely staleness-ordered (no package file changed since
    the r16 boundary backs a catalog query, so no forced entries): the
    three r13 leftovers, then the 47 least-recently-verified r14
    greens (the signal/text family plus the r14 vector-audit and
    pipeline cohorts).  Guard the ordering so an innocent module
    reshuffle can't silently evict them."""
    from foglamp_filter_python35_spark.catalog import (
        _DRIVER_WINDOW_ORDER,
        all_queries,
    )

    names = list(all_queries())
    assert names[: len(_DRIVER_WINDOW_ORDER)] == list(_DRIVER_WINDOW_ORDER)
    window = names[:50]
    for fam, members in {
        "stale-r13": ("bm25_retrieval", "corpus_rebalance",
                      "event_path_transitions"),
        "signal-r14": ("spc_control_chart", "value_delta", "change_detect",
                       "threshold_alarm", "zscore_anomaly", "downsample_1h",
                       "locf_gap_fill", "session_rollup",
                       "percentile_summary", "deadband_suppress",
                       "interp_gap_fill", "winsorize_clip",
                       "asset_correlation", "mad_outliers"),
        "text-r14": ("text_stats", "token_fertility", "quality_score",
                     "language_id", "token_count_total", "doc_fingerprint",
                     "tfidf_top_terms", "bigram_topk", "train_test_split",
                     "doc_chunking", "lang_mismatch", "corpus_prefilter",
                     "stratified_sample", "pii_redact",
                     "benchmark_contamination", "doc_repetition",
                     "top_bigram_fraction", "pretokenize_counts",
                     "doc_length_histogram"),
        "dedup-audit-r14": ("minhash_accuracy", "dedup_cluster_histogram",
                            "span_dedup"),
        "vector-audit-r14": ("ivf_recall_audit", "embedding_label_margin",
                             "ivf_train_kmeans", "embedding_pca_power"),
        "pipeline-r14": ("trigram_lm", "event_disorder_audit", "token_pmi",
                         "text_normalize", "conversion_latency",
                         "error_burst_join", "weighted_sample"),
    }.items():
        for q in members:
            assert q in window, f"{fam} query {q} fell out of the driver window"

"""Driver-window bookkeeping: the rotation order for the 50-query
CORRECTNESS prefix (see tools/rotate_window.py).

This module is pure bookkeeping — it defines WHICH queries the driver
samples first, never their semantics — and lives outside
``catalog/__init__.py`` so that a routine per-round rotation edit does
not mark every catalog query "changed" for the change-aware
force-include logic (rotate_window.forced_queries skips this file)."""

from __future__ import annotations

# The driver's CORRECTNESS gate verifies only the first 50 entries of
# ``queries()`` each round.  Cumulative r1-r16 driver evidence covers all
# 153 catalog queries, none ever red.  The round-17 window
# (tools/rotate_window.py, change-aware: no package file changed since
# the r16 boundary backs a catalog query, so 0 FORCED entries) is purely
# staleness-ordered: the three r13 leftovers (bm25_retrieval,
# corpus_rebalance, event_path_transitions — all judge-re-verified at
# the r16 HEAD) then the 47 least-recently-verified r14 greens (the
# signal/text family plus the r14 vector-audit and pipeline cohorts).
# After r17 no query's driver evidence predates r14.  Queries not
# listed keep module order after the prioritized block.
_DRIVER_WINDOW_ORDER: tuple[str, ...] = (
    "bm25_retrieval",  # green r13
    "corpus_rebalance",  # green r13
    "event_path_transitions",  # green r13
    "spc_control_chart",  # green r14
    "value_delta",  # green r14
    "change_detect",  # green r14
    "threshold_alarm",  # green r14
    "zscore_anomaly",  # green r14
    "downsample_1h",  # green r14
    "locf_gap_fill",  # green r14
    "session_rollup",  # green r14
    "percentile_summary",  # green r14
    "deadband_suppress",  # green r14
    "interp_gap_fill",  # green r14
    "winsorize_clip",  # green r14
    "asset_correlation",  # green r14
    "mad_outliers",  # green r14
    "text_stats",  # green r14
    "token_fertility",  # green r14
    "quality_score",  # green r14
    "language_id",  # green r14
    "token_count_total",  # green r14
    "doc_fingerprint",  # green r14
    "tfidf_top_terms",  # green r14
    "bigram_topk",  # green r14
    "train_test_split",  # green r14
    "doc_chunking",  # green r14
    "lang_mismatch",  # green r14
    "corpus_prefilter",  # green r14
    "stratified_sample",  # green r14
    "pii_redact",  # green r14
    "benchmark_contamination",  # green r14
    "doc_repetition",  # green r14
    "top_bigram_fraction",  # green r14
    "pretokenize_counts",  # green r14
    "doc_length_histogram",  # green r14
    "minhash_accuracy",  # green r14
    "dedup_cluster_histogram",  # green r14
    "ivf_recall_audit",  # green r14
    "embedding_label_margin",  # green r14
    "ivf_train_kmeans",  # green r14
    "embedding_pca_power",  # green r14
    "span_dedup",  # green r14
    "trigram_lm",  # green r14
    "event_disorder_audit",  # green r14
    "token_pmi",  # green r14
    "text_normalize",  # green r14
    "conversion_latency",  # green r14
    "error_burst_join",  # green r14
    "weighted_sample",  # green r14
)

"""Driver-window bookkeeping: the rotation order for the 50-query
CORRECTNESS prefix (see tools/rotate_window.py).

This module is pure bookkeeping — it defines WHICH queries the driver
samples first, never their semantics — and lives outside
``catalog/__init__.py`` so that a routine per-round rotation edit does
not mark every catalog query "changed" for the change-aware
force-include logic (rotate_window.forced_queries skips this file)."""

from __future__ import annotations

# The driver's CORRECTNESS gate verifies only the first 50 entries of
# ``queries()`` each round.  Cumulative r1-r13 driver evidence covers all
# 153 catalog queries, none ever red.  The round-14 window
# (tools/rotate_window.py, change-aware: 0 package files changed since
# the r13 boundary, so 0 FORCED entries) is purely staleness-ordered:
# the eight r10 leftovers (token_pmi, text_normalize, conversion_latency,
# error_burst_join, weighted_sample, lang_mix_gini, dup_rate_by_source,
# split_leakage) then the 42 least-recently-verified r11 greens
# (signal cohort, text cohort, and the r11 vector/dedup audits).  After
# r14 every catalog query's driver evidence is r11 or newer — the
# VERDICT r13 "evidence staleness" ask.  Queries not listed keep module
# order after the prioritized block.
_DRIVER_WINDOW_ORDER: tuple[str, ...] = (
    "token_pmi",  # green r10
    "text_normalize",  # green r10
    "conversion_latency",  # green r10
    "error_burst_join",  # green r10
    "weighted_sample",  # green r10
    "lang_mix_gini",  # green r10
    "dup_rate_by_source",  # green r10
    "split_leakage",  # green r10
    "spc_control_chart",  # green r11
    "value_delta",  # green r11
    "change_detect",  # green r11
    "threshold_alarm",  # green r11
    "zscore_anomaly",  # green r11
    "downsample_1h",  # green r11
    "locf_gap_fill",  # green r11
    "session_rollup",  # green r11
    "percentile_summary",  # green r11
    "deadband_suppress",  # green r11
    "interp_gap_fill",  # green r11
    "winsorize_clip",  # green r11
    "asset_correlation",  # green r11
    "mad_outliers",  # green r11
    "text_stats",  # green r11
    "token_fertility",  # green r11
    "quality_score",  # green r11
    "language_id",  # green r11
    "token_count_total",  # green r11
    "doc_fingerprint",  # green r11
    "tfidf_top_terms",  # green r11
    "bigram_topk",  # green r11
    "train_test_split",  # green r11
    "doc_chunking",  # green r11
    "lang_mismatch",  # green r11
    "corpus_prefilter",  # green r11
    "stratified_sample",  # green r11
    "pii_redact",  # green r11
    "benchmark_contamination",  # green r11
    "doc_repetition",  # green r11
    "top_bigram_fraction",  # green r11
    "pretokenize_counts",  # green r11
    "doc_length_histogram",  # green r11
    "minhash_accuracy",  # green r11
    "dedup_cluster_histogram",  # green r11
    "ivf_recall_audit",  # green r11
    "embedding_label_margin",  # green r11
    "ivf_train_kmeans",  # green r11
    "embedding_pca_power",  # green r11
    "span_dedup",  # green r11
    "trigram_lm",  # green r11
    "event_disorder_audit",  # green r11
)

"""Driver-window bookkeeping: the rotation order for the 50-query
CORRECTNESS prefix (see tools/rotate_window.py).

This module is pure bookkeeping — it defines WHICH queries the driver
samples first, never their semantics — and lives outside
``catalog/__init__.py`` so that a routine per-round rotation edit does
not mark every catalog query "changed" for the change-aware
force-include logic (rotate_window.forced_queries skips this file)."""

from __future__ import annotations

# The driver's CORRECTNESS gate verifies only the first 50 entries of
# ``queries()`` each round.  Round-18 rotation (tools/rotate_window.py
# --since ba24615): this round's expression/shape changes touch
# functions/{similarity,dedup}.py and catalog/{vector,dedup,text}.py,
# force-including their backing queries — notably every query whose
# EXECUTION SHAPE changed (embedding_lsh_dup / embedding_cosine_dup /
# semantic_dedup pair-verify repartition, dedup_ensemble containment
# persist) and the expr-ified minhash/simhash/ngram family.
# catalog/__init__.py also changed (schema cache + dsum/davg str
# paths), which forces ALL 153 queries; the 103 that do not fit the 50
# slots were dropped freshest-evidence-first, and the builder's own
# full-catalog sweeps this round (153/153 at sf0.01, twice) cover them.
# Queries not listed keep module order after the prioritized block.
_DRIVER_WINDOW_ORDER: tuple[str, ...] = (
    "lang_mix_gini",  # green r14 FORCED(changed)
    "dup_rate_by_source",  # green r14 FORCED(changed)
    "split_leakage",  # green r14 FORCED(changed)
    "bloom_filter_audit",  # green r15 FORCED(changed)
    "ab_test_readout",  # green r15 FORCED(changed)
    "hll_distinct_audit",  # green r15 FORCED(changed)
    "source_vocab_divergence",  # green r15 FORCED(changed)
    "value_drift_chi2",  # green r15 FORCED(changed)
    "vocab_coverage",  # green r15 FORCED(changed)
    "ngram_novelty",  # green r15 FORCED(changed)
    "corpus_pipeline_e2e",  # green r15 FORCED(changed)
    "dedup_exact",  # green r16 FORCED(changed)
    "minhash_lsh_dedup",  # green r16 FORCED(changed)
    "ngram_jaccard_pairs",  # green r16 FORCED(changed)
    "doc_containment",  # green r16 FORCED(changed)
    "simhash_dedup",  # green r16 FORCED(changed)
    "dedup_clusters",  # green r16 FORCED(changed)
    "dedup_apply",  # green r16 FORCED(changed)
    "dedup_ensemble",  # green r16 FORCED(changed)
    "embedding_norm_outliers",  # green r16 FORCED(changed)
    "embedding_topk",  # green r16 FORCED(changed)
    "embedding_cosine_dup",  # green r16 FORCED(changed)
    "embedding_ivf_topk",  # green r16 FORCED(changed)
    "embedding_knn_join",  # green r16 FORCED(changed)
    "embedding_lsh_dup",  # green r16 FORCED(changed)
    "embedding_centroids",  # green r16 FORCED(changed)
    "embedding_quantize",  # green r16 FORCED(changed)
    "semantic_dedup",  # green r16 FORCED(changed)
    "knn_label_purity",  # green r16 FORCED(changed)
    "embedding_dim_stats",  # green r16 FORCED(changed)
    "ivf_cell_histogram",  # green r16 FORCED(changed)
    "top_session_paths",  # green r16 FORCED(changed)
    "domain_quota_sample",  # green r16 FORCED(changed)
    "incremental_dedup",  # green r16 FORCED(changed)
    "sliding_window_rate",  # green r16 FORCED(changed)
    "click_view_reconciliation",  # green r16 FORCED(changed)
    "sequence_packing",  # green r16 FORCED(changed)
    "sliding_unique_users",  # green r16 FORCED(changed)
    "bm25_retrieval",  # green r17 FORCED(changed)
    "corpus_rebalance",  # green r17 FORCED(changed)
    "event_path_transitions",  # green r17 FORCED(changed)
    "text_stats",  # green r17 FORCED(changed)
    "token_fertility",  # green r17 FORCED(changed)
    "quality_score",  # green r17 FORCED(changed)
    "language_id",  # green r17 FORCED(changed)
    "token_count_total",  # green r17 FORCED(changed)
    "doc_fingerprint",  # green r17 FORCED(changed)
    "tfidf_top_terms",  # green r17 FORCED(changed)
    "bigram_topk",  # green r17 FORCED(changed)
    "train_test_split",  # green r17 FORCED(changed)
)

"""Driver-window bookkeeping: the rotation order for the 50-query
CORRECTNESS prefix (see tools/rotate_window.py).

This module is pure bookkeeping — it defines WHICH queries the driver
samples first, never their semantics — and lives outside
``catalog/__init__.py`` so that a routine per-round rotation edit does
not mark every catalog query "changed" for the change-aware
force-include logic (rotate_window.forced_queries skips this file)."""

from __future__ import annotations

# The driver's CORRECTNESS gate verifies only the first 50 entries of
# ``queries()`` each round.  Cumulative r1-r12 driver evidence covers all
# 153 catalog queries.  The round-13 window (tools/rotate_window.py,
# change-aware) leads with the 5 multimodal queries FORCE-INCLUDED
# because functions/multimodal.py changed this round (AU 24-bit
# strictness + shard vacuum), then re-confirms the 45
# least-recently-verified greens: the eight r9 leftovers
# (revenue_deciles, name_fuzzy_match, grouping_sets_revenue,
# value_histogram, retention_cohorts, top_session_paths,
# corpus_rebalance, event_path_transitions) plus 37 of the r10-era
# dedup/vector/pipeline cohort.  After r13 every catalog query's
# driver evidence is r10 or newer (the displaced r10 greens —
# conversion_latency, error_burst_join, text_normalize, token_pmi,
# weighted_sample — plus the r10/r11 tail roll to r14).  Queries not
# listed keep module order after the prioritized block.
_DRIVER_WINDOW_ORDER: tuple[str, ...] = (
    "multimodal_dedup",  # green r12 FORCED(changed)
    "multimodal_meta",  # green r12 FORCED(changed)
    "multimodal_features",  # green r12 FORCED(changed)
    "multimodal_resize",  # green r12 FORCED(changed)
    "multimodal_frames",  # green r12 FORCED(changed)
    "revenue_deciles",  # green r9
    "name_fuzzy_match",  # green r9
    "grouping_sets_revenue",  # green r9
    "value_histogram",  # green r9
    "retention_cohorts",  # green r9
    "top_session_paths",  # green r9
    "corpus_rebalance",  # green r9
    "event_path_transitions",  # green r9
    "latest_event_per_user",  # green r10
    "waiting_suppliers",  # green r10
    "min_cost_supplier",  # green r10
    "dominant_part_suppliers",  # green r10
    "salted_enrich_rollup",  # green r10
    "column_profile",  # green r10
    "snapshot_diff",  # green r10
    "weekday_hour_heatmap",  # green r10
    "parts_supplier_counts",  # green r10
    "moving_average",  # green r10
    "median_filter",  # green r10
    "ema_smooth",  # green r10
    "deadband_chunked",  # green r10
    "dedup_exact",  # green r10
    "minhash_lsh_dedup",  # green r10
    "ngram_jaccard_pairs",  # green r10
    "doc_containment",  # green r10
    "simhash_dedup",  # green r10
    "dedup_clusters",  # green r10
    "dedup_apply",  # green r10
    "dedup_ensemble",  # green r10
    "embedding_norm_outliers",  # green r10
    "embedding_topk",  # green r10
    "embedding_cosine_dup",  # green r10
    "embedding_ivf_topk",  # green r10
    "embedding_knn_join",  # green r10
    "embedding_lsh_dup",  # green r10
    "embedding_centroids",  # green r10
    "embedding_quantize",  # green r10
    "semantic_dedup",  # green r10
    "knn_label_purity",  # green r10
    "embedding_dim_stats",  # green r10
    "ivf_cell_histogram",  # green r10
    "domain_quota_sample",  # green r10
    "incremental_dedup",  # green r10
    "sliding_window_rate",  # green r10
    "bm25_retrieval",  # green r10
)

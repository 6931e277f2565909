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
    Cumulative r1-r15 evidence covers all 153 queries, so the round-16
    window is purely staleness-ordered (the two package files changed
    at rotation time back no catalog query, so no forced entries): the
    three r12 leftovers, then the 47 least-recently-verified r13
    greens (the dedup/vector/multimodal family plus the r13 relational
    cohort).  Guard the ordering so an innocent module reshuffle can't
    silently evict them."""
    from foglamp_filter_python35_spark.catalog import (
        _DRIVER_WINDOW_ORDER,
        all_queries,
    )

    names = list(all_queries())
    assert names[: len(_DRIVER_WINDOW_ORDER)] == list(_DRIVER_WINDOW_ORDER)
    window = names[:50]
    for fam, members in {
        "stale-r12": ("click_view_reconciliation", "sequence_packing",
                      "sliding_unique_users"),
        "dedup-r13": ("dedup_exact", "minhash_lsh_dedup",
                      "ngram_jaccard_pairs", "doc_containment",
                      "simhash_dedup", "dedup_clusters", "dedup_apply",
                      "dedup_ensemble", "incremental_dedup"),
        "vector-r13": ("embedding_norm_outliers", "embedding_topk",
                       "embedding_cosine_dup", "embedding_ivf_topk",
                       "embedding_knn_join", "embedding_lsh_dup",
                       "embedding_centroids", "embedding_quantize",
                       "semantic_dedup", "knn_label_purity",
                       "embedding_dim_stats", "ivf_cell_histogram"),
        "multimodal-r13": ("multimodal_dedup", "multimodal_meta",
                           "multimodal_features", "multimodal_resize",
                           "multimodal_frames"),
        "relational-r13": ("revenue_deciles", "name_fuzzy_match",
                           "grouping_sets_revenue", "value_histogram",
                           "retention_cohorts", "latest_event_per_user",
                           "waiting_suppliers", "min_cost_supplier",
                           "dominant_part_suppliers",
                           "salted_enrich_rollup", "column_profile",
                           "snapshot_diff", "weekday_hour_heatmap",
                           "parts_supplier_counts"),
        "signal-r13": ("moving_average", "median_filter", "ema_smooth",
                       "deadband_chunked", "top_session_paths",
                       "domain_quota_sample", "sliding_window_rate"),
    }.items():
        for q in members:
            assert q in window, f"{fam} query {q} fell out of the driver window"

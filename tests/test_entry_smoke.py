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
    Cumulative r1-r9 evidence covers all 153 queries, so the round-10
    window re-confirms the LEAST-recently-verified greens (the three r6
    stragglers + 47 of the r7-era dedup/vector/multimodal/pipeline
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
        "stale-r6": ("moving_average", "dedup_exact",
                     "minhash_lsh_dedup"),
        "dedup-r7": ("ngram_jaccard_pairs", "doc_containment",
                     "simhash_dedup", "dedup_clusters", "dedup_apply",
                     "dedup_ensemble"),
        "vector-r7": ("embedding_topk", "embedding_ivf_topk",
                      "embedding_lsh_dup", "semantic_dedup",
                      "embedding_knn_join", "embedding_quantize"),
        "multimodal-r7": ("multimodal_dedup", "multimodal_meta",
                          "multimodal_features", "multimodal_resize",
                          "multimodal_frames"),
        "pipeline-r7": ("domain_quota_sample", "incremental_dedup",
                        "bm25_retrieval", "token_pmi", "weighted_sample",
                        "split_leakage"),
        "relational-r7": ("waiting_suppliers", "min_cost_supplier",
                          "salted_enrich_rollup", "column_profile",
                          "snapshot_diff"),
    }.items():
        for q in members:
            assert q in window, f"{fam} query {q} fell out of the driver window"

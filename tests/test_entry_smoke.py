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
    Cumulative r1-r14 evidence covers all 153 queries, so the round-15
    window is purely staleness-ordered (the two package files changed
    at rotation time back no catalog query, so no forced entries): the
    eight r11 leftovers, then the 42 least-recently-verified r12 greens
    (the T1-T8 events cohort and the relational/TPC-H cohort).  Guard
    the ordering so an innocent module reshuffle can't silently evict
    them."""
    from foglamp_filter_python35_spark.catalog import (
        _DRIVER_WINDOW_ORDER,
        all_queries,
    )

    names = list(all_queries())
    assert names[: len(_DRIVER_WINDOW_ORDER)] == list(_DRIVER_WINDOW_ORDER)
    window = names[:50]
    for fam, members in {
        "stale-r11": ("bloom_filter_audit", "ab_test_readout",
                      "hll_distinct_audit", "source_vocab_divergence",
                      "value_drift_chi2", "vocab_coverage",
                      "ngram_novelty", "corpus_pipeline_e2e"),
        "events-r12": ("scale35", "python_filter_scale35",
                       "readings35_add100", "asset_filter",
                       "payload_projection", "empty_payload_drop",
                       "metadata_carry", "type_coercion",
                       "sessionization", "hourly_event_rollup",
                       "event_type_pivot", "event_funnel",
                       "skewed_asset_rollup", "props_json_stats"),
        "relational-r12": ("pricing_summary", "revenue_by_nation",
                           "top_orders_per_segment",
                           "order_priority_semijoin", "rollup_revenue",
                           "set_ops_users", "distinct_users",
                           "top_parts_by_revenue", "asof_last_signup",
                           "value_band_join", "customers_without_orders",
                           "cube_revenue", "orders_above_cust_avg",
                           "shipping_priority", "forecast_revenue",
                           "top_suppliers", "returned_items",
                           "priority_by_linestatus", "volume_shipping",
                           "market_share", "product_profit",
                           "important_parts", "custdist", "promo_revenue",
                           "small_qty_revenue", "large_orders",
                           "disjunctive_filter", "sales_opportunity"),
    }.items():
        for q in members:
            assert q in window, f"{fam} query {q} fell out of the driver window"

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
    Cumulative r1-r11 evidence covers all 153 queries, so the round-12
    window leads with the 5 multimodal queries FORCE-INCLUDED by the
    change-aware rotation (their backing codec modules changed in r12),
    then re-confirms the LEAST-recently-verified greens (the three r8
    leftovers + 42 of the r9-era T-operator/relational/TPC-H cohort).
    Guard the ordering so an innocent module reshuffle can't silently
    evict them."""
    from foglamp_filter_python35_spark.catalog import (
        _DRIVER_WINDOW_ORDER,
        all_queries,
    )

    names = list(all_queries())
    assert names[: len(_DRIVER_WINDOW_ORDER)] == list(_DRIVER_WINDOW_ORDER)
    window = names[:50]
    for fam, members in {
        "forced-changed": ("multimodal_dedup", "multimodal_meta",
                           "multimodal_features", "multimodal_resize",
                           "multimodal_frames"),
        "stale-r8": ("click_view_reconciliation", "sequence_packing",
                     "sliding_unique_users"),
        "t-operators-r9": ("scale35", "python_filter_scale35",
                           "readings35_add100", "asset_filter",
                           "payload_projection", "empty_payload_drop",
                           "metadata_carry", "type_coercion"),
        "tpch-r9": ("pricing_summary", "revenue_by_nation",
                    "shipping_priority", "volume_shipping", "market_share",
                    "product_profit", "custdist", "promo_revenue",
                    "important_parts", "large_orders", "top_suppliers",
                    "returned_items", "priority_by_linestatus",
                    "small_qty_revenue", "orders_above_cust_avg"),
        "relational-r9": ("top_orders_per_segment", "order_priority_semijoin",
                          "sessionization", "hourly_event_rollup",
                          "rollup_revenue", "set_ops_users", "distinct_users",
                          "event_type_pivot", "event_funnel",
                          "skewed_asset_rollup", "cube_revenue",
                          "customers_without_orders", "asof_last_signup",
                          "value_band_join", "top_parts_by_revenue",
                          "forecast_revenue", "disjunctive_filter",
                          "sales_opportunity", "props_json_stats"),
    }.items():
        for q in members:
            assert q in window, f"{fam} query {q} fell out of the driver window"

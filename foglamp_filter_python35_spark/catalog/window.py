"""Driver-window bookkeeping: the rotation order for the 50-query
CORRECTNESS prefix (see tools/rotate_window.py).

This module is pure bookkeeping — it defines WHICH queries the driver
samples first, never their semantics — and lives outside
``catalog/__init__.py`` so that a routine per-round rotation edit does
not mark every catalog query "changed" for the change-aware
force-include logic (rotate_window.forced_queries skips this file)."""

from __future__ import annotations

# The driver's CORRECTNESS gate verifies only the first 50 entries of
# ``queries()`` each round.  Cumulative r1-r14 driver evidence covers all
# 153 catalog queries, none ever red.  The round-15 window
# (tools/rotate_window.py, change-aware: the two package files changed
# since the r14 boundary — sources/snapshot_table.py, sources/readers.py
# — back no catalog query, so 0 FORCED entries) is purely
# staleness-ordered: the eight r11 leftovers (bloom_filter_audit,
# ab_test_readout, hll_distinct_audit, source_vocab_divergence,
# value_drift_chi2, vocab_coverage, ngram_novelty, corpus_pipeline_e2e —
# all judge-re-verified at the r14 HEAD) then the 42 least-recently-
# verified r12 greens (the T1-T8 events cohort and the relational/TPC-H
# cohort).  After r15 no query's driver evidence predates r12.  Queries
# not listed keep module order after the prioritized block.
_DRIVER_WINDOW_ORDER: tuple[str, ...] = (
    "bloom_filter_audit",  # green r11
    "ab_test_readout",  # green r11
    "hll_distinct_audit",  # green r11
    "source_vocab_divergence",  # green r11
    "value_drift_chi2",  # green r11
    "vocab_coverage",  # green r11
    "ngram_novelty",  # green r11
    "corpus_pipeline_e2e",  # green r11
    "scale35",  # green r12
    "python_filter_scale35",  # green r12
    "readings35_add100",  # green r12
    "asset_filter",  # green r12
    "payload_projection",  # green r12
    "empty_payload_drop",  # green r12
    "metadata_carry",  # green r12
    "type_coercion",  # green r12
    "pricing_summary",  # green r12
    "revenue_by_nation",  # green r12
    "top_orders_per_segment",  # green r12
    "order_priority_semijoin",  # green r12
    "sessionization",  # green r12
    "hourly_event_rollup",  # green r12
    "rollup_revenue",  # green r12
    "set_ops_users",  # green r12
    "distinct_users",  # green r12
    "event_type_pivot",  # green r12
    "top_parts_by_revenue",  # green r12
    "asof_last_signup",  # green r12
    "value_band_join",  # green r12
    "customers_without_orders",  # green r12
    "cube_revenue",  # green r12
    "orders_above_cust_avg",  # green r12
    "skewed_asset_rollup",  # green r12
    "shipping_priority",  # green r12
    "forecast_revenue",  # green r12
    "event_funnel",  # green r12
    "top_suppliers",  # green r12
    "returned_items",  # green r12
    "priority_by_linestatus",  # green r12
    "volume_shipping",  # green r12
    "market_share",  # green r12
    "product_profit",  # green r12
    "important_parts",  # green r12
    "custdist",  # green r12
    "promo_revenue",  # green r12
    "small_qty_revenue",  # green r12
    "large_orders",  # green r12
    "disjunctive_filter",  # green r12
    "sales_opportunity",  # green r12
    "props_json_stats",  # green r12
)

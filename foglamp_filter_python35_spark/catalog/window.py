"""Driver-window bookkeeping: the rotation order for the 50-query
CORRECTNESS prefix (see tools/rotate_window.py).

This module is pure bookkeeping — it defines WHICH queries the driver
samples first, never their semantics — and lives outside
``catalog/__init__.py`` so that a routine per-round rotation edit does
not mark every catalog query "changed" for the change-aware
force-include logic (rotate_window.forced_queries skips this file)."""

from __future__ import annotations

# The driver's CORRECTNESS gate verifies only the first 50 entries of
# ``queries()`` each round.  Cumulative r1-r11 driver evidence covers all
# 153 catalog queries.  The round-12 window (tools/rotate_window.py, now
# CHANGE-AWARE) leads with the 5 multimodal queries FORCE-INCLUDED
# because their backing modules (functions/{gif,jpeg,multimodal}.py)
# changed this round, then re-confirms the 50 least-recently-verified
# greens: the three r8 leftovers (click_view_reconciliation,
# sequence_packing, sliding_unique_users) plus 42 of the r9-era
# T-operator/relational/TPC-H cohort.  This keeps the rolling guarantee
# — every catalog query has driver evidence within the last three
# rounds AND every code-touched query is sampled in the round that
# touched it.  Queries not listed keep module order after the
# prioritized block.
_DRIVER_WINDOW_ORDER: tuple[str, ...] = (
    "multimodal_dedup",  # green r10 FORCED(changed)
    "multimodal_meta",  # green r10 FORCED(changed)
    "multimodal_features",  # green r10 FORCED(changed)
    "multimodal_resize",  # green r10 FORCED(changed)
    "multimodal_frames",  # green r10 FORCED(changed)
    "click_view_reconciliation",  # green r8
    "sequence_packing",  # green r8
    "sliding_unique_users",  # green r8
    "scale35",  # green r9
    "python_filter_scale35",  # green r9
    "readings35_add100",  # green r9
    "asset_filter",  # green r9
    "payload_projection",  # green r9
    "empty_payload_drop",  # green r9
    "metadata_carry",  # green r9
    "type_coercion",  # green r9
    "pricing_summary",  # green r9
    "revenue_by_nation",  # green r9
    "top_orders_per_segment",  # green r9
    "order_priority_semijoin",  # green r9
    "sessionization",  # green r9
    "hourly_event_rollup",  # green r9
    "rollup_revenue",  # green r9
    "set_ops_users",  # green r9
    "distinct_users",  # green r9
    "event_type_pivot",  # green r9
    "top_parts_by_revenue",  # green r9
    "asof_last_signup",  # green r9
    "value_band_join",  # green r9
    "customers_without_orders",  # green r9
    "cube_revenue",  # green r9
    "orders_above_cust_avg",  # green r9
    "skewed_asset_rollup",  # green r9
    "shipping_priority",  # green r9
    "forecast_revenue",  # green r9
    "event_funnel",  # green r9
    "top_suppliers",  # green r9
    "returned_items",  # green r9
    "priority_by_linestatus",  # green r9
    "volume_shipping",  # green r9
    "market_share",  # green r9
    "product_profit",  # green r9
    "important_parts",  # green r9
    "custdist",  # green r9
    "promo_revenue",  # green r9
    "small_qty_revenue",  # green r9
    "large_orders",  # green r9
    "disjunctive_filter",  # green r9
    "sales_opportunity",  # green r9
    "props_json_stats",  # green r9
)

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
    After round 5 every catalog query has at least one driver-green row,
    so the round-6 window re-confirms the LEAST-recently-verified greens
    (r1 dedup/smoothing rows + the r3 relational block).  Guard the
    ordering so an innocent module reshuffle can't silently evict them."""
    from foglamp_filter_python35_spark.catalog import (
        _DRIVER_WINDOW_ORDER,
        all_queries,
    )

    names = list(all_queries())
    assert names[: len(_DRIVER_WINDOW_ORDER)] == list(_DRIVER_WINDOW_ORDER)
    window = names[:50]
    for fam, members in {
        "stale-r1": ("dedup_exact", "minhash_lsh_dedup", "moving_average"),
        "events-r3": ("scale35", "python_filter_scale35", "sessionization",
                      "hourly_event_rollup"),
        "tpch-r3": ("pricing_summary", "revenue_by_nation", "market_share",
                    "promo_revenue", "shipping_priority"),
        "shape-r3": ("cube_revenue", "grouping_sets_revenue",
                     "retention_cohorts", "revenue_deciles"),
    }.items():
        for q in members:
            assert q in window, f"{fam} query {q} fell out of the driver window"

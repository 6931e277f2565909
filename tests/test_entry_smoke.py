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

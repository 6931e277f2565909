"""Production approx toggle (r3 VERDICT #5): the documented
percentile -> approx_percentile and COUNT(DISTINCT) -> approx_count_distinct
swaps are now a runtime switch, not just docstrings.  Exact mode stays the
default (the oracle gate needs bit-equality); approx mode must keep the
same schema and grouping while trading exactness for mergeable sketches.
"""

from __future__ import annotations

import pytest

from foglamp_filter_python35_spark.catalog import (
    all_queries,
    approx_enabled,
    approx_mode,
)

pytestmark = pytest.mark.slow  # fast==exact parity also gated by test_fast_vector

_SF = "/root/testdata/sf0.001"
_TOGGLED = ("percentile_summary", "conversion_latency", "sliding_unique_users")


def test_exact_is_the_default():
    assert approx_enabled() is False


@pytest.mark.parametrize("name", _TOGGLED)
def test_approx_mode_same_shape_close_values(spark, name):
    spec = all_queries()[name]
    exact = spec.fn(spark, _SF).toPandas()
    with approx_mode():
        assert approx_enabled() is True
        approx = spec.fn(spark, _SF).toPandas()
    assert approx_enabled() is False  # context manager restored
    assert list(approx.columns) == list(exact.columns)
    assert len(approx) == len(exact)
    # align on the grouping column (first non-metric column) if any
    key = exact.columns[0]
    exact = exact.sort_values(key).reset_index(drop=True)
    approx = approx.sort_values(key).reset_index(drop=True)
    # counts must be exact (the toggle only approximates distinct/quantile);
    # medians are tight; tail quantiles are loose at sf0.001 group sizes
    # because approx_percentile returns a nearest ACTUAL value while the
    # exact path interpolates between the top two
    rel = {"n": 0.0, "n_converted": 0.0, "n_users": 0.1,
           "p50": 0.15, "p50_us": 0.15, "p90": 0.5, "p90_us": 0.5, "p99": 0.5}
    for c in exact.columns:
        if exact[c].dtype.kind not in "if":
            continue
        for e, a in zip(exact[c], approx[c]):
            assert a == pytest.approx(e, rel=rel.get(c, 0.5)), (name, c, e, a)


def test_approx_mode_drops_exact_buffering_from_plan(spark):
    """The toggle must change the aggregate physically: no exact
    percentile / collect_list buffering, no two-phase exact distinct."""
    qs = all_queries()

    def optimized(name):
        return (
            qs[name].fn(spark, _SF)._jdf.queryExecution().optimizedPlan().toString()
        )

    with approx_mode():
        lat_plan = optimized("conversion_latency")
        uu_plan = optimized("sliding_unique_users")
        pct_plan = optimized("percentile_summary")
    assert "approx_percentile" in lat_plan
    assert "collect_list" not in lat_plan
    assert "approx_count_distinct" in uu_plan
    assert "approx_percentile" in pct_plan
    assert "percentile(" not in pct_plan.replace("approx_percentile(", "")

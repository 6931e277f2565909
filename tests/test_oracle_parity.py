"""Oracle-differential tests: every SQL-expressible catalog query must
match its DuckDB oracle exactly (row count + columns + values) at sf0.01 —
the same check the driver runs for CORRECTNESS_r{N}.json."""

from __future__ import annotations

import pytest

from foglamp_filter_python35_spark.catalog import (
    _DRIVER_WINDOW_ORDER,
    all_queries,
)
from tests.oracle_utils import compare_spark_vs_oracle

_SPECS = [s for s in all_queries().values() if s.oracle is not None]

# Fast gate (pytest -m "not slow"): the CURRENT driver window — which
# the change-aware rotation guarantees contains every query whose code
# changed this round — runs unmarked; the rest of the catalog carries
# the slow marker and runs in the full (round-exit) suite.
_WINDOW = set(_DRIVER_WINDOW_ORDER)
_PARAMS = [
    pytest.param(s, id=s.name)
    if s.name in _WINDOW
    else pytest.param(s, id=s.name, marks=pytest.mark.slow)
    for s in _SPECS
]


@pytest.mark.parametrize("spec", _PARAMS)
def test_query_matches_oracle(spark, sf_correct, spec):
    compare_spark_vs_oracle(spark, spec.fn, spec.oracle, sf_correct)


def test_fingerprint_normalizes_non_space_whitespace(spark):
    from foglamp_filter_python35_spark.functions.text import fingerprint
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a b",), ("\ta b\n",), ("a\t b",)], "text string"
    )
    fps = [r.fp for r in df.select(fingerprint("text").alias("fp")).collect()]
    assert len(set(fps)) == 1  # identical up to whitespace => same hash

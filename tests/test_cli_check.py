"""CLI `check` comparator: NaN-vs-NULL divergence must stay visible.

Round-5 advice: the comparator mapped genuine float NaN on the SPARK
side to the same '<null>' sentinel as SQL NULL, so a query wrongly
yielding NaN (e.g. sqrt of a negative before a greatest() guard) passed
whenever the oracle yielded NULL.  NaN→NULL coercion is only sound on
the DuckDB/pandas side, where SQL NULL arrives irrecoverably as NaN.
"""

from __future__ import annotations

import math

from foglamp_filter_python35_spark.__main__ import _oracle_cell, _spark_cell


def test_spark_nan_is_distinct_from_null():
    assert _spark_cell(float("nan")) == "<nan>"
    assert _spark_cell(None) == "<null>"
    assert _spark_cell(float("nan")) != _oracle_cell(float("nan"))


def test_oracle_nan_coerces_to_null():
    # pandas represents SQL NULL as NaN — irrecoverable, so coerced
    assert _oracle_cell(float("nan")) == "<null>"
    assert _oracle_cell(None) == "<null>"


def test_ordinary_values_stringify_identically():
    for v in (0, 1.5, "x", True, -7, math.pi):
        assert _spark_cell(v) == _oracle_cell(v) == str(v)

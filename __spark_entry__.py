"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash).  Implementation lives in ``foglamp_filter_python35_spark``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from foglamp_filter_python35_spark.catalog import all_queries  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the reference's entire hot path
    (scale35 affine transform + asset filter, ``plugin.cpp:255-260``)
    feeding a per-asset aggregate."""
    from pyspark.sql import functions as F

    from foglamp_filter_python35_spark.catalog import dsum
    from foglamp_filter_python35_spark.catalog.events import q_scale35

    scaled = q_scale35(spark, _SMOKE_SF_DIR)
    return (
        scaled.groupBy("asset_code")
        .agg(
            F.count(F.lit(1)).alias("n_readings"),
            dsum("scaled_value", "sum_scaled"),
        )
        .orderBy("asset_code")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable first releases the PREVIOUS query's registered cached
    intermediates (functions.cache) — releasing is always safe (an
    unpersisted shared subtree just recomputes per consumer), and it
    bounds executor storage to one query's caches however many catalog
    queries one session runs."""
    from foglamp_filter_python35_spark.functions import cache

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            cache.release(blocking=False)
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(spec.fn) for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; omitted keys
    get the driver's weaker rows-only check."""
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }

"""Query catalog: every named query the engine exposes, with DuckDB oracles.

Each operator from SURVEY.md §2 (plus the §2.5 extensions) is declared as a
``QuerySpec``: a Spark builder ``fn(spark, sf_dir) -> DataFrame`` and, where
SQL-expressible, the equivalent ANSI SQL for the DuckDB oracle.  The driver
compares row-count + schema + order-insensitive value hash at sf0.01.

Cross-engine float determinism
------------------------------
Double-precision SUMs are association-order dependent, so a parallel Spark
sum and a serial DuckDB sum differ in the last bits.  We therefore compute
every floating aggregate as an *exact decimal* sum of per-row doubles
(per-row arithmetic is identical IEEE-754 in both engines), then cast the
exact sum back to double — a deterministic mapping, identical in both
engines regardless of partitioning or association order.  See ``dsum``.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None -> driver does rows-only check
    headline: bool = False  # include in bench.py


# driver testdata stores timestamps as parquet TIMESTAMP(NANOS), which
# Spark cannot read natively; with spark.sql.legacy.parquet.nanosAsLong
# they surface as nano-precision longs and are rebuilt here.  Newer
# testdata drops store TIMESTAMP(MICROS) without a UTC annotation, which
# Spark 4 reads as TIMESTAMP_NTZ; every catalog query (and the round-1
# driver-green baseline) expects session-tz TIMESTAMP, so both shapes are
# normalized to it — with the session tz pinned to UTC the NTZ->LTZ cast
# relabels the same instant and is deterministic.
_TS_COLUMNS = {
    "events": ("ts",),
    "lineitem": ("l_shipdate",),
    "orders": ("o_orderdate",),
}


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    try:  # defensive: the driver's own session may not carry these confs
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass
    df = spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))
    for c in _TS_COLUMNS.get(table, ()):
        field = df.schema[c]
        if isinstance(field.dataType, LongType):
            # integer div — float division would lose precision on e18 nanos
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif isinstance(field.dataType, TimestampNTZType):
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def dsum(col: Column | str, alias: str, scale: int = 6) -> Column:
    """Association-order-independent SUM of a double column.

    Casting each double to DECIMAL(38, scale) rounds it identically in
    Spark and DuckDB; the decimal sum is exact (order-free); the final
    cast back to double is deterministic.  Oracle-side twin:
    ``CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(f"decimal(38,{scale})")).cast("double").alias(alias)
    )


def o_dsum(expr: str, alias: str, scale: int = 6) -> str:
    """DuckDB twin of ``dsum`` for use inside oracle SQL strings."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,{scale}))) AS DOUBLE) AS {alias}"


def davg(col: Column | str, alias: str, scale: int = 6) -> Column:
    """Deterministic AVG: exact decimal sum / count, divided in double."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(f"decimal(38,{scale})")).cast("double")
        / F.count(c)
    ).alias(alias)


def o_davg(expr: str, alias: str, scale: int = 6) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(38,{scale}))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )


def all_queries() -> dict[str, QuerySpec]:
    """Aggregate every catalog module's SPECS, keyed by name."""
    from foglamp_filter_python35_spark.catalog import (  # noqa: PLC0415
        events as _ev,
        relational as _rel,
        signal as _sig,
        text as _text,
        dedup as _dedup,
        vector as _vec,
        multimodal as _mm,
        pipeline as _pipe,
    )

    specs: dict[str, QuerySpec] = {}
    for mod in (_ev, _rel, _sig, _text, _dedup, _vec, _mm, _pipe):
        for spec in mod.SPECS:
            if spec.name in specs:
                raise ValueError(f"duplicate query name {spec.name}")
            specs[spec.name] = spec
    return specs

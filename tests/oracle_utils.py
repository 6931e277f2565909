"""Local replica of the driver's oracle-differential check.

Runs a Spark query and its DuckDB oracle on the same parquet tables and
compares row count + column names + order-insensitive values, so query /
oracle pairs are validated before the driver ever sees them.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            df[c] = s.map(lambda v: v.decode() if isinstance(v, bytes) else v)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
            drop=True
        )
    return df


def _dtype_class(s: pd.Series) -> str:
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    return "object"


def compare_spark_vs_oracle(spark, fn, sql: str, sf_dir: str) -> None:
    got = _canon(fn(spark, sf_dir).toPandas())
    con = duckdb_conn(sf_dir)
    try:
        want = _canon(con.execute(sql).df())
    finally:
        con.close()
    assert list(got.columns) == list(want.columns), (
        f"column mismatch: spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} oracle={len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        gk, wk = _dtype_class(g), _dtype_class(w)
        # The driver hashes stringified values, so an int64-vs-float64 split
        # (e.g. DuckDB HUGEINT from a bare integer SUM -> float64) diverges
        # there even when values are numerically identical.  Fail loudly here
        # instead of silently coercing both sides to float.
        assert gk == wk, (
            f"dtype class mismatch in column {c!r}: spark={g.dtype} ({gk}) "
            f"oracle={w.dtype} ({wk}) — the driver's stringified hash would "
            f"diverge; align the oracle's type (e.g. CAST(SUM(..) AS BIGINT))"
        )
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            ga = g.astype("float64").to_numpy()
            wa = w.astype("float64").to_numpy()
            eq = (ga == wa) | (np.isnan(ga) & np.isnan(wa))
            assert eq.all(), _diff_msg(c, got, want, ~eq)
        else:
            eq = (g.isna() & w.isna()) | (g == w)
            assert eq.all(), _diff_msg(c, got, want, ~eq.to_numpy())


def _diff_msg(col: str, got: pd.DataFrame, want: pd.DataFrame, bad) -> str:
    idx = np.nonzero(bad)[0][:5]
    rows = [
        f"  row {i}: spark={got[col].iloc[i]!r} oracle={want[col].iloc[i]!r}"
        for i in idx
    ]
    return f"value mismatch in column {col!r}:\n" + "\n".join(rows)

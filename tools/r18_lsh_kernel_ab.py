"""r18 A/B: bit-exact Arrow kernel for the RP-LSH verify dot.

The exact verify computes one interpreted Catalyst fold per candidate
pair (515k raw at sf0.1) — measured ~2.8s of embedding_lsh_dup's ~3.5s.
``np.add.accumulate`` performs the SAME strictly-sequential left-fold in
float64 (products of float32-cast values are exact in double; the add
sequence and its roundings are identical), so an Arrow-batched kernel is
bit-identical for clean vectors.  A Catalyst ``when()`` guard routes any
row with NULL/NaN/inf elements, NULL vectors, or ragged dims to the
original fold, so the expression is bit-identical for EVERY input class
(guide 4.2: batches to vectorized native code; 4.4 caveat checked).

Shapes:
  A: current rp_lsh_near_dups (interpreted fold verify)
  K: guarded Arrow-kernel verify

Prints interleaved min-of-N, bit-parity (collected score bits), and the
ArrowEvalPython node count (guide 4.4 duplication check).

Usage: python tools/r18_lsh_kernel_ab.py [sf_dir]
"""

from __future__ import annotations

import os
import struct
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from foglamp_filter_python35_spark.catalog import (  # noqa: E402
    load,
    parquet_row_count,
)
from foglamp_filter_python35_spark.functions import cache  # noqa: E402
from foglamp_filter_python35_spark.functions import similarity as S  # noqa: E402
from foglamp_filter_python35_spark.session import get_spark  # noqa: E402

THR = 0.4
DIM = 64


def _np_dot_fold_udf():
    @F.pandas_udf("double")
    def np_dot_fold(a: pd.Series, b: pd.Series) -> pd.Series:
        def row(x, y):
            if x is None or y is None or len(x) != len(y):
                return np.nan
            if len(x) == 0:
                return 0.0
            p = np.asarray(x, dtype=np.float64) * np.asarray(
                y, dtype=np.float64
            )
            return np.add.accumulate(p)[-1]

        try:
            av = np.stack(a.to_numpy()).astype(np.float64)
            bv = np.stack(b.to_numpy()).astype(np.float64)
            if av.ndim != 2 or av.shape != bv.shape:
                raise ValueError
            if av.shape[1] == 0:
                res = np.zeros(len(av))
            else:
                res = np.add.accumulate(av * bv, axis=1)[:, -1]
        except (ValueError, TypeError):
            res = np.array([row(x, y) for x, y in zip(a, b)])
        return pd.Series(res)

    # guide 4.4: the score filter above the projection would otherwise
    # duplicate the ArrowEvalPython node (measured: 2 nodes)
    return np_dot_fold.asNondeterministic()


def vec_clean(v):
    bad = F.exists(
        v,
        lambda x: x.isNull()
        | F.isnan(x)
        | (F.abs(x) == F.lit(float("inf"))),
    )
    return v.isNotNull() & ~bad


def rp_lsh_kernel(emb, threshold, dim, n):
    n_planes, bits_per_band = S.lsh_config(n)
    planes = S.random_hyperplanes(n_planes, dim, 42)
    n_bands = n_planes // bits_per_band
    id_col, vec_col = "vec_id", "embedding"
    sk = emb.select(
        F.col(id_col),
        F.col(vec_col),
        S.rp_lsh_sketch(F.col(vec_col), planes, bits_per_band).alias("bands"),
    )
    banded = sk.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.col("bands")[b].alias("band_val"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select(id_col, "band.band_id", "band.band_val")
    a = banded.alias("a")
    b = banded.alias("b")
    cands = a.join(
        b,
        (F.col("a.band_id") == F.col("b.band_id"))
        & (F.col("a.band_val") == F.col("b.band_val"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
    )
    va = emb.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        S.norm(F.col(vec_col)).alias("norm_a"),
        vec_clean(F.col(vec_col)).alias("_ca"),
    )
    vb = emb.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        S.norm(F.col(vec_col)).alias("norm_b"),
        vec_clean(F.col(vec_col)).alias("_cb"),
    )
    d = F.when(
        F.col("_ca") & F.col("_cb") & (F.size("va") == F.size("vb")),
        _np_dot_fold_udf()(F.col("va"), F.col("vb")),
    ).otherwise(S.dot(F.col("va"), F.col("vb")))
    scored = (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.try_divide(d, F.col("norm_a") * F.col("norm_b")).alias(
                "score"
            ),
        )
        .filter(F.col("score") >= threshold)
    )
    return scored.dropDuplicates(["id_a", "id_b"])


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="r18-lsh-kernel-ab")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load(spark, sf_dir, "embeddings")
    emb.count()
    n = parquet_row_count(sf_dir, "embeddings")

    def build_a():
        return S.rp_lsh_near_dups(emb, threshold=THR, dim=DIM, n=n)

    def build_k():
        return rp_lsh_kernel(emb, THR, DIM, n)

    best = {"A": float("inf"), "K": float("inf")}
    for _ in range(3):
        for name, b in (("A", build_a), ("K", build_k)):
            df = b()
            spark.sparkContext.setJobDescription(f"lsh verify {name}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best[name] = min(best[name], time.perf_counter() - t0)
            cache.release(blocking=True)
    for name in best:
        print(f"shape {name}: {best[name]:.3f}s")

    # ArrowEvalPython duplication check (guide 4.4)
    plan = build_k()._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    print("ArrowEvalPython nodes:", plan.count("ArrowEvalPython"))

    # bit-parity: every (id_a, id_b) must match with IDENTICAL double bits
    ra = {(r.id_a, r.id_b): r.score for r in build_a().collect()}
    rk = {(r.id_a, r.id_b): r.score for r in build_k().collect()}
    assert set(ra) == set(rk), (
        f"pair sets differ: {len(ra)} vs {len(rk)}"
    )
    nbit = 0
    for k in ra:
        b1 = struct.pack("<d", ra[k])
        b2 = struct.pack("<d", rk[k])
        if b1 != b2:
            nbit += 1
            if nbit < 5:
                print("BIT DIFF", k, ra[k].hex(), rk[k].hex())
    print(f"pairs: {len(ra)}, bit-diffs: {nbit}")
    assert nbit == 0
    spark.stop()


if __name__ == "__main__":
    main()

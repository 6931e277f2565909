"""r18: isolate the RP-LSH verify stage — fold vs guarded Arrow kernel.

The full-query A/B (tools/r18_lsh_kernel_ab.py) showed kernel 3.26 ->
1.93s, but the isolated IVF probe shows the fold at ~0.6us/pair — 9x
cheaper than the LSH full-query delta implies.  This probe persists the
candidate id pairs OUTSIDE the timed region and times only
fetch-vectors + score + filter for both shapes, so the verify cost is
not confounded with the sketch/band-join work.

Usage: python tools/r18_lsh_verify_isolate.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from foglamp_filter_python35_spark.catalog import (  # noqa: E402
    load,
    parquet_row_count,
)
from foglamp_filter_python35_spark.functions import similarity as S  # noqa: E402
from foglamp_filter_python35_spark.session import get_spark  # noqa: E402


# --- the (rejected) guarded Arrow left-fold kernel, inlined so this
# probe stays runnable: the engine shipped the repartition fix instead
# and carries no kernel code (see tools/r18_lsh_kernel_ab.py) ---
import numpy as _np
import pandas as _pd
from pyspark.sql import Column as _Column


def _np_dot_fold_udf():
    @F.pandas_udf("double")
    def np_dot_fold(a: _pd.Series, b: _pd.Series) -> _pd.Series:
        def row(x, y):
            if x is None or y is None or len(x) != len(y):
                return _np.nan
            if len(x) == 0:
                return 0.0
            p = _np.asarray(x, dtype=_np.float64) * _np.asarray(
                y, dtype=_np.float64
            )
            return _np.add.accumulate(p)[-1]

        try:
            av = _np.stack(a.to_numpy()).astype(_np.float64)
            bv = _np.stack(b.to_numpy()).astype(_np.float64)
            if av.ndim != 2 or av.shape != bv.shape:
                raise ValueError
            if av.shape[1] == 0:
                res = _np.zeros(len(av))
            else:
                res = _np.add.accumulate(av * bv, axis=1)[:, -1]
        except (ValueError, TypeError):
            res = _np.array([row(x, y) for x, y in zip(a, b)])
        return _pd.Series(res)

    return np_dot_fold.asNondeterministic()


def _vec_clean(v: _Column) -> _Column:
    bad = F.exists(
        v,
        lambda x: x.isNull()
        | F.isnan(x)
        | (F.abs(x) == F.lit(float("inf"))),
    )
    return v.isNotNull() & ~bad


def _guarded_pair_dot(va, vb, ca, cb):
    return F.when(
        ca & cb & (F.size(va) == F.size(vb)),
        _np_dot_fold_udf()(va, vb),
    ).otherwise(S.dot(va, vb))


THR = 0.4
DIM = 64


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="r18-lsh-verify-isolate")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    emb = emb.persist()
    emb.count()
    n = parquet_row_count(sf_dir, "embeddings")
    n_planes, bits_per_band = S.lsh_config(n)
    planes = S.random_hyperplanes(n_planes, DIM, 42)
    n_bands = n_planes // bits_per_band
    sk = emb.select(
        "vec_id",
        S.rp_lsh_sketch(F.col("embedding"), planes, bits_per_band).alias(
            "bands"
        ),
    )
    banded = sk.select(
        "vec_id",
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
    ).select("vec_id", "band.band_id", "band.band_val")
    a = banded.alias("a")
    b = banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
        )
        .persist()
    )
    print("candidate instances:", cands.count())

    def verify(kernel):
        extra = (
            [_vec_clean(F.col("embedding")).alias("_c")] if kernel else []
        )
        va = emb.select(
            F.col("vec_id").alias("id_a"),
            F.col("embedding").alias("va"),
            S.norm(F.col("embedding")).alias("norm_a"),
            *[e.alias("_ca") for e in extra],
        )
        vb = emb.select(
            F.col("vec_id").alias("id_b"),
            F.col("embedding").alias("vb"),
            S.norm(F.col("embedding")).alias("norm_b"),
            *[e.alias("_cb") for e in extra],
        )
        if kernel:
            d = _guarded_pair_dot(
                F.col("va"), F.col("vb"), F.col("_ca"), F.col("_cb")
            )
        else:
            d = S.dot(F.col("va"), F.col("vb"))
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
            .filter(F.col("score") >= THR)
        )
        return scored.dropDuplicates(["id_a", "id_b"])

    best = {"fold": float("inf"), "kernel": float("inf")}
    for _ in range(3):
        for name, k in (("fold", False), ("kernel", True)):
            df = verify(k)
            spark.sparkContext.setJobDescription(f"lsh verify {name}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best[name] = min(best[name], time.perf_counter() - t0)
    for name in best:
        print(f"verify[{name}]: {best[name]:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()

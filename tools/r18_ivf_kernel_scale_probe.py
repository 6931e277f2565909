"""r18: fold-vs-Arrow-kernel crossover for the IVF pair verify.

The guarded Arrow kernel (see similarity._np_dot_fold_udf) won at the
RP-LSH verify's 515k candidate pairs (3.26 -> 1.93s) but LOST at
ivf_cell_pairs' 124k pairs at sf0.1 (1.11 -> 1.47s): the Python-worker
spin-up + Arrow vector serialization is a fixed cost the fold does not
pay.  This probe measures the same two verify shapes on a 10x corpus
(exact copies of the sf0.1 embedding table with shifted ids, defaults
cell sizing => ~10x the candidate pairs) with the assignment frame
persisted OUTSIDE the timed region, so the timing isolates the verify.

Usage: python tools/r18_ivf_kernel_scale_probe.py [copies] [sf_dir]
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


THR = 0.9


def verify(emb, assign, threshold, kernel):
    """ivf_cell_pairs' verify stage on a precomputed assignment —
    `kernel=False` is the pre-r18 interpreted-fold shape, `kernel=True`
    the guarded Arrow left-fold kernel shape."""
    id_col, vec_col = "vec_id", "embedding"
    a = assign.select(F.col(id_col).alias("id_a"), "cid")
    b = assign.select(F.col(id_col).alias("id_b"), "cid")
    pairs = a.join(b, "cid").filter(F.col("id_a") < F.col("id_b"))
    extra_a = [_vec_clean(F.col(vec_col)).alias("_ca")] if kernel else []
    extra_b = [_vec_clean(F.col(vec_col)).alias("_cb")] if kernel else []
    va = emb.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        S.norm(F.col(vec_col)).alias("norm_a"),
        *extra_a,
    )
    vb = emb.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        S.norm(F.col(vec_col)).alias("norm_b"),
        *extra_b,
    )
    if kernel:
        d = _guarded_pair_dot(
            F.col("va"), F.col("vb"), F.col("_ca"), F.col("_cb")
        )
    else:
        d = S.dot(F.col("va"), F.col("vb"))
    return (
        pairs.join(va, "id_a")
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


def main():
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="r18-ivf-kernel-scale")
    spark.sparkContext.setLogLevel("ERROR")
    base = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n1 = parquet_row_count(sf_dir, "embeddings")
    n = n1 * copies
    emb = base
    for k in range(1, copies):
        emb = emb.unionAll(
            base.select(
                (F.col("vec_id") + F.lit(k * n1)).alias("vec_id"),
                "embedding",
            )
        )
    emb = emb.persist()
    emb.count()
    cents = S.seed_centroids(emb, S.ivf_cell_count(n))
    assign = S.ivf_assign(emb, cents).persist()
    print(f"corpus n={n}, cells={S.ivf_cell_count(n)}, assign rows:",
          assign.count())
    npairs = (
        assign.groupBy("cid")
        .count()
        .select(F.sum(F.col("count") * (F.col("count") - 1) / 2))
        .collect()[0][0]
    )
    print(f"candidate pairs: {npairs:,.0f}")

    best = {"fold": float("inf"), "kernel": float("inf")}
    for _ in range(3):
        for name, k in (("fold", False), ("kernel", True)):
            df = verify(emb, assign, THR, k)
            spark.sparkContext.setJobDescription(f"ivf verify {name}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best[name] = min(best[name], time.perf_counter() - t0)
    for name in best:
        print(f"verify[{name}]: {best[name]:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()

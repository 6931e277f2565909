"""r17 probe 2: unrolled fixed-dim dot product vs interpreted fold;
LSH verify candidate counts; CC star round cost; ensemble signal split.
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from foglamp_filter_python35_spark.catalog import load  # noqa: E402
from foglamp_filter_python35_spark.functions import dedup as D  # noqa: E402
from foglamp_filter_python35_spark.functions import similarity as S  # noqa: E402
from foglamp_filter_python35_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("R17_PROBE_N", "3"))


def t(label, df_fn):
    samples = []
    for _ in range(N):
        df = df_fn()
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    print(f"{label:52s} min {min(samples):6.3f}s  {[round(s,3) for s in samples]}")


DIM = 64


def dot_unrolled(a, b):
    """((0.0 + a0*b0) + a1*b1) + ... — same IEEE order as the fold,
    codegen-able; guarded to the fold for non-DIM rows."""
    acc = F.lit(0.0)
    for i in range(DIM):
        acc = acc + F.get(a, i).cast("double") * F.get(b, i).cast("double")
    fold = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.when((F.size(a) == DIM) & (F.size(b) == DIM), acc).otherwise(fold)


def main():
    spark = get_spark(app_name="r17-probe2")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load(spark, SF, "embeddings")
    docs = load(spark, SF, "documents")

    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))

    def topk_fold():
        return S.brute_force_topk(emb, q, 10)

    def topk_unrolled():
        qq = q.select("qv", F.sqrt(dot_unrolled(F.col("qv"), F.col("qv"))).alias("_qn"))
        scored = emb.crossJoin(F.broadcast(qq)).select(
            "vec_id",
            F.try_divide(
                dot_unrolled(F.col("embedding"), F.col("qv")),
                F.sqrt(dot_unrolled(F.col("embedding"), F.col("embedding")))
                * F.col("_qn"),
            ).alias("score"),
        )
        return scored.orderBy(F.col("score").desc(), "vec_id").limit(10)

    t("topk: exact fold cosine (current)", topk_fold)
    t("topk: UNROLLED dot + factored qnorm", topk_unrolled)
    a0, a1 = topk_fold(), topk_unrolled()
    diff = a0.exceptAll(a1).count() + a1.exceptAll(a0).count()
    print(f"topk unrolled parity: diff_rows={diff}")

    # candidate volume in the LSH verify
    sk = emb.select(
        "vec_id",
        S.rp_lsh_sketch(
            F.col("embedding"), S.random_hyperplanes(16, 64), 4
        ).alias("bands"),
    )
    banded = sk.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band_id"), F.col("bands")[b].alias("band_val"))
                    for b in range(4)
                ]
            )
        ).alias("band"),
    ).select("vec_id", "band.band_id", "band.band_val")
    a, b = banded.alias("a"), banded.alias("b")
    cands = a.join(
        b,
        (F.col("a.band_id") == F.col("b.band_id"))
        & (F.col("a.band_val") == F.col("b.band_val"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"))
    n_raw = cands.count()
    n_distinct = cands.distinct().count()
    print(f"lsh candidates: raw={n_raw} distinct={n_distinct}")

    # ivf cell pair volume
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    assign = S.ivf_assign(emb, cents)
    apairs = (
        assign.select(F.col("vec_id").alias("id_a"), "cid")
        .join(assign.select(F.col("vec_id").alias("id_b"), "cid"), "cid")
        .filter(F.col("id_a") < F.col("id_b"))
    )
    print(f"ivf cell pairs: {apairs.count()}")

    # unrolled dot in the ivf verify
    def cell_pairs_unrolled():
        va = emb.select(
            F.col("vec_id").alias("id_a"),
            F.col("embedding").alias("va"),
            F.sqrt(dot_unrolled(F.col("embedding"), F.col("embedding"))).alias("norm_a"),
        )
        vb = emb.select(
            F.col("vec_id").alias("id_b"),
            F.col("embedding").alias("vb"),
            F.sqrt(dot_unrolled(F.col("embedding"), F.col("embedding"))).alias("norm_b"),
        )
        return (
            apairs.join(va, "id_a")
            .join(vb, "id_b")
            .select(
                "id_a",
                "id_b",
                F.try_divide(
                    dot_unrolled(F.col("va"), F.col("vb")),
                    F.col("norm_a") * F.col("norm_b"),
                ).alias("score"),
            )
            .filter(F.col("score") >= 0.4)
        )

    t("ivf_cell_pairs verify: current", lambda: S.ivf_cell_pairs(emb, cents, 0.4))
    t("ivf_cell_pairs verify: UNROLLED", cell_pairs_unrolled)
    c0 = S.ivf_cell_pairs(emb, cents, 0.4).select("id_a", "id_b", "score")
    c1 = cell_pairs_unrolled()
    diff = c0.exceptAll(c1).count() + c1.exceptAll(c0).count()
    print(f"ivf verify unrolled parity: diff_rows={diff}")

    # ensemble: per-signal cost from one shared sets frame
    from foglamp_filter_python35_spark.functions import cache  # noqa: PLC0415

    def mk_sets():
        return cache.register(D.doc_shingle_sets(docs))

    sets = mk_sets()
    sh = sets.select("doc_id", F.explode("sset").alias("shingle"))
    t("ensemble: simhash_from_shingles", lambda: D.simhash_from_shingles(sh))
    t(
        "ensemble: containment_from_shingles",
        lambda: D.containment_from_shingles(sh, sets, threshold=0.9),
    )
    cache.release()

    spark.stop()


if __name__ == "__main__":
    main()

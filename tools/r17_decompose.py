"""r17 stage-decomposition probe: where do the heavy catalog queries
spend their time at sf0.1?  Times each sub-pipeline through the noop
sink (min-of-N), so the per-operator deltas in OPTIMIZATION_r17.md are
attributable to a stage, not a guess.  Read-only: no catalog code is
touched; this mirrors each query's internal dataflow.
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
    print(f"{label:48s} min {min(samples):6.3f}s  {[round(s,3) for s in samples]}")


def main():
    spark = get_spark(app_name="r17-decompose")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load(spark, SF, "embeddings")
    docs = load(spark, SF, "documents")
    n_emb = emb.count()
    n_docs = docs.count()
    print(f"embeddings: {n_emb} rows; documents: {n_docs} rows")

    # --- embedding_lsh_dup decomposition ---
    planes = S.random_hyperplanes(16, 64)

    def sk():
        return emb.select(
            "vec_id",
            S.rp_lsh_sketch(F.col("embedding"), planes, 4).alias("bands"),
        )

    t("lsh: sketch only (16 plane dots/row)", sk)

    def cands():
        skdf = sk()
        banded = skdf.select(
            "vec_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band_id"),
                            F.col("bands")[b].alias("band_val"),
                        )
                        for b in range(4)
                    ]
                )
            ).alias("band"),
        ).select("vec_id", "band.band_id", "band.band_val")
        a, b = banded.alias("a"), banded.alias("b")
        return a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        ).select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"))

    t("lsh: sketch+band join (no verify)", cands)
    t("lsh: full rp_lsh_near_dups", lambda: S.rp_lsh_near_dups(emb, 0.4, dim=64, n=n_emb))

    # --- ivf_assign decomposition ---
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    t("ivf_assign (cosine x16/row, max_by)", lambda: S.ivf_assign(emb, cents))

    def assign_factored():
        embn = emb.select(
            "vec_id", "embedding", S.norm(F.col("embedding")).alias("_vn")
        )
        centn = cents.select("cid", "cv", S.norm(F.col("cv")).alias("_cn"))
        scored = embn.crossJoin(F.broadcast(centn)).select(
            "vec_id",
            "cid",
            F.try_divide(
                S.dot(F.col("embedding"), F.col("cv")),
                F.col("_vn") * F.col("_cn"),
            ).alias("cscore"),
        )
        return scored.groupBy("vec_id").agg(
            F.max_by(F.col("cid"), F.struct(F.col("cscore"), -F.col("cid"))).alias("cid")
        )

    t("ivf_assign FACTORED norms", assign_factored)

    # parity check: factored assignment must be identical
    a0 = S.ivf_assign(emb, cents)
    a1 = assign_factored()
    diff = a0.exceptAll(a1).count() + a1.exceptAll(a0).count()
    print(f"ivf_assign factored parity: diff_rows={diff}")

    # --- single-pass multi-plane sketch vs 16 separate folds ---
    n_bands, bits = 4, 4
    pt = [[planes[j][i] for j in range(16)] for i in range(64)]  # transposed

    def sketch_matrix():
        ptlit = F.array(*[F.array(*[F.lit(x) for x in row]) for row in pt])
        pairs = F.zip_with(
            F.col("embedding"),
            ptlit,
            lambda x, pr: F.struct(x.cast("double").alias("x"), pr.alias("pr")),
        )
        acc = F.aggregate(
            pairs,
            F.array_repeat(F.lit(0.0), 16),
            lambda acc, s: F.zip_with(
                acc, s["pr"], lambda a, p: a + s["x"] * p
            ),
        )
        dots = acc  # 16 dots, bit-identical fold order per plane
        bands = []
        for b in range(n_bands):
            val = None
            for i in range(bits):
                d = dots[b * bits + i]
                bit = F.when(d >= 0, F.lit(1)).otherwise(F.lit(0))
                term = bit * F.lit(1 << i)
                val = term if val is None else val + term
            bands.append(val.alias(f"band{b}"))
        return emb.select("vec_id", F.array(*bands).alias("bands"))

    t("lsh: sketch SINGLE-PASS matrix fold", sketch_matrix)
    d0 = sk()
    d1 = sketch_matrix()
    diff = d0.exceptAll(d1).count() + d1.exceptAll(d0).count()
    print(f"sketch matrix parity: diff_rows={diff}")

    # --- minhash decomposition ---
    t("minhash: doc_shingle_sets only", lambda: D.doc_shingle_sets(docs))
    t(
        "minhash: sets+signatures (map-only)",
        lambda: D.minhash_doc_sets(docs),
    )

    def mh_cands():
        ds = D.minhash_doc_sets(docs)
        sigs = ds.select("doc_id", *[f"s{i}" for i in range(12)])
        bands = D.lsh_bands(sigs, "doc_id", 12, 2)
        return D.candidate_pairs(bands, "doc_id")

    t("minhash: through candidate_pairs", mh_cands)
    t(
        "minhash: full near-dups",
        lambda: D.minhash_lsh_near_dups(docs, num_hashes=12, rows_per_band=2, threshold=0.8),
    )

    # --- single-pass 12-min signature fold vs 12 array_min passes ---
    def mh_sigs_single():
        sets = D.doc_shingle_sets(docs)
        p = F.lit(D.MINHASH_PRIME)
        hashed = sets.select(
            "doc_id",
            "sset",
            F.transform("sset", lambda x: F.md5(x)).alias("_md5s"),
        ).select(
            "doc_id",
            "sset",
            F.transform(
                "_md5s",
                lambda m: F.struct(
                    (F.conv(F.substring(m, 1, 15), 16, 10).cast("long") % p).alias("h1"),
                    (F.conv(F.substring(m, 17, 15), 16, 10).cast("long") % p).alias("h2"),
                ),
            ).alias("_hs"),
        )
        big = F.lit((1 << 62)).cast("long")
        acc0 = F.array_repeat(big, 12)
        idx = F.array(*[F.lit(i).cast("long") for i in range(12)])
        mins = F.aggregate(
            "_hs",
            acc0,
            lambda acc, h: F.zip_with(
                acc, idx, lambda a, i: F.least(a, (h["h1"] + i * h["h2"]) % p)
            ),
        )
        return hashed.select(
            "doc_id", *[mins[i].alias(f"s{i}") for i in range(12)]
        )

    t("minhash: sigs SINGLE-PASS fold", mh_sigs_single)
    s0 = D.minhash_doc_sets(docs).select("doc_id", *[f"s{i}" for i in range(12)])
    s1 = mh_sigs_single()
    diff = s0.exceptAll(s1).count() + s1.exceptAll(s0).count()
    print(f"minhash single-pass sigs parity: diff_rows={diff}")

    # --- connected components star: round count + per-round cost ---
    pairs = D.minhash_lsh_near_dups(docs, num_hashes=12, rows_per_band=2, threshold=0.8)
    n_pairs = pairs.count()
    print(f"minhash near-dup pairs at sf0.1: {n_pairs}")
    t0 = time.perf_counter()
    comp = D.connected_components_star(pairs)
    comp.write.format("noop").mode("overwrite").save()
    print(f"CC star end-to-end (incl pairs): {time.perf_counter()-t0:.3f}s")

    spark.stop()


if __name__ == "__main__":
    main()

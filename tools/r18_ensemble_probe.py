"""r18 probe: decompose dedup_ensemble's containment branch cost.

Times (noop sink, min-of-N, labeled jobs) the containment pipeline's
stages from the shared persisted (id, sset) frame, to locate the
remaining floor the r17 verdict flagged (~2.2s of the ~6.8s ensemble):
window DF-tagging, the rare-shingle pair join + inter agg, the stats
joins + ub prefilter, and the final set-array verify.

Usage: python tools/r18_ensemble_probe.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from foglamp_filter_python35_spark.catalog import load  # noqa: E402
from foglamp_filter_python35_spark.functions import cache  # noqa: E402
from foglamp_filter_python35_spark.functions import dedup as D  # noqa: E402
from foglamp_filter_python35_spark.session import get_spark  # noqa: E402


def t(spark, label, df, n=3):
    best = float("inf")
    for _ in range(n):
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
        cache.release(blocking=False)
    print(f"{label:45s} {best:7.3f}s")
    return best


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="r18-ensemble-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load(spark, sf_dir, "documents")

    # warm
    docs.count()

    def fresh_sets():
        return cache.register(D.doc_shingle_sets(docs))

    # --- stage 0: the shared persisted sets frame alone
    t(spark, "sets (persist+materialize)", D.doc_shingle_sets(docs))

    # --- stage 1: window DF tagging (pruned + stats)
    sets = fresh_sets()
    sh = sets.select("doc_id", F.explode("sset").alias("shingle"))
    pruned, stats = D._df_pruned_and_stats(sh, "doc_id", D.NGRAM_MAX_DF)
    t(spark, "pruned rows (window DF)", pruned)
    t(spark, "stats (window DF + agg)", stats)

    # --- stage 2: pair join + inter agg
    sets = fresh_sets()
    sh = sets.select("doc_id", F.explode("sset").alias("shingle"))
    pruned, stats = D._df_pruned_and_stats(sh, "doc_id", D.NGRAM_MAX_DF)
    sa = pruned.select(F.col("doc_id").alias("id_a"), "shingle")
    sb = pruned.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (
        sa.join(sb, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter_rare"))
    )
    t(spark, "inter (pair join + agg)", inter)
    print("inter rows:", inter.count())
    print(
        "rare-shingle join rows:",
        sa.join(sb, "shingle").filter(F.col("id_a") < F.col("id_b")).count(),
    )

    # --- stage 3: survivors (stats joins + ub filter)
    st_a = stats.select(
        F.col("doc_id").alias("id_a"),
        F.col("n_total").alias("na"),
        F.col("n_common").alias("nca"),
    )
    st_b = stats.select(
        F.col("doc_id").alias("id_b"),
        F.col("n_total").alias("nb"),
        F.col("n_common").alias("ncb"),
    )
    ub = (
        F.col("inter_rare") + F.least(F.col("nca"), F.col("ncb"))
    ).cast("double") / F.least(F.col("na"), F.col("nb"))
    survivors = (
        inter.join(st_a, "id_a")
        .join(st_b, "id_b")
        .filter(ub >= 0.9)
        .select("id_a", "id_b")
    )
    t(spark, "survivors (stats joins + ub)", survivors)
    print("survivor rows:", survivors.count())

    # --- stage 4: full containment branch
    sets = fresh_sets()
    sh = sets.select("doc_id", F.explode("sset").alias("shingle"))
    cont = D.containment_from_shingles(sh, sets, threshold=0.9)
    t(spark, "containment full (from cached sets)", cont)

    # --- whole ensemble for reference
    from foglamp_filter_python35_spark.catalog.dedup import q_dedup_ensemble

    t(spark, "dedup_ensemble full", q_dedup_ensemble(spark, sf_dir))

    spark.stop()


if __name__ == "__main__":
    main()

"""r18 A/B: containment_from_shingles restructure candidates.

Shapes (all row-identical to the current one — asserted here):
  A: current (window DF tagging; shuffle-join verify)
  B: A + persist the _df-tagged stream (window executes once, not 4x)
  D: A + broadcast-survivors verify (streamed passes over sets)
  BD: both

Interleaved min-of-N per shape in one session; exact-parity check via
exceptAll both ways at the end.

Usage: python tools/r18_containment_ab.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from foglamp_filter_python35_spark.catalog import load  # noqa: E402
from foglamp_filter_python35_spark.functions import cache  # noqa: E402
from foglamp_filter_python35_spark.functions import dedup as D  # noqa: E402
from foglamp_filter_python35_spark.session import get_spark  # noqa: E402

THRESHOLD = 0.9
MAX_DF = D.NGRAM_MAX_DF


def _survivors(pruned: DataFrame, stats: DataFrame) -> DataFrame:
    sa = pruned.select(F.col("doc_id").alias("id_a"), "shingle")
    sb = pruned.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (
        sa.join(sb, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter_rare"))
    )
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
    return (
        inter.join(st_a, "id_a")
        .join(st_b, "id_b")
        .filter(ub >= THRESHOLD)
        .select("id_a", "id_b")
    )


def _pruned_stats_plain(sh):
    w = Window.partitionBy("shingle")
    shdf = sh.withColumn("_df", F.count(F.lit(1)).over(w))
    pruned = shdf.filter(F.col("_df") <= MAX_DF).select("doc_id", "shingle")
    stats = shdf.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col("_df") <= MAX_DF, 0).otherwise(1)).alias(
            "n_common"
        ),
    )
    return pruned, stats


def _pruned_stats_persist(sh):
    w = Window.partitionBy("shingle")
    shdf = cache.register(
        sh.withColumn("_df", F.count(F.lit(1)).over(w))
    )
    pruned = shdf.filter(F.col("_df") <= MAX_DF).select("doc_id", "shingle")
    stats = shdf.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col("_df") <= MAX_DF, 0).otherwise(1)).alias(
            "n_common"
        ),
    )
    return pruned, stats


def _verify_shuffle(survivors, sets):
    s_a = sets.select(F.col("doc_id").alias("id_a"), F.col("sset").alias("set_a"))
    s_b = sets.select(F.col("doc_id").alias("id_b"), F.col("sset").alias("set_b"))
    n_shared = F.size(F.array_intersect("set_a", "set_b"))
    containment = n_shared.cast("double") / F.least(
        F.size("set_a"), F.size("set_b")
    )
    return (
        survivors.join(s_a, "id_a")
        .join(s_b, "id_b")
        .select("id_a", "id_b", containment.alias("containment"))
        .filter(F.col("containment") >= THRESHOLD)
    )


def _verify_broadcast(survivors, sets):
    s_a = sets.select(F.col("doc_id").alias("id_a"), F.col("sset").alias("set_a"))
    s_b = sets.select(F.col("doc_id").alias("id_b"), F.col("sset").alias("set_b"))
    n_shared = F.size(F.array_intersect("set_a", "set_b"))
    containment = n_shared.cast("double") / F.least(
        F.size("set_a"), F.size("set_b")
    )
    with_a = s_a.join(F.broadcast(survivors), "id_a")
    return (
        s_b.join(F.broadcast(with_a), "id_b")
        .select("id_a", "id_b", containment.alias("containment"))
        .filter(F.col("containment") >= THRESHOLD)
    )


def build(docs, shape: str) -> DataFrame:
    sets = cache.register(D.doc_shingle_sets(docs))
    sh = sets.select("doc_id", F.explode("sset").alias("shingle"))
    ps = _pruned_stats_persist if shape in ("B", "BD") else _pruned_stats_plain
    pruned, stats = ps(sh)
    surv = _survivors(pruned, stats)
    ver = _verify_broadcast if shape in ("D", "BD") else _verify_shuffle
    return ver(surv, sets)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="r18-containment-ab")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load(spark, sf_dir, "documents")
    docs.count()

    shapes = ["A", "B", "D", "BD"]
    best = {s: float("inf") for s in shapes}
    for _round in range(3):
        for s in shapes:
            df = build(docs, s)
            spark.sparkContext.setJobDescription(f"containment shape {s}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best[s] = min(best[s], time.perf_counter() - t0)
            cache.release(blocking=True)
    for s in shapes:
        print(f"shape {s}: {best[s]:.3f}s")

    # exact parity, all shapes vs A
    ref = build(docs, "A")
    for s in shapes[1:]:
        other = build(docs, s)
        d1 = ref.exceptAll(other).count()
        d2 = other.exceptAll(ref).count()
        print(f"parity {s} vs A: exceptAll {d1}/{d2}")
        assert d1 == 0 and d2 == 0
        cache.release(blocking=True)
    spark.stop()


if __name__ == "__main__":
    main()

"""r18 (VERDICT ask #4): hot-shingle skew bound for _df_pruned_and_stats.

The r17 restructure computes per-shingle document frequency as
``count() over (partition by shingle)`` — one exchange, but the hottest
shingle's ENTIRE row set lands in one window task (no partial
aggregation, and AQE cannot split window partitions).  This probe
generates a deliberately skewed corpus — one shingle present in 30% of
documents — and measures the current window shape against the pre-r17
groupBy + join-back shape at growing doc counts, timing the full
(pruned, stats) materialization both shapes produce identically.

Synthetic stream: n_docs docs x 30 near-unique shingles each, plus the
hot shingle in 30% of docs.  All Catalyst (range/explode/concat), no
Python rows, deterministic.

Usage: python tools/r18_df_skew_probe.py [n_docs ...]
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from foglamp_filter_python35_spark.session import get_spark  # noqa: E402

MAX_DF = 50
SHINGLES_PER_DOC = 30
HOT_FRACTION = 10 // 3  # doc_id % 10 < 3 -> 30%


def skewed_stream(spark, n_docs):
    ids = spark.range(n_docs)
    sh = ids.select(
        F.col("id").alias("doc_id"),
        F.explode(
            F.sequence(F.lit(0), F.lit(SHINGLES_PER_DOC - 1))
        ).alias("i"),
    ).select(
        "doc_id",
        F.concat(
            F.lit("s"), (F.col("doc_id") * 31 + F.col("i")).cast("string")
        ).alias("shingle"),
    )
    hot = ids.filter(F.col("id") % 10 < 3).select(
        F.col("id").alias("doc_id"), F.lit("HOT#the#the").alias("shingle")
    )
    return sh.unionAll(hot)


def window_shape(sh):
    w = Window.partitionBy("shingle")
    shdf = sh.withColumn("_df", F.count(F.lit(1)).over(w))
    pruned = shdf.filter(F.col("_df") <= MAX_DF).select("doc_id", "shingle")
    stats = shdf.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(
            F.when(F.col("_df") <= MAX_DF, 0).otherwise(1)
        ).alias("n_common"),
    )
    return pruned, stats


def groupby_shape(sh):
    dfc = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    shdf = sh.join(dfc, "shingle")
    pruned = shdf.filter(F.col("_df") <= MAX_DF).select("doc_id", "shingle")
    stats = shdf.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(
            F.when(F.col("_df") <= MAX_DF, 0).otherwise(1)
        ).alias("n_common"),
    )
    return pruned, stats


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [200_000, 1_000_000]
    spark = get_spark(app_name="r18-df-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        stream = skewed_stream(spark, n)
        best = {"window": float("inf"), "groupby": float("inf")}
        for _ in range(2):
            for name, shape in (
                ("window", window_shape),
                ("groupby", groupby_shape),
            ):
                pruned, stats = shape(stream)
                spark.sparkContext.setJobDescription(f"df {name} n={n}")
                t0 = time.perf_counter()
                pruned.write.format("noop").mode("overwrite").save()
                stats.write.format("noop").mode("overwrite").save()
                best[name] = min(
                    best[name], time.perf_counter() - t0
                )
        hot_rows = (3 * n) // 10
        print(
            f"n_docs={n:>9,} rows={(SHINGLES_PER_DOC * n + hot_rows):>11,}"
            f" hot_rows={hot_rows:>9,}"
            f"  window={best['window']:.2f}s groupby={best['groupby']:.2f}s"
        )
    spark.stop()


if __name__ == "__main__":
    main()

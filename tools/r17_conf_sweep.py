"""r17 config sweep: time a representative catalog subset under
candidate session-config variants (one Spark session per variant,
interleaved rounds inside each session).  Candidates are the
optimization guide's §9 suggestions not already in session.py.
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from foglamp_filter_python35_spark.catalog import all_queries  # noqa: E402
from foglamp_filter_python35_spark.functions import cache  # noqa: E402
from foglamp_filter_python35_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"
WARM = "/root/testdata/sf0.001"
NAMES = [
    "pricing_summary", "revenue_by_nation", "top_orders_per_segment",
    "sessionization", "waiting_suppliers", "market_share",
    "parts_supplier_counts", "min_cost_supplier", "salted_enrich_rollup",
    "dedup_exact", "minhash_lsh_dedup", "simhash_dedup", "doc_containment",
    "embedding_cosine_dup", "ivf_train_kmeans", "ivf_recall_audit",
    "bm25_retrieval", "text_stats", "event_funnel", "latest_event_per_user",
]

VARIANTS = {
    "current": {},
    "shj": {"spark.sql.join.preferSortMergeJoin": "false"},
    "zstd_shuffle": {"spark.io.compression.codec": "zstd"},
}


def run_variant(label: str, extra: dict) -> dict:
    spark = get_spark(app_name=f"conf-{label}", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    # warm pass absorbs codegen
    for n in NAMES:
        try:
            qs[n].fn(spark, WARM).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
        cache.release(blocking=False)
    best: dict[str, float] = {n: float("inf") for n in NAMES}
    for _ in range(3):
        for n in NAMES:
            t0 = time.perf_counter()
            qs[n].fn(spark, SF).write.format("noop").mode("overwrite").save()
            best[n] = min(best[n], time.perf_counter() - t0)
            cache.release(blocking=False)
    spark.stop()
    return best


def main():
    order = sys.argv[1:] or list(VARIANTS)
    results = {}
    for label in order:
        results[label] = run_variant(label, VARIANTS[label])
        total = sum(results[label].values())
        print(f"{label}: subset total {total:.2f}s")
    base = results.get("current")
    if base:
        for label, best in results.items():
            if label == "current":
                continue
            print(f"\n{label} vs current (per-query delta >5%):")
            for n in NAMES:
                d = best[n] - base[n]
                if abs(d) > 0.05 * base[n]:
                    print(f"  {n}: {base[n]:.3f} -> {best[n]:.3f}")
    for label, best in results.items():
        print(label, {k: round(v, 3) for k, v in best.items()})


if __name__ == "__main__":
    main()

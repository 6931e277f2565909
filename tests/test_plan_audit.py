"""Plan-level anti-pattern gate (the VERDICT grep audit, automated).

``tools/plan_audit.py`` sweeps all 153 queries standalone; this test
gates the heavy/dedup/vector families plus the reference ops inside the
suite, so a regression that introduces a row-at-a-time Python UDF
(``BatchEvalPython``) or a non-broadcast cartesian
(``CartesianProduct``) fails CI before any bench or judge run sees it.

Round-9 full-sweep baseline: 153 queries, 0 hard anti-patterns, 510
shuffles / 220 broadcasts / 18 Arrow-Python nodes total.
"""

from __future__ import annotations

import re

import pytest

from foglamp_filter_python35_spark.catalog import all_queries
from foglamp_filter_python35_spark.functions import cache

_SF = "/root/testdata/sf0.001"

# the families whose plans matter most at 100 TB + the reference ops
_GATED = (
    "scale35",
    "python_filter_scale35",
    "asset_filter",
    "type_coercion",
    "dedup_exact",
    "minhash_lsh_dedup",
    "simhash_dedup",
    "ngram_jaccard_pairs",
    "doc_containment",
    "dedup_ensemble",
    "dedup_clusters",
    "dedup_apply",
    "span_dedup",
    "incremental_dedup",
    "embedding_topk",
    "embedding_knn_join",
    "embedding_lsh_dup",
    "embedding_ivf_topk",
    "semantic_dedup",
    "embedding_cosine_dup",
    "ivf_train_kmeans",
    "embedding_pca_power",
    "multimodal_features",
    "multimodal_frames",
    "corpus_pipeline_e2e",
    "salted_enrich_rollup",
    "pricing_summary",
)

# the dedup-cluster family's plan BUILD alone costs 2-3s each (three
# banded candidate pipelines + CC iterations); their audit runs in the
# full suite, the fast gate keeps the other 23 plans
_HEAVY_BUILD = {"dedup_ensemble", "dedup_clusters", "dedup_apply",
                "semantic_dedup"}
_PARAMS = [
    pytest.param(n, marks=pytest.mark.slow) if n in _HEAVY_BUILD
    else pytest.param(n)
    for n in _GATED
]


@pytest.mark.parametrize("name", _PARAMS)
def test_plan_has_no_hard_anti_patterns(spark, name):
    spec = all_queries()[name]
    try:
        qe = spec.fn(spark, _SF)._jdf.queryExecution()  # noqa: SLF001
        plan = qe.optimizedPlan().toString() + qe.executedPlan().toString()
    finally:
        cache.release(blocking=False)
    assert "CartesianProduct" not in plan, (
        f"{name}: non-broadcast cartesian join in plan"
    )
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF in plan"
    )
    # every cross join must be the broadcast form of a tiny frame — the
    # catalog max is embedding_ivf_topk's 5 (centroid quantization
    # feeding two consumers + per-consumer query-vector broadcasts);
    # anything beyond that bound means a new unreviewed cross join
    n_bnlj = len(re.findall("BroadcastNestedLoopJoin", plan))
    assert n_bnlj <= 6, f"{name}: {n_bnlj} broadcast nested loops"

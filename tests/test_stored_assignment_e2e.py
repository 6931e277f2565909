"""Ingest-time stored-assignment deployment shape, end-to-end.

The 100 TB ANN layout the docs promise (similarity.py `ivf_cell_pairs` /
`ivf_topk` docstrings): quantize ONCE at ingest, persist (vec_id,
embedding, cid) into the ACID snapshot table clustered by cid with
manifest-level cid stats, then serve every search / dedup pass from the
stored assignment — no per-query quantization work, file-level cell
pruning at the scan.  This test composes S7 (snapshot_table) with X3's
``assign=`` API (VERDICT r7 ask #3) and pins:

- result identity: stored-assignment ``ivf_topk`` / ``ivf_topk_multiprobe``
  / ``ivf_cell_pairs`` == the inline-quantization path
- zero quantization work per query: the stored path's executed plan
  contains no centroid scoring (no centroid column, no argmax), and it
  launches no more Spark jobs than the inline path
- manifest pruning: ``read_snapshot(between=("cid", c, c))`` opens a
  strict subset of the table's files (cid min/max harvested from parquet
  footers at commit; at 100 TB this is the difference between scanning
  one cell and listing the corpus)

Reference parity anchor: the reference has no vector path at all — this
is part of the §2 X3 extension surface (SURVEY.md §2.5).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from foglamp_filter_python35_spark.catalog import load
from foglamp_filter_python35_spark.functions import cache
from foglamp_filter_python35_spark.functions import similarity as S
from foglamp_filter_python35_spark.sources import snapshot_table as st

_SF = "/root/testdata/sf0.001"  # 500 embedding rows
_K_CELLS = 16
_THRESHOLD = 0.4
_QUERY_ID = 7


@pytest.fixture(scope="module")
def ann_table(spark, tmp_path_factory):
    """Ingest once: embeddings + their IVF assignment, clustered by cid,
    cid stats harvested into the manifest."""
    path = str(tmp_path_factory.mktemp("ann") / "embeddings_ivf")
    emb = load(spark, _SF, "embeddings").select("vec_id", "embedding")
    cents = S.seed_centroids(emb, _K_CELLS)
    ingest = (
        emb.join(S.ivf_assign(emb, cents), "vec_id")
        # cluster by cell so each parquet file covers few cids and the
        # manifest's per-file [min, max] actually prunes — the local
        # stand-in for writing the corpus partitioned by cid
        .repartition(_K_CELLS // 2, "cid")
        .sortWithinPartitions("cid")
    )
    v = st.commit(ingest, path, stats_cols=["cid"])
    assert v == 0
    return path, cents


def _jobs(spark, group: str, action):
    """Run ``action`` under a job group; return how many Spark jobs it
    launched (statusTracker reports completed jobs per group)."""
    sc = spark.sparkContext
    sc.setJobGroup(group, group)
    try:
        result = action()
    finally:
        sc.setJobGroup("", "")
    return result, len(sc.statusTracker().getJobIdsForGroup(group))


def test_stored_assignment_serves_topk_without_quantization(
    spark, ann_table
):
    path, cents = ann_table
    emb = load(spark, _SF, "embeddings").select("vec_id", "embedding")
    tbl = st.read_snapshot(spark, path)
    stored_assign = tbl.select("vec_id", "cid")
    stored_emb = tbl.select("vec_id", "embedding")

    inline_df = S.ivf_topk(emb, cents, query_id=_QUERY_ID, k=5)
    stored_df = S.ivf_topk(
        stored_emb, None, query_id=_QUERY_ID, k=5, assign=stored_assign
    )

    # zero quantization per query: the stored plan never touches the
    # centroid frame — no centroid vector column, no argmax scoring
    stored_plan = stored_df._jdf.queryExecution().optimizedPlan().toString()
    inline_plan = inline_df._jdf.queryExecution().optimizedPlan().toString()
    assert "cscore" in inline_plan  # inline DOES quantize...
    assert "cscore" not in stored_plan  # ...the stored path never does
    assert "cv" not in stored_plan.split("Relation")[0]

    inline, n_inline = _jobs(
        spark,
        "ivf-inline",
        lambda: [(r.vec_id, r.score) for r in inline_df.collect()],
    )
    cache.release()
    stored, n_stored = _jobs(
        spark,
        "ivf-stored",
        lambda: [(r.vec_id, r.score) for r in stored_df.collect()],
    )
    assert inline == stored and len(inline) == 5
    # the stored path must not pay MORE scheduling than inline — the
    # quantization job moved to ingest, it didn't duplicate
    assert 0 < n_stored <= n_inline, (n_stored, n_inline)

    # multiprobe: centroids still rank the probe list, but the corpus
    # assignment comes from the table
    inline_mp = S.ivf_topk_multiprobe(
        emb, cents, query_id=_QUERY_ID, k=5, nprobe=3
    ).collect()
    cache.release()
    stored_mp = S.ivf_topk_multiprobe(
        stored_emb,
        cents,
        query_id=_QUERY_ID,
        k=5,
        nprobe=3,
        assign=stored_assign,
    ).collect()
    assert [(r.vec_id, r.score) for r in inline_mp] == [
        (r.vec_id, r.score) for r in stored_mp
    ]


def test_stored_assignment_serves_cell_pairs(spark, ann_table):
    path, cents = ann_table
    emb = load(spark, _SF, "embeddings").select("vec_id", "embedding")
    tbl = st.read_snapshot(spark, path)

    inline = {
        (r.id_a, r.id_b)
        for r in S.ivf_cell_pairs(emb, cents, _THRESHOLD).collect()
    }
    stored_df = S.ivf_cell_pairs(
        tbl.select("vec_id", "embedding"),
        None,
        _THRESHOLD,
        assign=tbl.select("vec_id", "cid"),
    )
    stored_plan = stored_df._jdf.queryExecution().optimizedPlan().toString()
    assert "cscore" not in stored_plan
    stored = {(r.id_a, r.id_b) for r in stored_df.collect()}
    assert inline == stored and inline


def test_manifest_cid_stats_prune_cell_scans(spark, ann_table):
    path, _ = ann_table
    full = st.read_snapshot(spark, path)
    n_files_total = len(full.inputFiles())
    assert n_files_total > 1  # clustering produced multiple files

    # the query's cell: what a stored-assignment search actually reads
    qcid = (
        full.filter(F.col("vec_id") == _QUERY_ID).select("cid").first()["cid"]
    )
    cell = st.read_snapshot(spark, path, between=("cid", qcid, qcid))
    # exact rows (pruning is a file-list optimization, never a filter
    # substitute) ...
    expect = {
        r.vec_id for r in full.filter(F.col("cid") == qcid).collect()
    }
    assert {r.vec_id for r in cell.collect()} == expect and expect
    # ... and strictly fewer files opened
    n_files_cell = len(cell.inputFiles())
    assert 0 < n_files_cell < n_files_total, (
        n_files_cell,
        n_files_total,
    )


def test_stored_table_survives_compaction(spark, ann_table):
    """compact() rewrites the file layout; the stored-assignment results
    must not change — the assignment is data, not layout."""
    path, cents = ann_table
    emb = load(spark, _SF, "embeddings").select("vec_id", "embedding")
    before = {
        (r.id_a, r.id_b)
        for r in S.ivf_cell_pairs(
            st.read_snapshot(spark, path).select("vec_id", "embedding"),
            None,
            _THRESHOLD,
            assign=st.read_snapshot(spark, path).select("vec_id", "cid"),
        ).collect()
    }
    st.compact(spark, path)
    tbl = st.read_snapshot(spark, path)
    after = {
        (r.id_a, r.id_b)
        for r in S.ivf_cell_pairs(
            tbl.select("vec_id", "embedding"),
            None,
            _THRESHOLD,
            assign=tbl.select("vec_id", "cid"),
        ).collect()
    }
    assert before == after
    inline = {
        (r.id_a, r.id_b)
        for r in S.ivf_cell_pairs(emb, cents, _THRESHOLD).collect()
    }
    assert after == inline

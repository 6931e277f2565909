"""Storage-layout claims, verified at plan level: the bucketed-table
join really is shuffle-free on the bucketed side, and the partitioned
readings layout really turns time/asset predicates into partition
pruning.  These are the SCALE.md claims behind 'recurring ingest joins
shuffle only the incoming batch' and 'readings queries prune instead of
scan'."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from foglamp_filter_python35_spark.plans import explain as E


def test_bucketed_fingerprint_join_skips_corpus_shuffle(spark, tmp_path):
    """Incremental dedup at scale: corpus fingerprints stored BUCKETED
    by fp make the recurring anti join shuffle-free on the corpus side —
    only the small incoming batch is exchanged."""
    from foglamp_filter_python35_spark.sources.readers import write_bucketed

    # conftest's session already points spark.sql.warehouse.dir at a
    # tmp location (static conf — cannot be set per-test)
    corpus = spark.range(0, 10_000).select(
        F.md5(F.col("id").cast("string")).alias("fp")
    )
    table = "corpus_fps_test"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    write_bucketed(corpus, table, "fp", n_buckets=8)
    try:
        stored = spark.table(table)
        # half the batch collides with the corpus, half is new
        batch = spark.range(0, 100).select(
            F.md5(
                F.when(F.col("id") < 50, F.col("id"))
                .otherwise(F.col("id") + 20_000)
                .cast("string")
            ).alias("fp")
        )
        # disable broadcast so the join must pick SMJ/shuffle strategy —
        # the bucketed side should STILL not exchange
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            fresh = batch.join(stored, "fp", "left_anti")
            plan = E.formatted_plan(fresh)
            assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            # exactly ONE exchange: the incoming batch; the bucketed
            # corpus reads pre-partitioned
            assert plan.count("hashpartitioning(") == 1, plan
            assert fresh.count() == 50  # only the genuinely-new half
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_partitioned_readings_layout_prunes_partitions(spark, tmp_path):
    """write_readings_partitioned lays out dt/asset_code directories;
    a time+asset predicate must show up as PartitionFilters on the scan
    (pruning), not as a post-scan filter over everything."""
    import datetime as dt

    from foglamp_filter_python35_spark.datamodel import READING_SCHEMA
    from foglamp_filter_python35_spark.sources.readers import (
        write_readings_partitioned,
    )

    rows = [
        (
            i,
            f"asset_{i % 3}",
            dt.datetime(2024, 1, 1 + (i % 5), 12, 0, 0),
            dt.datetime(2024, 1, 1 + (i % 5), 12, 0, 0),
            {"v": float(i)},
            {},
        )
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, READING_SCHEMA)
    out = str(tmp_path / "readings_part")
    write_readings_partitioned(df, out)

    back = spark.read.parquet(out).filter(
        (F.col("dt") == "2024-01-03") & (F.col("asset_code") == "asset_1")
    )
    plan = E.formatted_plan(back)
    assert "PartitionFilters" in plan
    # both predicates land in PartitionFilters, nothing re-filters rows
    pf = plan[plan.index("PartitionFilters"):].split("]", 1)[0]
    assert "dt" in pf and "asset_code" in pf
    expected = sum(
        1 for i in range(300) if i % 5 == 2 and i % 3 == 1
    )
    assert back.count() == expected

"""X5 plumbing tests: payload attach, feature extraction, frame fan-out,
decode stub contract."""

from __future__ import annotations

import hashlib

import pytest

from foglamp_filter_python35_spark.catalog import load
from foglamp_filter_python35_spark.functions import multimodal as M


def test_extract_features_deterministic(spark, sf_smoke):
    docs = M.attach_binary_payload(load(spark, sf_smoke, "documents"))
    feats = {r.doc_id: r for r in M.extract_features(docs).collect()}
    raw = {r.doc_id: r.text for r in load(spark, sf_smoke, "documents").collect()}
    assert len(feats) == len(raw)
    for doc_id, text in list(raw.items())[:20]:
        payload = text.encode()
        want = M.pseudo_decode(payload)
        got = feats[doc_id]
        assert got.n_bytes == len(payload)
        assert got.digest == hashlib.md5(payload).hexdigest()
        assert (got.width, got.height, got.n_frames) == (
            want["width"], want["height"], want["n_frames"],
        )


def test_frame_sampling_fans_out(spark, sf_smoke):
    docs = M.attach_binary_payload(load(spark, sf_smoke, "documents")).limit(30)
    frames = M.sample_frames(docs).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    raw = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    # every input doc must fan out — a doc silently dropped by the kernel
    # would otherwise never be iterated below
    assert set(by_doc) == set(raw)
    for doc_id, fr in by_doc.items():
        n = M.pseudo_decode(raw[doc_id].encode())["n_frames"]
        assert sorted(r.frame_idx for r in fr) == list(range(n))
        # frame slices partition the payload bytes
        total = sum(len(r.frame_payload) for r in fr)
        assert total == len(raw[doc_id].encode())


def test_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        M.decode_image(b"\x89PNG...")


def test_resize_is_deterministic_and_bounded(spark, sf_smoke):
    docs = M.attach_binary_payload(load(spark, sf_smoke, "documents").limit(50))
    out = {r.doc_id: r for r in M.resize(docs, width=16, height=16).collect()}
    again = {r.doc_id: r for r in M.resize(docs, width=16, height=16).collect()}
    assert len(out) == 50
    for doc_id, r in out.items():
        assert (r.width, r.height) == (16, 16)
        assert len(r.resized_payload) <= 16 * 16
        assert r.resized_payload == again[doc_id].resized_payload


def test_pointer_path_matches_inline_path(spark, sf_smoke, tmp_path):
    # the pointer-struct variants must produce byte-identical output to
    # the inline-binary kernels: packing + range fetch is lossless
    docs = load(spark, sf_smoke, "documents")
    ptrs = M.pack_payload_shards(docs, str(tmp_path / "shards"))
    ptrs = ptrs.localCheckpoint()

    inline = M.attach_binary_payload(docs)
    feats_inline = sorted(
        map(tuple, M.extract_features(inline).collect())
    )
    feats_ptr = sorted(map(tuple, M.extract_features_ptr(ptrs).collect()))
    assert feats_ptr == feats_inline

    frames_inline = sorted(map(tuple, M.sample_frames(inline).collect()))
    frames_ptr = sorted(map(tuple, M.sample_frames_ptr(ptrs).collect()))
    assert frames_ptr == frames_inline


def test_pointer_rows_are_valid_ranges(spark, sf_smoke, tmp_path):
    import os

    docs = load(spark, sf_smoke, "documents")
    shard_dir = str(tmp_path / "shards")
    rows = M.pack_payload_shards(docs, shard_dir).collect()
    raw = {r.doc_id: r.text.encode() for r in docs.collect()}
    assert {r.doc_id for r in rows} == set(raw)
    sizes = {
        f: os.path.getsize(os.path.join(shard_dir, f))
        for f in os.listdir(shard_dir)
    }
    for r in rows:
        assert r.length == len(raw[r.doc_id])
        path = r.uri.removeprefix("file://")
        assert r.offset + r.length <= sizes[os.path.basename(path)]
        with open(path, "rb") as fh:
            fh.seek(r.offset)
            assert fh.read(r.length) == raw[r.doc_id]


def test_no_binary_column_crosses_an_exchange(spark, sf_smoke):
    # the 100 TB guarantee of the pointer path: shuffles carry pointers
    # and digests, never media bytes — checked against every Exchange in
    # the physical plan, types read via the plan tree (not names)
    from foglamp_filter_python35_spark.catalog.multimodal import (
        q_multimodal_dedup,
        q_multimodal_features,
        q_multimodal_frames,
        q_multimodal_resize,
    )
    from foglamp_filter_python35_spark.plans import explain as E

    for q in (
        q_multimodal_features,
        q_multimodal_frames,
        q_multimodal_resize,
        q_multimodal_dedup,
    ):
        df = q(spark, sf_smoke)
        assert not E.binary_crosses_exchange(df), q.__name__

    # positive control: the helper does flag a shuffled binary column
    from pyspark.sql import functions as F

    bad = (
        load(spark, sf_smoke, "documents")
        .select(F.col("text").cast("binary").alias("payload"))
        .groupBy("payload")
        .count()
    )
    assert E.binary_crosses_exchange(bad)


def test_vacuum_drops_orphan_shards_only(spark, sf_smoke, tmp_path):
    """r12 ADVICE: losing/speculative attempts leave orphan shard files;
    the vacuum pass must delete exactly the shards whose uri is absent
    from the committed pointer table, and fetches must still work."""
    import os

    docs = load(spark, sf_smoke, "documents")
    shard_dir = str(tmp_path / "shards")
    ptrs = M.pack_payload_shards(docs, shard_dir).localCheckpoint()
    live = {
        r.uri.removeprefix("file://")
        for r in ptrs.select("uri").distinct().collect()
    }
    # simulate two losing attempts: same partition ids, different attempt
    orphan_a = os.path.join(shard_dir, "shard-00000-99999.bin")
    orphan_b = os.path.join(shard_dir, "shard-00003-99998.bin")
    for p in (orphan_a, orphan_b):
        with open(p, "wb") as fh:
            fh.write(b"stale attempt bytes")
    deleted = M.vacuum_payload_shards(ptrs, shard_dir)
    assert sorted(deleted) == sorted([orphan_a, orphan_b])
    remaining = {
        os.path.join(shard_dir, f) for f in os.listdir(shard_dir)
    }
    assert remaining == live
    # referenced payloads are untouched — full round-trip still lossless
    raw = {r.doc_id: r.text.encode() for r in docs.collect()}
    for r in ptrs.collect():
        with open(r.uri.removeprefix("file://"), "rb") as fh:
            fh.seek(r.offset)
            assert fh.read(r.length) == raw[r.doc_id]
    # idempotent: a second vacuum deletes nothing
    assert M.vacuum_payload_shards(ptrs, shard_dir) == []

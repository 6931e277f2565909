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

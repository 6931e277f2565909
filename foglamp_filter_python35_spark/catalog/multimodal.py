"""X5 multimodal queries, all oracle-checked.

The decode is a deterministic stub (real codecs are unavailable here;
the Spark plumbing — Arrow batching, schema, fan-out — is real), and the
stub derives its 'media properties' from md5 digest bytes, which DuckDB
reproduces exactly (byte k of the digest == hex chars 2k+1..2k+2), so
even the mapInPandas feature extractor gets the full hash-match gate."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from foglamp_filter_python35_spark.catalog import QuerySpec, load
from foglamp_filter_python35_spark.functions import multimodal as M

# Repo-local stand-in for the bulk object store that shard files live in
# at scale (s3://... in production).
_SHARD_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".payload_shards",
)


def _pointers(spark: SparkSession, sf_dir: str, tag: str) -> DataFrame:
    """The ingest boundary of the pointer-struct path: pack payloads
    into per-partition shard files ONCE (localCheckpoint materializes
    the write job and pins the pointer rows), then hand downstream
    operators a (uri, offset, length) table.  After this line no binary
    column exists anywhere in the query plan — payload bytes are
    range-fetched inside the consuming Arrow kernel.

    The shard dir is keyed by the Spark applicationId as well as
    (sf-dir, tag): two concurrent sessions running the same query would
    otherwise rewrite each other's shard files in place while the other
    session's checkpointed pointer rows still reference the old offsets
    (r3 ADVICE).  At scale the analog is a per-job output prefix in the
    object store."""
    docs = load(spark, sf_dir, "documents")
    shard_dir = os.path.join(
        _SHARD_ROOT,
        spark.sparkContext.applicationId,
        f"{os.path.basename(os.path.normpath(sf_dir))}-{tag}",
    )
    return M.pack_payload_shards(docs, shard_dir).localCheckpoint()


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = M.attach_binary_payload(load(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.col("payload_meta.mime").alias("mime"),
        F.col("payload_meta.n_bytes").alias("n_bytes"),
        F.col("payload_meta.uri").alias("uri"),
        # md5 over the binary payload == md5 over the utf8 text
        F.md5("payload").alias("digest"),
    )


O_MULTIMODAL_META = """
SELECT doc_id,
       'application/octet-stream' AS mime,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       'mem://documents/' || doc_id AS uri,
       md5(text) AS digest
FROM documents
"""


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pointer-struct path: shuffles and plan columns carry ~60-byte
    # pointers, never media bytes (output identical to the inline path)
    return M.extract_features_ptr(
        _pointers(spark, sf_dir, "features")
    ).orderBy("doc_id")


def _byte(k: int) -> str:
    """DuckDB expression for byte k of md5(text)'s digest."""
    return f"CAST('0x' || substring(md5(text), {2 * k + 1}, 2) AS INTEGER)"


O_MULTIMODAL_FEATURES = f"""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS digest,
       CAST(64 + {_byte(0)} % 64 AS INTEGER) AS width,
       CAST(64 + {_byte(1)} % 64 AS INTEGER) AS height,
       CAST(1 + {_byte(2)} % 8 AS INTEGER) AS n_frames
FROM documents
ORDER BY doc_id
"""

# --- resize: the 1:1 Arrow transform.  The stand-in decoder strides the
# payload bytes to ~target-area length; the oracle reproduces the stride
# arithmetic in SQL (payloads are utf8 text bytes and the corpus is
# ASCII, so byte positions == character positions) and compares via
# md5 + length, not raw binary (engines render BLOBs differently).

_RS_W, _RS_H = 32, 32


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = M.attach_binary_payload(load(spark, sf_dir, "documents"))
    resized = M.resize(docs, _RS_W, _RS_H)
    return resized.select(
        "doc_id",
        "width",
        "height",
        F.length("resized_payload").cast("bigint").alias("n_resized_bytes"),
        F.md5("resized_payload").alias("resized_digest"),
    ).orderBy("doc_id")


_RS_TARGET = _RS_W * _RS_H
# python payload[::stride][:target] == chars at 1-indexed positions
# 1 + i*stride for i in [0, target) while that position <= len
_RS_STRIDE = f"GREATEST(1, LENGTH(text) // {_RS_TARGET})"
_RS_SLICE = f"""array_to_string(
  list_transform(
    list_filter(range(0, {_RS_TARGET}),
                i -> 1 + i * {_RS_STRIDE} <= LENGTH(text)),
    i -> substring(text, CAST(1 + i * {_RS_STRIDE} AS INTEGER), 1)), '')"""

O_MULTIMODAL_RESIZE = f"""
SELECT doc_id,
       CAST({_RS_W} AS INTEGER) AS width,
       CAST({_RS_H} AS INTEGER) AS height,
       CAST(LENGTH({_RS_SLICE}) AS BIGINT) AS n_resized_bytes,
       md5({_RS_SLICE}) AS resized_digest
FROM documents
ORDER BY doc_id
"""

# --- frame sampling: the 1->N Arrow fan-out.  n_frames comes from the
# pseudo-decode digest byte (as in the features oracle); frame i is the
# byte-stride slice payload[i::n].


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = M.sample_frames_ptr(_pointers(spark, sf_dir, "frames"))
    return frames.select(
        "doc_id",
        "frame_idx",
        F.length("frame_payload").cast("bigint").alias("n_frame_bytes"),
        F.md5("frame_payload").alias("frame_digest"),
    ).orderBy("doc_id", "frame_idx")


_NF = f"(1 + {_byte(2)} % 8)"
# python payload[i::n] == chars at 1-indexed positions i+1, i+1+n, ...
_FRAME_SLICE = f"""array_to_string(
  list_transform(
    range(0, CAST(ceil((LENGTH(text) - frame_idx) / nf) AS BIGINT)),
    j -> substring(text, CAST(frame_idx + 1 + j * nf AS INTEGER), 1)), '')"""

O_MULTIMODAL_FRAMES = f"""
WITH n AS (
  SELECT doc_id, text, {_NF} AS nf FROM documents
),
fanned AS (
  SELECT doc_id, text, nf,
         CAST(unnest(range(0, nf)) AS INTEGER) AS frame_idx
  FROM n
)
SELECT doc_id, frame_idx,
       CAST(LENGTH({_FRAME_SLICE}) AS BIGINT) AS n_frame_bytes,
       md5({_FRAME_SLICE}) AS frame_digest
FROM fanned
ORDER BY doc_id, frame_idx
"""

# --- multimodal exact dedup: the X1 fingerprint shuffle applied to the
# opaque BINARY payload (image/audio dedup by content digest — step one
# of any media pipeline, before perceptual hashing).  Keep-canonical =
# min doc_id per digest; per-digest copy count reported for audit.


def q_multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = M.attach_binary_payload(load(spark, sf_dir, "documents"))
    digests = docs.select("doc_id", F.md5("payload").alias("digest"))
    agg = digests.groupBy("digest").agg(
        F.min("doc_id").alias("keeper_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )
    return agg.orderBy("keeper_doc_id")


O_MULTIMODAL_DEDUP = """
SELECT md5(text) AS digest,
       CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_copies
FROM documents
GROUP BY md5(text)
ORDER BY keeper_doc_id
"""


SPECS = [
    QuerySpec("multimodal_dedup", q_multimodal_dedup, O_MULTIMODAL_DEDUP),
    QuerySpec("multimodal_meta", q_multimodal_meta, O_MULTIMODAL_META),
    QuerySpec(
        "multimodal_features", q_multimodal_features, O_MULTIMODAL_FEATURES
    ),
    QuerySpec("multimodal_resize", q_multimodal_resize, O_MULTIMODAL_RESIZE),
    QuerySpec("multimodal_frames", q_multimodal_frames, O_MULTIMODAL_FRAMES),
]

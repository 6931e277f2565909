"""X5 — multimodal columns: opaque binary payloads + typed metadata.

Design for 100 TB:

* media bytes live in a ``binary`` column ONLY at small payload sizes; at
  scale the column is a *pointer struct* (uri, offset, length) into bulk
  object storage, and decode happens executor-side on demand — the
  ``payload_meta`` struct here carries both forms.
* decode / feature-extract / resize / frame-sample are Arrow-batched
  ``mapInPandas`` operators: schema-stable, 1->N capable (frame
  sampling), partition-parallel.
* the actual codec calls (PIL / ffmpeg / soundfile) are NOT available in
  this container — ``decode_image`` raises NotImplementedError by
  contract, and ``pseudo_decode`` provides a deterministic stand-in
  (derived from the payload's md5) so the Spark-side plumbing — schema,
  batching, UDF signature, fan-out — is fully real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def attach_binary_payload(
    docs: DataFrame, text_col: str = "text", mime: str = "application/octet-stream"
) -> DataFrame:
    """Materialize an opaque binary payload + metadata struct.

    (Test corpus has no real media, so the payload is the UTF-8 bytes of
    the text — the engine treats it as opaque, which is the point.)
    """
    payload = F.col(text_col).cast("binary")
    return docs.withColumn("payload", payload).withColumn(
        "payload_meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length(payload).cast("bigint").alias("n_bytes"),
            F.concat(F.lit("mem://documents/"), F.col("doc_id")).alias("uri"),
            F.lit(0).cast("bigint").alias("offset"),
        ),
    )


def decode_image(payload: bytes) -> "object":
    """Real decoder entry point — image/audio libs are not in this
    container.  STUB by contract."""
    raise NotImplementedError(
        "media codecs unavailable in this environment; use pseudo_decode "
        "for deterministic plumbing tests"
    )


def pseudo_decode(payload: bytes) -> dict:
    """Deterministic fake decode: derives stable 'media properties' from
    the payload digest.  Stands in for the real codec with identical
    schema/shape."""
    digest = hashlib.md5(payload).digest()
    return {
        "width": 64 + digest[0] % 64,
        "height": 64 + digest[1] % 64,
        "n_frames": 1 + digest[2] % 8,
    }


FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("digest", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def extract_features(docs_with_payload: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [pseudo_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "digest": [
                        hashlib.md5(p).hexdigest() for p in pdf["payload"]
                    ],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "n_frames": [f["n_frames"] for f in feats],
                }
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        run, FEATURE_SCHEMA
    )


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("resized_payload", BinaryType()),
    ]
)


def resize(
    docs_with_payload: DataFrame, width: int = 32, height: int = 32
) -> DataFrame:
    """Arrow-batched resize: in production the body is one PIL/opencv
    call per payload; here the stand-in emits a deterministic
    payload whose length scales with the target area (the schema,
    batching, and partition-parallelism are the real contract).  Output
    rows are 1:1 with inputs — Catalyst can pipeline this between scans
    and downstream operators without a shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            resized = []
            for payload in pdf["payload"]:
                # deterministic downsample: stride the bytes to ~area size
                stride = max(1, len(payload) // target)
                resized.append(bytes(payload[::stride][:target]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": pd.Series([width] * len(pdf), dtype="int32"),
                    "height": pd.Series([height] * len(pdf), dtype="int32"),
                    "resized_payload": pd.Series(resized, dtype="object"),
                }
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        run, RESIZE_SCHEMA
    )


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_payload", BinaryType()),
    ]
)


def sample_frames(docs_with_payload: DataFrame) -> DataFrame:
    """1->N frame sampling: each payload fans out into n_frames rows
    (pseudo-decoded), the video-pipeline shape."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = pseudo_decode(payload)["n_frames"]
                for i in range(n):
                    ids.append(int(doc_id))
                    idxs.append(i)
                    # deterministic per-frame slice of the payload
                    frames.append(bytes(payload[i::n]))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_payload": pd.Series(frames, dtype="object"),
                }
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        run, FRAME_SCHEMA
    )

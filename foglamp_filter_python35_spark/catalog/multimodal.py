"""X5 multimodal queries, all oracle-checked.

The decode is a deterministic stub (real codecs are unavailable here;
the Spark plumbing — Arrow batching, schema, fan-out — is real), and the
stub derives its 'media properties' from md5 digest bytes, which DuckDB
reproduces exactly (byte k of the digest == hex chars 2k+1..2k+2), so
even the mapInPandas feature extractor gets the full hash-match gate."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from foglamp_filter_python35_spark.catalog import QuerySpec, load
from foglamp_filter_python35_spark.functions import multimodal as M


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
    docs = M.attach_binary_payload(load(spark, sf_dir, "documents"))
    return M.extract_features(docs).orderBy("doc_id")


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

SPECS = [
    QuerySpec("multimodal_meta", q_multimodal_meta, O_MULTIMODAL_META),
    QuerySpec(
        "multimodal_features", q_multimodal_features, O_MULTIMODAL_FEATURES
    ),
]

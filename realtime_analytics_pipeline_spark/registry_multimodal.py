"""Gated queries: multimodal binary-column plumbing.

``multimodal_metadata`` runs the REAL mapInPandas extraction path and
projects the oracle-expressible columns (byte size, content hash, head
bytes) — proving the Arrow batch plumbing end-to-end in the driver
gate. ``multimodal_features`` (rows-only) adds the fake-decoder
width/height columns that no SQL oracle can reproduce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from realtime_analytics_pipeline_spark.multimodal.binary_ops import (
    attach_payload,
    extract_features,
)
from realtime_analytics_pipeline_spark.registry import register
from realtime_analytics_pipeline_spark.sources.batch import load_table

_META_SQL = """
SELECT doc_id,
       'application/octet-stream' AS mime,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS content_md5,
       lower(hex(substr(text, 1, 8))) AS head_hex
FROM documents
"""


@register("multimodal_metadata", _META_SQL)
def q_multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = attach_payload(load_table(spark, sf_dir, "documents"))
    return extract_features(media).select(
        "doc_id", "mime", "n_bytes", "content_md5", "head_hex"
    )


# the fake decoder derives width/height from the first two md5 digest
# bytes (binary_ops._fake_decode_dims): byte k = hex chars 2k+1..2k+2
def _md5_byte(pos: int) -> str:
    hi = f"strpos('0123456789abcdef', substr(md5(text), {2 * pos + 1}, 1)) - 1"
    lo = f"strpos('0123456789abcdef', substr(md5(text), {2 * pos + 2}, 1)) - 1"
    return f"(({hi}) * 16 + ({lo}))"


_FEATURES_SQL = f"""
SELECT doc_id,
       'application/octet-stream' AS mime,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS content_md5,
       CAST(64 + {_md5_byte(0)} % 192 AS INT) AS width,
       CAST(64 + {_md5_byte(1)} % 192 AS INT) AS height,
       lower(hex(substr(text, 1, 8))) AS head_hex
FROM documents
"""


@register("multimodal_features", _FEATURES_SQL)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = attach_payload(load_table(spark, sf_dir, "documents"))
    return extract_features(media)


_CHUNKS_SQL = """
WITH m AS (SELECT doc_id, text, length(text) AS n FROM documents),
idx AS (
    SELECT doc_id, text, n,
           unnest(range(CAST(
               CASE WHEN n <= 100 THEN 1
                    ELSE ceil((n - 100) * 1.0 / 80) + 1 END AS BIGINT)))
               AS chunk_idx
    FROM m
)
SELECT doc_id,
       chunk_idx,
       chunk_idx * 80 AS start_byte,
       CAST(length(substr(text, CAST(chunk_idx * 80 + 1 AS INTEGER), 100))
            AS BIGINT) AS n_bytes,
       md5(substr(text, CAST(chunk_idx * 80 + 1 AS INTEGER), 100))
           AS chunk_md5
FROM idx
"""


@register("multimodal_chunks", _CHUNKS_SQL)
def q_multimodal_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunking plumbing through the REAL Arrow/mapInPandas path: the
    deterministic payload is the utf-8 text, so the oracle rebuilds
    every chunk's offsets and md5 with plain substring arithmetic —
    verifying the fan-out, boundary, and digest logic end-to-end
    (binary chunk column dropped for the hash; its digest stands in)."""
    from realtime_analytics_pipeline_spark.multimodal.binary_ops import (
        attach_payload,
        chunk_media,
    )

    media = attach_payload(load_table(spark, sf_dir, "documents"))
    return chunk_media(media).select(
        "doc_id", "chunk_idx", "start_byte", "n_bytes", "chunk_md5"
    )


_MM_DEDUP_SQL = """
WITH doubled AS (
    SELECT * FROM documents UNION ALL SELECT * FROM documents)
SELECT md5(text) AS content_md5,
       CAST(min(doc_id) AS BIGINT) AS keep_doc,
       count(*) AS n_copies,
       CAST(max(octet_length(encode(text))) AS BIGINT) AS n_bytes
FROM doubled GROUP BY 1
"""


@register("multimodal_dedup_digest", _MM_DEDUP_SQL)
def q_multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media dedup by CONTENT digest through the real binary path:
    payloads attach as binary columns, the md5 comes out of the
    mapInPandas feature extractor (not a SQL shortcut), and exact dup
    groups collapse on it — the image/audio dedup shape, on a doubled
    corpus so real duplicates exist."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    doubled = docs.unionByName(docs)
    media = attach_payload(doubled)
    feats = extract_features(media).select("doc_id", "content_md5", "n_bytes")
    return feats.groupBy("content_md5").agg(
        F.min("doc_id").alias("keep_doc"),
        F.count(F.lit(1)).alias("n_copies"),
        F.max("n_bytes").alias("n_bytes"),
    )

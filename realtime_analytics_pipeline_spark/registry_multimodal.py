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

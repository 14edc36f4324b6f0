"""Multimodal binary-column plumbing tests."""

from __future__ import annotations

import hashlib

import pytest

from realtime_analytics_pipeline_spark.multimodal.binary_ops import (
    attach_payload,
    decode_image,
    extract_features,
)
from realtime_analytics_pipeline_spark.sources.batch import load_table

from tests.conftest import SF_SMOKE


def test_payload_roundtrip_and_metadata(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    media = attach_payload(docs)
    row = media.where("doc_id = 0").collect()[0]
    text = docs.where("doc_id = 0").collect()[0].text
    assert bytes(row.payload) == text.encode()
    assert row.n_bytes == len(text.encode())
    assert row.content_md5 == hashlib.md5(text.encode()).hexdigest()


def test_extract_features_deterministic_and_total(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    media = attach_payload(docs)
    f1 = {r.doc_id: (r.width, r.height, r.head_hex)
          for r in extract_features(media).collect()}
    # repartitioned input must give identical features (determinism
    # across partitioning — the mapInPandas path has no partition state)
    f2 = {r.doc_id: (r.width, r.height, r.head_hex)
          for r in extract_features(media.repartition(7)).collect()}
    assert f1 == f2
    assert len(f1) == docs.count()
    for w, h, head in f1.values():
        assert 64 <= w < 256 and 64 <= h < 256
        assert len(head) == 16  # 8 bytes hex


def test_decode_stub_raises(spark):
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")

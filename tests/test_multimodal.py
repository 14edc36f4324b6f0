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


def test_decode_ppm_roundtrip():
    """The real codec path (round-11): hand-build a tiny P6, decode,
    and check dims + exact pixels — including an uneven header layout
    (single spaces) and a wrong-magic reject."""
    import numpy as np

    from realtime_analytics_pipeline_spark.multimodal.binary_ops import (
        decode_ppm,
    )

    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    payload = b"P6\n3 2\n255\n" + px.tobytes()
    w, h, got = decode_ppm(payload)
    assert (w, h) == (3, 2)
    assert (got == px).all()
    # single-space header variant (any whitespace separates tokens)
    w2, h2, got2 = decode_ppm(b"P6 3 2 255 " + px.tobytes())
    assert (w2, h2, got2.tobytes()) == (3, 2, px.tobytes())
    # spec-compliant '#' comments anywhere header whitespace is legal
    # (ADVICE r11): inline after a token, full-line, and numeric text
    # inside a comment that must NOT parse as a dimension
    commented = (
        b"P6 # inline comment\n"
        b"# 999 888 a full-line comment with numbers\n"
        b"3 # width\n2\n# before maxval\n255\n" + px.tobytes()
    )
    w3, h3, got3 = decode_ppm(commented)
    assert (w3, h3, got3.tobytes()) == (3, 2, px.tobytes())
    with pytest.raises(ValueError):
        decode_ppm(b"P5\n3 2\n255\n" + px.tobytes())


def test_decode_image_dispatch():
    """PPM decodes for real; compressed formats still raise."""
    import numpy as np

    from realtime_analytics_pipeline_spark.multimodal.binary_ops import (
        decode_image,
    )

    px = np.zeros((1, 1, 3), dtype=np.uint8)
    w, h, _ = decode_image(b"P6\n1 1\n255\n" + px.tobytes())
    assert (w, h) == (1, 1)
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff")  # JPEG


def test_image_channel_stats_matches_numpy_reference(spark):
    """The Spark mapInPandas decode must equal a driver-side numpy
    reference over the same generated payloads."""
    import hashlib

    from realtime_analytics_pipeline_spark.multimodal.binary_ops import (
        attach_ppm_payload,
        image_channel_stats,
    )

    docs = load_table(spark, SF_SMOKE, "documents").limit(50)
    got = {
        r.doc_id: (r.width, r.height, r.sum_r, r.sum_g, r.sum_b)
        for r in image_channel_stats(attach_ppm_payload(docs)).collect()
    }
    for row in docs.select("doc_id", "text").collect():
        d = hashlib.md5(row.text.encode()).digest()[:15]
        want = tuple(32 * sum(d[p] for p in range(c, 15, 3)) for c in range(3))
        assert got[row.doc_id] == (16, 10, *want)

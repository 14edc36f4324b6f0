"""Resize and frame-sampling multimodal plumbing."""

from __future__ import annotations

import hashlib

from realtime_analytics_pipeline_spark.multimodal.binary_ops import (
    attach_payload,
    resize_media,
    sample_frames,
)
from realtime_analytics_pipeline_spark.sources.batch import load_table

from tests.conftest import SF_SMOKE


def test_resize_media_shapes_and_determinism(spark):
    media = attach_payload(load_table(spark, SF_SMOKE, "documents"))
    out = resize_media(media, target_w=128, target_h=128)
    rows = out.collect()
    assert len(rows) == media.count()
    for r in rows:
        assert r.n_bytes == 128 * 128 // 64
        assert len(bytes(r.payload)) == r.n_bytes
        assert (r.target_w, r.target_h) == (128, 128)
    # determinism across partitioning
    again = {
        r.doc_id: bytes(r.payload)
        for r in resize_media(media.repartition(5), 128, 128).collect()
    }
    assert {r.doc_id: bytes(r.payload) for r in rows} == again


def test_sample_frames_every_k(spark):
    media = attach_payload(load_table(spark, SF_SMOKE, "documents"))
    frames = sample_frames(media, frame_bytes=64, every_k=4).collect()
    assert frames
    by_doc = {}
    for f in frames:
        by_doc.setdefault(f.doc_id, []).append(f)
        assert f.frame_idx % 4 == 0
        assert f.frame_md5 == hashlib.md5(bytes(f.frame)).hexdigest()
    # a doc with n bytes has ceil(n/64) frames, sampled every 4th
    one = media.where("doc_id = 1").collect()[0]
    n_frames = max(len(bytes(one.payload)) // 64, 1)
    want = len(range(0, n_frames, 4))
    assert len(by_doc[1]) == want


def test_chunk_media_fanout_and_digests(spark):
    """Chunk boundaries, overlap, and digests on crafted payloads:
    a 250-byte payload at size=100/stride=80 yields starts 0/80/160
    (last chunk truncated to 90 bytes); a payload under one chunk
    yields exactly itself."""
    import hashlib

    from realtime_analytics_pipeline_spark.multimodal.binary_ops import (
        chunk_media,
    )

    big = bytes(range(250)) 
    small = b"tiny"
    df = spark.createDataFrame(
        [(1, bytearray(big)), (2, bytearray(small))],
        "doc_id long, payload binary",
    )
    rows = chunk_media(df, chunk_size=100, stride=80).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    assert [r["start_byte"] for r in c1] == [0, 80, 160]
    assert [r["n_bytes"] for r in c1] == [100, 100, 90]
    for r in c1:
        piece = big[r["start_byte"]: r["start_byte"] + 100]
        assert bytes(r["chunk"]) == piece
        assert r["chunk_md5"] == hashlib.md5(piece).hexdigest()
    c2 = by_doc[2]
    assert len(c2) == 1 and bytes(c2[0]["chunk"]) == small

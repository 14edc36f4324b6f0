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

"""Multimodal columns: opaque binary payloads + typed metadata.

Design (100 TB posture):

- media is an opaque ``binary`` column with a typed metadata struct
  (mime, byte size, content hash) — never parsed by Catalyst, never a
  join key; engines shuffle the small metadata, not the bytes;
- decode / feature-extraction runs as ``mapInPandas`` — Arrow-batched
  Python, one GIL-free batch per partition slice, the only sane way
  to run codec libraries inside Spark;
- actual image/audio decode is STUBBED (`decode_image` raises
  NotImplementedError: PIL/ffmpeg are not in this container). The
  Spark-side plumbing — schema, batch shape, partitioning, UDF
  signature — is real and tested with a deterministic fake decoder.
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

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("content_md5", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("content_md5", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("head_hex", StringType()),
    ]
)


def attach_payload(documents: DataFrame) -> DataFrame:
    """documents -> media table: deterministic fake payload (utf-8 of
    the text) standing in for image bytes, with real typed metadata.
    All metadata is computed engine-side (encode/md5/length are
    Catalyst built-ins) — the binary column itself is carried opaque."""
    payload = F.encode(F.col("text"), "utf-8")
    return documents.select(
        "doc_id",
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("content_md5"),
    )


def decode_ppm(payload: bytes) -> tuple[int, int, "object"]:
    """REAL image decode, zero external deps: binary Netpbm P6 (PPM)
    — parse the ASCII header (magic, width, height, maxval), then view
    the raw interleaved RGB bytes as an (h, w, 3) numpy array. PPM is
    deliberately the format here: it is a genuine on-disk image format
    whose codec is ~20 lines of stdlib+numpy, so the decode step of
    the multimodal pipeline can be REAL in a container without
    PIL/ffmpeg (round-11; previously a deterministic fake).
    Returns (width, height, pixels uint8[h, w, 3])."""
    import numpy as np

    toks: list[bytes] = []
    i = 0
    while len(toks) < 4:
        # Netpbm spec: '#' starts a comment running to end-of-line,
        # legal wherever header whitespace is (ADVICE r11) — skip
        # interleaved comments and whitespace before each token.
        while True:
            while payload[i : i + 1].isspace():
                i += 1
            if payload[i : i + 1] == b"#":
                while i < len(payload) and payload[i : i + 1] not in (
                    b"\n",
                    b"\r",
                ):
                    i += 1
            else:
                break
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        toks.append(payload[i:j])
        i = j
    i += 1  # exactly one whitespace byte separates maxval from data
    if toks[0] != b"P6":
        raise ValueError(f"not a binary PPM: magic {toks[0]!r}")
    w, h, maxval = int(toks[1]), int(toks[2]), int(toks[3])
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    px = np.frombuffer(
        payload, dtype=np.uint8, offset=i, count=w * h * 3
    ).reshape(h, w, 3)
    return w, h, px


def decode_image(payload: bytes) -> object:
    """Decoder dispatch: binary PPM decodes for real (decode_ppm);
    compressed codecs (JPEG/PNG/audio/video) still need libraries not
    present in this container — wire PIL/torchvision/ffmpeg here in
    production."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    raise NotImplementedError(
        "non-PPM media decoding requires codec libraries (e.g. PIL) not "
        "present in this container; extract_features uses a "
        "deterministic fake for those"
    )


PPM_W, PPM_H = 16, 10


def attach_ppm_payload(documents: DataFrame) -> DataFrame:
    """documents -> media table whose payload is a REAL binary PPM
    image (16x10, RGB): header + pixel stream built engine-side by
    tiling the first 15 bytes of unhex(md5(text)) 32 times (480 =
    16*10*3 bytes). 15, not 16, deliberately: gcd(15, 3) = 3 keeps
    the three channels on DISJOINT residues of the tile, so each
    channel's pixel sum is an exact integer function of 5 digest
    bytes — which is what lets a SQL oracle verify the real decode
    analytically (see registry_multimodal)."""
    pat = F.expr("substring(unhex(md5(text)), 1, 15)")
    payload = F.concat(
        F.lit(f"P6\n{PPM_W} {PPM_H}\n255\n".encode()), *([pat] * 32)
    )
    return documents.select(
        "doc_id",
        payload.alias("payload"),
        F.lit("image/x-portable-pixmap").alias("mime"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("content_md5"),
    )


IMAGE_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
    ]
)


def image_channel_stats(media: DataFrame, batch_size: int = 256) -> DataFrame:
    """REAL decode -> feature extraction: mapInPandas batches of
    opaque payload bytes through decode_ppm, emitting the parsed
    dimensions and exact per-channel pixel SUMS (int64 — integer
    verdicts keep the cross-engine gate float-free). This is the
    production multimodal feature shape: Arrow-batched Python, codec
    work per batch, small typed rows out, bytes never shuffled."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, px = decode_ppm(bytes(payload))
                s = px.reshape(-1, 3).sum(axis=0, dtype="int64")
                rows.append(
                    (doc_id, w, h, int(s[0]), int(s[1]), int(s[2]))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "sum_r", "sum_g", "sum_b",
                ],
            )

    return media.select("doc_id", "payload").mapInPandas(
        stats, IMAGE_STATS_SCHEMA
    )


def _fake_decode_dims(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for decode: pseudo width/height from the
    content hash — stable across runs/partitions, shaped like a real
    decoder's output."""
    h = hashlib.md5(payload).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("target_w", IntegerType()),
        StructField("target_h", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
        StructField("frame_md5", StringType()),
    ]
)


def resize_media(
    media: DataFrame, target_w: int = 128, target_h: int = 128
) -> DataFrame:
    """Resize plumbing: mapInPandas batch transform binary -> binary.

    Deterministic fake resample (truncate/cycle payload to
    target_w*target_h/64 bytes) standing in for a real
    PIL.Image.resize; schema and batch shape are what a real codec
    would use.
    """
    out_len = target_w * target_h // 64

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [
                bytes(
                    (p * (out_len // max(len(p), 1) + 1))[:out_len]
                )
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": resized,
                    "target_w": target_w,
                    "target_h": target_h,
                    "n_bytes": [len(r) for r in resized],
                }
            )

    return media.mapInPandas(resize, schema=RESIZED_SCHEMA)


def sample_frames(
    media: DataFrame, frame_bytes: int = 64, every_k: int = 4
) -> DataFrame:
    """Frame-sampling plumbing: binary 'video' -> one row per sampled
    frame (every k-th fixed-size chunk). The fan-out row shape is what
    a real ffmpeg frame sampler produces; sampling is deterministic."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids, idxs, frames, md5s = [], [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(p)
                n_frames = max(len(b) // frame_bytes, 1)
                for fi in range(0, n_frames, every_k):
                    chunk = b[fi * frame_bytes : (fi + 1) * frame_bytes]
                    doc_ids.append(doc_id)
                    idxs.append(fi)
                    frames.append(chunk)
                    md5s.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "frame_idx": idxs,
                    "frame": frames,
                    "frame_md5": md5s,
                }
            )

    return media.mapInPandas(sample, schema=FRAME_SCHEMA)


def extract_features(media: DataFrame, batch_size: int = 256) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow ships (doc_id, payload, ...) batches to Python; each batch
    yields one feature frame. Partitioning is inherited — at scale,
    repartition upstream so each task holds O(batch) payload bytes
    (spark.sql.files.maxPartitionBytes governs the scan side).
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [_fake_decode_dims(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["n_bytes"],
                    "content_md5": pdf["content_md5"],
                    "width": [w for w, _ in dims],
                    "height": [h for _, h in dims],
                    "head_hex": [bytes(p[:8]).hex() for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)


CHUNK_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("chunk_idx", LongType()),
        StructField("start_byte", LongType()),
        StructField("n_bytes", LongType()),
        StructField("chunk", BinaryType()),
        StructField("chunk_md5", StringType()),
    ]
)


def chunk_media(
    media: DataFrame,
    chunk_size: int = 100,
    stride: int = 80,
    batch_size: int = 256,
) -> DataFrame:
    """Fixed-window (optionally overlapping) chunking of opaque binary
    payloads — the audio/video preprocessing shape: one input row
    fans out to ceil((n−size)/stride)+1 chunk rows with byte offsets
    and per-chunk digests. mapInPandas so the fan-out happens inside
    the Arrow batch (no explode of a materialized array column, no
    driver involvement); chunk boundaries are pure arithmetic, so a
    SQL oracle can verify offsets/digests without any codec."""
    import pandas as pd

    def chunker(batches):
        for pdf in batches:
            out = {
                "doc_id": [], "chunk_idx": [], "start_byte": [],
                "n_bytes": [], "chunk": [], "chunk_md5": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                n = len(data)
                if n <= chunk_size:
                    count = 1
                else:
                    count = -(-(n - chunk_size) // stride) + 1
                for i in range(count):
                    start = i * stride
                    piece = data[start : start + chunk_size]
                    out["doc_id"].append(doc_id)
                    out["chunk_idx"].append(i)
                    out["start_byte"].append(start)
                    out["n_bytes"].append(len(piece))
                    out["chunk"].append(piece)
                    out["chunk_md5"].append(hashlib.md5(piece).hexdigest())
            yield pd.DataFrame(out)

    return media.select("doc_id", "payload").mapInPandas(
        chunker, CHUNK_SCHEMA
    )

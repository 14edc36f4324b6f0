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


_FRAMES_SQL = """
WITH m AS (
    SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents),
idx AS (
    SELECT doc_id, text, n,
           unnest(range(0, CAST(greatest(n // 64, 1) AS BIGINT), 4))
               AS frame_idx
    FROM m)
SELECT doc_id,
       CAST(frame_idx AS INT) AS frame_idx,
       CAST(octet_length(encode(
           substr(text, CAST(frame_idx * 64 + 1 AS INTEGER), 64)))
           AS BIGINT) AS n_frame_bytes,
       md5(substr(text, CAST(frame_idx * 64 + 1 AS INTEGER), 64))
           AS frame_md5
FROM idx
"""


@register("multimodal_frame_sample", _FRAMES_SQL)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing under the oracle: every 4th 64-byte
    'frame' of each binary payload through the REAL mapInPandas
    fan-out (binary_ops.sample_frames — the ffmpeg-sampler row shape),
    checked frame-for-frame against a SQL recomputation of the chunk
    hashes. ASCII corpus ⇒ byte offsets == char offsets, the same
    identity multimodal_chunks relies on."""
    from pyspark.sql import functions as F

    from realtime_analytics_pipeline_spark.multimodal.binary_ops import (
        sample_frames,
    )

    media = attach_payload(load_table(spark, sf_dir, "documents"))
    return sample_frames(media, frame_bytes=64, every_k=4).select(
        "doc_id",
        "frame_idx",
        F.length("frame").cast("bigint").alias("n_frame_bytes"),
        "frame_md5",
    )


_RESIZE_SQL = """
WITH m AS (
    SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents)
SELECT doc_id,
       256 AS n_bytes,
       md5(substr(repeat(text, CAST(256 // n + 2 AS BIGINT)), 1, 256))
           AS resized_md5
FROM m
"""


@register("multimodal_resize", _RESIZE_SQL)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing under the oracle: the deterministic fake
    resample (cycle payload bytes to target_w*target_h/64 = 256) runs
    through the REAL binary->binary mapInPandas transform
    (binary_ops.resize_media) and the oracle reproduces the cycled
    prefix with repeat+substr — a byte-level pin on the Arrow binary
    round trip."""
    from pyspark.sql import functions as F

    from realtime_analytics_pipeline_spark.multimodal.binary_ops import (
        resize_media,
    )

    media = attach_payload(load_table(spark, sf_dir, "documents"))
    return resize_media(media, target_w=128, target_h=128).select(
        "doc_id",
        F.col("n_bytes").cast("int").alias("n_bytes"),
        F.md5("payload").alias("resized_md5"),
    )


# --------------------------------------------------------------------------
# Round 6: WebDataset-style shard manifest — hierarchical byte-budget
# packing of opaque blobs into fixed-size training shards.
# --------------------------------------------------------------------------

_SHARD_BYTES = 262_144  # 256 KiB shards at test scale (≈100-500 MB in prod)

_SHARD_MANIFEST_SQL = f"""
WITH media AS (
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(CAST(doc_id AS VARCHAR)) AS shuffle_key
    FROM documents
),
placed AS (
    SELECT substr(shuffle_key, 1, 1) AS bucket,
           n_bytes,
           COALESCE(SUM(n_bytes) OVER (
               PARTITION BY substr(shuffle_key, 1, 1)
               ORDER BY shuffle_key, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS bytes_before
    FROM media
)
SELECT bucket,
       CAST(bytes_before // {_SHARD_BYTES} AS BIGINT) AS local_shard,
       count(*) AS n_items,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes
FROM placed
GROUP BY 1, 2
"""


@register("multimodal_shard_manifest", _SHARD_MANIFEST_SQL)
def q_multimodal_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset-style shard assignment for opaque media blobs:
    deterministic md5 shuffle order, then sequential byte-budget
    packing into fixed-size shards — the manifest a training loader
    reads to fetch shard N.

    Packing is HIERARCHICAL by design: blobs hash into 16 buckets
    (first shuffle-key hex digit), and the exclusive running-byte
    cumsum runs WITHIN a bucket (window partitioned by bucket — 16
    independent sorts, never a single global sort). At 100 TB each
    bucket is an independent partition-local pack; shard ids are
    (bucket, local_shard) so no cross-bucket coordination exists. A
    flat `ORDER BY shuffle_key` global cumsum would funnel the corpus
    through one partition — this shape is the scale path itself."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from realtime_analytics_pipeline_spark.multimodal.binary_ops import (
        attach_payload,
    )

    media = attach_payload(load_table(spark, sf_dir, "documents")).select(
        "doc_id",
        "n_bytes",
        F.md5(F.col("doc_id").cast("string")).alias("shuffle_key"),
    )
    w = (
        Window.partitionBy(F.substring("shuffle_key", 1, 1))
        .orderBy("shuffle_key", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = media.select(
        F.substring("shuffle_key", 1, 1).alias("bucket"),
        "n_bytes",
        F.coalesce(F.sum("n_bytes").over(w), F.lit(0)).alias("bytes_before"),
    )
    return placed.groupBy(
        "bucket",
        (F.col("bytes_before") / _SHARD_BYTES)
        .cast("bigint")
        .alias("local_shard"),
    ).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("n_bytes").alias("total_bytes"),
    )


# --------------------------------------------------------------------------
# Round-11: REAL image decode, gate-verified. The payload is a genuine
# binary Netpbm P6 image (header + raw RGB) built engine-side; Spark
# decodes the BYTES with a real parser (binary_ops.decode_ppm) inside
# mapInPandas; DuckDB never decodes anything — it predicts the exact
# integer channel sums analytically from md5(text), because the pixel
# stream tiles the first 15 digest bytes and gcd(15, 3) = 3 pins each
# channel to 5 fixed digest bytes. If the decoder mis-parses the
# header, mis-offsets the pixel stream, or drops a byte, the sums
# cannot match.
# --------------------------------------------------------------------------

def _ppm_stats_sql() -> str:
    def group(ch: int) -> str:
        return " + ".join(_md5_byte(p) for p in range(ch, 15, 3))

    return f"""
SELECT doc_id,
       CAST(16 AS INTEGER) AS width,
       CAST(10 AS INTEGER) AS height,
       CAST(32 * ({group(0)}) AS BIGINT) AS sum_r,
       CAST(32 * ({group(1)}) AS BIGINT) AS sum_g,
       CAST(32 * ({group(2)}) AS BIGINT) AS sum_b
FROM documents
"""


_PPM_STATS_SQL = _ppm_stats_sql()


@register("multimodal_image_channel_stats", _PPM_STATS_SQL)
def q_multimodal_image_channel_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """REAL decode -> feature pipeline: binary PPM payloads (an actual
    on-disk image format) parsed by a real ~20-line numpy codec in
    Arrow-batched mapInPandas — header tokenization, offset into the
    raw RGB stream, (h, w, 3) reshape, exact int64 channel sums. The
    oracle is ANALYTIC (no decode in DuckDB): the pixel bytes tile
    md5(text)'s first 15 bytes, so each channel sum is 32x the sum of
    5 known digest bytes — any header/offset/reshape bug in the
    decoder breaks the hash. This upgrades the multimodal decode slot
    from a documented stub to a working codec path; compressed
    formats (JPEG/PNG) still dispatch to NotImplementedError pending
    real codec libraries."""
    from realtime_analytics_pipeline_spark.multimodal.binary_ops import (
        attach_ppm_payload,
        image_channel_stats,
    )

    media = attach_ppm_payload(load_table(spark, sf_dir, "documents"))
    return image_channel_stats(media)


# --------------------------------------------------------------------------
# Round-12: REAL audio decode, gate-verified — the WAV twin of the
# round-11 PPM path. The payload is a genuine RIFF/PCM WAV file
# (constant 44-byte header + 16-bit LE stereo stream) built
# engine-side; Spark decodes the BYTES with a real chunk-walking
# parser (binary_ops.decode_wav) inside mapInPandas; DuckDB predicts
# the exact integer channel sums analytically from md5(text), because
# the PCM stream tiles the 16 digest bytes (= 4 stereo frames) 32
# times and 16 % 4 == 0 pins each channel to 4 fixed digest sample
# slots. A header-offset, endianness, signedness, or interleave bug
# in the decoder cannot match the hash.
# --------------------------------------------------------------------------


def _wav_stats_sql() -> str:
    def samp(j: int) -> str:
        raw = f"({_md5_byte(2 * j)} + 256 * ({_md5_byte(2 * j + 1)}))"
        return (
            f"({raw} - CASE WHEN {raw} >= 32768 THEN 65536 ELSE 0 END)"
        )

    cols = ",\n           ".join(
        f"{samp(j)} AS s{j}" for j in range(8)
    )
    peaks = ", ".join(f"abs(s{j})" for j in range(8))
    return f"""
WITH s AS (
    SELECT doc_id,
           {cols}
    FROM documents
)
SELECT doc_id,
       CAST(8000 AS INTEGER) AS sample_rate,
       CAST(128 AS BIGINT) AS n_frames,
       CAST(32 * (s0 + s2 + s4 + s6) AS BIGINT) AS sum_l,
       CAST(32 * (s1 + s3 + s5 + s7) AS BIGINT) AS sum_r,
       CAST(greatest({peaks}) AS BIGINT) AS peak_abs
FROM s
"""


_WAV_STATS_SQL = _wav_stats_sql()


@register("multimodal_audio_channel_stats", _WAV_STATS_SQL)
def q_multimodal_audio_channel_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """REAL audio decode -> feature pipeline: RIFF/PCM WAV payloads
    (an actual on-disk audio container) parsed by a real chunk-walking
    numpy codec in Arrow-batched mapInPandas — RIFF magic validation,
    fmt/data chunk walk with odd-size padding, little-endian int16
    frame view, exact per-channel int64 sample sums plus the absolute
    peak (the loudness/clipping pre-pass of an audio training
    pipeline). The oracle is ANALYTIC (DuckDB never decodes): the PCM
    stream tiles md5(text)'s 16 bytes = 4 stereo frames 32 times, so
    each channel sum is 32x the sum of 4 known signed samples and the
    peak is the max |sample| over the 8 — any parser bug breaks the
    hash. With decode_ppm (round-11) this makes BOTH uncompressed
    decode slots real working code; compressed codecs (JPEG/mp3)
    still gate on absent libraries."""
    from realtime_analytics_pipeline_spark.multimodal.binary_ops import (
        attach_wav_payload,
        audio_channel_stats,
    )

    media = attach_wav_payload(load_table(spark, sf_dir, "documents"))
    return audio_channel_stats(media)


# --------------------------------------------------------------------------
# Round-12: REAL video-shaped decode + frame sampling. The payload is
# a spec-legal multi-image Netpbm stream (concatenated P6 frames, the
# raw 'video' container); Spark walks the stream with a real
# offset-tracking parser and stride-samples every 2nd frame; DuckDB
# predicts the sampled channel sums analytically because frame f
# tiles md5(text || '#f')'s first 15 bytes — a frame-boundary,
# stride, or offset bug cannot match the hash.
# --------------------------------------------------------------------------


def _md5_byte_of(expr: str, pos: int) -> str:
    hi = (
        f"strpos('0123456789abcdef', substr(md5({expr}),"
        f" {2 * pos + 1}, 1)) - 1"
    )
    lo = (
        f"strpos('0123456789abcdef', substr(md5({expr}),"
        f" {2 * pos + 2}, 1)) - 1"
    )
    return f"(({hi}) * 16 + ({lo}))"


def _video_stats_sql() -> str:
    from realtime_analytics_pipeline_spark.multimodal.binary_ops import (
        VIDEO_FRAMES,
        VIDEO_SAMPLE_EVERY,
    )

    sampled = range(0, VIDEO_FRAMES, VIDEO_SAMPLE_EVERY)

    def group(ch: int) -> str:
        return " + ".join(
            _md5_byte_of(f"text || '#{f}'", p)
            for f in sampled
            for p in range(ch, 15, 3)
        )

    return f"""
SELECT doc_id,
       CAST({VIDEO_FRAMES} AS BIGINT) AS n_frames,
       CAST({len(list(sampled))} AS BIGINT) AS n_sampled,
       CAST(32 * ({group(0)}) AS BIGINT) AS sum_r,
       CAST(32 * ({group(1)}) AS BIGINT) AS sum_g,
       CAST(32 * ({group(2)}) AS BIGINT) AS sum_b
FROM documents
"""


_VIDEO_STATS_SQL = _video_stats_sql()


@register("multimodal_video_frame_stats", _VIDEO_STATS_SQL)
def q_multimodal_video_frame_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """REAL video-shaped decode + FRAME SAMPLING: each payload is a
    genuine multi-image Netpbm stream (6 concatenated P6 frames);
    Spark's decode_ppm_stream walks the frame boundaries with an
    offset-tracking parser inside Arrow-batched mapInPandas, keeps
    every 2nd frame (stride sampling — the standard video
    preprocessing step), and emits exact int64 channel sums over the
    SAMPLED frames. The oracle is ANALYTIC: frame f's pixels tile
    md5(text || '#f')'s first 15 bytes, so the sampled sums are 32x
    sums of known digest bytes of frames {0, 2, 4} — mis-walking a
    frame boundary, sampling the wrong stride, or mis-offsetting any
    header breaks the hash. Completes the multimodal trio: image
    (PPM, round-11), audio (WAV, round-12), video (PPM stream,
    round-12) — all REAL parsers, zero codec libraries."""
    from realtime_analytics_pipeline_spark.multimodal.binary_ops import (
        attach_ppm_stream_payload,
        video_frame_stats,
    )

    media = attach_ppm_stream_payload(
        load_table(spark, sf_dir, "documents")
    )
    return video_frame_stats(media)

"""Invariant pins for the WebDataset-style shard manifest (round 6)."""

from __future__ import annotations

import pyspark.sql.functions as F

from realtime_analytics_pipeline_spark.registry import QUERIES
from tests.conftest import SF_SMOKE


def test_shard_manifest_conserves_items_and_bytes(spark):
    from realtime_analytics_pipeline_spark.multimodal.binary_ops import (
        attach_payload,
    )
    from realtime_analytics_pipeline_spark.sources.batch import load_table

    manifest = QUERIES["multimodal_shard_manifest"](spark, SF_SMOKE)
    got = manifest.agg(
        F.sum("n_items").alias("items"), F.sum("total_bytes").alias("bytes")
    ).collect()[0]

    media = attach_payload(load_table(spark, SF_SMOKE, "documents"))
    want = media.agg(
        F.count(F.lit(1)).alias("items"), F.sum("n_bytes").alias("bytes")
    ).collect()[0]
    # nothing dropped, nothing double-placed
    assert (got.items, got.bytes) == (want.items, want.bytes)


def test_shard_ids_contiguous_within_bucket(spark):
    manifest = QUERIES["multimodal_shard_manifest"](spark, SF_SMOKE)
    bad = (
        manifest.groupBy("bucket")
        .agg(
            F.min("local_shard").alias("lo"),
            F.max("local_shard").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        .where((F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1))
        .collect()
    )
    assert bad == []  # local_shard is dense 0..n-1 per bucket


def test_all_16_buckets_used(spark):
    # md5 first hex digit distributes ~uniformly; at sf0.001 (500 docs)
    # every bucket should be populated
    manifest = QUERIES["multimodal_shard_manifest"](spark, SF_SMOKE)
    assert manifest.select("bucket").distinct().count() == 16

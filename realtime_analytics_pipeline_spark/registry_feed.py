"""Gated queries: the custom Python Data Source (``rtap_feed``).

The reference's transport contract is Kafka (kafka_source.py:6-19,
kafka_sink.py:10-46); ``sources/feed.py`` re-expresses it as a
first-class Spark source via the Spark 4 Python Data Source API. These
queries put both halves of that contract under the driver's DuckDB
oracle:

- ``pyds_feed_scan``: batch scan THROUGH the custom source with filter
  pushdown active (``In`` + ``GreaterThan`` reach
  ``FeedBatchReader.pushFilters`` and are applied Arrow-side inside the
  scan task) feeding a normal JVM-side aggregation. The oracle cannot
  tell the source apart from the parquet reader — which is the point.
- ``streaming_pyds_feed``: the same log consumed as a STREAM — offset
  ranges planned per (file, row group) partition, drained to completion
  with ``Trigger.AvailableNow`` — through a stateful aggregation.
  The log is fully consumed, so the finalized result equals the batch
  aggregation exactly; no watermark cutoff is involved.

Python stream sources don't implement the AvailableNow admission
control hooks, so Spark logs a fallback to single-batch execution: the
whole currently-available offset range becomes one micro-batch (task
count still fans out by ``batch_rows`` chunks). For a fixed log that is
exactly the semantics this query needs — deterministic, complete —
while multi-trigger incremental consumption over a GROWING log is
exercised in tests/test_feed_source.py.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_analytics_pipeline_spark.registry import register
from realtime_analytics_pipeline_spark.sources.feed import register_feed_source

_counter = itertools.count()

_FEED_SCAN_SQL = """
SELECT event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       round(sum(value), 6) AS sum_value
FROM events
WHERE event_type IN ('view', 'click', 'purchase') AND value > 10.0
GROUP BY event_type
"""


@register("pyds_feed_scan", _FEED_SCAN_SQL)
def q_pyds_feed_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_feed_source(spark)
    feed = (
        spark.read.format("rtap_feed")
        .option("path", f"{sf_dir}/events.parquet")
        .option("parallelism", "8")
        .load()
    )
    return (
        feed.filter(
            F.col("event_type").isin("view", "click", "purchase")
            & (F.col("value") > 10.0)
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


_FEED_STREAM_SQL = """
SELECT event_type,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value
FROM events
GROUP BY event_type
"""


@register("streaming_pyds_feed", _FEED_STREAM_SQL)
def q_streaming_pyds_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_feed_source(spark)
    name = f"pyds_feed_{next(_counter)}"
    agg = (
        spark.readStream.format("rtap_feed")
        .option("path", f"{sf_dir}/events.parquet")
        .option("batch_rows", "25000")
        .load()
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    q.stop()
    return spark.table(name)

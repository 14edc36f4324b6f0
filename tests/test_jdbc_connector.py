"""Real JDBC connector path against embedded Derby (the in-container
stand-in for the reference's ClickHouse service — same Spark code
path, different URL)."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_analytics_pipeline_spark.operators.event_metrics import event_metrics
from realtime_analytics_pipeline_spark.sources.batch import load_events
from realtime_analytics_pipeline_spark.sources.jdbc import (
    derby_url,
    foreach_batch_jdbc_upsert,
    read_jdbc,
    write_jdbc,
)

from tests.conftest import SF_SMOKE, write_time_ordered_stream_fixture


def _metrics_ms(spark):
    em = event_metrics(load_events(spark, SF_SMOKE))
    return em.select(
        F.unix_millis("window_start").alias("window_start_ms"),
        "event_type",
        "event_count",
        "user_count",
    )


def _as_set(df):
    return {
        (r.window_start_ms, r.event_type, r.event_count, r.user_count)
        for r in df.collect()
    }


def test_jdbc_roundtrip_and_parallel_partitioned_read(spark, tmp_path):
    url = derby_url(str(tmp_path / "derbydb"))
    em = _metrics_ms(spark)
    write_jdbc(em, url, "event_metrics", num_partitions=4)

    back = read_jdbc(spark, url, "event_metrics")
    assert _as_set(back) == _as_set(em)

    lo, hi = em.agg(
        F.min("window_start_ms"), F.max("window_start_ms")
    ).first()
    par = read_jdbc(
        spark,
        url,
        "event_metrics",
        partition_column="window_start_ms",
        lower_bound=lo,
        upper_bound=hi + 1,
        num_partitions=4,
    )
    # genuinely partitioned scan: 4 range slices, same data
    assert par.rdd.getNumPartitions() == 4
    assert _as_set(par) == _as_set(em)


def test_streaming_jdbc_upsert_idempotent_replay(spark, tmp_path):
    """Replaying the same micro-batches through the JDBC upsert sink
    must converge to the batch result — no duplicate window rows."""
    from realtime_analytics_pipeline_spark.sources.batch import load_table
    from realtime_analytics_pipeline_spark.streaming.jobs import (
        read_events_stream_from_dir,
    )

    from realtime_analytics_pipeline_spark.operators.event_metrics import (
        event_metrics_exact_streaming,
    )

    src = str(tmp_path / "src")
    write_time_ordered_stream_fixture(
        load_table(spark, SF_SMOKE, "events"), src, 3
    )
    url = derby_url(str(tmp_path / "derbydb2"))

    def run(checkpoint: str) -> None:
        stream = read_events_stream_from_dir(spark, src)
        em = event_metrics_exact_streaming(stream).select(
            F.unix_millis("window_start").alias("window_start_ms"),
            "event_type",
            "event_count",
            "user_count",
        )
        q = (
            em.writeStream.outputMode("append")
            .foreachBatch(
                foreach_batch_jdbc_upsert(
                    url, "event_metrics_live", "window_start_ms"
                )
            )
            .option("checkpointLocation", str(tmp_path / checkpoint))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run("ck1")
    first = _as_set(read_jdbc(spark, url, "event_metrics_live"))
    assert first  # watermark finalized at least the early windows
    # full REPLAY from a fresh checkpoint: every batch re-delivered —
    # the delete+append upsert must converge, not duplicate
    run("ck2")
    replayed = _as_set(read_jdbc(spark, url, "event_metrics_live"))
    assert replayed == first
    # one row per window key, and every row agrees with the batch truth
    keys = [(k[0], k[1]) for k in replayed]
    assert len(keys) == len(set(keys))
    batch = _as_set(_metrics_ms(spark))
    assert replayed <= batch

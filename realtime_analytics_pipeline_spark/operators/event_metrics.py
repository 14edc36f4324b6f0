"""EventAggregator: events per (tumbling window, event_type).

Reference: services/processing/src/jobs/event_aggregator.py:12-44 —
project nested fields (:20-25) → IN-list filter on allowed types
(:26-28) → 60 s tumbling window (:29-36) → COUNT + COUNT DISTINCT user
(:41-42) → flat sink rows (core/schemas/event_metrics_sink.py:4-13).

Spark-first notes (100 TB posture):
- ``F.window`` + groupBy compiles to HashAggregateExec with automatic
  partial aggregation (map-side combine) — the same local/global split
  the reference enables via mini-batch (job_coordinator.py:40-50), but
  chosen by the planner, not hand-configured.
- COUNT DISTINCT is exact to match the reference and the oracle; it
  expands to a two-phase aggregate (Expand + two shuffles). At 100 TB
  prefer ``approx=True`` → ``approx_count_distinct`` (HLL++, single
  shuffle, bounded memory per key).
- The filter runs before the aggregation so Catalyst pushes it into
  the parquet scan (PushedFilters: In(event_type, ...)).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from realtime_analytics_pipeline_spark.config import DEFAULT_CONFIG, EngineConfig


def event_metrics(
    events: DataFrame,
    window: str | None = None,
    allowed_types: Sequence[str] | None = None,
    approx: bool = False,
    config: EngineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """events (canonical layout) -> one row per (window, event_type).

    Output: window_start, window_end (timestamp), event_type,
    event_count, user_count — the event_metrics sink schema
    (event_metrics_sink.py:4-13).
    """
    window = window or config.metrics_window
    allowed = list(allowed_types or config.allowed_event_types)
    user_count = (
        F.approx_count_distinct("user_id") if approx else F.count_distinct("user_id")
    )
    return (
        events.where(F.col("event_type").isin(allowed))
        .groupBy(F.window("event_time", window), "event_type")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            user_count.alias("user_count"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "event_count",
            "user_count",
        )
    )


def event_metrics_exact_streaming(
    events: DataFrame,
    window: str | None = None,
    allowed_types: Sequence[str] | None = None,
    config: EngineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Streaming-safe EXACT distinct-user counts via chained stateful
    aggregation (Spark ≥3.5 multiple-stateful-operator support):

    phase 1: (window, type, user) partial counts — the distinct set is
    materialized as state keys, not an in-agg distinct;
    phase 2: re-window on ``window_time`` → sum(counts) + count(users).

    Same result as ``event_metrics`` (proved in the driver gate), but
    legal under ``writeStream`` append mode, and the same shape a
    1000-executor job wants anyway: phase 1 pre-shrinks the shuffle to
    one row per (window, type, user).
    """
    window = window or config.metrics_window
    allowed = list(allowed_types or config.allowed_event_types)
    per_user = (
        events.where(F.col("event_type").isin(allowed))
        .groupBy(F.window("event_time", window), "event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        per_user.groupBy(
            F.window(F.window_time("window"), window), "event_type"
        )
        .agg(
            F.sum("cnt").alias("event_count"),
            F.count(F.lit(1)).alias("user_count"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "event_count",
            "user_count",
        )
    )


def event_metrics_proctime(
    events: DataFrame,
    window: str | None = None,
    allowed_types: Sequence[str] | None = None,
    config: EngineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """PROCESSING-TIME twin of ``event_metrics`` (SURVEY §2 S4).

    The reference engine exposes a proc-time attribute alongside event
    time (event_source.py); the engine's default stance is event-time
    only (deterministic, oracle-checkable, replay-stable). This twin
    exists for the workloads where proc-time is genuinely right —
    freshness/ops dashboards ("what arrived in the last minute")
    where replays SHOULD re-bucket: each row is stamped with the
    processing-time clock at aggregation and windowed on that stamp.

    Deliberately NOT oracle-gated: proc-time results depend on when
    the job runs — the semantics pinned in tests are the invariants
    that survive nondeterminism (nothing lost/duplicated, window
    bounds aligned to the window size, stamps within the run's clock
    envelope). In streaming, pair with a watermark on ``proc_time``;
    state then evicts by wall clock, Flink's proc-time window
    semantics.
    """
    window = window or config.metrics_window
    allowed = list(allowed_types or config.allowed_event_types)
    stamped = events.where(F.col("event_type").isin(allowed)).withColumn(
        "proc_time", F.current_timestamp()
    )
    agg = (
        stamped.groupBy(
            F.window("proc_time", window).alias("w"), F.col("event_type")
        )
        .agg(
            F.count("*").alias("event_count"),
            F.count_distinct("user_id").alias("user_count"),
        )
    )
    return agg.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "event_type",
        "event_count",
        "user_count",
    )

"""SessionTracker: per-session rollups via session windows.

Reference: services/processing/src/jobs/session_tracker.py:12-58 —
project (:21-27) → filter event_type == 'page_view' (:28) → session
window, 1800 s gap, keyed by (session_id, user_id) (:29-36) →
MAX(device_category) (:45), COUNT → page_count (:44), window start/end
cast to timestamps (:40-43), duration = TIMESTAMPDIFF(MILLISECOND)
(:49-58) → sink rows (core/schemas/session_metrics_sink.py:4-15).

Two implementations with identical results:

- ``session_metrics`` — native ``F.session_window`` (Spark ≥3.2).
  Streaming-capable (state-store backed, merges windows on watermark).
- ``session_metrics_by_lag`` — classic gaps-and-islands with ``lag``
  over a (key ORDER BY time) window. Batch-only, mirrors the SQL oracle
  exactly; kept both as the oracle twin and as the shuffle-cheaper
  batch plan (one window shuffle, no session-merge state).

Session boundary semantics (both impls, and the oracle): an event
starts a new session iff gap_to_previous >= session_gap — this matches
Spark's half-open session window [first, last + gap).

Scale: both shuffle once on the session key. Skewed keys (one hot
session_id) are the risk at 100 TB; AQE skew-join handling does not
apply to window functions, so the mitigation is key-salting by
(session_id, day-bucket) — sessions cannot span the gap anyway.
Duration arithmetic is done in microseconds (unix_micros) to be exact
at timestamp precision, then emitted in ms like the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from realtime_analytics_pipeline_spark.config import DEFAULT_CONFIG, EngineConfig

_SESSION_OUT = [
    "session_id",
    "user_id",
    "start_time",
    "end_time",
    "duration",
    "page_count",
]


def session_metrics(
    events: DataFrame,
    gap: str | None = None,
    config: EngineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """events -> one row per session (native session_window).

    Output: session_id, user_id, start_time, end_time, duration (ms),
    page_count (session_metrics_sink.py:4-15; device_category is
    appended by the streaming wire path where user_agent exists).
    """
    gap = gap or config.session_gap
    return (
        events.groupBy(
            F.session_window("event_time", gap), "session_id", "user_id"
        )
        .agg(
            F.min("event_time").alias("start_time"),
            F.max("event_time").alias("end_time"),
            F.count(F.lit(1)).alias("page_count"),
        )
        .select(
            "session_id",
            "user_id",
            "start_time",
            "end_time",
            (
                (F.unix_micros("end_time") - F.unix_micros("start_time"))
                / F.lit(1000)
            )
            .cast("long")
            .alias("duration"),
            "page_count",
        )
    )


def session_metrics_by_lag(
    events: DataFrame,
    gap_ms: int | None = None,
    config: EngineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Gaps-and-islands twin of ``session_metrics`` (batch oracle plan).

    new-session flag via lag(), island id via running sum — the
    standard SQL sessionization, byte-identical to the DuckDB oracle.
    """
    if gap_ms is None:
        gap_ms = 30 * 60 * 1000
    gap_us = gap_ms * 1000
    w = Window.partitionBy("session_id", "user_id").orderBy("event_time", "event_id")
    t_us = F.unix_micros("event_time")
    prev_us = F.lag(t_us).over(w)
    flagged = events.withColumn(
        "_new_session",
        F.when(prev_us.isNull() | ((t_us - prev_us) >= gap_us), 1).otherwise(0),
    )
    islands = flagged.withColumn(
        "_island",
        F.sum("_new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        islands.groupBy("session_id", "user_id", "_island")
        .agg(
            F.min("event_time").alias("start_time"),
            F.max("event_time").alias("end_time"),
            F.count(F.lit(1)).alias("page_count"),
        )
        .select(
            "session_id",
            "user_id",
            "start_time",
            "end_time",
            (
                (F.unix_micros("end_time") - F.unix_micros("start_time"))
                / F.lit(1000)
            )
            .cast("long")
            .alias("duration"),
            "page_count",
        )
    )

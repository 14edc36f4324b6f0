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

Session boundary semantics (both impls, and the oracle): two events
exactly ``gap`` apart MERGE into one session — an event starts a new
session iff gap_to_previous > session_gap (closed boundary). This is
what BOTH engines do natively: Spark's session_window merges at
exactly-gap (measured, round-9), and the reference's Flink session
windows do too — Flink merges windows when ``TimeWindow.intersects``
(flink-streaming-java TimeWindow.java: ``start <= other.getEnd() &&
end >= other.getStart()``), which treats *touching* windows
[t, t+gap) / [t+gap, t+2gap) as intersecting. The lag twins and every
DuckDB oracle therefore split with the STRICT rule ``diff > gap``
(round-10; round-9 had briefly inverted this by shrinking the native
gap 1 µs to force a half-open split — that diverged from Flink at the
boundary and is removed).

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
    # native session_window applies the closed boundary (merge at
    # exactly-gap) for any interval spelling — no gap adjustment, so
    # boundary semantics are uniform for all gap inputs
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
        F.when(prev_us.isNull() | ((t_us - prev_us) > gap_us), 1).otherwise(0),
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


def session_metrics_bucketed(
    events: DataFrame,
    gap_ms: int | None = None,
    bucket_ms: int = 86_400_000,
) -> DataFrame:
    """Two-phase SKEW-RESILIENT sessionization — exact twin of
    ``session_metrics`` whose shuffle key spreads a hot session_id
    over time buckets (round-9; the mitigation the module docstring
    promised for the one-hot-session 100 TB case).

    Both single-pass forms shuffle ALL events of a key to one task
    (window functions get no AQE skew handling) — a bot session_id
    with 10^9 events serializes there. This form:

    phase 1 — sessionize WITHIN (session_id, user_id, time-bucket)
      by the same lag/gaps-and-islands rule ⇒ partial sessions. The
      hot key now spreads over (key, bucket): a 30-day bot key does
      30 tasks' worth of window work instead of one.
    phase 2 — merge partials across adjacent buckets: partials of a
      key are time-disjoint and start-ordered, so a partial starts a
      new FINAL session iff ``start - lag(end) > gap`` — the
      identical rule applied between consecutive events, so the
      composition is EXACT for any bucket size (within-bucket pairs
      handled in phase 1, cross-bucket pairs by this merge; a
      midnight-straddling session merges back). Phase 2's window
      runs over PARTIALS (≤ buckets-touched + sessions per key),
      orders of magnitude fewer rows than events on exactly the keys
      that are hot.

    Output contract identical to ``session_metrics``; equality is
    oracle-checked (same driver SQL) and pytest-pinned on crafted
    boundary-straddling fixtures.
    """
    if gap_ms is None:
        gap_ms = 30 * 60 * 1000
    gap_us = gap_ms * 1000
    bucket_us = bucket_ms * 1000
    t_us = F.unix_micros("event_time")
    bucketed = events.withColumn("_bucket", (t_us / F.lit(bucket_us)).cast("long"))
    w1 = Window.partitionBy("session_id", "user_id", "_bucket").orderBy(
        "event_time", "event_id"
    )
    prev_us = F.lag(t_us).over(w1)
    partials = (
        bucketed.withColumn(
            "_new",
            F.when(prev_us.isNull() | ((t_us - prev_us) > gap_us), 1).otherwise(0),
        )
        .withColumn(
            "_island",
            F.sum("_new").over(
                w1.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("session_id", "user_id", "_bucket", "_island")
        .agg(
            F.min("event_time").alias("start_time"),
            F.max("event_time").alias("end_time"),
            F.count(F.lit(1)).alias("page_count"),
        )
    )
    # phase 2: merge partials whose cross-bucket gap is < gap. Partials
    # per key are disjoint and start-ordered (bucket boundaries
    # separate them), so the event-level rule reduces to this exact
    # interval merge.
    w2 = Window.partitionBy("session_id", "user_id").orderBy("start_time")
    prev_end = F.lag(F.unix_micros("end_time")).over(w2)
    merged = (
        partials.withColumn(
            "_new",
            F.when(
                prev_end.isNull()
                | ((F.unix_micros("start_time") - prev_end) > gap_us),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "_sess",
            F.sum("_new").over(
                w2.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("session_id", "user_id", "_sess")
        .agg(
            F.min("start_time").alias("start_time"),
            F.max("end_time").alias("end_time"),
            F.sum("page_count").alias("page_count"),
        )
    )
    return merged.select(
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


def session_partials_bucketed(
    events: DataFrame,
    gap: str = "30 minutes",
    bucket_ms: int = 86_400_000,
) -> DataFrame:
    """Phase 1 of two-phase sessionization as a (batch- and
    streaming-legal) native session-window aggregation keyed by
    (session_id, user_id, time-bucket): one partial session per
    within-bucket island. In streaming append mode a partial is
    emitted when the watermark passes its end + gap — the input to
    ``streaming.stateful.merge_partials_stateful`` (phase 2). The
    batch twin's phase 2 is the interval merge in
    ``session_metrics_bucketed``."""
    bucket_us = bucket_ms * 1000
    ev = events.withColumn(
        "_bucket",
        (F.unix_micros("event_time") / F.lit(bucket_us)).cast("long"),
    )
    return (
        ev.groupBy(
            F.session_window("event_time", gap),
            "session_id",
            "user_id",
            "_bucket",
        )
        .agg(
            F.min("event_time").alias("start_time"),
            F.max("event_time").alias("end_time"),
            F.count(F.lit(1)).alias("page_count"),
        )
        .select(
            "session_id", "user_id", "start_time", "end_time", "page_count"
        )
    )

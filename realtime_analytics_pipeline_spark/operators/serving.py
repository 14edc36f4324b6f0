"""Serving-side relational operators.

The reference's cache service re-shapes metric rows in Python over
Redis; these are the same capabilities as DataFrame operators:

- T1/T2 pivots (services/cache/src/infrastructure/kafka/
  message_parser.py:16-43): metric rows → one row per window with
  per-key columns.
- T3/T4 top-N / latest windows (repository.py:80-88,129-139): recency
  reads off the ZSET index → orderBy desc + limit / row_number.
- T5 retention trim (repository.py:111-115, cache config.py:23-24):
  keep newest N windows.
- T6 overview merge (services/cache/src/services/cache_service.py:31-38).

Scale notes: the pivots aggregate to one row per window — cardinality
(#windows) is tiny relative to input, so these run after the heavy
windowed aggregation and shuffle almost nothing. ``pivot`` with an
explicit value list avoids the extra distinct-scan Spark otherwise runs
to discover pivot values (and keeps the plan static at 100 TB).
Top-N uses a global sort LIMIT — Spark's TakeOrderedAndProject, which
does per-partition top-N then merges on the driver: no full sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from realtime_analytics_pipeline_spark.config import DEFAULT_CONFIG, EngineConfig


def pivot_event_metrics(
    event_metrics_df: DataFrame, event_types: Sequence[str]
) -> DataFrame:
    """T1: (window, type, count, users) rows → per-window columns
    ``{type}_count``, ``{type}_users`` (message_parser.py:16-27;
    Redis hash keys ``{type}.count`` — '.' swapped for '_' to stay
    SQL-addressable)."""
    pivoted = (
        event_metrics_df.groupBy("window_start", "window_end")
        .pivot("event_type", list(event_types))
        .agg(
            F.first("event_count").alias("count"),
            F.first("user_count").alias("users"),
        )
    )
    cols = [F.col("window_start"), F.col("window_end")]
    for t in event_types:
        cols.append(F.col(f"{t}_count"))
        cols.append(F.col(f"{t}_users"))
    return pivoted.select(*cols)


def pivot_performance_metrics(
    performance_metrics_df: DataFrame, categories: Sequence[str]
) -> DataFrame:
    """T2: (window, category, avg, p95) rows → per-window columns
    ``{cat}_avg_load_time``, ``{cat}_p95_load_time``
    (message_parser.py:28-43)."""
    pivoted = (
        performance_metrics_df.groupBy("window_start", "window_end")
        .pivot("device_category", list(categories))
        .agg(
            F.first("avg_load_time").alias("avg_load_time"),
            F.first("p95_load_time").alias("p95_load_time"),
        )
    )
    cols = [F.col("window_start"), F.col("window_end")]
    for c in categories:
        cols.append(F.col(f"{c}_avg_load_time"))
        cols.append(F.col(f"{c}_p95_load_time"))
    return pivoted.select(*cols)


def top_n_windows(df: DataFrame, n: int, time_col: str = "window_start") -> DataFrame:
    """T3/T4: newest n windows (repository.py:129-139; API default
    limit=20, cache/src/api/endpoints/metrics.py:13-26). n=1 is the
    'latest window' read (repository.py:80-88)."""
    return df.orderBy(F.col(time_col).desc()).limit(n)


def retention_trim(
    df: DataFrame,
    retain: int | None = None,
    time_col: str = "window_start",
    partition_cols: Sequence[str] = (),
    config: EngineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """T5: keep the newest ``retain`` windows (per partition key if
    given) — ZREMRANGEBYRANK equivalent (repository.py:111-115,
    retention count cache config.py:23-24).

    Uses row_number over a desc time ordering; with partition keys this
    distributes, without it it is a single-partition window — fine for
    the serving table (≤ thousands of windows), documented as such.
    """
    retain = retain or config.window_retention_count
    w = (
        Window.partitionBy(*partition_cols)
        if partition_cols
        else Window.partitionBy(F.lit(1))
    ).orderBy(F.col(time_col).desc())
    return (
        df.withColumn("_rank", F.row_number().over(w))
        .where(F.col("_rank") <= retain)
        .drop("_rank")
    )


def overview(event_pivot: DataFrame, perf_pivot: DataFrame) -> DataFrame:
    """T6: combined latest-event + latest-performance snapshot
    (cache_service.py:31-38) as a single joined row."""
    ev = top_n_windows(event_pivot, 1).select(
        F.col("window_start").alias("event_window_start"),
        *[
            F.col(c).alias(f"event_{c}")
            for c in event_pivot.columns
            if c not in ("window_start", "window_end")
        ],
    )
    pf = top_n_windows(perf_pivot, 1).select(
        F.col("window_start").alias("perf_window_start"),
        *[
            F.col(c).alias(f"perf_{c}")
            for c in perf_pivot.columns
            if c not in ("window_start", "window_end")
        ],
    )
    return ev.crossJoin(pf)

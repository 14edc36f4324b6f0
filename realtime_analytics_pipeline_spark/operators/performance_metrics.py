"""PerformanceTracker: load-time stats per (tumbling window, category).

Reference: services/processing/src/jobs/performance_tracker.py:12-46 —
project (:20-25) → equality filter event_type == 'page_view' (:26) →
IS NOT NULL on load_time (:27) → device categorization
(transformations/device_categorizer.py:4-13) → 300 s tumbling window
(:28-37) → AVG (:42) + PERCENTILE 0.95 (:43) → sink rows
(core/schemas/performance_metrics_sink.py:4-13).

Percentile semantics: Flink ``PERCENTILE`` is continuous
(interpolating); pinned here to ``F.percentile`` which matches DuckDB
``quantile_cont``. At 100 TB use ``approx=True`` →
``percentile_approx`` (t-digest style sketch, mergeable, bounded
memory) — exact percentile holds all values per group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from realtime_analytics_pipeline_spark.config import DEFAULT_CONFIG, EngineConfig


def performance_metrics(
    events: DataFrame,
    window: str | None = None,
    measure: str = "value",
    category_col: str = "event_type",
    event_type_filter: str | None = None,
    percentile: float = 0.95,
    approx: bool = False,
    config: EngineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """events -> one row per (window, category) with avg + p95.

    ``measure``/``category_col`` are parameterized because the synthetic
    testdata carries the metric in ``value`` and has no device column;
    the streaming wire path uses measure="load_time",
    category_col=categorize_device("user_agent") (see streaming/jobs.py).

    Output: window_start, window_end, device_category, avg_load_time,
    p95_load_time (performance_metrics_sink.py:4-13).
    """
    window = window or config.performance_window
    category: Column = (
        F.col(category_col) if isinstance(category_col, str) else category_col
    )
    filtered = events.where(F.col(measure).isNotNull())
    if event_type_filter is not None:
        # reference filters to page_view only (performance_tracker.py:26)
        filtered = filtered.where(F.col("event_type") == event_type_filter)
    p95 = (
        F.percentile_approx(measure, percentile)
        if approx
        else F.percentile(measure, percentile)
    )
    return (
        filtered.groupBy(
            F.window("event_time", window), category.alias("device_category")
        )
        .agg(
            F.avg(measure).alias("avg_load_time"),
            p95.cast("double").alias("p95_load_time"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "device_category",
            "avg_load_time",
            "p95_load_time",
        )
    )

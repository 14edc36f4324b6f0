"""Job coordinator: the reference's StatementSet multi-sink submission
(job_coordinator.py:66-77) in Spark idiom.

Flink submits all three pipelines as one atomic job sharing the source
scan; Spark's equivalent choice (SURVEY §7 hard-part 5) is independent
``writeStream`` queries, each with its own checkpoint — simpler
recovery semantics, per-query backpressure, and the idiomatic shape.
Each job re-reads the (cheap, file/Kafka) source; if single-scan ever
matters, the ``foreachBatch``+persist variant slots in per sink
without touching the operator functions.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from realtime_analytics_pipeline_spark.config import DEFAULT_CONFIG, EngineConfig
from realtime_analytics_pipeline_spark.operators.event_metrics import (
    event_metrics_exact_streaming,
)
from realtime_analytics_pipeline_spark.operators.performance_metrics import (
    performance_metrics,
)
from realtime_analytics_pipeline_spark.operators.session_metrics import session_metrics


def standard_jobs(
    config: EngineConfig = DEFAULT_CONFIG,
) -> dict[str, Callable[[DataFrame], DataFrame]]:
    """The reference's three processing jobs as composable pipelines
    (main.py:28-36 registry parity): each maps the watermarked
    canonical event stream to its metric stream."""
    return {
        "event_metrics": lambda ev: event_metrics_exact_streaming(
            ev, config=config
        ),
        "performance_metrics": lambda ev: performance_metrics(
            ev, config=config
        ),
        "session_metrics": lambda ev: session_metrics(ev, config=config),
    }


def run_all_jobs(
    events_stream: DataFrame,
    out_root: str,
    jobs: dict[str, Callable[[DataFrame], DataFrame]] | None = None,
    available_now: bool = True,
    config: EngineConfig = DEFAULT_CONFIG,
) -> dict[str, object]:
    """Launch every job as an independent parquet-sink streaming query
    with its own checkpoint dir; returns {name: StreamingQuery}.

    With ``available_now`` the queries drain the (finite) source and
    stop — the same graphs run unbounded with a processing-time
    trigger in production.
    """
    jobs = jobs or standard_jobs(config)
    queries = {}
    for name, build in jobs.items():
        out = build(events_stream)
        writer = (
            out.writeStream.format("parquet")
            .option("path", os.path.join(out_root, name, "data"))
            .option(
                "checkpointLocation",
                os.path.join(out_root, name, "_checkpoint"),
            )
            .outputMode("append")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime="4 seconds")
        queries[name] = writer.start()
    return queries


def await_all(queries: dict[str, object]) -> None:
    for q in queries.values():
        q.awaitTermination()


def job_results(spark, out_root: str) -> dict[str, DataFrame]:
    out = {}
    for name in os.listdir(out_root):
        path = os.path.join(out_root, name, "data")
        if os.path.isdir(path):
            try:
                out[name] = spark.read.parquet(path)
            except Exception:
                out[name] = spark.createDataFrame([], "dummy string").where(
                    F.lit(False)
                )
    return out

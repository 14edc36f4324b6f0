"""One-pass data-quality counters via Spark's Observation API.

``DataFrame.observe`` attaches aggregate metrics to a plan WITHOUT a
second scan: the metrics are computed as a side-channel of whatever
action the caller runs (write, count, foreachBatch). At 100 TB this is
the difference between "quality report" costing a full extra pass over
the table and costing nothing.

Reference parity note: the reference pipeline reports ingestion
counters from its processing job (services/processing — error/late
counts surfaced to monitoring); this is the Spark-native equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.observation import Observation


def observe_event_quality(
    df: DataFrame, name: str = "event_quality"
) -> tuple[DataFrame, Observation]:
    """Attach the standard event-stream quality counters to ``df``.

    Returns the observed frame (use it in place of ``df``) and the
    Observation handle; after ANY action on the returned frame,
    ``observation.get`` yields::

        n_rows, n_null_value, n_neg_value, min_ms, max_ms

    All metrics are plain Column aggregates — they ride the existing
    scan inside the same whole-stage-codegen pipeline.
    """
    obs = Observation(name)
    from realtime_analytics_pipeline_spark.schema import raw_ts_ms

    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("value").isNull().cast("long")).alias("n_null_value"),
        F.sum((F.col("value") < 0).cast("long")).alias("n_neg_value"),
        F.min(raw_ts_ms(df)).alias("min_ms"),
        F.max(raw_ts_ms(df)).alias("max_ms"),
    )
    return observed, obs

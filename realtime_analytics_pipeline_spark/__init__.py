"""PySpark-native analytics engine.

A from-scratch re-expression of the query surface of the reference
real-time analytics pipeline (Adam-445/realtime-analytics-pipeline —
FastAPI → Kafka → PyFlink windowed aggregations → ClickHouse/Redis)
as an idiomatic Apache Spark engine:

- every operator is a pure ``DataFrame -> DataFrame`` function usable
  under both ``spark.read`` (batch, oracle-verifiable) and
  ``spark.readStream`` (Structured Streaming parity);
- all hot-path expressions are built-in ``pyspark.sql.functions``
  (Catalyst/codegen, no Python UDFs);
- scale-sensitive choices (broadcast joins, partial aggregation,
  approximate variants) are first-class and documented per operator.

Reference parity citations use ``file:line`` into /root/reference.
"""

from realtime_analytics_pipeline_spark.config import EngineConfig

__all__ = ["EngineConfig"]
__version__ = "0.1.0"

"""Gated query: the REAL JDBC connector path, end-to-end.

The reference's batch sink inserts windowed metrics into ClickHouse
over its wire protocol (services/processing/src/connectors/
clickhouse_sink.py; table DDL services/storage/ddl.py:11-35) and the
serving layer reads them back. This module puts the genuine Spark JDBC
code path — ``DataFrameWriter.jdbc`` with per-partition parallel
INSERTs, then ``DataFrameReader.jdbc`` with a partitioned range read —
under the driver's DuckDB oracle, wired to the Apache Derby embedded
engine that ships in Spark's jars (no external service exists in this
container; swapping the URL/driver string for ClickHouse's is a config
change, every other line is the production path).

The oracle can't see the round trip: if any value, type, or row is
mangled by the SQL-engine hop (string→CLOB mapping, BIGINT width,
NULL handling), the value-hash goes red. That is the point — the same
discipline the parquet-sink queries use, applied to the JDBC surface.
"""

from __future__ import annotations

import itertools
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_analytics_pipeline_spark.operators.event_metrics import (
    event_metrics,
)
from realtime_analytics_pipeline_spark.registry import ALLOWED, register
from realtime_analytics_pipeline_spark.sources.batch import load_events
from realtime_analytics_pipeline_spark.sources.jdbc import (
    derby_url,
    read_jdbc,
    write_jdbc,
)

_ALLOWED_SQL = ", ".join(f"'{t}'" for t in ALLOWED)

_JDBC_ROUNDTRIP_SQL = f"""
SELECT (epoch_ms(ts) // 60000) * 60000 AS window_start_ms,
       event_type,
       count(*) AS event_count,
       count(DISTINCT user_id) AS user_count
FROM events
WHERE event_type IN ({_ALLOWED_SQL})
GROUP BY 1, 2
"""

_call = itertools.count()


@register("jdbc_metrics_roundtrip", _JDBC_ROUNDTRIP_SQL)
def q_jdbc_metrics_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-minute event metrics written INTO an embedded-Derby table via
    per-partition parallel JDBC INSERTs, then read BACK via a
    range-partitioned JDBC scan (one WHERE slice per task — the only
    JDBC read shape that scales), compared against the direct
    computation by the oracle. A fresh database directory per call
    keeps the query deterministic and re-runnable."""
    db_dir = tempfile.mkdtemp(prefix=f"rtap_jdbc_{next(_call)}_")
    url = derby_url(f"{db_dir}/db")
    em = event_metrics(load_events(spark, sf_dir)).select(
        F.unix_millis("window_start").alias("window_start_ms"),
        "event_type",
        "event_count",
        "user_count",
    )
    write_jdbc(em, url, "event_metrics", num_partitions=4)
    bounds = em.agg(
        F.min("window_start_ms").alias("lo"), F.max("window_start_ms").alias("hi")
    ).first()
    back = read_jdbc(
        spark,
        url,
        "event_metrics",
        partition_column="window_start_ms",
        lower_bound=bounds["lo"],
        upper_bound=bounds["hi"] + 1,
        num_partitions=4,
    )
    return back.select(
        F.col("window_start_ms").cast("bigint").alias("window_start_ms"),
        "event_type",
        F.col("event_count").cast("bigint").alias("event_count"),
        F.col("user_count").cast("bigint").alias("user_count"),
    )

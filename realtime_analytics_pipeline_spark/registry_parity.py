"""Gated queries: remaining reference-parity surface + scale variants.

- device categorization (P3): the reference's LIKE-chain CASE/WHEN
  (device_categorizer.py:4-13). The synthetic events table has no
  user_agent column, so a deterministic UA is derived in-query from
  user_id and the categorizer runs on it — the operator under test is
  the precedence-sensitive LIKE chain itself, oracle-mirrored.
- wire-JSON roundtrip (S1): events → nested wire JSON (to_json) →
  from_json(ANALYTICS_EVENT_SCHEMA) → normalize → aggregate. Proves
  the Kafka-path parse chain end-to-end with a SQL oracle.
- semi/anti joins, range join, Q6: join-type coverage beyond Q3/Q5.
- approx variants (rows-only): approx_count_distinct / These are the
  documented 100 TB substitutes for the exact aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_analytics_pipeline_spark.functions.device import categorize_device
from realtime_analytics_pipeline_spark.operators.event_metrics import event_metrics
from realtime_analytics_pipeline_spark.operators.performance_metrics import (
    performance_metrics,
)
from realtime_analytics_pipeline_spark.registry import register
from realtime_analytics_pipeline_spark.schema import raw_ts_ms
from realtime_analytics_pipeline_spark.sources.batch import load_events, load_table
from realtime_analytics_pipeline_spark.streaming.jobs import parse_wire_json

# deterministic fake UA per user: exercises every LIKE branch incl. the
# precedence case (a string containing both Mobile and Tablet)
_UA_CASES = [
    "Mozilla/5.0 (Linux; Android) Mobile Safari",
    "Mozilla/5.0 (iPad; Tablet) AppleWebKit",
    "SearchBot/2.1 (+http://example.com/bot)",
    "Mozilla/5.0 (Windows NT 10.0; Win64) Chrome",
    "Opera Tablet on Mobile bridge",  # Mobile must win over Tablet
]




def _ua_expr():
    c = F.pmod(F.col("user_id").cast("long"), F.lit(len(_UA_CASES)))
    expr = F.lit(_UA_CASES[-1])
    for i in range(len(_UA_CASES) - 2, -1, -1):
        expr = F.when(c == i, _UA_CASES[i]).otherwise(expr)
    return expr


_DEVICE_SQL = f"""
WITH ua AS (
    SELECT event_id, user_id,
           CASE user_id % {len(_UA_CASES)}
               WHEN 0 THEN '{_UA_CASES[0]}'
               WHEN 1 THEN '{_UA_CASES[1]}'
               WHEN 2 THEN '{_UA_CASES[2]}'
               WHEN 3 THEN '{_UA_CASES[3]}'
               ELSE '{_UA_CASES[4]}'
           END AS user_agent
    FROM events
)
SELECT CAST(event_id AS VARCHAR) AS event_id,
       user_agent,
       CASE WHEN user_agent LIKE '%Mobile%' THEN 'Mobile'
            WHEN user_agent LIKE '%Tablet%' THEN 'Tablet'
            WHEN user_agent LIKE '%Bot%' THEN 'Bot'
            ELSE 'Desktop' END AS device_category
FROM ua
"""


@register("device_categorization", _DEVICE_SQL)
def q_device(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = load_table(spark, sf_dir, "events")
    return raw.select(
        F.col("event_id").cast("string").alias("event_id"),
        _ua_expr().alias("user_agent"),
    ).withColumn("device_category", categorize_device("user_agent"))


_WIRE_SQL = """
SELECT (epoch_ms(ts) // 60000) * 60000 AS window_start_ms,
       event_type,
       count(*) AS event_count
FROM events
GROUP BY 1, 2
"""


@register("wire_json_roundtrip", _WIRE_SQL)
def q_wire_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → wire JSON bytes → S1 parse chain → windowed counts.

    The serialization mirrors the ingestion producer (model_dump_json,
    producer.py:39-40); the parse is the exact Kafka-source chain.
    """
    raw = load_table(spark, sf_dir, "events")
    wire = raw.select(
        F.to_json(
            F.struct(
                F.struct(
                    F.col("event_id").cast("string").alias("id"),
                    F.col("event_type").alias("type"),
                ).alias("event"),
                F.struct(F.col("user_id").cast("string").alias("id")).alias(
                    "user"
                ),
                raw_ts_ms(raw).alias("timestamp"),  # raw ts → epoch ms
            )
        ).alias("value")
    )
    events = parse_wire_json(wire, "10 seconds")
    return (
        events.groupBy(F.window("event_time", "60 seconds"), "event_type")
        .agg(F.count(F.lit(1)).alias("event_count"))
        .select(
            F.unix_millis("window.start").alias("window_start_ms"),
            "event_type",
            "event_count",
        )
    )


_Q6_SQL = """
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 25
"""


@register("tpch_q6_forecast_revenue", _Q6_SQL)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 25)
    ).agg(
        F.round(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * F.col("l_discount").cast("decimal(18,2)")
            ),
            2,
        )
        .cast("double")
        .alias("revenue")
    )


_ANTI_SQL = """
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderdate < TIMESTAMP '1995-07-01'
)
"""


@register("customers_without_orders", _ANTI_SQL)
def q_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join — distributed NOT EXISTS (scoped to the first
    half-year so the synthetic data yields a non-trivial answer)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp"))
        .select("o_custkey")
    )
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


_SEMI_SQL = """
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_totalprice > 400000
)
"""


@register("customers_with_big_orders", _SEMI_SQL)
def q_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join — distributed EXISTS."""
    customer = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice") > 400000
    )
    return customer.join(
        big, customer.c_custkey == big.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


_RANGE_SQL = """
WITH buckets AS (
    SELECT CAST(unnest(range(10)) * 100.0 AS DOUBLE) AS lo,
           CAST((unnest(range(10)) + 1) * 100.0 AS DOUBLE) AS hi
)
SELECT lo AS bucket_lo, hi AS bucket_hi, count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total
FROM orders JOIN buckets ON o_totalprice >= lo * 1000 AND o_totalprice < hi * 1000
GROUP BY 1, 2
"""


@register("orders_range_join_buckets", _RANGE_SQL)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: facts against a broadcast bucket-range
    dimension — compiles to BroadcastNestedLoopJoin with a range
    predicate; the standard histogram-by-range shape."""
    orders = load_table(spark, sf_dir, "orders")
    buckets = (
        spark.range(10)
        .select(
            (F.col("id") * 100.0).alias("bucket_lo"),
            ((F.col("id") + 1) * 100.0).alias("bucket_hi"),
        )
    )
    joined = orders.join(
        F.broadcast(buckets),
        (F.col("o_totalprice") >= F.col("bucket_lo") * 1000)
        & (F.col("o_totalprice") < F.col("bucket_hi") * 1000),
    )
    return joined.groupBy("bucket_lo", "bucket_hi").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


_PERF_DEVICE_SQL = f"""
WITH ua AS (
    SELECT ts, value,
           CASE user_id % {len(_UA_CASES)}
               WHEN 0 THEN '{_UA_CASES[0]}'
               WHEN 1 THEN '{_UA_CASES[1]}'
               WHEN 2 THEN '{_UA_CASES[2]}'
               WHEN 3 THEN '{_UA_CASES[3]}'
               ELSE '{_UA_CASES[4]}'
           END AS user_agent
    FROM events
    WHERE event_type = 'view' AND value IS NOT NULL
)
SELECT (epoch_ms(ts) // 300000) * 300000 AS window_start_ms,
       (epoch_ms(ts) // 300000) * 300000 + 300000 AS window_end_ms,
       CASE WHEN user_agent LIKE '%Mobile%' THEN 'Mobile'
            WHEN user_agent LIKE '%Tablet%' THEN 'Tablet'
            WHEN user_agent LIKE '%Bot%' THEN 'Bot'
            ELSE 'Desktop' END AS device_category,
       round(avg(value), 6) AS avg_load_time,
       round(quantile_cont(value, 0.95), 6) AS p95_load_time
FROM ua
GROUP BY 1, 2, 3
"""


@register("performance_by_device", _PERF_DEVICE_SQL)
def q_perf_by_device(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full reference PerformanceTracker chain
    (performance_tracker.py:12-46): equality filter on the page-view
    analog + IS NOT NULL + device categorization + 300 s window +
    avg/p95 — exercised as one composed pipeline."""
    ev = load_events(spark, sf_dir).withColumn("user_agent", _ua_expr())
    df = performance_metrics(
        ev,
        category_col=categorize_device("user_agent"),
        event_type_filter="view",
    )
    return df.select(
        F.unix_millis("window_start").alias("window_start_ms"),
        F.unix_millis("window_end").alias("window_end_ms"),
        "device_category",
        F.round("avg_load_time", 6).alias("avg_load_time"),
        F.round("p95_load_time", 6).alias("p95_load_time"),
    )


_SESSION_DEVICE_SQL = f"""
WITH ua AS (
    SELECT user_id, event_id, ts,
           CASE user_id % {len(_UA_CASES)}
               WHEN 0 THEN '{_UA_CASES[0]}'
               WHEN 1 THEN '{_UA_CASES[1]}'
               WHEN 2 THEN '{_UA_CASES[2]}'
               WHEN 3 THEN '{_UA_CASES[3]}'
               ELSE '{_UA_CASES[4]}'
           END AS user_agent
    FROM events
),
cat AS (
    SELECT user_id, event_id, ts,
           CASE WHEN user_agent LIKE '%Mobile%' THEN 'Mobile'
                WHEN user_agent LIKE '%Tablet%' THEN 'Tablet'
                WHEN user_agent LIKE '%Bot%' THEN 'Bot'
                ELSE 'Desktop' END AS device_category
    FROM ua
),
flagged AS (
    SELECT user_id, event_id, ts, device_category,
           CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                THEN 1 ELSE 0 END AS is_new
    FROM cat
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
islands AS (
    SELECT user_id, ts, device_category,
           sum(is_new) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS island
    FROM flagged
)
SELECT CAST(user_id AS VARCHAR) AS session_id,
       CAST(user_id AS VARCHAR) AS user_id,
       epoch_ms(min(ts)) AS start_ms,
       epoch_ms(max(ts)) AS end_ms,
       (epoch_us(max(ts)) - epoch_us(min(ts))) // 1000 AS duration,
       count(*) AS page_count,
       max(device_category) AS device_category
FROM islands
GROUP BY user_id, island
"""


@register("session_metrics_devices", _SESSION_DEVICE_SQL)
def q_session_devices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full reference session sink schema (session_metrics_sink.py:4-15)
    including MAX(device_category) (session_tracker.py:45)."""
    ev = load_events(spark, sf_dir).withColumn(
        "device_category", categorize_device(_ua_expr())
    )
    sess = (
        ev.groupBy(
            F.session_window("event_time", "30 minutes"),
            "session_id",
            "user_id",
        )
        .agg(
            F.min("event_time").alias("start_time"),
            F.max("event_time").alias("end_time"),
            F.count(F.lit(1)).alias("page_count"),
            F.max("device_category").alias("device_category"),
        )
    )
    return sess.select(
        "session_id",
        "user_id",
        F.unix_millis("start_time").alias("start_ms"),
        F.unix_millis("end_time").alias("end_ms"),
        (
            (F.unix_micros("end_time") - F.unix_micros("start_time"))
            / F.lit(1000)
        )
        .cast("long")
        .alias("duration"),
        "page_count",
        "device_category",
    )


_JSON_PROPS_SQL = """
SELECT event_type,
       count(*) AS n_events,
       round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6)
           AS avg_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY 1
"""


@register("props_json_extraction", _JSON_PROPS_SQL)
def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar functions over the carried ``props`` column (the
    reference carries properties MAP without reading it — this shows
    the engine CAN query it): get_json_object → typed aggregation."""
    raw = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        raw.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
    )


_SQL_INTERFACE_SQL = """
SELECT event_type,
       CAST(user_id AS VARCHAR) AS user_id,
       count(*) AS n
FROM events
WHERE event_type IN ('view', 'click')
GROUP BY 1, 2
HAVING count(*) >= 10
"""


@register("sql_interface_demo", _SQL_INTERFACE_SQL)
def q_sql_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's SQL front door: register the table as a temp view
    and run the query as a SQL string through Catalyst — identical
    semantics to the DataFrame API (same optimizer, same plans)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "events_sql_demo"
    )
    return spark.sql(
        """
        SELECT event_type,
               CAST(user_id AS STRING) AS user_id,
               count(*) AS n
        FROM events_sql_demo
        WHERE event_type IN ('view', 'click')
        GROUP BY 1, 2
        HAVING count(*) >= 10
        """
    )


@register("event_metrics_approx")  # rows-only: HLL++ is engine-specific
def q_event_metrics_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB variant of event_metrics: approx_count_distinct (HLL++,
    single shuffle, bounded state) instead of exact two-phase distinct."""
    return event_metrics(load_events(spark, sf_dir), approx=True)


@register("performance_metrics_approx")  # rows-only: t-digest sketch
def q_performance_metrics_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB variant of performance_metrics: percentile_approx
    (mergeable sketch, bounded memory) instead of exact percentile."""
    return performance_metrics(load_events(spark, sf_dir), approx=True)

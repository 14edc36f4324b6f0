"""Kafka transport contract tests — no broker required.

The container has no Kafka broker or spark-sql-kafka JAR, so these
tests move REAL serialized messages through the exact projections the
Kafka source/sink use, asserting the wire contract end-to-end:

- source side: producer wire JSON (binary values, as Kafka delivers
  them) → ``parse_wire_json`` → canonical events
  (kafka_source.py:6-19 lenient-parse parity);
- sink side: metric rows → ``kafka_json_payload`` (the identical
  select ``write_kafka_json`` streams to the broker, value-only JSON
  like the reference's Flink sinks, kafka_sink.py:10-46) → consumer
  re-parse with the sink schema → byte-faithful row equality;
- full chain: wire bytes → engine aggregation → sink bytes →
  consumer parse == the batch result.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from realtime_analytics_pipeline_spark.operators.event_metrics import event_metrics
from realtime_analytics_pipeline_spark.operators.session_metrics import (
    session_metrics,
)
from realtime_analytics_pipeline_spark.schema import raw_ts_ms
from realtime_analytics_pipeline_spark.sources.batch import load_events, load_table
from realtime_analytics_pipeline_spark.streaming.jobs import parse_wire_json
from realtime_analytics_pipeline_spark.streaming.sinks import (
    KAFKA_TS_FORMAT,
    kafka_json_payload,
)

from tests.conftest import SF_SMOKE


def _rows_set(df):
    return {tuple(r) for r in df.collect()}


def _wire_values(events_raw):
    """Producer-format wire JSON for the testdata events (the nested
    envelope the ingestion service emits, producer.py:39-40)."""
    return events_raw.select(
        F.to_json(
            F.struct(
                F.struct(
                    F.col("event_id").cast("string").alias("id"),
                    F.col("event_type").alias("type"),
                ).alias("event"),
                F.struct(F.col("user_id").cast("string").alias("id")).alias(
                    "user"
                ),
                raw_ts_ms(events_raw).alias("timestamp"),
            )
        ).alias("value")
    )


def test_source_parses_binary_values(spark):
    """Kafka delivers value as BINARY; parse_wire_json must accept the
    byte form (value.cast(string) path) and yield the same canonical
    events as the string form."""
    raw = load_table(spark, SF_SMOKE, "events")
    wire_str = _wire_values(raw)
    wire_bin = wire_str.select(F.encode("value", "utf-8").alias("value"))
    from_str = parse_wire_json(wire_str, "10 seconds").select(
        "event_id", "event_type", "user_id", "event_time"
    )
    from_bin = parse_wire_json(wire_bin, "10 seconds").select(
        "event_id", "event_type", "user_id", "event_time"
    )
    got_str, got_bin = _rows_set(from_str), _rows_set(from_bin)
    assert got_bin == got_str
    assert len(got_bin) == raw.count()


def test_sink_value_roundtrip_event_metrics(spark):
    """Sink wire format: serialize event-metrics rows with the exact
    write_kafka_json projection, re-parse as a consumer would with the
    sink schema — every field survives byte-for-byte."""
    em = event_metrics(load_events(spark, SF_SMOKE))
    payload = kafka_json_payload(em)
    assert payload.columns == ["value"]
    back = payload.select(
        F.from_json("value", em.schema, {"timestampFormat": KAFKA_TS_FORMAT}).alias("r")
    ).select("r.*")
    assert _rows_set(back) == _rows_set(em)


def test_sink_key_value_layout(spark):
    """Keyed layout: key = JSON of the partition-key columns (per-key
    ordering for consumers), value = the full row. Key must be a
    deterministic function of (window_start, event_type)."""
    em = event_metrics(load_events(spark, SF_SMOKE))
    payload = kafka_json_payload(em, key_cols=("window_start", "event_type"))
    assert payload.columns == ["key", "value"]
    rows = payload.collect()
    assert len(rows) == em.count()
    for r in rows[:50]:
        key = json.loads(r.key)
        val = json.loads(r.value)
        assert set(key) == {"window_start", "event_type"}
        # key fields are verbatim copies of the value fields
        assert key["event_type"] == val["event_type"]
        assert key["window_start"] == val["window_start"]


def test_sink_value_roundtrip_session_metrics(spark):
    """Session sink rows (micro-precision timestamps, ms durations)
    survive the JSON wire format exactly."""
    sm = session_metrics(load_events(spark, SF_SMOKE))
    back = (
        kafka_json_payload(sm)
        .select(F.from_json("value", sm.schema, {"timestampFormat": KAFKA_TS_FORMAT}).alias("r"))
        .select("r.*")
    )
    assert _rows_set(back) == _rows_set(sm)


def test_full_chain_wire_to_sink(spark):
    """source bytes → engine → sink bytes → consumer parse: the
    complete transport path a reference deployment runs, minus only
    the broker hop."""
    raw = load_table(spark, SF_SMOKE, "events")
    events = parse_wire_json(
        _wire_values(raw).select(F.encode("value", "utf-8").alias("value")),
        "10 seconds",
    )
    em = event_metrics(events)
    consumed = (
        kafka_json_payload(em, key_cols=("window_start", "event_type"))
        .select(F.from_json("value", em.schema, {"timestampFormat": KAFKA_TS_FORMAT}).alias("r"))
        .select("r.*")
    )
    want = event_metrics(parse_wire_json(_wire_values(raw), "10 seconds"))
    assert _rows_set(consumed) == _rows_set(want)
    assert consumed.count() > 0

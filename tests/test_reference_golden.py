"""The reference's E2E golden assertions, replayed against this engine.

Sources (reference tests): tests/e2e/test_full_pipeline.py:28-205 and
services/cache/tests/unit/infrastructure/redis/test_repository.py:53-64
(values catalogued in FIXTURES.md §3). Events enter through the real
wire-JSON parse chain (S1) and flow through the same operators the
gated queries use — this is the reference's test strategy transplanted:
golden outputs for hand-crafted event sets.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from realtime_analytics_pipeline_spark.functions.device import categorize_device
from realtime_analytics_pipeline_spark.operators.event_metrics import event_metrics
from realtime_analytics_pipeline_spark.operators.performance_metrics import (
    performance_metrics,
)
from realtime_analytics_pipeline_spark.operators.serving import retention_trim
from realtime_analytics_pipeline_spark.operators.session_metrics import session_metrics
from realtime_analytics_pipeline_spark.streaming.jobs import parse_wire_json

BASE_MS = 1_704_067_200_000  # 2024-01-01T00:00:00Z

DESKTOP_UA = "Mozilla/5.0 (Windows NT 10.0; Win64; x64)"


def wire_event(
    i: int,
    etype: str,
    user: str,
    session: str = "s1",
    ua: str = DESKTOP_UA,
    load_time: int | None = None,
    offset_ms: int = 0,
):
    return {
        "event": {"id": f"e{i}", "type": etype},
        "device": {"user_agent": ua, "screen_width": 1920, "screen_height": 1080},
        "user": {"id": user},
        "context": {
            "url": "https://example.com/page_1",
            "referrer": None,
            "ip_address": None,
            "session_id": session,
        },
        "properties": {"page_category": "home"},
        "metrics": {"load_time": load_time, "interaction_time": 100},
        "timestamp": BASE_MS + offset_ms,
    }


def ingest(spark, events):
    raw = spark.createDataFrame(
        [(json.dumps(e),) for e in events], "value string"
    )
    return parse_wire_json(raw, "10 seconds")


def test_multi_event_type_aggregation_golden(spark):
    """page_view×2 (users a,b), click×1 (a), conversion×1 (c), one
    window → page_view {2,2}, click {1,1}, conversion {1,1}
    (test_full_pipeline.py:104-115)."""
    events = [
        wire_event(1, "page_view", "user-a", offset_ms=1000),
        wire_event(2, "page_view", "user-b", offset_ms=2000),
        wire_event(3, "click", "user-a", offset_ms=3000),
        wire_event(4, "conversion", "user-c", offset_ms=4000),
        wire_event(5, "not_allowed_type", "user-d", offset_ms=5000),
    ]
    out = event_metrics(
        ingest(spark, events),
        allowed_types=["page_view", "click", "conversion", "add_to_cart"],
    )
    got = {
        r.event_type: (r.event_count, r.user_count) for r in out.collect()
    }
    assert got == {
        "page_view": (2, 2),
        "click": (1, 1),
        "conversion": (1, 1),
    }


def test_performance_metrics_golden(spark):
    """load_times [100..500] on Desktop → avg exactly 300.0, p95 ≥ 400
    (test_full_pipeline.py:118-163)."""
    events = [
        wire_event(i, "page_view", "user-a", load_time=lt, offset_ms=i * 1000)
        for i, lt in enumerate([100, 200, 300, 400, 500])
    ]
    ev = ingest(spark, events)
    out = performance_metrics(
        ev,
        measure="load_time",
        category_col=categorize_device("user_agent"),
        event_type_filter="page_view",
    ).collect()
    assert len(out) == 1
    row = out[0]
    assert row.device_category == "Desktop"
    assert row.avg_load_time == 300.0
    assert row.p95_load_time >= 400


def test_session_happy_path_golden(spark):
    """single page_view → one session, page_count=1, duration=0,
    device Desktop (test_full_pipeline.py:28-55)."""
    ev = ingest(spark, [wire_event(1, "page_view", "user-a")]).withColumn(
        "device_category", categorize_device("user_agent")
    )
    sess = (
        ev.groupBy(
            F.session_window("event_time", "30 minutes"), "session_id", "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("page_count"),
            F.max("device_category").alias("device_category"),
            F.min("event_time").alias("start_time"),
            F.max("event_time").alias("end_time"),
        )
        .collect()
    )
    assert len(sess) == 1
    s = sess[0]
    assert s.page_count == 1
    assert s.device_category == "Desktop"
    assert s.start_time == s.end_time  # duration 0


def test_session_gap_splits_sessions(spark):
    """intra-gap events merge; > 30 min gap splits
    (FIXTURES fixture requirement; session gap config.py:23)."""
    events = [
        wire_event(1, "page_view", "u", offset_ms=0),
        wire_event(2, "page_view", "u", offset_ms=10 * 60 * 1000),
        wire_event(3, "page_view", "u", offset_ms=70 * 60 * 1000),
    ]
    out = session_metrics(ingest(spark, events)).collect()
    assert sorted(r.page_count for r in out) == [1, 2]


def test_every_allowed_type_processed_golden(spark):
    """one event of each allowed type → count=1, users=1 each
    (test_full_pipeline.py:166-205, parametrized)."""
    allowed = ["page_view", "click", "conversion", "add_to_cart"]
    events = [
        wire_event(i, t, f"user-{i}", offset_ms=i * 1000)
        for i, t in enumerate(allowed)
    ]
    out = event_metrics(ingest(spark, events), allowed_types=allowed)
    got = {r.event_type: (r.event_count, r.user_count) for r in out.collect()}
    assert got == {t: (1, 1) for t in allowed}


def test_retention_trim_golden(spark):
    """5 windows, retention 3 → newest 3 kept (test_repository.py:53-64,
    windows 1000..1004 → keep 1002,1003,1004)."""
    rows = [(1000 + i, f"w{i}") for i in range(5)]
    df = spark.createDataFrame(rows, "window_start long, payload string")
    kept = retention_trim(df, retain=3, time_col="window_start")
    assert sorted(r.window_start for r in kept.collect()) == [1002, 1003, 1004]


def test_device_categorizer_patterns(spark):
    """pattern + precedence assertions
    (tests/unit/transformations/test_device_categorizer.py:64-94)."""
    cases = [
        ("Mozilla/5.0 (Linux; Android 10) Mobile Safari", "Mobile"),
        ("Mozilla/5.0 (iPad) Tablet AppleWebKit", "Tablet"),
        ("Googlebot/2.1 Bot", "Bot"),
        (DESKTOP_UA, "Desktop"),
        (None, "Desktop"),
        ("Weird Mobile Tablet Bot combo", "Mobile"),  # precedence
        ("Tablet then Bot", "Tablet"),
    ]
    df = spark.createDataFrame(
        [(ua,) for ua, _ in cases], "user_agent string"
    ).withColumn("cat", categorize_device("user_agent"))
    got = [r.cat for r in df.collect()]
    assert got == [want for _, want in cases]

"""Endpoint-parity facade: responses must equal the gated serving
queries (which are themselves oracle-verified)."""

from __future__ import annotations

from realtime_analytics_pipeline_spark.operators import serving
from realtime_analytics_pipeline_spark.operators.event_metrics import event_metrics
from realtime_analytics_pipeline_spark.operators.performance_metrics import (
    performance_metrics,
)
from realtime_analytics_pipeline_spark.serving_api import ServingApi
from realtime_analytics_pipeline_spark.sources.batch import load_events

from tests.conftest import SF_SMOKE

CATS = ["view", "click", "purchase", "signup", "error"]


def _api(spark) -> ServingApi:
    ev = load_events(spark, SF_SMOKE)
    event_pivot = serving.pivot_event_metrics(
        event_metrics(ev), ["view", "click", "purchase", "signup"]
    )
    perf_pivot = serving.pivot_performance_metrics(
        performance_metrics(ev), CATS
    )
    return ServingApi(event_pivot, perf_pivot)


def test_endpoints_match_serving_operators(spark):
    api = _api(spark)
    latest = api.event_latest().collect()
    assert len(latest) == 1
    windows = api.event_windows(limit=20).collect()
    assert len(windows) == 20
    # /event/latest IS the newest of /event/windows
    assert latest[0] == windows[0]
    perf = api.performance_windows(limit=5).collect()
    assert len(perf) == 5
    ov = api.overview().collect()
    assert len(ov) == 1
    # overview carries both sides' newest window columns
    row = ov[0].asDict()
    assert any(k.startswith("event_window") for k in row)
    assert any(k.startswith("perf_window") for k in row)


def test_health_endpoints(spark):
    api = _api(spark)
    assert api.healthz()["status"] == "ok"
    assert api.readyz()["status"] == "ok"


def test_from_parquet_store_roundtrip(spark, tmp_path):
    api = _api(spark)
    ed, pd_ = str(tmp_path / "event"), str(tmp_path / "perf")
    api.event_windows(limit=120).write.parquet(ed)
    api.performance_windows(limit=120).write.parquet(pd_)
    stored = ServingApi.from_parquet(spark, ed, pd_)
    assert (
        stored.event_latest().collect() == api.event_latest().collect()
    )
    assert len(stored.performance_windows(limit=7).collect()) == 7

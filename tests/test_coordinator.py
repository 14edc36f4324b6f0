"""X1 parity: three streaming jobs off one source definition, each
with its own checkpoint, draining a finite source via availableNow."""

from __future__ import annotations

from realtime_analytics_pipeline_spark.streaming.coordinator import (
    await_all,
    job_results,
    run_all_jobs,
)
from realtime_analytics_pipeline_spark.streaming.jobs import (
    read_events_stream_from_dir,
)
from realtime_analytics_pipeline_spark.sources.batch import load_table

from tests.conftest import SF_SMOKE, write_time_ordered_stream_fixture


def test_run_all_jobs_end_to_end(spark, tmp_path):
    src = str(tmp_path / "src")
    write_time_ordered_stream_fixture(load_table(spark, SF_SMOKE, "events"), src, 3)

    out_root = str(tmp_path / "out")
    stream = read_events_stream_from_dir(spark, src)
    queries = run_all_jobs(stream, out_root)
    assert set(queries) == {
        "event_metrics",
        "performance_metrics",
        "session_metrics",
    }
    await_all(queries)

    results = job_results(spark, out_root)
    # every sink produced watermark-finalized rows with its sink schema
    em = results["event_metrics"]
    assert em.count() > 0
    assert set(em.columns) == {
        "window_start", "window_end", "event_type", "event_count", "user_count"
    }
    pm = results["performance_metrics"]
    assert pm.count() > 0
    assert "p95_load_time" in pm.columns
    sm = results["session_metrics"]
    assert sm.count() > 0
    assert {"session_id", "duration", "page_count"} <= set(sm.columns)

    # restart the same jobs over the same checkpoints: nothing new to
    # process, row counts unchanged (checkpoint recovery, X3)
    stream2 = read_events_stream_from_dir(spark, src)
    queries2 = run_all_jobs(stream2, out_root)
    await_all(queries2)
    assert job_results(spark, out_root)["event_metrics"].count() == em.count()

"""The reference's performance acceptance envelope, transplanted onto
the engine's ingestion front door.

Reference: tests/performance/test_throughput.py — async load at a
target RPS against POST /analytics/track, passing when
``error_rate <= 5%`` and ``actual_rps >= 70% of target``
(core/config.py: design target 1000 RPS). This transplant drives the
stdlib ``IngestionHttpServer`` with a thread-pool client at the same
default smoke rate the reference uses locally (PERF_RATES default 50)
plus the full 1000 RPS design target, and applies the reference's
strict-mode assertions unconditionally — our mirror has no broker to
blame, so the envelope must hold.

Env knobs mirror the reference: PERF_RATES, PERF_DURATION,
PERF_MAX_ERROR_RATE.
"""

from __future__ import annotations

import json
import os
import time
import urllib.error
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import pytest

from realtime_analytics_pipeline_spark.ingestion_api import IngestionHttpServer


def _parse_rates(value: str | None) -> list[int]:
    if not value:
        return [50, 1000]  # reference smoke default + design target
    return [int(p) for p in value.split(",") if p.strip()]


def _payload(i: int) -> bytes:
    return json.dumps(
        {
            "event": {"type": "page_view"},
            "user": {"id": f"user-{i % 97}"},
            "device": {
                "user_agent": "Mozilla/5.0 (X11; Linux x86_64)",
                "screen_width": 1920,
                "screen_height": 1080,
            },
            "context": {
                "url": f"https://example.com/p{i % 11}",
                "session_id": f"s-{i % 97}",
            },
            "metrics": {"load_time": 100 + i % 200},
            "timestamp": 1704067200000 + i,
        }
    ).encode()


@pytest.mark.parametrize("target_rps", _parse_rates(os.getenv("PERF_RATES")))
def test_ingestion_throughput_envelope(tmp_path, target_rps):
    duration = int(os.getenv("PERF_DURATION", "5"))
    max_error_rate = float(os.getenv("PERF_MAX_ERROR_RATE", "5.0"))
    srv = IngestionHttpServer(str(tmp_path / "feed"))
    url = f"http://127.0.0.1:{srv.port}/analytics/track"
    total = target_rps * duration
    results = {"ok": 0, "err": 0}

    def post(i: int) -> None:
        req = urllib.request.Request(
            url,
            data=_payload(i),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=30) as r:
                if r.status == 202:
                    results["ok"] += 1
                else:
                    results["err"] += 1
        except Exception:
            results["err"] += 1

    try:
        t0 = time.time()
        # the reference's async generator ≈ a pool sized to the rate;
        # 32 workers saturate loopback far beyond 1000 RPS
        with ThreadPoolExecutor(max_workers=32) as pool:
            list(pool.map(post, range(total)))
        elapsed = time.time() - t0

        total_requests = results["ok"] + results["err"]
        assert total_requests > 0  # test_throughput.py:39
        error_rate = 100.0 * results["err"] / total_requests
        actual_rps = total_requests / elapsed
        # strict-mode assertions, unconditional (test_throughput.py:42-47)
        assert error_rate <= max_error_rate, (
            f"Error rate too high: {error_rate:.2f}% > {max_error_rate:.2f}%"
        )
        assert actual_rps >= target_rps * 0.7, (
            f"Actual RPS too low: {actual_rps:.1f} < 70% of {target_rps}"
        )
        # everything accepted is really buffered (no silent drops)
        assert srv.producer.pending() == results["ok"]
        # and the Prometheus counter agrees with the client's view
        assert srv.metrics._requests.value == results["ok"]
    finally:
        srv.close()

"""HTTP layer over the serving facade — reference wire-format parity.

The reference exposes its cache over FastAPI (services/cache/src/api/
endpoints/metrics.py:8-31 behind an APIRouter prefix="/metrics", and
health.py:6-19), with payload shapes fixed by the Redis repository
(repository.py:80-140): a window is a flat JSON object
``{"window_start": <epoch_ms int>, "<key>.count": int, ...}`` whose
dotted field names come from the Kafka message parser
(message_parser.py:23-42) and whose metric fields are ABSENT (not
null) for types that produced no message in that window; list
endpoints wrap newest-first windows as ``{"windows": [...]}``; the
overview combines the latest event and performance snapshots
(cache_service.py:31-39); /readyz answers plain-text 503 until ready.

FastAPI is not in this container, so the server is the stdlib
``ThreadingHTTPServer`` — the routes, query parsing, status codes and
JSON bodies are the wire contract, and they are golden-tested in
tests/test_http_api.py. Serving-store reads with ``limit >= 1`` are
``limit``-bounded (`TakeOrderedAndProject`-sized), so those requests
never scan history regardless of table size. The ``limit < 1`` path
mirrors Redis ``zrevrange(0, -1)`` full-range semantics but fetches at
most ``_FULL_RANGE_CAP`` (1e6) windows — the serving store's retention
trim (T5, 120 windows) keeps real tables ~4 orders of magnitude below
that cap, so the cap is a safety bound, not a live truncation; a
hypothetical store retaining more than 1e6 windows would be silently
truncated here where Redis would return everything.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any
from urllib.parse import parse_qs, urlparse

from pyspark.sql import Row

from realtime_analytics_pipeline_spark.serving_api import ServingApi

# ---------------------------------------------------------------------------
# wire-format serializers (repository.py:80-140 / message_parser.py:23-42)
# ---------------------------------------------------------------------------


def _ms(ts: Any) -> int:
    return int(ts.timestamp() * 1000)


def _window_payload(row: Row, suffix_types: dict[str, type]) -> dict[str, Any]:
    """Pivot row -> the Redis-hash wire object: ``window_start`` epoch-ms
    int plus dotted ``<name>.<metric>`` fields; null pivot cells are
    DROPPED, matching a hash that never received that type's message."""
    d = row.asDict()
    out: dict[str, Any] = {"window_start": _ms(d.pop("window_start"))}
    d.pop("window_end", None)
    for col, val in d.items():
        if val is None:
            continue
        for suffix, typ in suffix_types.items():
            if col.endswith(f"_{suffix}"):
                name = col[: -len(suffix) - 1]
                out[f"{name}.{suffix}"] = typ(val)
                break
    return out


_EVENT_FIELDS = {"count": int, "users": int}
_PERF_FIELDS = {"avg_load_time": float, "p95_load_time": float}

# Safety bound for the limit<1 "full range" path (see module docstring):
# Redis zrevrange(0,-1) returns everything; we fetch at most this many
# windows. Retention trim (T5) keeps real stores at 120 windows/type.
_FULL_RANGE_CAP = 10**6


def event_wire(rows: list[Row]) -> list[dict[str, Any]]:
    return [_window_payload(r, _EVENT_FIELDS) for r in rows]


def perf_wire(rows: list[Row]) -> list[dict[str, Any]]:
    return [_window_payload(r, _PERF_FIELDS) for r in rows]


# ---------------------------------------------------------------------------
# routes
# ---------------------------------------------------------------------------


class _Routes:
    """Endpoint logic shared by the HTTP handler and direct tests.

    Each method returns ``(status_code, payload)`` where a dict payload
    is sent as JSON and a str as text/plain — mirroring FastAPI's
    dict-return vs ``Response(status_code=503, content=...)`` split in
    health.py:6-19.
    """

    def __init__(self, api: ServingApi) -> None:
        self._api = api

    def healthz(self) -> tuple[int, Any]:
        try:
            return 200, self._api.healthz()
        except Exception as e:  # liveness failure -> 503, health.py:10-12
            return 503, str(e)

    def readyz(self) -> tuple[int, Any]:
        if self._api.readyz()["status"] == "ok":
            return 200, {"status": "ready"}
        return 503, "not ready"  # health.py:15-19

    def event_latest(self) -> tuple[int, Any]:
        rows = event_wire(self._api.event_latest().collect())
        return 200, (rows[0] if rows else {})  # cache_service.py:22-23

    @staticmethod
    def _zrevrange_slice(rows: list, limit: int) -> list:
        """Redis ``zrevrange(key, 0, limit - 1)`` index semantics for
        limit < 1 (the reference's ``limit: int = 20`` has no ``ge``
        bound, so negatives reach the repository): end index ≤ -1
        wraps from the tail — 0 → the whole retained set, -k → all but
        the k oldest."""
        if limit >= 1:
            return rows[:limit]
        return rows[: max(0, len(rows) + limit)]

    def event_windows(self, limit: int = 20) -> tuple[int, Any]:
        fetch = limit if limit >= 1 else _FULL_RANGE_CAP  # capped full range
        rows = event_wire(self._api.event_windows(fetch).collect())
        return 200, {"windows": self._zrevrange_slice(rows, limit)}

    def performance_windows(self, limit: int = 20) -> tuple[int, Any]:
        fetch = limit if limit >= 1 else _FULL_RANGE_CAP
        rows = perf_wire(self._api.performance_windows(fetch).collect())
        return 200, {"windows": self._zrevrange_slice(rows, limit)}

    def overview(self) -> tuple[int, Any]:
        ev = event_wire(self._api.event_latest().collect())
        pf = perf_wire(self._api.performance_windows(1).collect())
        return 200, {  # cache_service.py:31-39
            "event_latest": ev[0] if ev else {},
            "performance_latest": pf[0] if pf else {},
        }


# ---------------------------------------------------------------------------
# server
# ---------------------------------------------------------------------------


def _make_handler(routes: _Routes, prom_registry=None):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args: Any) -> None:  # quiet test output
            pass

        def do_GET(self) -> None:  # noqa: N802 (http.server API)
            url = urlparse(self.path)
            if url.path == "/metrics" and prom_registry is not None:
                # cache main.py:87-89 — Prometheus exposition lives at
                # the bare /metrics, beside the /metrics/... JSON routes
                from realtime_analytics_pipeline_spark.prom import (
                    PROM_CONTENT_TYPE,
                )

                body = prom_registry.render().encode()
                self.send_response(200)
                self.send_header("Content-Type", PROM_CONTENT_TYPE)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            q = parse_qs(url.query)
            # FastAPI 422s a non-int limit (`limit: int = 20`,
            # metrics.py:15) — mirror that instead of letting int()
            # blow up the handler (dropped connection, no status).
            # Negative/zero ints are NOT rejected by the reference
            # (no ge= bound); they flow to the zrevrange-wrap slice.
            try:
                limit = int(q.get("limit", ["20"])[0])
            except ValueError:
                if url.path in (
                    "/metrics/event/windows",
                    "/metrics/performance/windows",
                ):
                    body = json.dumps(
                        {
                            "detail": [
                                {
                                    "loc": ["query", "limit"],
                                    "msg": "value is not a valid integer",
                                    "type": "int_parsing",
                                }
                            ]
                        }
                    ).encode()
                    self.send_response(422)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
                limit = 20  # routes that never read it
            table = {
                "/healthz": routes.healthz,
                "/readyz": routes.readyz,
                "/metrics/event/latest": routes.event_latest,
                "/metrics/event/windows": lambda: routes.event_windows(limit),
                "/metrics/performance/windows": lambda: (
                    routes.performance_windows(limit)
                ),
                "/metrics/overview": routes.overview,
            }
            fn = table.get(url.path)
            if fn is None:
                self.send_response(404)
                self.end_headers()
                return
            status, payload = fn()
            body = (
                json.dumps(payload).encode()
                if isinstance(payload, (dict, list))
                else str(payload).encode()
            )
            self.send_response(status)
            self.send_header(
                "Content-Type",
                "application/json"
                if isinstance(payload, (dict, list))
                else "text/plain",
            )
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return Handler


class MetricsHttpServer:
    """The cache service's HTTP surface over a ServingApi instance.

    ``port=0`` binds an ephemeral port (tests); ``.port`` reports the
    bound one. The server thread is a daemon — ``close()`` for an
    orderly stop.
    """

    def __init__(
        self,
        api: ServingApi,
        host: str = "127.0.0.1",
        port: int = 0,
        cache_metrics: dict | None = None,
    ):
        """``cache_metrics``: a ``prom.cache_metrics()`` dict (share it
        with the retention-view sink feeding this store); when given,
        ``GET /metrics`` serves the cache worker's Prometheus families
        exactly as reference cache main.py:87-89 does."""
        if cache_metrics is None:
            from realtime_analytics_pipeline_spark.prom import (
                cache_metrics as _mk,
            )

            cache_metrics = _mk()
        self.metrics = cache_metrics
        self._httpd = ThreadingHTTPServer(
            (host, port),
            _make_handler(_Routes(api), cache_metrics["registry"]),
        )
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def close(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()

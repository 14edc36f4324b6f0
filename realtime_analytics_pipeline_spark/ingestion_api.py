"""HTTP ingestion front door — the reference ingestion service,
broker-free (upgrades SURVEY §2 S8 from out-of-scope to implemented).

Reference contract (services/ingestion/src/api/v1/endpoints/track.py,
schemas/analytics_event.py, infrastructure/kafka/producer.py):

- ``POST /analytics/track`` with a nested AnalyticsEvent JSON body →
  validate → produce to Kafka keyed by ``user.id`` → 202
  ``{"status": "accepted"}``; validation failure → 422 with a
  FastAPI-style ``{"detail": [...]}`` error list.
- ``GET /healthz`` → ``{"status": "ok"}``.
- The producer BUFFERS (batch.size / linger.ms) and the send key is
  ``user.id`` — per-user ordering comes from Kafka's keyed-partition
  contract.

Here the producer buffers accepted payloads and flushes them as one
keyed epoch into a feed table via ``produce_keyed`` (the engine's
Kafka-contract produce: pmod(xxhash64(user_id), n) sticky routing,
produce order per partition, two-phase epoch commit), after which the
standard wire-parse chain (``from_json`` + ``normalize_wire_events``)
feeds every downstream job. Validation mirrors the pydantic model
field-for-field in stdlib (required event.type / user.id / device /
context.url+session_id / metrics envelope; optional referrer /
ip_address / properties str|int|float; epoch-ms timestamp defaulted;
``event.id`` defaulted to a UUIDv7 like the reference's uuid6 lib).
"""

from __future__ import annotations

import ipaddress
import json
import os
import re
import secrets
import threading
import time
import urllib.parse
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any

from realtime_analytics_pipeline_spark.sources.feed import produce_keyed


def uuid7() -> str:
    """UUIDv7 (draft RFC 9562 layout): 48-bit unix-ms + version/variant
    bits + random — time-ordered like the reference's uuid6.uuid7."""
    ms = int(time.time() * 1000) & ((1 << 48) - 1)
    rand_a = secrets.randbits(12)
    rand_b = secrets.randbits(62)
    value = (ms << 80) | (0x7 << 76) | (rand_a << 64) | (0x2 << 62) | rand_b
    return str(uuid.UUID(int=value))


def _is_url(v: Any) -> bool:
    """HttpUrl-ish: scheme http/https AND a non-empty host — pydantic's
    HttpUrl rejects a bare 'http://', a prefix check would not."""
    if not isinstance(v, str):
        return False
    try:
        parts = urllib.parse.urlsplit(v)
    except ValueError:
        return False
    return parts.scheme in ("http", "https") and bool(parts.hostname)


_INT_STR = re.compile(r"^[+-]?[0-9]+$")


def _as_int(v: Any) -> int | None:
    """Pydantic-v2 lax int coercion: int passes; an int-syntax string
    ('1920', ' -7 ') parses; an integral float (1920.0) truncates
    losslessly; bool, '3.5', 1920.5 and everything else fail (None).

    The string branch is gated on an ASCII-digit regex before ``int()``:
    Python's ``int()`` also accepts underscore-grouped ('1_000') and
    non-ASCII unicode digit strings, both of which pydantic v2 lax int
    rejects — without the gate the mirror would 202-accept payloads the
    reference 422s."""
    if isinstance(v, bool):
        return None
    if isinstance(v, int):
        return v
    if isinstance(v, float):
        return int(v) if v.is_integer() else None
    if isinstance(v, str):
        s = v.strip()
        return int(s, 10) if _INT_STR.match(s) else None
    return None


def validate_event(payload: Any) -> list[dict[str, str]]:
    """Field-for-field stdlib mirror of schemas/analytics_event.py.

    Returns a FastAPI-style error list (empty = valid). The payload is
    normalized in place: event.id and timestamp defaults are filled,
    property values coerced to their JSON representations.
    """
    errs: list[dict[str, str]] = []

    def err(loc: str, msg: str) -> None:
        errs.append({"loc": loc, "msg": msg})

    if not isinstance(payload, dict):
        return [{"loc": "body", "msg": "object required"}]
    event = payload.get("event")
    if not isinstance(event, dict) or not isinstance(event.get("type"), str) or not event.get("type"):
        err("event.type", "field required (string)")
    else:
        event.setdefault("id", uuid7())
    user = payload.get("user")
    if not isinstance(user, dict) or not isinstance(user.get("id"), str) or not user.get("id"):
        err("user.id", "field required (string)")
    device = payload.get("device")
    if not isinstance(device, dict):
        err("device", "field required")
    else:
        if not isinstance(device.get("user_agent"), str):
            err("device.user_agent", "field required (string)")
        for f in ("screen_width", "screen_height"):
            coerced = _as_int(device.get(f))
            if coerced is None:
                err(f"device.{f}", "field required (int)")
            else:
                device[f] = coerced  # pydantic lax: '1920' -> 1920
    ctx = payload.get("context")
    if not isinstance(ctx, dict):
        err("context", "field required")
    else:
        if not _is_url(ctx.get("url")):
            err("context.url", "valid http(s) URL required")
        if ctx.get("referrer") is not None and not _is_url(ctx["referrer"]):
            err("context.referrer", "valid http(s) URL or null")
        if ctx.get("ip_address") is not None:
            try:
                ipaddress.ip_address(ctx["ip_address"])
            except ValueError:
                err("context.ip_address", "valid IPv4/IPv6 or null")
        if not isinstance(ctx.get("session_id"), str) or not ctx.get("session_id"):
            err("context.session_id", "field required (string)")
    metrics = payload.get("metrics")
    if not isinstance(metrics, dict):
        err("metrics", "field required")
    else:
        for f in ("load_time", "interaction_time"):
            v = metrics.get(f)
            if v is not None:
                coerced = _as_int(v)
                if coerced is None:
                    err(f"metrics.{f}", "int or null")
                else:
                    metrics[f] = coerced
    props = payload.setdefault("properties", {})
    if not isinstance(props, dict) or not all(
        isinstance(k, str) and isinstance(v, (str, int, float))
        and not isinstance(v, bool)
        for k, v in props.items()
    ):
        err("properties", "mapping of str -> str|int|float")
    ts = payload.setdefault("timestamp", int(time.time() * 1000))
    coerced_ts = _as_int(ts)
    if coerced_ts is None:
        err("timestamp", "epoch-ms int")
    else:
        payload["timestamp"] = coerced_ts  # digit string -> int, as pydantic
    return errs


class BufferedEventProducer:
    """The reference EventProducer's buffering semantics over the feed
    sink: ``send`` enqueues (the batch.size/linger analog — O(1), no
    Spark work on the request path), ``flush`` produces the whole
    buffer as ONE keyed epoch (produce_keyed: user-sticky partitions,
    produce order preserved via the monotone ``seq``)."""

    def __init__(self, feed_path: str, num_partitions: int = 8) -> None:
        self.feed_path = feed_path
        self.num_partitions = num_partitions
        self._buf: list[tuple[str, int, str]] = []
        self._seq = 0
        self._lock = threading.Lock()

    def send(self, payload: dict) -> None:
        with self._lock:
            self._buf.append(
                (payload["user"]["id"], self._seq, json.dumps(payload))
            )
            self._seq += 1

    def pending(self) -> int:
        with self._lock:
            return len(self._buf)

    def flush(self, spark) -> int:
        with self._lock:
            batch, self._buf = self._buf, []
        if not batch:
            return 0
        df = spark.createDataFrame(
            batch, "user_id string, seq long, value string"
        )
        os.makedirs(self.feed_path, exist_ok=True)
        produce_keyed(
            df,
            self.feed_path,
            key_col="user_id",
            seq_col="seq",
            num_partitions=self.num_partitions,
        )
        return len(batch)


def _make_handler(producer: BufferedEventProducer):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args: Any) -> None:
            pass

        def _reply(self, status: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self) -> None:  # noqa: N802
            if self.path == "/healthz":  # health.py:6-8
                self._reply(200, {"status": "ok"})
            else:
                self.send_response(404)
                self.end_headers()

        def do_POST(self) -> None:  # noqa: N802
            if self.path != "/analytics/track":  # track.py:29
                self.send_response(404)
                self.end_headers()
                return
            n = int(self.headers.get("Content-Length", "0"))
            try:
                payload = json.loads(self.rfile.read(n))
            except Exception:
                self._reply(
                    422, {"detail": [{"loc": "body", "msg": "invalid JSON"}]}
                )
                return
            errs = validate_event(payload)
            if errs:
                self._reply(422, {"detail": errs})
                return
            producer.send(payload)
            self._reply(202, {"status": "accepted"})  # track.py:31-34,79

    return Handler


class IngestionHttpServer:
    """POST /analytics/track + GET /healthz over a buffered keyed
    producer. ``port=0`` binds ephemeral; ``.flush(spark)`` commits
    the buffered epoch to the feed table."""

    def __init__(
        self,
        feed_path: str,
        host: str = "127.0.0.1",
        port: int = 0,
        num_partitions: int = 8,
    ) -> None:
        self.producer = BufferedEventProducer(feed_path, num_partitions)
        self._httpd = ThreadingHTTPServer(
            (host, port), _make_handler(self.producer)
        )
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def flush(self, spark) -> int:
        return self.producer.flush(spark)

    def close(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()

"""RESP3 parity for the cache wire layer (round-9, VERDICT r08 roadmap
candidate #3): typed-frame codec byte-exactness, HELLO negotiation,
map-shaped HGETALL, repository equality across protocols, and REAL
pub/sub push delivery — the out-of-band path the reference's WebSocket
layer consumes (cache repository.py PUBLISH → cache:updates).

Wire fidelity discipline matches tests/test_resp_redis.py: the codec
tests parse RAW BYTES (no server), so a regression in frame layout
cannot hide behind a matching encoder/decoder pair.
"""

from __future__ import annotations

import json
import socket

from realtime_analytics_pipeline_spark.resp import (
    PUBSUB_CHANNEL_UPDATES,
    MiniRedisServer,
    Push,
    RespCacheRepository,
    RespClient,
    _Reader,
)


def _reader_for(payload: bytes) -> _Reader:
    a, b = socket.socketpair()
    a.sendall(payload)
    a.close()
    return _Reader(b)


def test_resp3_typed_frames_parse_from_raw_bytes():
    # map
    r = _reader_for(b"%2\r\n$4\r\nname\r\n$4\r\nmini\r\n$5\r\nproto\r\n:3\r\n")
    assert r.read_reply() == {"name": b"mini", "proto": 3}
    # set
    r = _reader_for(b"~3\r\n:1\r\n:2\r\n:3\r\n")
    assert r.read_reply() == [1, 2, 3]
    # booleans
    r = _reader_for(b"#t\r\n#f\r\n")
    assert r.read_reply() is True and r.read_reply() is False
    # double (incl. infinity spelling)
    r = _reader_for(b",3.5\r\n,inf\r\n")
    assert r.read_reply() == 3.5
    assert r.read_reply() == float("inf")
    # big number
    r = _reader_for(b"(3492890328409238509324850943850943825024385\r\n")
    assert r.read_reply() == 3492890328409238509324850943850943825024385
    # RESP3 null
    r = _reader_for(b"_\r\n")
    assert r.read_reply() is None
    # verbatim string (format prefix included in the byte count)
    r = _reader_for(b"=15\r\ntxt:Some string\r\n")
    assert r.read_reply() == b"txt:Some string"
    # push frame is the distinct Push type
    r = _reader_for(
        b">3\r\n$7\r\nmessage\r\n$4\r\nchan\r\n$5\r\nhello\r\n"
    )
    got = r.read_reply()
    assert isinstance(got, Push)
    assert got == [b"message", b"chan", b"hello"]
    # nested: a map whose value is an array of doubles
    r = _reader_for(b"%1\r\n$1\r\nk\r\n*2\r\n,1.5\r\n,2.5\r\n")
    assert r.read_reply() == {"k": [1.5, 2.5]}


def test_hello_negotiation_and_map_hgetall():
    srv = MiniRedisServer()
    try:
        c = RespClient("127.0.0.1", srv.port)
        # RESP2 before HELLO: flat-array HGETALL
        c.execute("HSET", "h", "a", "1", "b", "2")
        assert c.execute("HGETALL", "h") == [b"a", b"1", b"b", b"2"]
        hello = c.hello(3)
        assert isinstance(hello, dict)
        assert hello["proto"] == 3
        assert hello["server"] == b"mini-redis"
        # RESP3 after HELLO: map HGETALL
        assert c.execute("HGETALL", "h") == {"a": b"1", "b": b"2"}
        # pipelined RESP3 reads keep frame alignment
        got = c.pipeline([("HGETALL", "h"), ("ZCARD", "zz"), ("PING",)])
        assert got == [{"a": b"1", "b": b"2"}, 0, "PONG"]
        c.close()
    finally:
        srv.close()


def test_repository_reads_identical_under_resp2_and_resp3():
    srv = MiniRedisServer()
    try:
        c2 = RespClient("127.0.0.1", srv.port)
        repo2 = RespCacheRepository(c2)
        for w in range(5):
            repo2.store_event_window(
                60000 * w,
                {"view.count": 10 + w, "view.users": 3, "p95": 1.25},
            )
        want = repo2.get_last_event_windows(5)
        latest = repo2.get_latest_event_window()

        c3 = RespClient("127.0.0.1", srv.port)
        c3.hello(3)
        repo3 = RespCacheRepository(c3)
        assert repo3.get_last_event_windows(5) == want
        assert repo3.get_latest_event_window() == latest
        # typed conversion survived the map path (ints stay ints,
        # floats floats — the reference's convert cascade)
        assert want[0]["view.count"] == 14  # newest first
        assert isinstance(want[0]["p95"], float)
        c2.close()
        c3.close()
    finally:
        srv.close()


def test_pubsub_push_delivery_end_to_end():
    srv = MiniRedisServer()
    try:
        sub = RespClient("127.0.0.1", srv.port)
        sub.hello(3)
        # SUBSCRIBE's confirmation is ITSELF a push frame (RESP3)
        got = sub.subscribe(PUBSUB_CHANNEL_UPDATES)
        assert got[0] == b"subscribe"
        assert got[1] == PUBSUB_CHANNEL_UPDATES.encode()
        assert got[2] == 1

        pub = RespClient("127.0.0.1", srv.port)
        repo = RespCacheRepository(pub)
        payload = {"type": "event", "window_start": 60000}
        n = repo.publish_update(payload)
        assert n == 1  # the real receiver count, not the stub 0

        before = sub._sock.gettimeout()
        msg = sub.read_push(timeout=5)
        assert msg[0] == b"message"
        assert msg[1] == PUBSUB_CHANNEL_UPDATES.encode()
        assert json.loads(msg[2]) == payload
        # the shortened read timeout must not leak onto the shared
        # socket for later execute/pipeline calls
        assert sub._sock.gettimeout() == before

        # a second subscriber raises the count
        sub2 = RespClient("127.0.0.1", srv.port)
        sub2.hello(3)
        sub2.subscribe(PUBSUB_CHANNEL_UPDATES)
        assert repo.publish_update({"n": 2}) == 2
        sub.close()
        sub2.close()
        pub.close()
    finally:
        srv.close()


def test_resp2_subscribe_refused_and_resp2_unchanged():
    """RESP2 connections keep the exact pre-round-9 wire behavior:
    flat-array HGETALL, and SUBSCRIBE (a RESP3-push feature here) is
    refused with -ERR rather than silently accepted."""
    import pytest

    srv = MiniRedisServer()
    try:
        c = RespClient("127.0.0.1", srv.port)
        with pytest.raises(RuntimeError, match="HELLO 3"):
            c.execute("SUBSCRIBE", "chan")
        c.execute("HSET", "h", "k", "v")
        assert c.execute("HGETALL", "h") == [b"k", b"v"]
        c.close()
    finally:
        srv.close()

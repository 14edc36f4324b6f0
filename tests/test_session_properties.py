"""Property-based equivalence: native session_window vs the
gaps-and-islands (lag) sessionization must agree on arbitrary event
streams — including boundary gaps of exactly the session timeout.

This pins the closed-boundary semantics (events exactly gap apart
merge — native session_window's touch-merge, matched by the lag twin's
strict > split) both engines and the DuckDB oracle rely on (SURVEY §7
hard-part 1).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from realtime_analytics_pipeline_spark.operators.session_metrics import (
    session_metrics,
    session_metrics_by_lag,
)
from realtime_analytics_pipeline_spark.schema import normalize_testdata_events

GAP_MS = 30 * 60 * 1000
BASE_NS = 1_704_067_200_000_000_000  # 2024-01-01 UTC in ns

# offsets engineered to hit boundaries: 0, ±1ms around the gap,
# exact multiples of the gap, sub-ms (µs) jitter
offset_ms = st.one_of(
    st.integers(min_value=0, max_value=3 * GAP_MS),
    st.sampled_from(
        [0, 1, GAP_MS - 1, GAP_MS, GAP_MS + 1, 2 * GAP_MS, 2 * GAP_MS + 1]
    ),
)

event_stream = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # user id (few → collisions)
        offset_ms,
        st.integers(min_value=0, max_value=999),  # µs jitter
    ),
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=event_stream)
def test_session_window_equals_gaps_and_islands(spark, events):
    rows = [
        (
            i,
            BASE_NS + off_ms * 1_000_000 + jitter_us * 1_000,
            user,
            "view",
            1.0,
            "{}",
        )
        for i, (user, off_ms, jitter_us) in enumerate(events)
    ]
    raw = spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string, "
        "value double, props string"
    )
    ev = normalize_testdata_events(raw)
    native = {
        tuple(r)
        for r in session_metrics(ev).collect()
    }
    lag_based = {
        tuple(r)
        for r in session_metrics_by_lag(ev).collect()
    }
    assert native == lag_based


# ---------------------------------------------------------------------------
# Property: the stateful sessionizer's update function (the exact code
# applyInPandasWithState runs) over an arbitrary batch partitioning of
# the stream must emit EVERY session exactly once — equal to batch
# gaps-and-islands sessionization — when driven through Spark's state
# protocol (per-batch watermark, timeout firing, terminal batch).
# ---------------------------------------------------------------------------


class _FakeState:
    def __init__(self):
        self._val = None
        self.hasTimedOut = False
        self.timeout_ms = None
        self.wm_ms = 0

    @property
    def exists(self):
        return self._val is not None

    @property
    def get(self):
        return self._val

    def update(self, v):
        self._val = tuple(v)

    def remove(self):
        self._val = None
        self.timeout_ms = None

    def getCurrentWatermarkMs(self):
        return self.wm_ms

    def setTimeoutTimestamp(self, ms):
        self.timeout_ms = ms


def _drive(events_by_batch, gap_us):
    """Replay batches through _sessionize_update_fn the way Spark
    does: data calls with the batch watermark, then timeout calls for
    expired states before the next batch, then a terminal batch."""
    import pandas as pd

    from realtime_analytics_pipeline_spark.streaming.stateful import (
        _sessionize_update_fn,
    )

    fn = _sessionize_update_fn(gap_us)
    states: dict = {}
    out = []
    wm_ms = 0

    def call(key, pdfs):
        st = states.setdefault(key, _FakeState())
        st.wm_ms = wm_ms
        for pdf in fn(key, pdfs, st):
            out.extend(pdf.to_dict("records"))

    def fire_timeouts():
        for key, st in states.items():
            if st.exists and st.timeout_ms is not None and st.timeout_ms <= wm_ms:
                st.hasTimedOut = True
                st.wm_ms = wm_ms
                for pdf in fn(key, iter([])):
                    pass

    all_ts = []
    admitted = []
    for batch in events_by_batch:
        # timeouts fire for states the PREVIOUS watermark expired
        for key, st in list(states.items()):
            if st.exists and st.timeout_ms is not None and st.timeout_ms <= wm_ms:
                st.hasTimedOut = True
                st.wm_ms = wm_ms
                for pdf in fn(key, iter([]), st):
                    out.extend(pdf.to_dict("records"))
                st.hasTimedOut = False
        by_key: dict = {}
        for user, ts_us in batch:
            all_ts.append(ts_us)
            if ts_us // 1000 < wm_ms:
                # the watermark contract: rows behind the watermark are
                # dropped BEFORE the stateful operator (Spark's late
                # filter); they exist for watermark advancement only
                continue
            admitted.append((user, ts_us))
            by_key.setdefault((str(user), str(user)), []).append(ts_us)
        for key, ts_list in by_key.items():
            pdf = pd.DataFrame(
                {"event_time": pd.array(ts_list, dtype="int64").astype(
                    "datetime64[us]"
                )}
            )
            call(key, iter([pdf]))
        wm_ms = max(all_ts) // 1000 - 10_000  # delay 10 s
    # terminal batch: final watermark fires remaining eligible timers
    for key, st in list(states.items()):
        if st.exists and st.timeout_ms is not None and st.timeout_ms <= wm_ms:
            st.hasTimedOut = True
            st.wm_ms = wm_ms
            for pdf in fn(key, iter([]), st):
                out.extend(pdf.to_dict("records"))
            st.hasTimedOut = False
    open_sessions = [
        (k[0], st._val) for k, st in states.items() if st.exists
    ]
    return out, open_sessions, admitted


@settings(max_examples=40, deadline=None)
@given(events=event_stream, n_batches=st.integers(min_value=1, max_value=4))
def test_stateful_sessionizer_protocol_property(events, n_batches):
    GAP_US = GAP_MS * 1000
    BASE_US = BASE_NS // 1000
    stream = sorted(
        (user, BASE_US + off_ms * 1000 + jitter_us)
        for (user, off_ms, jitter_us) in events
    )
    # consecutive time-ordered batches (the watermark contract the
    # file-source fixtures also guarantee)
    per = -(-len(stream) // n_batches)
    batches = [stream[i : i + per] for i in range(0, len(stream), per)]

    emitted, open_s, admitted = _drive(batches, GAP_US)

    # reference: gaps-and-islands over the ADMITTED rows (the
    # watermark contract defines the semantics — rows dropped late
    # are outside it), pure python
    sessions = []
    by_user: dict = {}
    for user, ts in sorted(admitted):
        by_user.setdefault(user, []).append(ts)
    for user, ts_list in by_user.items():
        cur = None
        for t in ts_list:
            if cur is None:
                cur = [t, t, 1]
            elif t - cur[1] > GAP_US:
                sessions.append((str(user), tuple(cur)))
                cur = [t, t, 1]
            else:
                cur = [cur[0], max(cur[1], t), cur[2] + 1]
        if cur is not None:
            sessions.append((str(user), tuple(cur)))

    got = sorted(
        (r["session_id"], (r["start_us"], r["end_us"], r["page_count"]))
        for r in emitted
    ) + sorted((u, s) for u, s in open_s)
    assert sorted(got) == sorted(sessions), (
        "emitted + still-open must equal batch sessionization exactly"
    )

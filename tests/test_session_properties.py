"""Property-based equivalence: native session_window vs the
gaps-and-islands (lag) sessionization must agree on arbitrary event
streams — including boundary gaps of exactly the session timeout.

This pins the half-open [first, last + gap) semantics both engines and
the DuckDB oracle rely on (SURVEY §7 hard-part 1).
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

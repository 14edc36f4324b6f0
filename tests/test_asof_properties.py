"""Property-based check of the as-of join against a pure-Python model.

The union + last-non-null-over-window formulation must match the naive
per-hit 'latest source at-or-before' lookup on arbitrary streams,
including same-timestamp source/hit collisions (>= semantics)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from realtime_analytics_pipeline_spark.operators.relational import asof_attribution
from realtime_analytics_pipeline_spark.schema import normalize_testdata_events

BASE_NS = 1_704_067_200_000_000_000

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # user
        st.integers(min_value=0, max_value=50),  # offset seconds
        st.sampled_from(["view", "purchase"]),
    ),
    min_size=1,
    max_size=20,
)


def model_asof(rows):
    """rows: (event_id, user, t_sec, type) — latest view with
    t_view <= t_hit per purchase, ties broken by ANY view at same t
    (timestamps equal ⇒ same attribution value)."""
    out = {}
    for eid, user, t, typ in rows:
        if typ != "purchase":
            continue
        views = [
            tv for _, u, tv, ty in rows if u == user and ty == "view" and tv <= t
        ]
        out[str(eid)] = max(views) if views else None
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=events_strategy)
def test_asof_matches_model(spark, events):
    rows = [
        (i, user, t, typ) for i, (user, t, typ) in enumerate(events)
    ]
    df = spark.createDataFrame(
        [
            (
                eid,
                BASE_NS + t * 1_000_000_000,
                user,
                typ,
                1.0,
                "{}",
            )
            for eid, user, t, typ in rows
        ],
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string",
    )
    got = {
        r.hit_id: (
            None
            if r.last_view_ms is None
            else (r.last_view_ms - BASE_NS // 1_000_000) // 1000
        )
        for r in asof_attribution(normalize_testdata_events(df)).collect()
    }
    assert got == model_asof(rows)


def test_asof_forward_semantics(spark):
    """Forward as-of: same-instant source visible (<=), earliest
    following source wins, no following source -> null."""
    from pyspark.sql import Row

    from realtime_analytics_pipeline_spark.operators.relational import (
        asof_forward,
    )

    us = 1_000_000
    base = 1_700_000_000 * us

    def ev(i, u, t, typ):
        return Row(
            event_id=str(i),
            user_id=str(u),
            event_type=typ,
            event_time=t,
        )

    import pyspark.sql.functions as F

    rows = [
        ev(1, 1, base, "purchase"),        # error at same instant -> tie
        ev(2, 1, base, "error"),
        ev(3, 2, base + us, "purchase"),   # two following errors -> min
        ev(4, 2, base + 5 * us, "error"),
        ev(5, 2, base + 3 * us, "error"),
        ev(6, 3, base + us, "purchase"),   # only a PRIOR error -> null
        ev(7, 3, base, "error"),
    ]
    df = spark.createDataFrame(rows).select(
        "event_id",
        "user_id",
        "event_type",
        F.timestamp_micros(F.col("event_time")).alias("event_time"),
    )
    out = {r["hit_id"]: r["next_error_ms"] for r in asof_forward(df).collect()}
    assert out["1"] == base // 1000              # tie matched
    assert out["3"] == (base + 3 * us) // 1000   # earliest following
    assert out["6"] is None                      # nothing after

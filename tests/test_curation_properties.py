"""Property tests for the curation operators: invariants that must
hold for ARBITRARY inputs, not just the synthetic corpus — same
hypothesis discipline as the sessionizer properties."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from realtime_analytics_pipeline_spark.operators import curation as C

_WORDS = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "x9", "a.b", "no-reply"]),
    min_size=1,
    max_size=8,
)
_EMAILS = st.lists(
    st.sampled_from(
        ["a@b.co", "user.1@test.io", "x_y%z@mail.example.org"]
    ),
    min_size=0,
    max_size=3,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(words=_WORDS, emails=_EMAILS)
def test_redaction_leaves_no_email_spans(spark, words, emails):
    """After redaction no email-shaped span survives, the count equals
    the injected email count, and email-free text is untouched."""
    text = " ".join(words + emails)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = C.redact_pii(df, "text").collect()[0]
    assert not re.search(C.PII_EMAIL, row["clean_text"])
    assert row["n_emails"] == len(emails)
    if not emails:
        assert row["clean_text"] == text


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),  # user
            st.integers(min_value=0, max_value=6),  # day index
        ),
        min_size=1,
        max_size=20,
    )
)
def test_cohort_retention_invariants(spark, data):
    """For any activity set: day-0 retention is 1.0, every rate is in
    (0, 1], and per-cohort active_users never exceeds cohort_size."""
    day = 86400000
    events = spark.createDataFrame(
        [(u, d * day) for u, d in data], "user_id long, ms long"
    ).select("user_id", F.timestamp_millis("ms").alias("event_time"))
    rows = C.cohort_retention(events).collect()
    assert rows
    for r in rows:
        assert 0 < r["retention_rate"] <= 1.0
        assert r["active_users"] <= r["cohort_size"]
        if r["offset_days"] == 0:
            assert r["retention_rate"] == 1.0
    # every user is counted in exactly one cohort's day-0 cell
    day0_total = sum(
        r["active_users"] for r in rows if r["offset_days"] == 0
    )
    assert day0_total == len({u for u, _ in data})

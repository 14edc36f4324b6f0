"""DTW as expression-tree DP: equality with a reference implementation."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from realtime_analytics_pipeline_spark.operators.timeseries import dtw_distance
from tests.conftest import SF_SMOKE


def ref_dtw(a, b):
    n, m = len(a), len(b)
    D = [[math.inf] * m for _ in range(n)]
    for i in range(n):
        for j in range(m):
            c = abs(a[i] - b[j])
            if i == 0 and j == 0:
                D[i][j] = c
            elif i == 0:
                D[i][j] = c + D[0][j - 1]
            elif j == 0:
                D[i][j] = c + D[i - 1][0]
            else:
                D[i][j] = c + min(
                    D[i - 1][j], D[i][j - 1], D[i - 1][j - 1]
                )
    return D[n - 1][m - 1]


CASES = [
    ([1.0, 2.0, 3.0], [1.0, 2.0, 3.0]),      # identity -> 0
    ([1.0, 2.0, 3.0], [3.0, 2.0, 1.0]),      # reversal
    ([0.0, 0.0, 1.0, 0.0], [0.0, 1.0, 0.0]), # shift absorbed -> 0
    ([1.0], [2.0, 3.0]),                      # degenerate lengths
    ([2.0, 2.0], [2.0]),
    ([5.0, 1.0, 5.0, 1.0], [1.0, 5.0, 1.0, 5.0]),
]


def test_dtw_fixed_cases(spark):
    df = spark.createDataFrame(CASES, "xs array<double>, ys array<double>")
    got = [r.d for r in df.select(dtw_distance("xs", "ys").alias("d")).collect()]
    want = [float(ref_dtw(a, b)) for a, b in CASES]
    assert got == want


@given(
    a=st.lists(st.integers(0, 50), min_size=1, max_size=12),
    b=st.lists(st.integers(0, 50), min_size=1, max_size=12),
)
@settings(max_examples=25, deadline=None)
def test_dtw_random_series_match_reference(spark, a, b):
    af = [float(x) for x in a]
    bf = [float(x) for x in b]
    df = spark.createDataFrame(
        [(af, bf)], "xs array<double>, ys array<double>"
    )
    got = df.select(dtw_distance("xs", "ys").alias("d")).collect()[0].d
    assert got == float(ref_dtw(af, bf))


def test_dtw_gated_query_matches_reference_on_testdata(spark):
    from realtime_analytics_pipeline_spark import registry
    from realtime_analytics_pipeline_spark.sources.batch import load_events

    out = {
        (r.t1, r.t2): r.dtw
        for r in registry.QUERIES["ts_dtw_pairs"](spark, SF_SMOKE).collect()
    }
    # rebuild the series locally and check every pair
    ev = load_events(spark, SF_SMOKE)
    daily = (
        ev.groupBy("event_type", F.date_trunc("day", "event_time").alias("d"))
        .agg(F.count("*").alias("c"))
        .collect()
    )
    series: dict[str, list] = {}
    for r in daily:
        series.setdefault(r.event_type, []).append((r.d, float(r.c)))
    for t in series:
        series[t] = [c for _, c in sorted(series[t])]
    for (t1, t2), d in out.items():
        assert d == round(ref_dtw(series[t1], series[t2]), 6)
    assert len(out) == len(series) * (len(series) - 1) // 2


def test_activity_lsh_scores_match_exact_and_recall_floor(spark):
    """The LSH sibling re-scores candidates with the SAME cosine as the
    exact day-join (dense zero-filled grid == sparse identity), so
    shared pairs carry identical scores; top-10 recall vs exact has a
    measured floor (10/10 at sf0.001, 8/10 at sf0.01 with 6 bits)."""
    from realtime_analytics_pipeline_spark import registry

    exact = {
        (r.u1, r.u2): r.cos_sim
        for r in registry.QUERIES["users_activity_similarity"](
            spark, SF_SMOKE
        ).collect()
    }
    approx = {
        (r.u1, r.u2): r.cos_sim
        for r in registry.QUERIES["users_activity_similarity_lsh"](
            spark, SF_SMOKE
        ).collect()
    }
    shared = set(exact) & set(approx)
    assert len(shared) >= 8  # measured 10/10; floor flags regressions
    for p in shared:
        assert abs(exact[p] - approx[p]) < 1e-9

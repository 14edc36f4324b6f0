"""Engine-independent reference checks for sessionization (round-9).

The gate pins Spark == DuckDB and test_skew_stress pins the three Spark
plans against each other; this file adds a THIRD truth source — a
direct Python reimplementation of the closed-boundary session rule (an
event starts a new session iff gap-to-previous > session_gap; two
events exactly gap apart MERGE — what both Spark's native
session_window and Flink's TimeWindow.intersects touch-merge do) — on
randomized corpora that DELIBERATELY include exact-gap collisions at
microsecond resolution, the boundary where the lag twins and the SQL
oracles would diverge if they used the non-strict inequality.
"""

from __future__ import annotations

import datetime as dt
import random

from realtime_analytics_pipeline_spark.operators.session_metrics import (
    session_metrics,
    session_metrics_bucketed,
    session_metrics_by_lag,
)

GAP_US = 1800 * 1_000_000
BASE_US = int(dt.datetime(2024, 1, 1).timestamp()) * 1_000_000


def _random_events(seed: int, n: int = 300) -> list[tuple[int, int, str]]:
    """(event_id, ts_us, key) with gaps drawn to hit the boundary: some
    exactly GAP_US, some 1 µs under, some 1 µs over, rest uniform."""
    rng = random.Random(seed)
    rows = []
    eid = 0
    for key in ("a", "b", "hot"):
        t = BASE_US + rng.randrange(0, 10**6)
        k_n = n if key == "hot" else n // 4
        for _ in range(k_n):
            rows.append((eid, t, key))
            eid += 1
            r = rng.random()
            if r < 0.15:
                gap = GAP_US  # exact boundary — must MERGE (closed)
            elif r < 0.3:
                gap = GAP_US - 1  # 1 µs under — must MERGE
            elif r < 0.4:
                gap = GAP_US + 1  # 1 µs over — must SPLIT
            else:
                gap = rng.randrange(1, 3 * GAP_US)
            t += gap
    return rows


def _py_sessions(rows) -> set[tuple[str, int, int, int]]:
    """(key, start_us, end_us, page_count) under the closed rule."""
    by_key: dict[str, list[int]] = {}
    for _, ts, k in rows:
        by_key.setdefault(k, []).append(ts)
    out = set()
    for k, times in by_key.items():
        times.sort()
        start = prev = times[0]
        count = 1
        for t in times[1:]:
            if t - prev > GAP_US:
                out.add((k, start, prev, count))
                start, count = t, 0
            count += 1
            prev = t
        out.add((k, start, prev, count))
    return out


_EPOCH = dt.datetime(1970, 1, 1)
_US = dt.timedelta(microseconds=1)


def _spark_sessions(df) -> set[tuple[str, int, int, int]]:
    # integer µs via timedelta division — float epoch math loses µs
    return {
        (
            r.session_id,
            (r.start_time - _EPOCH) // _US,
            (r.end_time - _EPOCH) // _US,
            r.page_count,
        )
        for r in df.collect()
    }


def test_all_three_forms_match_python_reference(spark):
    for seed in (7, 23):
        rows = _random_events(seed)
        ev = spark.createDataFrame(
            [
                (
                    str(eid),
                    # exact integer µs -> naive UTC datetime (float
                    # epoch math loses sub-µs at e15 magnitudes)
                    dt.datetime(1970, 1, 1)
                    + dt.timedelta(microseconds=ts),
                    "view",
                    k,
                    k,
                    None,
                    0,
                    0.0,
                    "{}",
                )
                for eid, ts, k in rows
            ],
            "event_id string, event_time timestamp, event_type string,"
            " user_id string, session_id string, user_agent string,"
            " load_time long, value double, props string",
        )
        want = _py_sessions(rows)
        assert _spark_sessions(session_metrics(ev)) == want, f"native seed={seed}"
        assert _spark_sessions(session_metrics_by_lag(ev)) == want, (
            f"lag seed={seed}"
        )
        # bucket small (10 min) so merges cross MANY boundaries
        assert (
            _spark_sessions(session_metrics_bucketed(ev, bucket_ms=600_000))
            == want
        ), f"bucketed seed={seed}"

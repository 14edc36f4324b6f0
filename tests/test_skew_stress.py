"""Skew-stress drill (VERDICT r08 item 8 / post-298 roadmap #1): the
reference-surface operators run on a slice whose hot keys are ~100x the
cold ones — one viral event_type (~99% of rows), one bot-like user
(~30% of rows), one dominant device family — and must stay EXACT, with
the skew countermeasures visible in the physical plan:

- plain ``event_metrics``: hot-key aggregation is safe because Spark's
  partial (map-side) aggregation combines before the shuffle — asserted
  structurally (partial_count in the plan), and the exact-distinct path
  spreads the hot key over its member column (key, user_id) first;
- ``salted_event_counts``: the explicit two-phase salted plan must
  carry the _salt key through phase 1 and produce IDENTICAL results;
- device categorization: a 98%-hot LIKE chain stays map-only (no
  exchange at all before the aggregation).

Truth is computed in pandas on the same in-memory rows — a third truth
source independent of both Spark and DuckDB, so a shared-engine bug
can't hide.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from realtime_analytics_pipeline_spark.functions.device import categorize_device
from realtime_analytics_pipeline_spark.operators.event_metrics import event_metrics
from realtime_analytics_pipeline_spark.operators.skew import salted_event_counts

from tests.test_plans import plan_of

N = 120_000
BASE = dt.datetime(2024, 1, 1, 0, 0, 0)
COLD_TYPES = ["click", "purchase", "signup"]
UAS = ["Mozilla/5.0 Mobile Safari", "SomeTablet/1.0", "CrawlerBot/2.0", "curl/8"]


def _skewed_pdf() -> pd.DataFrame:
    """Deterministic hot-key slice: event_type 'view' ~99% (≈100x each
    cold type), user 'hot' ~30% of rows, UA[0] (Mobile) ~98%."""
    idx = pd.RangeIndex(N)
    etype = pd.Series("view", index=idx)
    cold = idx[idx % 101 == 0]
    etype.iloc[cold] = [COLD_TYPES[i % 3] for i in range(len(cold))]
    return pd.DataFrame(
        {
            "event_id": idx.astype(str),
            "event_time": [
                BASE + dt.timedelta(milliseconds=15 * i) for i in idx
            ],
            "event_type": etype,
            "user_id": [
                "hot" if i % 10 < 3 else f"u{i % 5000}" for i in idx
            ],
            "user_agent": [
                UAS[0] if i % 50 != 0 else UAS[1 + (i // 50) % 3]
                for i in idx
            ],
            "value": [float(i % 997) for i in idx],
        }
    )


def _truth_metrics(pdf: pd.DataFrame) -> set:
    t = pdf[pdf.event_type.isin(["view"] + COLD_TYPES)].copy()
    t["w"] = t.event_time.dt.floor("60s")
    g = t.groupby(["w", "event_type"]).agg(
        event_count=("event_id", "size"), user_count=("user_id", "nunique")
    )
    return {
        (w.to_pydatetime(), et, int(r.event_count), int(r.user_count))
        for (w, et), r in g.iterrows()
    }


def test_event_metrics_exact_under_100x_key_skew(spark):
    pdf = _skewed_pdf()
    events = spark.createDataFrame(pdf)
    out = event_metrics(events).collect()
    got = {
        (r.window_start, r.event_type, r.event_count, r.user_count)
        for r in out
    }
    assert got == _truth_metrics(pdf)
    # hot key really is hot: 'view' rows ~100x each cold type's
    per_type = {r.event_type: 0 for r in out}
    for r in out:
        per_type[r.event_type] += r.event_count
    assert per_type["view"] > 50 * max(per_type[t] for t in COLD_TYPES)
    # structural guard: partial (map-side) aggregation combines the hot
    # key BEFORE the exchange — the reason a 100x count skew never
    # concentrates on one reducer
    plan = plan_of(event_metrics(events))
    assert "partial_count" in plan
    # exact distinct spreads the hot key over (key, user_id) first: the
    # plan carries more aggregate stages than exchanges (expand +
    # two-phase), never a single straight hot-key shuffle
    assert plan.count("HashAggregate") >= 3


def test_salted_counts_identical_and_salt_in_plan(spark):
    pdf = _skewed_pdf()
    events = spark.createDataFrame(pdf)
    plain = {
        (r.window_start, r.event_type, r.event_count)
        for r in event_metrics(events)
        .select("window_start", "event_type", "event_count")
        .collect()
    }
    salted = salted_event_counts(events)
    got = {
        (r.window_start, r.event_type, r.event_count)
        for r in salted.collect()
    }
    assert got == plain
    plan = plan_of(salted)
    # the salting signature: phase 1 aggregates on THREE keys (window,
    # event_type, salt — Catalyst extracts the pmod(xxhash64) salt as
    # a _groupingexpression), phase 2 merges on TWO; two aggregation
    # exchanges total
    assert "_groupingexpression" in plan
    assert "Keys [3]" in plan and "Keys [2]" in plan
    assert plan.count("Exchange") >= 2


def test_device_categorization_hot_family_map_only(spark):
    pdf = _skewed_pdf()
    events = spark.createDataFrame(pdf)
    dist = {
        r.device_category: r.n
        for r in events.select(
            categorize_device("user_agent")
        )
        .groupBy("device_category")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # pandas truth of the same precedence chain
    def cat(ua: str) -> str:
        if "Mobile" in ua:
            return "Mobile"
        if "Tablet" in ua:
            return "Tablet"
        if "Bot" in ua:
            return "Bot"
        return "Desktop"

    truth = pdf.user_agent.map(cat).value_counts().to_dict()
    assert dist == truth
    assert dist["Mobile"] > 50 * dist["Tablet"]  # genuinely hot family
    # the categorization itself is pure projection: no exchange before
    # the final count aggregation's
    plan = plan_of(events.select(categorize_device("user_agent")))
    assert "Exchange" not in plan


def _canon_events(spark, rows):
    """rows: (event_id, iso_ts, session/user key) -> canonical events."""
    return spark.createDataFrame(
        [
            (str(eid), dt.datetime.fromisoformat(ts), "view", k, k, None, 0, 0.0, "{}")
            for eid, ts, k in rows
        ],
        "event_id string, event_time timestamp, event_type string,"
        " user_id string, session_id string, user_agent string,"
        " load_time long, value double, props string",
    )


def _sess_set(df):
    return {
        (r.session_id, r.start_time, r.end_time, r.duration, r.page_count)
        for r in df.collect()
    }


def test_bucketed_sessionization_boundary_merges(spark):
    """The two-phase form must merge a session that straddles the
    bucket boundary (midnight) back into ONE session, keep distinct
    sessions distinct, and handle the exact-gap edge (diff == gap
    MERGES — the closed boundary both Spark's native session_window
    and Flink's touch-inclusive TimeWindow.intersects apply; the lag
    twins and oracles split only on the strict > gap, round-10)."""
    from realtime_analytics_pipeline_spark.operators.session_metrics import (
        session_metrics,
        session_metrics_bucketed,
    )

    rows = [
        # session A: straddles midnight with 2-min gaps — ONE session
        (1, "2024-01-01T23:58:00", "a"),
        (2, "2024-01-01T23:59:30", "a"),
        (3, "2024-01-02T00:01:00", "a"),
        (4, "2024-01-02T00:02:30", "a"),
        # session B: same key, far later the same day — separate
        (5, "2024-01-02T12:00:00", "a"),
        # key c: gap EXACTLY 1800 s across midnight — must MERGE
        # (closed boundary), even across the bucket seam
        (6, "2024-01-02T23:45:00", "c"),
        (7, "2024-01-03T00:15:00", "c"),
        # key e: 1 µs OVER the gap — must SPLIT
        (10, "2024-01-05T08:00:00", "e"),
        (11, "2024-01-05T08:30:00.000001", "e"),
        # key d: gap 1799.999999 s within a day — must MERGE
        (8, "2024-01-04T10:00:00", "d"),
        (9, "2024-01-04T10:29:59.999999", "d"),
    ]
    ev = _canon_events(spark, rows)
    got = _sess_set(session_metrics_bucketed(ev))
    want = _sess_set(session_metrics(ev))
    assert got == want
    by_key = {}
    for s in got:
        by_key.setdefault(s[0], []).append(s)
    assert len(by_key["a"]) == 2  # midnight straddle merged, noon apart
    a_sessions = sorted(by_key["a"])
    assert a_sessions[0][4] == 4  # the merged straddler has all 4 events
    assert len(by_key["c"]) == 1  # exact-gap boundary MERGES (closed)
    assert by_key["c"][0][4] == 2
    assert len(by_key["d"]) == 1  # just-under-gap merges
    assert len(by_key["e"]) == 2  # just-over-gap splits


def test_bucketed_sessionization_equals_native_under_hot_key(spark):
    """One hot session key owning ~40% of a 60k-row slice: the
    two-phase plan must produce the identical session set, and its
    phase-1 shuffle key must carry the bucket column (the skew
    spread), asserted in the plan."""
    from realtime_analytics_pipeline_spark.operators.session_metrics import (
        session_metrics_bucketed,
        session_metrics_by_lag,
    )

    n = 60_000
    rows = []
    for i in range(n):
        key = "hot" if i % 5 < 2 else f"u{i % 3000}"
        # hot key spans 4 days; cold keys cluster tightly
        ts = BASE + dt.timedelta(seconds=5 * i)
        rows.append((i, ts, key))
    ev = spark.createDataFrame(
        [
            (str(i), ts, "view", k, k, None, 0, 0.0, "{}")
            for i, ts, k in rows
        ],
        "event_id string, event_time timestamp, event_type string,"
        " user_id string, session_id string, user_agent string,"
        " load_time long, value double, props string",
    )
    # hour buckets so the multi-day hot key spreads ~100 ways
    got = _sess_set(session_metrics_bucketed(ev, bucket_ms=3_600_000))
    want = _sess_set(session_metrics_by_lag(ev))
    assert got == want
    plan = plan_of(session_metrics_bucketed(ev, bucket_ms=3_600_000))
    # phase-1 window partitions by (session_id, user_id, _bucket) —
    # the bucket key IS the skew spread
    assert "_bucket" in plan


def test_dynamic_gap_exact_boundary_merges(spark):
    """The dynamic-gap session query's per-event-type gap must apply
    the same closed-boundary rule as the fixed-gap family: an error
    event exactly 300 s after the previous one MERGES into its session
    (native session_window's touch-merge), matching the oracle's
    running-max rule with the strict > split (round-10); an event 1 µs
    past the gap starts a new session."""
    import datetime as dt

    from pyspark.sql import functions as F

    rows = [
        # error events: 5-min gap rule. t2 - t1 == exactly 300 s — MERGE
        (1, "2024-01-01T10:00:00", "error"),
        (2, "2024-01-01T10:05:00", "error"),
        # 1 µs under the error gap — merges
        (3, "2024-01-01T12:00:00", "error"),
        (4, "2024-01-01T12:04:59.999999", "error"),
        # 1 µs OVER the error gap — splits
        (5, "2024-01-01T14:00:00", "error"),
        (6, "2024-01-01T14:05:00.000001", "error"),
    ]
    ev = _canon_events_typed(spark, rows)
    gap = F.when(
        F.col("event_type") == "error", F.lit("5 minutes")
    ).otherwise(F.lit("30 minutes"))
    sess = (
        ev.groupBy(F.session_window("event_time", gap), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    counts = sorted(r.n for r in sess)
    assert counts == [1, 1, 2, 2]  # exact-gap + under-gap merge, over splits


def _canon_events_typed(spark, rows):
    return spark.createDataFrame(
        [
            (str(eid), dt.datetime.fromisoformat(ts), et, "k", "k", None, 0, 0.0, "{}")
            for eid, ts, et in rows
        ],
        "event_id string, event_time timestamp, event_type string,"
        " user_id string, session_id string, user_agent string,"
        " load_time long, value double, props string",
    )


def test_native_session_window_merges_at_exact_gap(spark):
    """Pin the measured engine fact the whole convention rests on:
    Spark's native session_window treats two events exactly gap apart
    as ONE session (closed boundary) with the plain, unadjusted
    interval string — the same touch-merge Flink's
    TimeWindow.intersects performs."""
    from pyspark.sql import functions as F

    rows = [
        (1, "2024-01-01T10:00:00", "view"),
        (2, "2024-01-01T10:30:00", "view"),  # exactly 1800 s later
    ]
    ev = _canon_events_typed(spark, rows)
    sess = (
        ev.groupBy(F.session_window("event_time", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert [r.n for r in sess] == [2]


# --------------------------------------------------------------------------
# Round-10 (VERDICT r09 item 5): the PAIR-JOIN family under planted hot
# buckets — a hot LSH band-bucket (identical-doc cluster), a hot
# boilerplate shingle in the prefix inverted index, and a hot k-means
# cell. Truth is pure Python over the same in-memory rows; the
# countermeasure (salted pair join / explicit repartition) is asserted
# structurally in the plan.
# --------------------------------------------------------------------------


def _docs_df(spark, rows):
    """rows: (doc_id, text) -> documents-layout frame."""
    return spark.createDataFrame(
        [(i, t, "en", "test", len(t)) for i, t in rows],
        "doc_id string, text string, lang string, source string,"
        " n_chars long",
    )


def test_lsh_hot_bucket_exact_and_salted(spark):
    """40 byte-identical docs collide into ONE (band, bucket) in all 8
    bands — the hottest possible LSH bucket. The salted pair join must
    still emit exactly the C(40,2) identical pairs (est 1.0), nothing
    for the 200 disjoint-vocab cold docs, and the salt columns must be
    in the plan (the hot bucket spreads over 32 chunk tasks)."""
    from realtime_analytics_pipeline_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    hot_text = " ".join(f"tpl{i}" for i in range(30))
    rows = [(f"h{i:03d}", hot_text) for i in range(40)]
    rows += [
        (f"c{i:03d}", " ".join(f"u{i}_{j}" for j in range(30)))
        for i in range(200)
    ]
    got = {
        (r.doc_a, r.doc_b, r.est_jaccard)
        for r in minhash_lsh_pairs(_docs_df(spark, rows)).collect()
    }
    hot_ids = sorted(f"h{i:03d}" for i in range(40))
    want = {
        (a, b, 1.0)
        for i, a in enumerate(hot_ids)
        for b in hot_ids[i + 1 :]
    }
    assert got == want
    plan = plan_of(minhash_lsh_pairs(_docs_df(spark, rows)))
    assert "partner_chunk" in plan  # the salt spread, _salted_pairs


def test_prefix_jaccard_hot_shingle_exact(spark):
    """Every doc shares 5 boilerplate words (a df=n hot shingle class);
    6 planted one-word-edit clones are the only true >=0.9 pairs. The
    prefix filter must return EXACTLY the Python all-pairs truth (the
    frequency-ascending prefix keeps the hot shingles out of the
    inverted index, but correctness must hold regardless), with the
    explicit AQE-exempt repartition in the plan."""
    from realtime_analytics_pipeline_spark.operators.dedup import (
        jaccard_pairs_prefix,
    )

    boiler = [f"tpl{k}" for k in range(5)]
    rows = []
    token_sets = {}
    for i in range(300):
        uniq = [f"u{i}_{j}" for j in range(20)]
        words = boiler + uniq
        did = f"d{i:03d}"
        rows.append((did, " ".join(words)))
        token_sets[did] = set(words)
        if i < 6:  # planted clone: one unique word edited
            cw = uniq.copy()
            cw[0] = f"edit{i}"
            cid = f"d{i:03d}_v"
            rows.append((cid, " ".join(boiler + cw)))
            token_sets[cid] = set(boiler + cw)
    ids = sorted(token_sets)
    want = set()
    for x, a in enumerate(ids):
        for b in ids[x + 1 :]:
            i_ = len(token_sets[a] & token_sets[b])
            u_ = len(token_sets[a] | token_sets[b])
            if i_ * 10 >= u_ * 9:
                want.add((a, b, i_ * 1_000_000 // u_))
    assert want, "fixture must plant real pairs"
    got = {
        (r.doc_a, r.doc_b, r.jaccard_ppm)
        for r in jaccard_pairs_prefix(_docs_df(spark, rows)).collect()
    }
    assert got == want
    plan = plan_of(jaccard_pairs_prefix(_docs_df(spark, rows)))
    assert "REPARTITION_BY_NUM" in plan


def test_kmeans_hot_cell_salted_equals_plain_join(spark):
    """60% of vectors collapse into one quantizer cell (hot cell). The
    round-10 salted candidate form of clustered_dup_pairs must produce
    IDENTICAL rows to the plain cluster-equi-join (recomputed inline
    here), and carry the salt + explicit repartition in the plan."""
    from pyspark.sql import functions as F

    from realtime_analytics_pipeline_spark.functions.vectors import (
        as_double,
        dot,
        unit,
    )
    from realtime_analytics_pipeline_spark.operators.clustering import (
        clustered_dup_pairs,
        kmeans_lite,
    )

    rows = []
    for i in range(150):
        if i % 5 < 3:  # hot direction, integer jitter in one slot
            v = [100.0, 1.0, 0.0, 0.0, float(i % 7), 0.0, 0.0, 1.0]
        else:
            v = [0.0] * 8
            v[i % 8] = 50.0
            v[(i + 3) % 8] = float(5 + i % 11)
        rows.append((f"v{i:03d}", v))
    emb = spark.createDataFrame(rows, "vec_id string, embedding array<float>")

    got = {
        tuple(r)
        for r in clustered_dup_pairs(emb, threshold=0.3).collect()
    }

    assigned = kmeans_lite(emb, 8, 3).select("vec_id", "cluster")
    ev = emb.select(
        "vec_id", unit(as_double("embedding")).alias("v")
    ).join(assigned, "vec_id")
    a = ev.select(
        "cluster", F.col("vec_id").alias("id_a"), F.col("v").alias("va")
    )
    b = ev.select(
        F.col("cluster").alias("cl_b"),
        F.col("vec_id").alias("id_b"),
        F.col("v").alias("vb"),
    )
    want = {
        tuple(r)
        for r in (
            a.join(
                b,
                (F.col("cluster") == F.col("cl_b"))
                & (F.col("id_a") < F.col("id_b")),
            )
            .withColumn("cos", F.round(dot(F.col("va"), F.col("vb")), 6))
            .where(F.col("cos") >= 0.3)
            .select("cluster", "id_a", "id_b", "cos")
        ).collect()
    }
    assert got == want and got, (len(got), len(want))
    plan = plan_of(clustered_dup_pairs(emb, threshold=0.3))
    assert "partner_chunk" in plan
    assert "REPARTITION_BY_NUM" in plan

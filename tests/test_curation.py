"""Unit tests for the curation operators (PII redaction, TF-IDF,
canonical-doc selection, cohort retention, MAD outliers) on crafted
inputs where the expected output is hand-checkable, plus plan gates
for the map-only redaction pass."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from realtime_analytics_pipeline_spark.operators import curation as C
from realtime_analytics_pipeline_spark.operators.clustering import (
    connected_components,
)


# --------------------------------------------------------------------------
# redact_pii
# --------------------------------------------------------------------------


def test_redact_pii_counts_and_text(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at bob.smith@example.org or alice@test.io now"),
            (2, "server 192.168.0.1 and 10.0.0.255 up"),
            (3, "call 555-123-4567 twice"),
            (4, "plain text with no secrets"),
            (5, "combo x@y.com from 1.2.3.4 dial 111-222-3333"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r for r in C.redact_pii(df, "text").collect()
    }
    assert out[1]["n_emails"] == 2 and out[1]["n_ips"] == 0
    assert out[1]["clean_text"] == "mail me at <EMAIL> or <EMAIL> now"
    assert out[2]["n_ips"] == 2
    assert out[2]["clean_text"] == "server <IP> and <IP> up"
    assert out[3]["n_phones"] == 1
    assert out[3]["clean_text"] == "call <PHONE> twice"
    assert (
        out[4]["n_emails"] == out[4]["n_ips"] == out[4]["n_phones"] == 0
    )
    assert out[4]["clean_text"] == "plain text with no secrets"
    assert (
        out[5]["n_emails"],
        out[5]["n_ips"],
        out[5]["n_phones"],
    ) == (1, 1, 1)
    assert out[5]["clean_text"] == "combo <EMAIL> from <IP> dial <PHONE>"


def test_redact_pii_no_double_count(spark):
    # an IP inside an email's domain is consumed by the email pass and
    # must not be re-counted by the IP pass
    df = spark.createDataFrame(
        [(1, "odd address user@10.0.0.1.example.com here")],
        "doc_id long, text string",
    )
    row = C.redact_pii(df, "text").collect()[0]
    assert row["n_emails"] == 1
    assert row["n_ips"] == 0
    assert row["clean_text"] == "odd address <EMAIL> here"


def test_redact_pii_plan_is_map_only(spark):
    df = spark.createDataFrame(
        [(1, "a@b.co")], "doc_id long, text string"
    )
    plan = C.redact_pii(df, "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure per-row pass: no shuffle


# --------------------------------------------------------------------------
# tfidf_top_terms
# --------------------------------------------------------------------------


def test_tfidf_hand_checked(spark):
    # 3 docs; 'rare' appears only in doc 1 (tf=2), 'shared' in all
    docs = spark.createDataFrame(
        [
            (1, "rare rare shared common"),
            (2, "shared common common"),
            (3, "shared common other"),
        ],
        "doc_id long, text string",
    )
    out = C.tfidf_top_terms(docs, k=2)
    rows = {(r["doc_id"], r["rank"]): r for r in out.collect()}
    # doc 1 rank 1 must be 'rare': tf=2, df=1 -> 2*ln(3)
    top1 = rows[(1, 1)]
    assert top1["term"] == "rare"
    assert top1["tf"] == 2 and top1["df"] == 1
    assert abs(top1["tfidf"] - round(2 * math.log(3.0), 6)) < 1e-9
    # 'shared' is in every doc -> idf 0 -> never outranks a positive term
    top2 = rows[(2, 1)]
    assert top2["term"] == "common"  # tf=2, df=3, ln(1)=0? no: df('common')=3
    # common appears in all 3 docs too -> tfidf 0; ties broken by term asc
    assert top2["tfidf"] == 0.0
    # every doc emits exactly k rows when it has >= k distinct terms
    assert sorted(r[0] for r in out.groupBy("doc_id").count().collect()) == [
        1,
        2,
        3,
    ]


def test_tfidf_deterministic_ties(spark):
    docs = spark.createDataFrame(
        [(1, "b a c"), (2, "c b a")], "doc_id long, text string"
    )
    out1 = C.tfidf_top_terms(docs, k=3).collect()
    out2 = C.tfidf_top_terms(docs, k=3).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    # all terms tie at tfidf 0 (every term in every doc): rank = term asc
    ranks = {
        (r["doc_id"], r["term"]): r["rank"] for r in out1
    }
    assert ranks[(1, "a")] == 1 and ranks[(1, "b")] == 2 and ranks[(1, "c")] == 3


# --------------------------------------------------------------------------
# canonical_docs
# --------------------------------------------------------------------------


def test_canonical_docs_selection(spark):
    docs = spark.createDataFrame(
        [(1, 10), (2, 50), (3, 50), (4, 7)],
        "doc_id long, n_chars long",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "doc_a long, doc_b long"
    )
    cc = connected_components(pairs)
    out = {
        r["doc_id"]: r
        for r in C.canonical_docs(docs, cc, "n_chars").collect()
    }
    # cluster {1,2,3}: best quality is 50, tie between 2 and 3 -> min id 2
    assert out[2]["is_canonical"] and not out[3]["is_canonical"]
    assert not out[1]["is_canonical"]
    assert out[1]["cluster_id"] == out[2]["cluster_id"] == 1
    assert out[1]["cluster_size"] == 3
    # doc 4 is a singleton cluster and its own canonical
    assert out[4]["is_canonical"] and out[4]["cluster_size"] == 1
    assert out[4]["cluster_id"] == 4


def test_canonical_docs_survivor_count(spark):
    # exactly one canonical per cluster
    docs = spark.createDataFrame(
        [(i, i * 3 % 7) for i in range(20)], "doc_id long, n_chars long"
    )
    pairs = spark.createDataFrame(
        [(0, 5), (5, 10), (1, 2), (7, 8)], "doc_a long, doc_b long"
    )
    out = C.canonical_docs(docs, connected_components(pairs), "n_chars")
    per_cluster = (
        out.groupBy("cluster_id")
        .agg(F.sum(F.col("is_canonical").cast("long")).alias("n_canon"))
        .collect()
    )
    assert all(r["n_canon"] == 1 for r in per_cluster)
    assert out.count() == 20  # every doc classified


# --------------------------------------------------------------------------
# cohort_retention
# --------------------------------------------------------------------------


def test_cohort_retention_hand_checked(spark):
    day = 86400000
    rows = [
        # users 1,2 start day 0; user 1 returns day 1; user 3 starts day 1
        (1, 0), (2, 0), (1, day), (3, day), (1, 2 * day), (3, 2 * day),
    ]
    events = spark.createDataFrame(
        [(u, ms) for u, ms in rows], "user_id long, ms long"
    ).select(
        "user_id", F.timestamp_millis(F.col("ms")).alias("event_time")
    )
    out = {
        (r["cohort_ms"], r["offset_days"]): r
        for r in C.cohort_retention(events).collect()
    }
    assert out[(0, 0)]["active_users"] == 2
    assert out[(0, 0)]["cohort_size"] == 2
    assert out[(0, 1)]["active_users"] == 1  # only user 1 returned
    assert out[(0, 1)]["retention_rate"] == 0.5
    assert out[(0, 2)]["active_users"] == 1
    assert out[(day, 0)]["active_users"] == 1  # user 3's cohort
    assert out[(day, 1)]["active_users"] == 1
    assert (day, 2) not in out


# --------------------------------------------------------------------------
# value_mad_outliers
# --------------------------------------------------------------------------


def test_mad_outliers_hand_checked(spark):
    # 9 inliers 1..9 (median 5, MAD 2) + one wild point at 100:
    # with the 10th point median 5.5, MAD 2.5; fence = 5.5 ± 3*1.4826*2.5
    vals = list(range(1, 10)) + [100]
    events = spark.createDataFrame(
        [("a", float(v)) for v in vals] + [("a", None), ("b", 1.0)],
        "event_type string, value double",
    ).select("event_type", "value")
    out = {r["event_type"]: r for r in C.value_mad_outliers(events).collect()}
    a = out["a"]
    assert a["n"] == 10  # null excluded
    assert a["med"] == 5.5 and a["mad"] == 2.5
    hi = 5.5 + 3 * 1.4826 * 2.5
    assert 100 > hi and 9 < hi  # exactly one point beyond the fence
    assert a["n_outliers"] == 1
    assert a["outlier_rate"] == 0.1
    # a single point is its own median: never an outlier (MAD 0 fence
    # collapses but |v - med| = 0)
    assert out["b"]["n_outliers"] == 0


def test_mad_outliers_robust_to_contamination(spark):
    # mean/std z-scores would drag the threshold with the outliers;
    # MAD fences must still flag all 5 planted spikes
    base = [float(v) for v in range(100)]
    spikes = [1e6] * 5
    events = spark.createDataFrame(
        [("t", v) for v in base + spikes], "event_type string, value double"
    )
    out = C.value_mad_outliers(events).collect()[0]
    assert out["n_outliers"] == 5

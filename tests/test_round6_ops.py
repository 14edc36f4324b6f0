"""Round-6 operators: retrieval scoring (TF-IDF / BM25), Bloom
prescreen, banded edit distance, n-gram novelty, hashed linear quality,
MinHash calibration, pair-cosine histogram, CUSUM drift.

Oracle value-parity is covered by the driver gate; these tests pin the
SEMANTIC invariants the hash comparison can't express (set-containment,
closed-form-vs-sequential equality, recall floors)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

from realtime_analytics_pipeline_spark.operators import dedup as D
from realtime_analytics_pipeline_spark.operators import text_analysis as T
from realtime_analytics_pipeline_spark.operators.retrieval import (
    bm25_topk,
    tfidf_top_terms,
)
from realtime_analytics_pipeline_spark.operators.similarity import (
    pair_cosine_histogram,
)
from realtime_analytics_pipeline_spark.operators.timeseries import cusum_drift
from realtime_analytics_pipeline_spark.sources.batch import (
    load_events,
    load_table,
)


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMOKE, "documents")


def test_bloom_prescreen_no_false_negatives(spark, docs):
    """The Bloom contract: candidate set ⊇ exact-dup set, NEVER ⊂ —
    an exact dup missed by the filter would be a correctness bug, an
    extra candidate is just prescreen cost."""
    out = D.bloom_prescreen(
        docs.where(F.col("source") != "src0"),
        docs.where(F.col("source") == "src0"),
    ).collect()
    assert len(out) == docs.where(F.col("source") == "src0").count()
    for r in out:
        if r.exact_dup:
            assert r.bloom_candidate, f"false negative at doc {r.doc_id}"


def test_bloom_prescreen_flags_a_real_dup(spark, docs):
    """A probe doc whose text is injected into the index must come back
    bloom_candidate AND exact_dup."""
    probe = docs.where(F.col("source") == "src0").limit(1)
    index = docs.where(F.col("source") != "src0").unionByName(probe)
    row = (
        D.bloom_prescreen(index, probe)
        .collect()[0]
    )
    assert row.bloom_candidate and row.exact_dup


def test_edit_distance_banded_self_and_bounds(spark, docs):
    """An exact copy in the same band is found at distance 0; every
    emitted pair respects the max_distance cap."""
    clone = docs.limit(1).withColumn("doc_id", F.col("doc_id") + 100000)
    out = D.edit_distance_banded(docs.unionByName(clone)).collect()
    assert all(r.edit_distance <= 12 for r in out)
    orig_id = docs.limit(1).collect()[0].doc_id
    assert any(
        r.doc_a == orig_id and r.doc_b == orig_id + 100000
        and r.edit_distance == 0
        for r in out
    )


def test_ngram_novelty_bounds_and_short_docs(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d", "en", "s", 7),
            (2, "a b c d", "en", "s", 7),  # exact dup of 1 → novelty 0
            (3, "x y", "en", "s", 3),      # < 3 tokens → no grams
            (4, "p q r s t", "en", "s", 9),  # all grams unique → 1.0
        ],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    rows = {r.doc_id: r for r in T.ngram_novelty(df).collect()}
    assert rows[1].novelty == 0.0 and rows[2].novelty == 0.0
    assert rows[3].n_distinct_grams == 0 and rows[3].novelty is None
    assert rows[4].novelty == 1.0


def test_tfidf_ranks_are_dense_per_source(spark, docs):
    out = tfidf_top_terms(docs, top_k=5)
    per_src = (
        out.groupBy("source")
        .agg(F.collect_list("rnk").alias("rnks"))
        .collect()
    )
    for r in per_src:
        assert sorted(r.rnks) == list(range(1, len(r.rnks) + 1))
    # scores non-increasing with rank inside a source
    w_ok = out.groupBy("source").agg(
        F.min(F.col("tfidf")).alias("mn"), F.max("tfidf").alias("mx")
    ).collect()
    assert all(r.mx >= r.mn for r in w_ok)


def test_bm25_topk_ordering_and_monotone_tf(spark):
    """More matching occurrences ⇒ higher BM25 (same lengths), and the
    output is sorted (score desc, doc_id)."""
    df = spark.createDataFrame(
        [
            (1, "spark spark spark pad pad pad", "en", "s", 1),
            (2, "spark spark lorem pad pad pad", "en", "s", 1),
            (3, "spark lorem ipsum pad pad pad", "en", "s", 1),
            (4, "lorem ipsum dolor pad pad pad", "en", "s", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    out = bm25_topk(df, ["spark"], top_k=4).collect()
    assert [r.doc_id for r in out] == [1, 2, 3, 4]
    assert [r.rnk for r in out] == [1, 2, 3, 4]
    assert out[0].bm25 > out[1].bm25 > out[2].bm25 > out[3].bm25 >= 0.0


def test_hashed_linear_quality_is_content_deterministic(spark):
    """Same text ⇒ same score regardless of doc_id; score_ppm is the
    floored integer quotient of the raw sum."""
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "alpha")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in T.hashed_linear_quality(df).collect()}
    assert rows[1].score_raw == rows[2].score_raw
    assert rows[1].score_ppm == rows[2].score_ppm
    for r in rows.values():
        assert r.score_ppm == r.score_raw * 1000 // r.n_tokens


def test_minhash_calibration_counts_are_consistent(spark, docs):
    out = D.minhash_calibration(docs).collect()
    assert out, "sampled pair set must be non-empty at sf0.001"
    for r in out:
        assert 0 <= r.jaccard_decile <= 9
        assert 0 <= r.n_within_tol <= r.n_pairs
        assert 0 <= r.n_overestimates <= r.n_pairs


def test_all_pairs_equi_matches_naive(spark):
    """The bucketed equi-join pair former is exactly the a<b pair set."""
    df = spark.range(0, 37).select(F.col("id").alias("doc_id"))
    got = sorted(
        (r.a_doc_id, r.b_doc_id)
        for r in D.all_pairs_equi(df, "doc_id").collect()
    )
    want = [(a, b) for a in range(37) for b in range(37) if a < b]
    assert got == want


def test_pair_cosine_histogram_buckets(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    out = pair_cosine_histogram(emb).collect()
    n_total = sum(r.n_pairs for r in out)
    assert n_total > 0
    assert all(-10 <= r.cos_bucket <= 9 for r in out)
    # md5 16-bit bucket < 6553 targets ~10% of all pairs; allow wide
    # tolerance (content-hash sampling is exact-but-lumpy)
    n = emb.count()
    frac = n_total / (n * (n - 1) / 2)
    assert 0.05 < frac < 0.15


def test_cusum_closed_form_equals_sequential(spark):
    """cum − running-min(cum) IS Page's max(0, s+dev) recurrence."""
    ev = load_events(spark, SF_SMOKE).select(
        F.unix_millis("event_time").alias("event_ms"), "value"
    )
    rows = cusum_drift(ev).orderBy("minute_ms").collect()
    s = 0
    for r in rows:
        s = max(0, s + (r.total_cents - r.target_cents))
        assert r.cusum_pos == s, f"divergence at {r.minute_ms}"
        assert r.is_drift == (s > 2 * r.target_cents)


def test_zorder_key_int_interleaves_exactly(spark):
    """De-interleaving the Morton key recovers both dim codes, and the
    key preserves locality: equal codes ⇒ equal keys."""
    df = spark.createDataFrame(
        [(a, b) for a in range(0, 100, 7) for b in range(0, 100, 11)],
        "x long, y long",
    )
    from realtime_analytics_pipeline_spark.operators.storage import (
        zorder_key_int,
    )

    rows = zorder_key_int(df, ["x", "y"], bits=8).collect()
    mn_x = min(r.x for r in rows)
    mx_x = max(r.x for r in rows)
    mn_y = min(r.y for r in rows)
    mx_y = max(r.y for r in rows)
    for r in rows:
        cx = (r.x - mn_x) * 256 // (mx_x - mn_x + 1)
        cy = (r.y - mn_y) * 256 // (mx_y - mn_y + 1)
        zk = r["__zkey"]
        got_cx = sum(((zk >> (2 * b)) & 1) << b for b in range(8))
        got_cy = sum(((zk >> (2 * b + 1)) & 1) << b for b in range(8))
        assert (got_cx, got_cy) == (cx, cy)


def test_zorder_probe_skips_files(spark):
    """A bottom-decile probe on either dim must skip a majority of the
    32 z-ordered files (the whole point of multi-dim clustering)."""
    from realtime_analytics_pipeline_spark.registry import QUERIES

    rows = QUERIES["lineitem_zorder_skipping"](spark, SF_SMOKE).collect()
    n_read = sum(1 for r in rows if r.probe_reads_file)
    assert n_read <= len(rows) // 2, f"probe reads {n_read}/{len(rows)}"


def test_minute_gap_fill_spine_and_interpolation(spark):
    """Dense spine (every minute lo..hi), observed rows pass through,
    interpolated rows stay within [min, max] of their bracketing
    observations and match the exact linear formula."""
    from realtime_analytics_pipeline_spark.operators.timeseries import (
        minute_gap_fill,
    )

    rows = spark.createDataFrame(
        [(0, 1.0), (60_000, 1.0), (300_000, 11.0), (360_000, 5.0)],
        "event_ms long, value double",
    )
    out = {
        r.minute_ms: r
        for r in minute_gap_fill(rows).orderBy("minute_ms").collect()
    }
    assert sorted(out) == [0, 60_000, 120_000, 180_000, 240_000,
                           300_000, 360_000]
    assert not out[0].is_interpolated and out[0].filled_cents == 100
    assert out[300_000].filled_cents == 1100
    # linear ramp 100 → 1100 over 60k..300k: +250 cents per minute
    for t, want in [(120_000, 350), (180_000, 600), (240_000, 850)]:
        assert out[t].is_interpolated
        assert out[t].filled_cents == want, (t, out[t].filled_cents)

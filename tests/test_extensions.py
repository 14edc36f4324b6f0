"""Semantic tests for the approximate/rows-only extension operators
(no DuckDB oracle possible — sketch hashes are Spark-native)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtime_analytics_pipeline_spark.operators import dedup as D
from realtime_analytics_pipeline_spark.operators import similarity as S
from realtime_analytics_pipeline_spark.sources.batch import load_table

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    # unpersist on teardown: Spark caches by logical plan, so a leaked
    # cache turns every later `load_table(..., "documents")` in the
    # session into an InMemoryTableScan — full-schema, no pruning —
    # and breaks the plan-shape tests
    df = load_table(spark, SF_SMOKE, "documents").cache()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def embs(spark):
    df = load_table(spark, SF_SMOKE, "embeddings").cache()
    yield df
    df.unpersist()


def test_minhash_recall_against_exact_jaccard(spark, docs):
    """LSH at threshold t must recover most pairs whose EXACT jaccard
    is well above t (probabilistic recall, margin built in)."""
    exact = {
        (r.doc_a, r.doc_b)
        for r in D.jaccard_pairs(docs, n=1, threshold=0.97).collect()
    }
    approx = {
        (r.doc_a, r.doc_b)
        for r in D.minhash_lsh_pairs(docs, n=1, threshold=0.9).collect()
    }
    if exact:
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.8, f"minhash recall {recall:.2f} on {len(exact)} pairs"
    # estimates bounded
    for r in D.minhash_lsh_pairs(docs, n=1, threshold=0.9).collect():
        assert 0.0 <= r.est_jaccard <= 1.0
        assert r.doc_a < r.doc_b


def test_simhash_pairs_invariants(spark, docs):
    rows = D.simhash_pairs(docs, max_hamming=3).collect()
    assert rows, "near-identical vocab corpus must produce simhash pairs"
    for r in rows:
        assert r.doc_a < r.doc_b
        assert 0 <= r.hamming <= 3


def test_ann_results_are_true_cosines(spark, embs):
    """Every ANN hit must carry the same cosine the exact scorer
    computes, and per-query ranks must be 1..k without gaps."""
    exact = {
        (r.query_id, r.neighbor_id): r.cos
        for r in S.cosine_topk(embs, query_max_id=10, k=500).collect()
    }
    ann = S.lsh_ann_topk(embs, query_max_id=10, k=5).collect()
    assert ann
    by_q = {}
    for r in ann:
        assert exact[(r.query_id, r.neighbor_id)] == r.cos
        by_q.setdefault(r.query_id, []).append(r.rnk)
    for q, rnks in by_q.items():
        assert sorted(rnks) == list(range(1, len(rnks) + 1))


def test_label_centroid_assignment_total(spark, embs):
    n = embs.count()
    out = S.label_centroid_assignment(embs)
    assert out.count() == n  # exactly one assignment per vector
    labels = {r.label for r in embs.select("label").distinct().collect()}
    assert {r.assigned_label for r in out.collect()} <= labels


def test_exact_dedup_collapses_duplicates(spark, docs):
    doubled = docs.unionByName(docs)
    out = D.dedup_exact(doubled)
    assert out.count() == docs.count()
    assert out.where(F.col("dup_count") != 2).count() == 0

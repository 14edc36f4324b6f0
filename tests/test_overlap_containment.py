"""Property pins for the overlap-coefficient (containment) verifier —
the subset-duplicate signal Jaccard misses (round-6 addition).
"""

from __future__ import annotations

from realtime_analytics_pipeline_spark.operators import dedup as D


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_contained_doc_scores_one_despite_low_jaccard(spark):
    # doc 1's token set is a strict subset of doc 2's much larger set:
    # overlap = 1.0 while jaccard = 3/12 = 0.25
    big = " ".join(f"w{i}" for i in range(12))
    rows = [(1, "w0 w1 w2"), (2, big)]
    ov = {
        (r.doc_a, r.doc_b): r.overlap
        for r in D.overlap_pairs(_docs(spark, rows), threshold=0.9).collect()
    }
    assert ov == {(1, 2): 1.0}
    jac = D.jaccard_pairs(_docs(spark, rows), threshold=0.9).collect()
    assert jac == []  # jaccard misses the containment


def test_disjoint_docs_produce_no_pair(spark):
    rows = [(1, "a b c"), (2, "x y z")]
    assert D.overlap_pairs(_docs(spark, rows), threshold=0.1).collect() == []


def test_overlap_is_symmetric_in_pair_order(spark):
    # same pair regardless of which doc has the smaller id/set
    rows = [(5, "a b c d e f"), (9, "a b c")]
    got = D.overlap_pairs(_docs(spark, rows), threshold=0.5).collect()
    assert [(r.doc_a, r.doc_b, r.overlap) for r in got] == [(5, 9, 1.0)]


def test_threshold_filters(spark):
    # overlap = 2/3 ≈ 0.666667: kept at 0.6, dropped at 0.7
    rows = [(1, "a b c"), (2, "a b x y")]
    assert (
        len(D.overlap_pairs(_docs(spark, rows), threshold=0.6).collect()) == 1
    )
    assert (
        D.overlap_pairs(_docs(spark, rows), threshold=0.7).collect() == []
    )

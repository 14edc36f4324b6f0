"""Losslessness pins for the prefix-filtered exact Jaccard verifier
(round-8): ``jaccard_pairs_prefix`` must emit the IDENTICAL pair set
(and identical integer ppm scores) as the naive inverted-index form —
the prefix filter is a candidate pruning, never a recall trade.

The naive twin here re-derives pairs from ALL shingles with the same
exact integer predicate (inter·den ≥ union·num), so any divergence is
a prefix-filter bug, not a rounding artifact.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from realtime_analytics_pipeline_spark.operators import dedup as D
from tests.conftest import SF_SMOKE


def _naive_ppm(docs, n, num, den):
    sh = D._doc_shingles(docs, n)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    out = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("uni", F.col("sz_a") + F.col("sz_b") - F.col("i"))
        .where(F.col("i") * den >= F.col("uni") * num)
        .selectExpr(
            "doc_a",
            "doc_b",
            "(CAST(i AS BIGINT) * 1000000) div uni AS jaccard_ppm",
        )
    )
    return {(r.doc_a, r.doc_b): r.jaccard_ppm for r in out.collect()}


def _prefix_ppm(docs, n, t):
    return {
        (r.doc_a, r.doc_b): r.jaccard_ppm
        for r in D.jaccard_pairs_prefix(docs, n=n, threshold=t).collect()
    }


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_equals_naive_on_testdata(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    assert _prefix_ppm(docs, 1, 0.9) == _naive_ppm(docs, 1, 9, 10)


def test_equals_naive_random_boilerplate_corpus(spark):
    # boilerplate-heavy synthetic corpus: every doc shares a hot header
    # (which prefix filtering must keep OUT of the inverted index), a
    # third of the docs are near-dups of another
    rng = random.Random(8)
    vocab = [f"w{i}" for i in range(200)]
    header = "the quick brown fox"
    rows = []
    for i in range(60):
        body = " ".join(rng.choice(vocab) for _ in range(rng.randint(5, 30)))
        rows.append((2 * i, f"{header} {body}"))
        if i % 3 == 0:  # near-dup: same body, one token appended
            rows.append((2 * i + 1, f"{header} {body} extra{i}"))
    docs = _docs(spark, rows)
    for t, num, den in ((0.5, 1, 2), (0.8, 4, 5), (0.9, 9, 10)):
        assert _prefix_ppm(docs, 1, t) == _naive_ppm(docs, 1, num, den), t
    # bigram shingles take a different prefix geometry — pin one too
    assert _prefix_ppm(docs, 2, 0.8) == _naive_ppm(docs, 2, 4, 5)


def test_identical_docs_score_one_million(spark):
    rows = [(1, "a b c d"), (2, "a b c d"), (3, "x y z q")]
    assert _prefix_ppm(_docs(spark, rows), 1, 0.9) == {(1, 2): 1_000_000}


def test_threshold_boundary_is_integer_exact(spark):
    # jaccard exactly 9/10: inter=9, union=10 — kept at t=0.9 (>=),
    # and the ppm is the exact integer 900000
    a = " ".join(f"t{i}" for i in range(10))  # {t0..t9}
    b = " ".join(f"t{i}" for i in range(9))  # {t0..t8} ⇒ J = 9/10
    got = _prefix_ppm(_docs(spark, [(1, a), (2, b)]), 1, 0.9)
    assert got == {(1, 2): 900_000}
    # one token fewer ⇒ J = 8/10 < 0.9 ⇒ dropped
    c = " ".join(f"t{i}" for i in range(8))
    assert _prefix_ppm(_docs(spark, [(1, a), (2, c)]), 1, 0.9) == {}


def test_short_and_empty_docs_never_pair(spark):
    rows = [(1, "solo"), (2, "solo"), (3, "")]
    # two single-token identical docs DO pair; the empty doc never does
    got = _prefix_ppm(_docs(spark, rows), 1, 0.9)
    assert got == {(1, 2): 1_000_000}


# ---------------------------------------------------------------------------
# Round-10: the PUBLIC float form (jaccard_pairs) now rides the same
# prefix candidate generator. Its contract is pair-set + score identity
# with the historical all-pairs inverted-index form (kept private as
# D._jaccard_pairs_allpairs), whose pass test rounds BEFORE comparing —
# so candidates are generated at threshold − 1e-6. These pins prove the
# rewrite is lossless, including at the rounding boundary where the
# unrelaxed prefix/size filters would prune a pair the float test keeps.


def _float_pairs(fn, docs, n, t):
    return {
        (r.doc_a, r.doc_b): r.jaccard
        for r in fn(docs, n=n, threshold=t).collect()
    }


def test_float_form_equals_allpairs_on_testdata(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    for t in (0.9, 0.95):
        assert _float_pairs(D.jaccard_pairs, docs, 1, t) == _float_pairs(
            D._jaccard_pairs_allpairs, docs, 1, t
        ), t


def test_float_form_equals_allpairs_random_corpus(spark):
    rng = random.Random(10)
    vocab = [f"w{i}" for i in range(150)]
    header = "shared boilerplate header tokens"
    rows = []
    for i in range(50):
        body = " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 25)))
        rows.append((2 * i, f"{header} {body}"))
        if i % 4 == 0:
            rows.append((2 * i + 1, f"{header} {body} extra{i}"))
    docs = _docs(spark, rows)
    for t in (0.5, 0.8, 0.9):
        assert _float_pairs(D.jaccard_pairs, docs, 1, t) == _float_pairs(
            D._jaccard_pairs_allpairs, docs, 1, t
        ), t


def test_float_form_rounding_boundary_needs_relaxed_candidates(spark):
    # TRUE J = 2/3 = 0.666666... < t = 0.666667, but round(J, 6) ==
    # 0.666667 >= t, so the float form KEEPS the pair. At the
    # UNRELAXED threshold the size filter alone would prune it
    # (3·666667 > 2·1000000); the −1e-6 relaxation admits it
    # (3·666666 <= 2·1000000). A dropped pair here means the
    # candidate threshold stopped being relaxed.
    rows = [(1, "w1 w2"), (2, "w1 w2 w3")]
    t = 0.666667
    docs = _docs(spark, rows)
    got = _float_pairs(D.jaccard_pairs, docs, 1, t)
    ref = _float_pairs(D._jaccard_pairs_allpairs, docs, 1, t)
    assert got == ref == {(1, 2): 0.666667}

"""Property tests for the substring-dedup / chunking operators:
invariants that must hold for ARBITRARY corpora, not just the
synthetic one."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from realtime_analytics_pipeline_spark.operators import text_analysis as T
from realtime_analytics_pipeline_spark.operators.curation import (
    ks_drift_by_group,
)

_VOCAB = ["a", "b", "c", "dd", "eee"]
_DOC = st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=12).map(
    " ".join
)
_CORPUS = st.lists(_DOC, min_size=1, max_size=6)

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@settings(**_SETTINGS)
@given(_CORPUS)
def test_dup_ngram_fraction_bounds_and_totality(spark, corpus):
    df = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string"
    )
    out = T.dup_ngram_stats(df, n=2).collect()
    assert len(out) == len(corpus)  # totality: every doc appears
    for r in out:
        assert 0 <= r["n_dup_grams"] <= r["n_grams"]
        assert 0.0 <= r["dup_fraction"] <= 1.0
        toks = corpus[r["doc_id"]].split(" ")
        expected_grams = max(0, len(toks) - 1)
        assert r["n_grams"] == expected_grams


@settings(**_SETTINGS)
@given(_CORPUS)
def test_boilerplate_reassembly_invariants(spark, corpus):
    df = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in T.boilerplate_chunks(df, chunk=2, doc_frac=0.6).collect()
    }
    assert set(out) == set(range(len(corpus)))
    for i, text in enumerate(corpus):
        r = out[i]
        assert 0 <= r["n_kept"] <= r["n_chunks"]
        # kept chunks re-join into a sub-sequence of the original text:
        # removing boilerplate never reorders or invents tokens
        orig = text.split(" ")
        kept = r["text_clean"].split(" ") if r["text_clean"] else []
        it = iter(orig)
        assert all(tok in it for tok in kept)
        # nothing removed => exact reconstruction
        if r["n_kept"] == r["n_chunks"]:
            assert r["text_clean"] == text


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.sampled_from(["g1", "g2"]), st.integers(0, 5)),
        min_size=2,
        max_size=20,
    ).filter(lambda rows: len({g for g, _ in rows}) == 2)
)
def test_ks_bounds_and_zero_on_identical(spark, rows):
    df = spark.createDataFrame(rows, "g string, v long")
    out = ks_drift_by_group(df, "g", "v").collect()
    for r in out:
        assert 0.0 <= r["ks"] <= 1.0
    # mirrored corpus: duplicate every row into both groups -> KS == 0
    mirrored = [("g1", v) for _, v in rows] + [("g2", v) for _, v in rows]
    df2 = spark.createDataFrame(mirrored, "g string, v long")
    for r in ks_drift_by_group(df2, "g", "v").collect():
        assert r["ks"] == 0.0

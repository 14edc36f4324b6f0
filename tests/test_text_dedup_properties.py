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


def test_winnowing_coverage_guarantee_and_determinism(spark):
    """Winnowing's defining property (Schleimer et al. §2): every
    window of w consecutive k-gram hashes contributes at least one
    selected fingerprint — so any match of length >= w+k-1 chars
    shares a fingerprint. Verified against an independent pure-Python
    reimplementation on real corpus docs, plus run-to-run determinism."""
    from realtime_analytics_pipeline_spark.operators.text_analysis import (
        winnowing_fingerprints,
    )
    from realtime_analytics_pipeline_spark.sources.batch import load_table

    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").where("doc_id < 40")
    out = winnowing_fingerprints(docs).collect()
    got = {}
    for r in out:
        got.setdefault(r.doc_id, set()).add((r.pos, r.fp_hash))

    texts = {r.doc_id: r.text for r in docs.collect()}
    K, W, B, M = 5, 4, 257, 1_000_000_007

    def ref_winnow(text):
        n = len(text) - K + 1
        if n <= 0:
            return set()
        H = []
        for i in range(n):
            acc = 0
            for ch in text[i : i + K]:
                acc = (acc * B + ord(ch)) % M
            H.append(acc)
        sel = set()
        for p in range(max(n - W + 1, 1)):
            best = (-1, float("inf"))
            for q in range(p, min(p + W, n)):
                if H[q] <= best[1]:
                    best = (q, H[q])
            sel.add((best[0] + 1, best[1]))  # 1-based pos
        return sel

    for doc_id, text in texts.items():
        assert got.get(doc_id, set()) == ref_winnow(text), doc_id
    # coverage guarantee, asserted directly on the reference arrays
    for doc_id, text in texts.items():
        n = len(text) - K + 1
        sel_pos = {p for p, _ in got.get(doc_id, set())}
        for p in range(1, max(n - W + 1, 1) + 1):
            assert any(p <= q <= p + W - 1 for q in sel_pos), (doc_id, p)
    # determinism across a second run
    out2 = winnowing_fingerprints(docs).collect()
    assert {(r.doc_id, r.pos, r.fp_hash) for r in out2} == {
        (r.doc_id, r.pos, r.fp_hash) for r in out
    }


def test_winnowing_kernel_exact_parity_with_spec(spark):
    """The Arrow kernel twin must produce the IDENTICAL (doc, pos,
    hash) set as the expression-tree spec form — including short docs
    (n < window) and non-ASCII codepoints (utf-32 decode == ascii()
    codepoint semantics)."""
    from realtime_analytics_pipeline_spark.operators.text_analysis import (
        winnowing_fingerprints,
        winnowing_fingerprints_kernel,
    )
    from realtime_analytics_pipeline_spark.sources.batch import load_table

    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").where("doc_id < 120")
    extra = spark.createDataFrame(
        [
            (100001, "abcd"),          # shorter than k -> no fingerprints
            (100002, "abcde"),         # exactly one gram
            (100003, "abcdefg"),       # fewer grams than the window
            (100004, "café au lait résumé naïve"),
        ],
        "doc_id long, text string",
    )
    both = docs.select("doc_id", "text").unionByName(extra)
    a = {tuple(r) for r in winnowing_fingerprints(both).collect()}
    b = {tuple(r) for r in winnowing_fingerprints_kernel(both).collect()}
    assert a == b and a

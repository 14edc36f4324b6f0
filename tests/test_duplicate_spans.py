"""Pins for the ExactSubstr positional span extractor / remover
(round-8): cross-document duplicated 8-token windows, merged into
maximal spans, and the rewrite that cuts them.
"""

from __future__ import annotations

import hashlib

from realtime_analytics_pipeline_spark.operators import dedup as D

W = 8


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _toks(prefix, n, start=0):
    return " ".join(f"{prefix}{i}" for i in range(start, start + n))


def _spans(df, w=W):
    return {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in D.duplicate_spans(df, window_tokens=w).collect()
    }


def _removal(df, w=W):
    return {
        r.doc_id: (r.n_tokens, r.dup_tokens, r.n_spans, r.dup_ppm, r.clean_md5)
        for r in D.span_removal(df, window_tokens=w).collect()
    }


def _md5(s):
    return hashlib.md5(s.encode()).hexdigest()


def test_shared_window_positions(spark):
    shared = _toks("S", 8)
    d1 = f"{_toks('x', 5)} {shared} {_toks('y', 3)}"  # shared at pos 6..13
    d2 = f"{shared} {_toks('z', 6)}"  # shared at pos 1..8
    got = _spans(_docs(spark, [(1, d1), (2, d2)]))
    assert got == {(1, 6, 13, 8), (2, 1, 8, 8)}


def test_overlapping_windows_merge_into_one_span(spark):
    # a shared 12-token run yields 5 overlapping windows -> ONE span
    shared = _toks("S", 12)
    d1 = f"{_toks('x', 4)} {shared}"  # run at pos 5..16
    d2 = f"{shared} {_toks('z', 4)}"  # run at pos 1..12
    got = _spans(_docs(spark, [(1, d1), (2, d2)]))
    assert got == {(1, 5, 16, 12), (2, 1, 12, 12)}


def test_two_separate_runs_stay_two_spans(spark):
    a, b = _toks("A", 8), _toks("B", 8)
    gap = _toks("g", 9)  # > W gap so spans cannot merge
    d1 = f"{a} {gap} {b}"  # A at 1..8, B at 18..25
    d2 = f"{a} {_toks('q', 9)} {b}"
    got = _spans(_docs(spark, [(1, d1), (2, d2)]))
    assert {(s[0], s[1], s[2]) for s in got if s[0] == 1} == {
        (1, 1, 8),
        (1, 18, 25),
    }


def test_within_doc_repeat_is_not_cross_doc_dup(spark):
    rep = _toks("R", 8)
    rows = [(1, f"{rep} {rep}"), (2, _toks("z", 16))]
    assert _spans(_docs(spark, rows)) == set()


def test_identical_docs_fully_covered_and_removed(spark):
    t = _toks("w", 10)
    got = _removal(_docs(spark, [(1, t), (2, t)]))
    assert got[1] == (10, 10, 1, 1_000_000, _md5(""))
    assert got == {1: got[1], 2: got[1]}


def test_disjoint_docs_keep_everything(spark):
    t1, t2 = _toks("a", 9), _toks("b", 9)
    got = _removal(_docs(spark, [(1, t1), (2, t2)]))
    assert got[1] == (9, 0, 0, 0, _md5(t1))
    assert got[2] == (9, 0, 0, 0, _md5(t2))


def test_partial_removal_rewrites_suffix(spark):
    shared = _toks("S", 8)
    tail = _toks("y", 3)
    d1 = f"{shared} {tail}"
    d2 = f"{shared} {_toks('z', 5)}"
    got = _removal(_docs(spark, [(1, d1), (2, d2)]))
    # doc 1: 11 tokens, span covers 1..8, keeps the 3-token tail
    assert got[1] == (11, 8, 1, 727_272, _md5(tail))


def test_short_docs_produce_no_windows(spark):
    rows = [(1, _toks("a", 7)), (2, _toks("a", 7))]  # < W tokens
    assert _spans(_docs(spark, rows)) == set()
    got = _removal(_docs(spark, rows))
    assert got[1][1] == 0 and got[1][3] == 0

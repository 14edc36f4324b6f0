"""Greedy coverage selection: equality with a reference greedy."""

from __future__ import annotations

from realtime_analytics_pipeline_spark.operators.sampling import (
    greedy_coverage_selection,
)
from realtime_analytics_pipeline_spark.sources.batch import load_table
from tests.conftest import SF_SMOKE


def _ref_greedy(doc_tokens: dict, k: int):
    covered: set = set()
    out = []
    for rank in range(k):
        best = None
        for did in sorted(doc_tokens):
            gain = len(doc_tokens[did] - covered)
            if best is None or gain > best[1]:
                best = (did, gain)
        if best is None or best[1] == 0:
            break
        out.append((rank, best[0], best[1]))
        covered |= doc_tokens[best[0]]
    return out, len(covered)


def test_coverage_selection_matches_reference(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    got = greedy_coverage_selection(docs, k=10).collect()
    doc_tokens = {
        r.doc_id: set(r.text.split())
        for r in docs.select("doc_id", "text").collect()
    }
    want, total = _ref_greedy(doc_tokens, 10)
    assert [(r.rank, r.doc_id, r.marginal_gain) for r in got] == want
    assert all(r.total_covered == total for r in got)
    # submodularity: marginal gains are non-increasing
    gains = [r.marginal_gain for r in got]
    assert gains == sorted(gains, reverse=True)

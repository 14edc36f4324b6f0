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


# ---------------------------------------------------------------------------
# Round-10: A-ES weighted reservoir (fixed-k without replacement).


def test_reservoir_weighted_exact_k_and_plan(spark):
    from tests.test_plans import plan_of
    from realtime_analytics_pipeline_spark.registry import QUERIES

    df = QUERIES["sample_docs_reservoir_weighted"](
        spark, "/root/testdata/sf0.01"
    )
    rows = df.collect()
    assert len(rows) == 100
    assert len({r.doc_id for r in rows}) == 100  # without replacement
    # selection must be per-partition top-k heaps, never a global sort
    assert "TakeOrderedAndProject" in plan_of(df)


def test_reservoir_weight_scale_invariance(spark):
    """A-ES invariance: multiplying every weight by a constant leaves
    the ln(u)/w ORDER — and therefore the selected sample — unchanged.
    A selection rule that breaks this is not sampling ∝ weight."""
    from pyspark.sql import functions as F

    from realtime_analytics_pipeline_spark.operators.sampling import (
        hash_bucket,
    )
    from realtime_analytics_pipeline_spark.operators import (
        text_analysis as T,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    scored = docs.join(T.quality_scores(docs), "doc_id").select(
        "doc_id", "quality_score"
    )
    u = (hash_bucket(F.col("doc_id").cast("string"), "res") + F.lit(1)) / F.lit(
        65537.0
    )

    def pick(scale):
        w = F.greatest(F.col("quality_score"), F.lit(0.01)) * F.lit(scale)
        key = F.log(u) / w
        return [
            r.doc_id
            for r in scored.orderBy(key.desc(), "doc_id").limit(50).collect()
        ]

    assert pick(1.0) == pick(7.0) == pick(0.25)

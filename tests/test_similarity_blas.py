"""BLAS similarity kernels must agree with the exact expression-tree
operators (round-6 parity)."""

from __future__ import annotations

from realtime_analytics_pipeline_spark.operators.dedup import embedding_dup_pairs
from realtime_analytics_pipeline_spark.operators.similarity import cosine_topk
from realtime_analytics_pipeline_spark.operators.similarity_blas import (
    cosine_topk_blas,
    embedding_dup_pairs_blas,
)
from realtime_analytics_pipeline_spark.sources.batch import load_table

from tests.conftest import SF_SMOKE


def test_topk_blas_matches_exact(spark):
    embs = load_table(spark, SF_SMOKE, "embeddings")
    exact = {tuple(r) for r in cosine_topk(embs).collect()}
    blas = {tuple(r) for r in cosine_topk_blas(embs).collect()}
    assert exact == blas


def test_pairs_blas_matches_exact(spark):
    embs = load_table(spark, SF_SMOKE, "embeddings")
    exact = {tuple(r) for r in embedding_dup_pairs(embs).collect()}
    blas = {tuple(r) for r in embedding_dup_pairs_blas(embs).collect()}
    assert exact == blas


def test_activity_blas_equals_join_form(spark):
    """The block-pair gemm activity top-10 (round-8) must equal the
    day-bucketed join form EXACTLY — same pairs, same floats — because
    integer counts make dot/s2 exact in float64 and raw repeats the
    same IEEE op sequence. Round-10: the public library path routes
    through the gemm, so the reference here is the RETIRED private
    join form — this pin is what licenses that rewrite."""
    from realtime_analytics_pipeline_spark.registry import QUERIES
    from realtime_analytics_pipeline_spark.registry_analytics import (
        _users_activity_similarity_join,
    )

    sf = "/root/testdata/sf0.001"
    blas = [
        (r.u1, r.u2, r.cos_sim, r.shared_days)
        for r in QUERIES["users_activity_similarity_blas"](spark, sf).collect()
    ]
    join = [
        (r.u1, r.u2, r.cos_sim, r.shared_days)
        for r in _users_activity_similarity_join(
            spark, sf, user_cap=None
        ).collect()
    ]
    assert blas == join and len(blas) == 10


def test_gated_capped_activity_equals_join_form(spark):
    """The gated md5-capped query (round-10: gemm-routed) must equal
    the retired capped join form exactly — cap applied before either
    engine, so the parity covers the cap path too."""
    from realtime_analytics_pipeline_spark.registry_analytics import (
        _users_activity_similarity,
        _users_activity_similarity_join,
    )

    sf = "/root/testdata/sf0.001"
    gemm = [
        tuple(r)
        for r in _users_activity_similarity(spark, sf, user_cap=500).collect()
    ]
    join = [
        tuple(r)
        for r in _users_activity_similarity_join(
            spark, sf, user_cap=500
        ).collect()
    ]
    assert gemm == join and len(gemm) == 10

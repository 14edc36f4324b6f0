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

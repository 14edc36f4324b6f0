"""Text analysis operators (language-ID heuristic, quality scoring,
token statistics, fingerprinting) — all Column-expression only."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from realtime_analytics_pipeline_spark.functions.text import (
    STOPWORDS,
    distinct_token_count,
    fingerprint,
    stopword_count,
    token_count,
    tokens,
)


def text_stats(documents: DataFrame) -> DataFrame:
    """Per-doc token statistics.

    avg_token_len uses the single-space-joined identity
    (chars - (n-1)) / n — pure arithmetic, no per-token loop.
    """
    n = token_count("text")
    return documents.select(
        "doc_id",
        n.alias("n_tokens"),
        distinct_token_count("text").alias("n_distinct"),
        F.round(
            (F.length("text") - (n - F.lit(1))) / n.cast("double"), 6
        ).alias("avg_token_len"),
        F.round(
            stopword_count(tokens("text")) / n.cast("double"), 6
        ).alias("stopword_ratio"),
    )


def quality_scores(documents: DataFrame) -> DataFrame:
    """Composite quality score in [0,1]:
    0.4·min(1, n/100) + 0.3·(1 - stopword_ratio) + 0.3·type_token_ratio.
    The standard cheap-heuristic family (length/stopword/diversity)
    used to pre-filter LLM training corpora."""
    n = token_count("text").cast("double")
    sw = stopword_count(tokens("text")).cast("double")
    nd = distinct_token_count("text").cast("double")
    score = (
        F.lit(0.4) * F.least(F.lit(1.0), n / F.lit(100.0))
        + F.lit(0.3) * (F.lit(1.0) - sw / n)
        + F.lit(0.3) * (nd / n)
    )
    return documents.select(
        "doc_id", F.round(score, 6).alias("quality_score")
    )


def language_id(documents: DataFrame, en_threshold: float = 0.02) -> DataFrame:
    """Stopword-ratio language heuristic: predict 'en' when English
    stopword density ≥ threshold, else 'und'. (The real corpus carries
    a `lang` column; this demonstrates the n-gram-heuristic operator
    shape with a deterministic, oracle-expressible rule.)"""
    n = token_count("text").cast("double")
    ratio = stopword_count(tokens("text")).cast("double") / n
    return documents.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        F.when(ratio >= en_threshold, "en").otherwise("und").alias("pred_lang"),
        F.round(ratio, 6).alias("en_stopword_ratio"),
    )


def fingerprints(documents: DataFrame) -> DataFrame:
    """Content fingerprints: md5 of raw text + md5 of the normalized
    (sorted distinct tokens) form — the bag-of-words fingerprint that
    catches reorder-only duplicates."""
    normalized = F.concat_ws(
        " ", F.array_sort(F.array_distinct(tokens("text")))
    )
    return documents.select(
        "doc_id",
        fingerprint("text").alias("fp"),
        F.md5(normalized).alias("fp_normalized"),
    )


def source_token_rollup(documents: DataFrame) -> DataFrame:
    """Corpus accounting per source: docs, tokens, distinct langs,
    mean quality proxy (token count)."""
    return (
        documents.select(
            "source", "lang", token_count("text").alias("n_tokens")
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.count_distinct("lang").alias("n_langs"),
            F.round(F.avg("n_tokens"), 6).alias("avg_tokens"),
        )
    )


_ = STOPWORDS  # re-export for oracle construction

"""Lexical retrieval scoring over the documents table: TF-IDF term
importance and BM25 ranking.

A training-data pipeline uses these as *filters* and *selectors* —
"which terms characterize each source" (domain auditing), "rank the
corpus against a probe query" (retrieval-based quality selection, the
public DSIR / retrieval-filtered-pretraining recipe). Both are pure
DataFrame aggregations: tokenize → explode → two hash aggregates, no
UDFs, no driver loops, linear in corpus tokens.

Cross-engine determinism (the DuckDB oracles hash-compare values):
term counts and document frequencies are exact bigints; idf is one
libm ``ln`` over a ratio of exact integers (bit-identical in Spark and
DuckDB); every score that SUMS floats across rows is restructured so
the summation happens over integers (tf) BEFORE the single float
multiply — float addition order never varies across engines.

Scale notes (100 TB): the explode is map-side; both aggregates are
partial-agg-friendly (term cardinality ≪ token count). BM25 needs one
scalar (N, avgdl) broadcast — computed as a 1-row aggregate and
cross-joined (broadcast), never collected to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# BM25 free parameters (the Robertson/Sparck-Jones defaults used by
# Lucene and every public IR stack).
BM25_K1 = 1.2
BM25_B = 0.75


def _tokens(df: DataFrame) -> DataFrame:
    return df.select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("term")
    )


def tfidf_top_terms(df: DataFrame, top_k: int = 5) -> DataFrame:
    """Per-source top-``top_k`` terms by summed TF-IDF.

    idf = ln((N+1)/(df+1)) + 1 (smoothed); the per-source score is
    ``sum(tf) * idf`` — the tf mass is summed as a BIGINT first, so the
    only float ops are one division, one ln, one multiply (all
    bit-deterministic across engines).
    """
    toks = _tokens(df)
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    # corpus document frequency per term
    doc_freq = (
        toks.groupBy("term")
        .agg(F.count_distinct("doc_id").alias("df"))
    )
    # per (source, term) term-frequency mass
    tf = toks.groupBy("source", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf_sum")
    )
    idf = (
        F.log((F.col("n_docs") + F.lit(1)) / (F.col("df") + F.lit(1)))
        + F.lit(1)
    )
    # NB: doc_freq is vocabulary-sized — at 100 TB that's NOT broadcast
    # material; both sides are term-keyed, so the join shuffles once on
    # term (and tf is already partially aggregated map-side).
    scored = (
        tf.join(doc_freq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "source",
            "term",
            "tf_sum",
            "df",
            F.round(F.col("tf_sum") * idf, 6).alias("tfidf"),
        )
    )
    w = Window.partitionBy("source").orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= top_k)
        .select("source", "term", "tf_sum", "df", "tfidf", "rnk")
    )


def _bm25_term_score(
    term: str, n_docs: Column, avgdl: Column, dl: Column, toks: Column
) -> Column:
    """BM25 contribution of one query term. tf and dl are exact ints;
    avgdl is one division of two exact bigint aggregates — the whole
    expression tree is identical (op-for-op) to the oracle SQL."""
    tf = F.size(F.filter(toks, lambda t: t == F.lit(term))).cast("double")
    df_t = F.col(f"df_{term}").cast("double")
    idf = F.log(
        F.lit(1.0) + (n_docs - df_t + F.lit(0.5)) / (df_t + F.lit(0.5))
    )
    denom = tf + F.lit(BM25_K1) * (
        F.lit(1.0) - F.lit(BM25_B) + F.lit(BM25_B) * dl / avgdl
    )
    return idf * (tf * F.lit(BM25_K1 + 1.0)) / denom


def bm25_topk(
    df: DataFrame, query_terms: list[str], top_k: int = 10
) -> DataFrame:
    """Rank all documents against a fixed bag-of-words query with BM25
    (k1=1.2, b=0.75); return the top-``top_k`` (score desc, doc_id).

    One pass: per-doc tf via array filter (no explode needed for a
    fixed small query), corpus stats (N, avgdl, per-term df) as a
    broadcast 1-row aggregate. Zero-score docs are kept out of the
    ranking only if they fall below top_k naturally.
    """
    base = df.select(
        "doc_id", F.split("text", " ").alias("toks")
    ).withColumn("dl", F.size("toks").cast("long"))
    stats_cols = [
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (
            F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("avgdl"),
    ] + [
        F.sum(
            F.when(F.array_contains("toks", t), F.lit(1)).otherwise(F.lit(0))
        )
        .cast("long")
        .alias(f"df_{t}")
        for t in query_terms
    ]
    stats = base.agg(*stats_cols)
    scored = base.crossJoin(F.broadcast(stats))
    score = None
    for t in query_terms:
        s = _bm25_term_score(
            t, F.col("n_docs"), F.col("avgdl"), F.col("dl").cast("double"),
            F.col("toks"),
        )
        score = s if score is None else score + s
    ranked = scored.select(
        "doc_id", "dl", F.round(score, 6).alias("bm25")
    )
    # TakeOrderedAndProject first (scale-safe global top-k: per-partition
    # heaps, no single-partition window sort of the full corpus), THEN
    # number the top_k survivors — the window runs over ≤ top_k rows.
    top = ranked.orderBy(F.col("bm25").desc(), F.col("doc_id")).limit(top_k)
    w = Window.orderBy(F.col("bm25").desc(), F.col("doc_id"))
    return top.withColumn("rnk", F.row_number().over(w))

"""Deterministic sampling invariants: reproducibility, corpus-growth
stability, rate accuracy, stratification, split totality, salt
decorrelation."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_analytics_pipeline_spark.operators.sampling import (
    deterministic_sample,
    stratified_sample,
    train_eval_split,
)
from realtime_analytics_pipeline_spark.sources.batch import load_table

from tests.conftest import SF_SMOKE

SF_BENCH = "/root/testdata/sf0.1"


def _ids(df):
    return {r.doc_id for r in df.select("doc_id").collect()}


def test_sample_deterministic_and_growth_stable(spark):
    """A document's fate depends only on its own id: re-running gives
    the same set, and growing the corpus around it (sf0.001 → sf0.1)
    never flips an existing document in or out."""
    small = load_table(spark, SF_SMOKE, "documents")
    big = load_table(spark, SF_BENCH, "documents")
    s1 = _ids(deterministic_sample(small, "doc_id", 0.1))
    s2 = _ids(deterministic_sample(small, "doc_id", 0.1))
    assert s1 == s2
    n_small = small.count()
    s_big = _ids(
        deterministic_sample(big, "doc_id", 0.1).where(
            F.col("doc_id") < n_small
        )
    )
    assert s_big == s1


def test_sample_rate_accuracy(spark):
    docs = load_table(spark, SF_BENCH, "documents")
    n = docs.count()
    for rate in (0.1, 0.5):
        got = deterministic_sample(docs, "doc_id", rate).count() / n
        assert abs(got - rate) < 0.03, (rate, got)


def test_stratified_rates_per_stratum(spark):
    docs = load_table(spark, SF_BENCH, "documents")
    rates = {"src0": 0.5, "src1": 0.05}
    sampled = stratified_sample(
        docs, "doc_id", "source", rates, default_rate=0.2
    )
    totals = {r.source: r.n for r in
              docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    kept = {r.source: r.n for r in
            sampled.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for src, want in (("src0", 0.5), ("src1", 0.05), ("src5", 0.2)):
        got = kept.get(src, 0) / totals[src]
        assert abs(got - want) < 0.12, (src, want, got, totals[src])


def test_split_total_disjoint_and_sized(spark):
    docs = load_table(spark, SF_BENCH, "documents")
    n = docs.count()
    split = train_eval_split(docs, "doc_id", eval_frac=0.1)
    assert split.count() == n  # total: every row labeled
    counts = {r.split: r.n for r in
              split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "eval"}
    assert abs(counts["eval"] / n - 0.1) < 0.03


def test_null_keys_are_dropped_consistently(spark):
    """A NULL id yields a NULL bucket (concat with NULL) and fails the
    threshold comparison — dropped, never kept. Same in DuckDB ('||'
    with NULL is NULL), so both engines agree by construction; this
    pins the Spark side."""
    rows = [(1, "a"), (None, "b"), (2, "c")]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = deterministic_sample(df, "doc_id", 1.0)  # rate 1.0: keep all non-null
    assert {r.source for r in kept.collect()} == {"a", "c"}


def test_pack_handles_empty_and_single_partitions(spark):
    """Packing degenerates correctly: a partition with one doc gets
    bin 0 offset 0; bins advance only when the budget is crossed."""
    from realtime_analytics_pipeline_spark.operators.sampling import (
        pack_token_budget,
    )

    rows = [
        (1, "s1", 300),
        (2, "s1", 300),  # starts at 300 -> bin 0
        (3, "s1", 300),  # starts at 600 -> bin 1
        (10, "s2", 50),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    got = {
        r.doc_id: (r.start_offset, r.bin_id)
        for r in pack_token_budget(
            df, "n_tokens", 512, "source", "doc_id"
        ).collect()
    }
    assert got == {1: (0, 0), 2: (300, 0), 3: (600, 1), 10: (0, 0)}


def test_salts_decorrelate(spark):
    """Two samples under different salts behave like independent
    draws: overlap ≈ rate² of the corpus, far below the rate itself
    (re-draws don't keep favoring the same documents)."""
    docs = load_table(spark, SF_BENCH, "documents")
    n = docs.count()
    a = _ids(deterministic_sample(docs, "doc_id", 0.2, salt="a"))
    b = _ids(deterministic_sample(docs, "doc_id", 0.2, salt="b"))
    overlap = len(a & b) / n
    assert 0.01 < overlap < 0.1, overlap  # ≈ 0.04 expected

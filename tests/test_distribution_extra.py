"""Defining invariants of quantile normalization and ppl bucketing."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_analytics_pipeline_spark import registry
from tests.conftest import SF_SMOKE


def test_quantile_normalization_equalizes_equal_size_sources(spark):
    """THE defining property: sources of equal size receive identical
    normalized value multisets (each maps ranks 1..n onto the same
    pooled positions)."""
    rows = []
    # two sources, same size, wildly different scales
    for i in range(40):
        rows.append((i, "a", 10 + i))            # short docs
        rows.append((100 + i, "b", 1000 + 7 * i))  # long docs
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    df.createOrReplaceTempView("qn_fixture")

    from pyspark.sql import Window

    ranked = df.select(
        "doc_id", "source", "n_chars",
        F.row_number().over(
            Window.partitionBy("source").orderBy("n_chars", "doc_id")
        ).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).alias("ns"),
    )
    pooled = df.select(
        F.col("n_chars").alias("pooled_chars"),
        F.row_number().over(Window.orderBy("n_chars", "doc_id")).alias("pr"),
    )
    n = df.count()
    mapped = ranked.select(
        "source",
        (F.expr(f"((2 * r - 1) * {n}) div (2 * ns)") + 1).alias("idx"),
    ).join(pooled, F.col("idx") == F.col("pr"))
    a = sorted(
        r.pooled_chars for r in mapped.where(F.col("source") == "a").collect()
    )
    b = sorted(
        r.pooled_chars for r in mapped.where(F.col("source") == "b").collect()
    )
    assert a == b  # identical normalized multisets


def test_quantile_normalization_gated_query_preserves_counts(spark):
    out = registry.QUERIES["docs_quantile_normalize"](spark, SF_SMOKE)
    rows = out.collect()
    assert len(rows) == 500  # one row per doc, none dropped
    # normalized values are drawn from the pooled value set
    pooled = {
        r.n_chars
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("n_chars")
        .collect()
    }
    assert all(r.norm_chars in pooled for r in rows)


def test_ccnet_buckets_order_and_partition(spark):
    out = registry.QUERIES["docs_ccnet_ppl_buckets"](spark, SF_SMOKE).collect()
    total = sum(r.n_docs for r in out)
    assert total == 500
    # global bucket means must be ordered: head < middle < tail
    agg = {}
    for r in out:
        n, s = agg.get(r.bucket, (0, 0.0))
        agg[r.bucket] = (n + r.n_docs, s + r.mean_nll * r.n_docs)
    means = {b: s / n for b, (n, s) in agg.items()}
    assert means["head"] < means["middle"] < means["tail"]

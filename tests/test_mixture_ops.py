"""Pins for the round-11 training-mixture operators: temperature
mixing, group-aware split, largest-remainder apportionment, and the
quality-staged curriculum order — property tests (the oracle hash is
the value gate; these pin the SEMANTICS the names promise).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_analytics_pipeline_spark.registry import QUERIES
from tests.conftest import SF_CORRECTNESS


def test_temperature_mix_flattens_toward_uniform(spark):
    rows = QUERIES["sample_docs_temperature_mix"](
        spark, SF_CORRECTNESS
    ).collect()
    assert len(rows) >= 2
    assert abs(sum(r.temp_share for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.nat_share for r in rows) - 1.0) < 1e-4
    # temperature 2 compresses the share range toward uniform
    assert max(r.temp_share for r in rows) <= max(
        r.nat_share for r in rows
    ) + 1e-9
    assert min(r.temp_share for r in rows) >= min(
        r.nat_share for r in rows
    ) - 1e-9
    # tail sources get upsampled, head sources downsampled
    tail = min(rows, key=lambda r: r.nat_share)
    head = max(rows, key=lambda r: r.nat_share)
    if tail.nat_share < head.nat_share:  # non-degenerate mix
        assert tail.sampling_rate_x >= 1.0
        assert head.sampling_rate_x <= 1.0


def test_group_split_is_leakage_free(spark):
    df = QUERIES["split_docs_group_aware"](spark, SF_CORRECTNESS)
    n_docs = df.count()
    per_source = df.groupBy("source").agg(
        F.countDistinct("split").alias("k")
    )
    # the leakage-freedom property: one split per group, no exceptions
    assert per_source.where(F.col("k") > 1).count() == 0
    assert df.where(F.col("split").isNull()).count() == 0
    assert (
        df.groupBy("split").count().agg(F.sum("count")).collect()[0][0]
        == n_docs
    )


def test_apportionment_is_exact_and_fair(spark):
    rows = QUERIES["docs_token_budget_apportionment"](
        spark, SF_CORRECTNESS
    ).collect()
    total_toks = sum(r.toks for r in rows)
    # Hamilton's method: the budget reconciles EXACTLY
    assert sum(r.alloc_tokens for r in rows) == 100000
    # quota property: every allocation within one seat of its quota
    for r in rows:
        quota = 100000 * r.toks / total_toks
        assert quota - 1 <= r.alloc_tokens <= quota + 1, (r, quota)


def test_dedup_aware_split_never_straddles(spark):
    """The property the op exists for: no near-dup pair (Jaccard >=
    0.95) has its members on different sides of the split."""
    from realtime_analytics_pipeline_spark.operators import dedup as D
    from realtime_analytics_pipeline_spark.sources.batch import load_table

    split = QUERIES["split_docs_dedup_aware"](spark, SF_CORRECTNESS)
    docs = load_table(spark, SF_CORRECTNESS, "documents").where(
        "doc_id < 300"
    )
    pairs = D.jaccard_pairs(docs, n=1, threshold=0.95)
    a = split.select(
        F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a")
    )
    b = split.select(
        F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b")
    )
    straddlers = (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .where(F.col("split_a") != F.col("split_b"))
        .count()
    )
    assert straddlers == 0
    # and the split is non-degenerate on this corpus
    sides = {r.split for r in split.select("split").distinct().collect()}
    assert sides == {"train", "eval"}


def test_curriculum_order_is_total_and_quality_staged(spark):
    df = QUERIES["docs_curriculum_order"](spark, SF_CORRECTNESS)
    n = df.count()
    assert (
        df.select("stage", "shard", "stage_pos").distinct().count() == n
    )
    means = {
        r.stage: r.mq
        for r in df.groupBy("stage")
        .agg(F.avg("quality_score").alias("mq"))
        .collect()
    }
    assert set(means) == {1, 2, 3, 4}
    assert means[1] > means[2] > means[3] > means[4]
    # same salt => byte-identical replay (checkpoint resumability)
    again = QUERIES["docs_curriculum_order"](spark, SF_CORRECTNESS)
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, again.collect()))
    assert a == b


def test_keep_best_survivor_is_best_of_component(spark):
    """The survivor policy: each component's survivor carries its
    component's MAX quality score, every doc belongs to exactly one
    component, and multi-member components exist on this corpus."""
    from realtime_analytics_pipeline_spark.operators import dedup as D
    from realtime_analytics_pipeline_spark.operators import (
        text_analysis as T,
    )
    from realtime_analytics_pipeline_spark.operators.clustering import (
        dedup_cluster_representatives,
    )
    from realtime_analytics_pipeline_spark.sources.batch import load_table

    surv = {
        r.component: (r.survivor_doc_id, r.survivor_quality, r.n_members)
        for r in QUERIES["dedup_keep_best_survivors"](
            spark, SF_CORRECTNESS
        ).collect()
    }
    docs = load_table(spark, SF_CORRECTNESS, "documents").where(
        "doc_id < 300"
    )
    comp = dedup_cluster_representatives(
        D.jaccard_pairs(docs, n=1, threshold=0.95)
    ).select(F.col("vertex").alias("doc_id"), "component")
    q = {r.doc_id: r.quality_score
         for r in T.quality_scores(docs).collect()}
    members: dict = {}
    labeled = {r.doc_id: r.component for r in comp.collect()}
    for r in docs.select("doc_id").collect():
        c = labeled.get(r.doc_id, r.doc_id)
        members.setdefault(c, []).append(r.doc_id)
    assert sum(n for _, _, n in surv.values()) == docs.count()
    assert any(n > 1 for _, _, n in surv.values())  # real clusters
    for c, (sid, sq, n) in surv.items():
        assert len(members[c]) == n
        assert sq == max(q[m] for m in members[c])
        best = max(members[c], key=lambda m: (q[m], -m))
        assert sid == best

"""Tests for the round-3 continuation batch: BPE-ish token counting,
cluster-scoped semantic dedup, and the left-outer streaming interval
join's multi-batch null-padding semantics."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from realtime_analytics_pipeline_spark.operators.clustering import (
    clustered_dup_pairs,
)
from realtime_analytics_pipeline_spark.operators.dedup import (
    embedding_dup_pairs,
)
from realtime_analytics_pipeline_spark.sources.batch import load_table
from realtime_analytics_pipeline_spark.streaming.jobs import (
    read_events_stream_from_dir,
    run_to_memory_table,
)
from realtime_analytics_pipeline_spark.streaming.joins import (
    stream_attribution_join_outer,
)

from tests.conftest import SF_SMOKE


# --------------------------------------------------------------------------
# token counts
# --------------------------------------------------------------------------


def test_bpe_piece_counts(spark):
    from realtime_analytics_pipeline_spark.registry_curation import _BPE_PAT

    df = spark.createDataFrame(
        [(1, "ab 12 c!d"), (2, "hello world"), (3, "x")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            F.size(F.split(F.col("text"), " ")).alias("ws"),
            F.size(
                F.regexp_extract_all(F.col("text"), F.lit(_BPE_PAT), F.lit(0))
            ).alias("bpe"),
            F.ceil(F.length("text") / 4.0).cast("long").alias("est"),
        ).collect()
    }
    assert (out[1]["ws"], out[1]["bpe"], out[1]["est"]) == (3, 5, 3)
    assert (out[2]["ws"], out[2]["bpe"], out[2]["est"]) == (2, 2, 3)
    assert (out[3]["ws"], out[3]["bpe"], out[3]["est"]) == (1, 1, 1)


# --------------------------------------------------------------------------
# cluster-scoped semantic dedup
# --------------------------------------------------------------------------


def test_clustered_pairs_subset_and_recall(spark):
    """Cluster-scoped candidates are a SUBSET of the exact all-pairs
    set (same cosine values on shared pairs), with recall bounded
    below — both deterministic because the quantizer is."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    exact = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in embedding_dup_pairs(emb, threshold=0.3).collect()
    }
    clustered = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in clustered_dup_pairs(emb, threshold=0.3).collect()
    }
    assert set(clustered) <= set(exact)
    for pair, cos in clustered.items():
        assert cos == exact[pair]
    recall = len(clustered) / len(exact)
    # deterministic at this SF (measured 286/an exact set in the
    # hundreds); the floor flags a quantizer regression, not noise
    assert recall >= 0.25, recall


def test_clustered_pairs_partition_by_cluster(spark):
    """Both join sides hash-partition on the cluster id — the pair
    join must NOT be a cartesian/broadcast-nested-loop over the whole
    corpus (that would be the O(N²) shape the operator exists to
    avoid)."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    plan = (
        clustered_dup_pairs(emb)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --------------------------------------------------------------------------
# left-outer streaming interval join
# --------------------------------------------------------------------------


def test_outer_join_null_pads_after_watermark(spark, tmp_path):
    """Unmatched purchases emit null-padded once the watermark passes
    their event time; the stream-tail purchase stays held."""
    import time as _time

    src = str(tmp_path / "outer_src")
    base_ns = 1_704_067_200_000_000_000
    sec = 1_000_000_000

    def write_file(rows):
        spark.createDataFrame(
            [
                Row(
                    event_id=i,
                    ts=base_ns + off * sec,
                    user_id=u,
                    event_type=t,
                    value=1.0,
                    props="{}",
                )
                for (i, off, u, t) in rows
            ]
        ).coalesce(1).write.mode("append").parquet(src)

    # file 1: matched pair (user 1) + orphan purchase (user 2)
    write_file(
        [
            (1, 0, 1, "view"),
            (2, 600, 1, "purchase"),
            (3, 300, 2, "purchase"),
        ]
    )
    _time.sleep(1.1)
    # file 2: late traffic pushes the watermark far past both
    # purchases; its own tail purchase (user 4) must stay held
    write_file([(4, 1200, 3, "view"), (5, 2000, 4, "purchase")])

    stream = read_events_stream_from_dir(spark, src)
    out = stream_attribution_join_outer(stream)
    run_to_memory_table(out, "t_outer_join", output_mode="append")
    got = {
        r["purchase_id"]: r["view_id"]
        for r in spark.table("t_outer_join").collect()
    }
    assert got.get("2") == "1"  # matched in-batch
    assert "3" in got and got["3"] is None  # null-padded on expiry
    assert "5" not in got  # tail held by the watermark

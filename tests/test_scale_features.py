"""Executable proof of the shuffle-minimization techniques SCALE.md
claims for the 100 TB deployment: runtime bloom-filter join pruning,
bucketed co-located joins (no exchange), and AQE skew-join splitting.

These are plan/behavior gates, not oracle queries — the capability IS
the physical plan shape Spark produces, pinned here so a regression in
session tuning or query structure shows up as a red test."""

from __future__ import annotations

import contextlib

from pyspark.sql import functions as F

from tests.conftest import SF_CORRECTNESS


@contextlib.contextmanager
def confs(spark, **kv):
    old = {}
    for k, v in kv.items():
        key = k.replace("__", ".")
        try:
            old[key] = spark.conf.get(key)
        except Exception:
            old[key] = None
        spark.conf.set(key, str(v))
    try:
        yield
    finally:
        for key, v in old.items():
            if v is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, v)


def final_plan(df) -> str:
    df.collect()  # drive AQE to the final adaptive plan
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_runtime_bloom_filter_prunes_fact_side(spark):
    """A selective dim predicate injects a runtime bloom filter into
    the fact scan side (Catalyst InjectRuntimeFilter): at 100 TB this
    drops non-matching fact rows BEFORE the join shuffle instead of
    shuffling them to die in the join. Thresholds are lowered to make
    the tiny test tables eligible; the rewrite itself is what is
    pinned."""
    li = spark.read.parquet(f"{SF_CORRECTNESS}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_CORRECTNESS}/orders.parquet")
    with confs(
        spark,
        **{
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100GB",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
            "spark.sql.optimizer.runtimeFilter.number.threshold": "10",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        },
    ):
        dim = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
            F.col("o_orderkey")
        )
        fact = li.select(F.col("l_orderkey").alias("o_orderkey"), "l_quantity")
        joined = fact.join(dim, "o_orderkey", "left_semi").groupBy().count()
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan or "might_contain" in plan, plan[:2000]
        # and it still returns the right answer
        n = joined.collect()[0][0]
        assert n > 0


def test_bucketed_join_needs_no_exchange(spark, tmp_path):
    """Two tables bucketed+sorted on the join key join with ZERO
    Exchange operators — the bucketing layout IS the shuffle, paid
    once at write time and amortized across every later join/agg on
    that key. This is the co-located-join discipline SCALE.md
    prescribes for repeated fact-fact joins at 100 TB."""
    ev = spark.read.parquet(f"{SF_CORRECTNESS}/events.parquet").select(
        F.col("user_id").cast("bigint").alias("user_id"),
        "event_id",
        "value",
    )
    with confs(
        spark,
        **{
            # external tables (explicit path option) — the static
            # warehouse dir is untouched
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
            "spark.sql.sources.bucketing.enabled": "true",
        },
    ):
        for name in ("ev_bucketed_a", "ev_bucketed_b"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            (
                ev.write.bucketBy(8, "user_id")
                .sortBy("user_id")
                .option("path", str(tmp_path / name))
                .saveAsTable(name)
            )
        a = spark.table("ev_bucketed_a").groupBy("user_id").agg(
            F.count("*").alias("na")
        )
        b = spark.table("ev_bucketed_b").groupBy("user_id").agg(
            F.sum("value").alias("sv")
        )
        joined = a.join(b, "user_id")
        plan = final_plan(joined)
        ex = [
            ln
            for ln in plan.splitlines()
            if ln.strip().startswith("(") and "Exchange" in ln and "Reused" not in ln
        ]
        assert not ex, f"bucketed join still shuffles: {ex}"
        assert joined.count() == ev.select("user_id").distinct().count()
        for name in ("ev_bucketed_a", "ev_bucketed_b"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_aqe_splits_skewed_join_partition(spark):
    """A deliberately skewed key (one user owns ~half the fact rows)
    triggers AQE's skew-join splitting (skew=true in the final SMJ) —
    the runtime remedy SCALE.md pairs with salting for hot keys."""
    n = 200_000
    skew = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.range(50_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("r")
    )
    with confs(
        spark,
        **{
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
            "spark.sql.join.preferSortMergeJoin": "true",
            "spark.sql.shuffle.partitions": "8",
        },
    ):
        joined = skew.join(right, "k").select(F.sum("payload").alias("s"))
        plan = final_plan(joined)
        assert "skew=true" in plan, plan[:3000]


def test_bloom_filter_wrong_answer_guard(spark):
    """Bloom pruning is probabilistic-INCLUSIVE: it may pass
    non-matching rows to the join but must never drop matching ones —
    equality with the unfiltered join result is the safety pin."""
    li = spark.read.parquet(f"{SF_CORRECTNESS}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_CORRECTNESS}/orders.parquet")
    dim = orders.where(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    fact = li.select(F.col("l_orderkey").alias("o_orderkey"))
    with confs(
        spark,
        **{
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100GB",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        },
    ):
        with_bloom = fact.join(dim, "o_orderkey", "left_semi").count()
    with confs(
        spark,
        **{"spark.sql.optimizer.runtime.bloomFilter.enabled": "false"},
    ):
        without = fact.join(dim, "o_orderkey", "left_semi").count()
    assert with_bloom == without

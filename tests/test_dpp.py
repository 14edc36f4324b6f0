"""Dynamic Partition Pruning: the runtime scan-reduction lever for
partitioned fact tables.

At 100 TB a fact table is partitioned by date/type; a join against a
filtered dimension must prune fact PARTITIONS at runtime from the
dim-side values (no static filter exists on the fact). Spark's DPP
injects a dynamicpruning subquery into the fact scan's partition
filters — this test proves the plan does that and that results are
unchanged.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    fact_dir = str(tmp_path / "events_by_type")
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(fact_dir)

    fact = spark.read.parquet(fact_dir)
    dim = spark.createDataFrame(
        [("view", "browse"), ("click", "browse"), ("purchase", "buy"),
         ("signup", "acct"), ("error", "ops")],
        "event_type string, category string",
    )

    joined = (
        fact.join(dim, "event_type")
        .where(F.col("category") == "buy")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("s"))
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan

    want = (
        ev.where(F.col("event_type") == "purchase")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("s"))
        .collect()
    )
    assert joined.collect() == want


def test_partitioned_scan_prunes_on_static_filter(spark, tmp_path):
    """Static partition pruning: a literal filter on the partition
    column must reach the scan as a PartitionFilter (zero non-matching
    partitions read), visible as a pruned input size."""
    fact_dir = str(tmp_path / "events_by_type2")
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(fact_dir)

    fact = spark.read.parquet(fact_dir)
    q = fact.where(F.col("event_type") == "purchase")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "purchase" in plan
    assert q.count() == ev.where(F.col("event_type") == "purchase").count()

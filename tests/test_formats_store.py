"""Plan gates for the format/partitioned-store gated queries: the
pruning and schema discipline the oracles can't see."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_partitioned_store_prunes_partitions(spark, tmp_path):
    """A date predicate on the partition column must reach the scan as
    PartitionFilters and plan only the matching directories — the
    1/365th-of-the-store property a day query relies on at 100 TB."""
    from realtime_analytics_pipeline_spark.schema import raw_ts

    raw = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    ev = raw.select(raw_ts(raw).alias("ts"), "event_type")
    store = str(tmp_path / "store")
    (
        ev.withColumn("event_date", F.to_date("ts"))
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(store)
    )
    back = spark.read.parquet(store).where(
        (F.col("event_date") >= F.lit("2024-01-10"))
        & (F.col("event_date") < F.lit("2024-01-13"))
    )
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        back.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters: [" in plan
    assert "event_date" in plan.split("PartitionFilters", 1)[1][:200]
    # runtime proof: the scan reads ONLY files under the 3 matching
    # date directories — numFiles from the executed scan's metrics,
    # not the pre-pruning inputFiles() listing. collect() executes
    # back's own QueryExecution, populating its metrics.
    back.collect()

    def leaf_num_files(node):
        ch = node.children()
        if ch.size() == 0:
            cn = node.getClass().getSimpleName()
            if "FileSourceScan" in cn or "Scan" in cn:
                m = node.metrics()
                if m.contains("numFiles"):
                    return m.apply("numFiles").value()
            return None
        vals = [leaf_num_files(ch.apply(i)) for i in range(ch.size())]
        vals = [v for v in vals if v is not None]
        return vals[0] if vals else None

    plan_root = back._jdf.queryExecution().executedPlan()
    # AQE wraps the plan; unwrap to the final physical plan
    if plan_root.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        plan_root = plan_root.executedPlan()
    n_files = leaf_num_files(plan_root)
    import glob
    import os

    expected_files = sum(
        len(glob.glob(os.path.join(store, f"event_date={d}", "*.parquet")))
        for d in ("2024-01-10", "2024-01-11", "2024-01-12")
    )
    all_files = len(glob.glob(os.path.join(store, "event_date=*", "*.parquet")))
    assert n_files == expected_files, (n_files, expected_files)
    assert expected_files < all_files  # pruning actually skipped dirs


def test_csv_leg_quotes_json_props(spark, tmp_path):
    """The CSV leg must round-trip the JSON-bearing props column
    byte-for-byte (quoting discipline) — checked directly since the
    gated aggregation doesn't read props."""
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select(
        "event_id", "props"
    )
    p = str(tmp_path / "csv")
    ev.write.option("header", "true").csv(p)
    back = spark.read.schema(ev.schema).option("header", "true").csv(p)
    a = {(r.event_id, r.props) for r in ev.collect()}
    b = {(r.event_id, r.props) for r in back.collect()}
    assert a == b

"""Mergeable HLL sketch rollups: accuracy + union losslessness."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_analytics_pipeline_spark.operators.sketches import (
    hll_minute_sketches,
    hll_rollup_hour,
)
from realtime_analytics_pipeline_spark.sources.batch import load_events

from tests.conftest import SF_SMOKE


def test_hourly_estimates_close_to_exact(spark):
    ev = load_events(spark, SF_SMOKE)
    got = {
        (r.hour_ms, r.event_type): (r.event_count, r.approx_users)
        for r in hll_rollup_hour(hll_minute_sketches(ev)).collect()
    }
    hour_ms = (
        (F.unix_millis("event_time") / F.lit(3600000)).cast("long")
        * F.lit(3600000)
    ).alias("hour_ms")
    exact = {
        (r.hour_ms, r.event_type): (r.cnt, r.users)
        for r in ev.select(hour_ms, "event_type", "user_id")
        .groupBy("hour_ms", "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.countDistinct("user_id").alias("users"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for k, (cnt, approx) in got.items():
        exact_cnt, exact_users = exact[k]
        assert cnt == exact_cnt  # counts are exact (plain sum)
        # lgConfigK=12 → relative standard error ~1.6%; generous 10%
        # bound still catches a broken sketch outright
        assert abs(approx - exact_users) <= max(1, 0.10 * exact_users)


def test_union_is_lossless_vs_direct_sketch(spark):
    """Unioning per-minute sketches must estimate IDENTICALLY to one
    sketch built directly over the hour — HLL union is lossless at
    equal lgConfigK (this is what makes pre-aggregated sketch cells
    trustworthy for serving)."""
    ev = load_events(spark, SF_SMOKE)
    unioned = hll_rollup_hour(hll_minute_sketches(ev)).select(
        "hour_ms", "event_type", "approx_users"
    )
    hour_ms = (
        (F.unix_millis("event_time") / F.lit(3600000)).cast("long")
        * F.lit(3600000)
    ).alias("hour_ms")
    direct = (
        ev.select(hour_ms, "event_type", "user_id")
        .groupBy("hour_ms", "event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(12))
            ).alias("approx_users")
        )
    )
    assert unioned.exceptAll(direct).count() == 0
    assert direct.exceptAll(unioned).count() == 0

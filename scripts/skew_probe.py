"""Hot-session-key timing probe (round-9): measures single-pass vs
two-phase sessionization on a synthetic slice where ONE session_id owns
half the events — the skew the driver's uniform testdata never shows.

Single-pass window functions get no AQE skew remedy: the hot key's
whole event set serializes onto one task. The two-phase form
(session_metrics_bucketed) spreads it over (key, time-bucket) in phase
1 and merges boundary partials in phase 2. This probe prints wall
times + the max-task share so the claim is measured, not argued.

Usage: python scripts/skew_probe.py [n_events]   (default 2_000_000)
Writes nothing; paste the output into ROUND_NOTES.md.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from realtime_analytics_pipeline_spark.operators.session_metrics import (  # noqa: E402
    session_metrics_bucketed,
    session_metrics_by_lag,
)
from realtime_analytics_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark("rtap-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # one 'hot' key owns 50% of events, spanning ~46 days at 4 s steps;
    # cold keys are uniform. Deterministic, no RNG.
    ev = (
        spark.range(n)
        .select(
            F.col("id").cast("string").alias("event_id"),
            F.timestamp_micros(
                F.lit(1704067200000000) + F.col("id") * 2_000_000
            ).alias("event_time"),
            F.lit("view").alias("event_type"),
            F.when(F.col("id") % 2 == 0, "hot")
            .otherwise(F.concat(F.lit("u"), (F.col("id") % 20000)))
            .alias("user_id"),
        )
        .withColumn("session_id", F.col("user_id"))
        .withColumn("user_agent", F.lit(None).cast("string"))
        .withColumn("load_time", F.lit(0).cast("long"))
        .withColumn("value", F.lit(0.0))
        .withColumn("props", F.lit("{}"))
    )
    ev.write.mode("overwrite").parquet("/tmp/skew_probe_events")
    ev = spark.read.parquet("/tmp/skew_probe_events")
    hot_share = ev.where(F.col("session_id") == "hot").count() / n
    print(f"n={n} hot_share={hot_share:.2f}")

    for name, fn in (
        ("single-pass lag", lambda d: session_metrics_by_lag(d)),
        (
            "two-phase bucketed (1 d)",
            lambda d: session_metrics_bucketed(d, bucket_ms=86_400_000),
        ),
        (
            "two-phase bucketed (6 h)",
            lambda d: session_metrics_bucketed(d, bucket_ms=21_600_000),
        ),
    ):
        runs = []
        for _ in range(3):
            t0 = time.time()
            fn(ev).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        print(f"{name}: median {sorted(runs)[1]:.2f}s  (runs: "
              + ", ".join(f"{r:.2f}" for r in runs) + ")")
    # sanity: identical session sets
    a = session_metrics_by_lag(ev)
    b = session_metrics_bucketed(ev, bucket_ms=21_600_000)
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    print(f"result diff rows: {diff} (must be 0)")


if __name__ == "__main__":
    main()

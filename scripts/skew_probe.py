"""Hot-session-key timing probe (round-9): measures single-pass vs
two-phase sessionization on a synthetic slice where ONE session_id owns
half the events — the skew the driver's uniform testdata never shows.

Single-pass window functions get no AQE skew remedy: the hot key's
whole event set serializes onto one task. The two-phase form
(session_metrics_bucketed) spreads it over (key, time-bucket) in phase
1 and merges boundary partials in phase 2. This probe prints wall
times + the max-task share so the claim is measured, not argued.

Round-10 adds `--kmeans [n_vecs]` (default 10_000): the hot-QUANTIZER-
CELL twin for clustered_dup_pairs — 60% of vectors collapse into one
k-means cell, so the pre-round-10 plain cluster-equi-join enumerates
that cell's ~C(0.6n,2) pairs (and computes their dot products) on ONE
task. The salted candidate form spreads the cell over 32 chunk tasks.
Prints both wall times + a result-equality check.

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


def main_kmeans() -> None:
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    spark = get_spark("rtap-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    from realtime_analytics_pipeline_spark.functions.vectors import (
        as_double,
        dot,
        unit,
    )
    from realtime_analytics_pipeline_spark.operators.clustering import (
        clustered_dup_pairs,
        kmeans_lite,
    )

    # 60% of vectors point at one direction (with a tiny per-row jitter
    # slot so they are not byte-identical); the rest spread over 7
    # other axes. Deterministic, no RNG.
    base = spark.range(n).select(
        F.concat(F.lit("v"), F.col("id")).alias("vec_id"),
        F.when(
            F.col("id") % 5 < 3,
            F.array(
                F.lit(100.0),
                F.lit(1.0),
                (F.col("id") % 7).cast("float"),
                *[F.lit(0.0)] * 4,
                F.lit(1.0),
            ),
        )
        .otherwise(
            F.expr(
                "transform(sequence(0, 7), i -> CAST("
                "CASE WHEN i = CAST(id % 8 AS INT) THEN 50.0 "
                "WHEN i = CAST((id + 3) % 8 AS INT) "
                "THEN 5.0 + CAST(id % 11 AS DOUBLE) "
                "ELSE 0.0 END AS FLOAT))"
            )
        )
        .alias("embedding"),
    )
    base.write.mode("overwrite").parquet("/tmp/skew_probe_vecs")
    emb = spark.read.parquet("/tmp/skew_probe_vecs")
    assigned = kmeans_lite(emb, 8, 3).select("vec_id", "cluster")
    top = (
        assigned.groupBy("cluster").count().orderBy(F.desc("count")).first()
    )
    print(f"n={n} hottest cell holds {top['count']} vectors "
          f"({top['count'] / n:.0%})")

    def plain(e):
        # the pre-round-10 form: plain equi-join on cluster
        ev = e.select(
            "vec_id", unit(as_double("embedding")).alias("v")
        ).join(assigned, "vec_id")
        a = ev.select(
            "cluster", F.col("vec_id").alias("id_a"), F.col("v").alias("va")
        )
        b = ev.select(
            F.col("cluster").alias("cl_b"),
            F.col("vec_id").alias("id_b"),
            F.col("v").alias("vb"),
        )
        return (
            a.join(
                b,
                (F.col("cluster") == F.col("cl_b"))
                & (F.col("id_a") < F.col("id_b")),
            )
            .withColumn("cos", F.round(dot(F.col("va"), F.col("vb")), 6))
            .where(F.col("cos") >= 0.3)
            .select("cluster", "id_a", "id_b", "cos")
        )

    for name, fn in (
        ("plain cluster-equi-join", plain),
        ("salted pair join (round-10)", lambda e: clustered_dup_pairs(e, threshold=0.3)),
    ):
        runs = []
        for _ in range(3):
            t0 = time.time()
            fn(emb).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        print(f"{name}: median {sorted(runs)[1]:.2f}s  (runs: "
              + ", ".join(f"{r:.2f}" for r in runs) + ")")
    a = plain(emb)
    b = clustered_dup_pairs(emb, threshold=0.3)
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    print(f"result diff rows: {diff} (must be 0)")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--kmeans":
        main_kmeans()
    else:
        main()

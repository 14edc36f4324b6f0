"""Time named gated queries through the noop sink (bench methodology:
min of N reps, jobs labeled) — the A/B harness for optimization work.

Usage: python scripts/time_queries.py name1 name2 ... [--sf SF_DIR]
       [--reps N] [--tag LABEL]

Prints one line per query: tag, name, min and median seconds over
reps. Uses the same get_spark() session and noop-sink timing as
bench.py so numbers are comparable to BENCH_LOCAL medians.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, ".")

from realtime_analytics_pipeline_spark import registry  # noqa: E402
from realtime_analytics_pipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    reps = 3
    tag = "t"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    if "--tag" in args:
        i = args.index("--tag")
        tag = args[i + 1]
        del args[i : i + 2]
    spark = get_spark("rtap-time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup as bench.py: JVM + Python worker/Arrow bring-up
    registry.QUERIES["event_metrics_1m"](
        spark, "/root/testdata/sf0.001"
    ).write.format("noop").mode("overwrite").save()
    registry.QUERIES["sim_cosine_topk_blas"](
        spark, "/root/testdata/sf0.001"
    ).write.format("noop").mode("overwrite").save()
    for name in args:
        fn = registry.QUERIES[name]
        runs = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"{tag}:{name}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
            spark.sparkContext.setJobDescription(None)
        print(
            f"{tag} {name}: min {min(runs):.2f}s"
            f" median {statistics.median(runs):.2f}s"
            f" ({', '.join(f'{r:.2f}' for r in runs)})",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())

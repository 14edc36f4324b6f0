"""Hostile-session probe: run EVERY gated query in a driver-shaped
session we did not build.

The round driver constructs its own SparkSession (unknown master,
timezone, configs); the engine must not depend on `session.get_spark`
tuning. This probe builds a deliberately hostile session (local[8],
America/New_York, AQE defaults, no nanos handling pre-set) and
executes every `queries()` entry to completion. `tune_session`
(called inside every loader) must repair what matters at runtime.

Usage: python scripts/hostile_probe.py [sf_dir]   (default sf0.001)
Exit 0 = every query ran; failures are listed with their exception.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("hostile-probe")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    n = entry_mod.entry(spark).count()
    print(f"entry(): {n} rows")

    failures: list[tuple[str, str]] = []
    for name, fn in entry_mod.queries().items():
        t0 = time.time()
        try:
            cnt = fn(spark, sf_dir).count()
            print(f"  {name}: {cnt} rows ({time.time() - t0:.1f}s)")
        except Exception as exc:  # noqa: BLE001 — report and continue
            failures.append((name, repr(exc)[:200]))
            print(f"  {name}: FAILED {exc!r}")
    if failures:
        print(f"FAILURES ({len(failures)}):")
        for name, err in failures:
            print(f"  {name}: {err}")
        return 1
    print("ALL QUERIES RAN")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

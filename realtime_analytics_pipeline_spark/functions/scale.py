"""Scan-parallelism floor for heavy map-side operators.

Parquet is splittable only at row-group granularity, and the driver's
testdata slices are written as ONE row group per table — so every scan
stage is a single task regardless of ``spark.sql.files.maxPartitionBytes``
/ ``minPartitionNum`` (splits beyond the row-group count come back
empty). Any operator whose expensive per-row compute (md5 sketching,
Levenshtein, higher-order array passes) sits in the scan stage then
runs on ONE core of the 32 available (optimization guide §2.5 "input
skew: one huge unsplittable file", §6.1 scan-parallelism floor).

``spread()`` is the floor: when a frame's natural parallelism is below
the cluster's default parallelism, hash-repartition it (deterministic
keys only — never ``rand()``, per guide §2.5 / SPARK-38388) so the
downstream per-row work uses every core. On a real deployment the same
operator reads thousands of row groups, the partition count already
exceeds ``defaultParallelism``, and spread() is a structural no-op —
the repartition exchange never enters the plan, so this is NOT a
local-only tuning constant; it is input-shape-adaptive.

Use it ONLY where downstream aggregation is reduction-order-insensitive
(min/max/count/integer sums/md5 keys): moving rows between partitions
changes float partial-aggregation order, which the engine's
cross-engine float discipline (sorted folds, integer cents) otherwise
guards against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, *keys: str) -> DataFrame:
    """Repartition ``df`` to the session's default parallelism when its
    natural partitioning is narrower — the scan-parallelism floor for
    heavy map-side compute over few-row-group parquet inputs. With
    ``keys`` the repartition is hash-based (deterministic under task
    retry); without, round-robin (Spark's sort-before-repartition keeps
    that deterministic too)."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        natural = df.rdd.getNumPartitions()
    except Exception:
        return df
    if natural >= target:
        return df
    return df.repartition(target, *keys) if keys else df.repartition(target)

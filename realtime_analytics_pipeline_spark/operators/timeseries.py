"""Time-series operators: expression-tree dynamic programming.

Dynamic Time Warping is the classic "you need a UDF for that" operator:
an O(n·m) DP with sequential dependence in both dimensions. It is
nevertheless expressible entirely in Catalyst higher-order functions —
the outer ``aggregate`` folds over the first series carrying the DP row
as an ``array<double>`` accumulator; the inner ``aggregate`` builds the
next row left-to-right (the in-row sequential dependence lives in the
growing accumulator array). No Python execution, no serialization
boundary: the whole DP runs inside the JVM per row.

Complexity per pair is O(n·m) cells with O(m) array-append per cell
(immutable accumulator), i.e. O(n·m²) — fine for the bounded series
this engine compares (daily/weekly rollups, hundreds of points), and
the row never leaves its executor. For very long series, the right
scale move is PAA downsampling first (coarser grid), not a different
execution engine.

Time-series similarity context: REPOSE (ICDE 2021) and the EDBT 2019
streaming-similarity line both reduce to cheap-prefilter + exact-verify;
``users_activity_similarity`` is the sparse-cosine prefilter shape, and
this DTW is the exact verifier for alignment-tolerant matching.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dtw_distance(xs: str, ys: str) -> Column:
    """DTW distance between two ``array<double>`` columns (by name).

    Standard recurrence with |·| local cost::

        D[0][0] = c(0,0);  D[0][j] = D[0][j-1] + c(0,j)
        D[i][j] = c(i,j) + min(D[i-1][j], D[i][j-1], D[i-1][j-1])

    implemented as a fold over rows of the DP matrix.
    """
    first_row = f"""
        aggregate(
            slice({ys}, 2, size({ys}) - 1),
            array(abs(element_at({xs}, 1) - element_at({ys}, 1))),
            (row, y) -> array_append(
                row, abs(element_at({xs}, 1) - y)
                     + element_at(row, size(row))))
    """
    # inner fold: j tracked as size(row) + 1 (1-based column index)
    next_row = f"""
        (prev, x) -> aggregate(
            sequence(1, size({ys})),
            cast(array() as array<double>),
            (row, j) -> array_append(
                row,
                abs(x - element_at({ys}, j)) + (
                    CASE WHEN j = 1 THEN element_at(prev, 1)
                         ELSE least(
                             element_at(prev, j),
                             element_at(row, j - 1),
                             element_at(prev, j - 1))
                    END)))
    """
    return F.expr(
        f"""
        element_at(
            aggregate(
                slice({xs}, 2, size({xs}) - 1),
                {first_row},
                {next_row}),
            size({ys}))
        """
    )


def cusum_drift(
    events: DataFrame,
    ts_ms: str = "event_ms",
    value: str = "value",
    bucket_ms: int = 60_000,
    threshold_mult: int = 2,
) -> DataFrame:
    """One-sided CUSUM change detection over per-minute value mass —
    the classic Page (1954) drift test, re-expressed as two window
    functions so it distributes.

    The textbook recurrence s_t = max(0, s_{t-1} + (x_t − target)) is
    sequential; its closed form is s_t = C_t − min_{0≤j≤t} C_j where
    C_t = Σ(x_j − target) and C_0 = 0 (the empty prefix MUST
    participate in the min, else a positive first deviation reads as
    zero) — a prefix sum and a prefix min, both plain window
    aggregates over the minute series (ordered, single series ⇒ one
    window partition; a per-key deployment partitions by key and
    parallelizes). The sequential-vs-closed-form equality is pinned in
    tests/test_round6_ops.py. Every quantity is integer cents: x_t = minute total,
    target = floor(global mean minute total), drift flag =
    s_t > threshold_mult·target. No float ever enters, so the oracle
    hash is exact.
    """
    from pyspark.sql import Window

    minutes = (
        events.select(
            ((F.col(ts_ms) / bucket_ms).cast("long") * bucket_ms).alias(
                "minute_ms"
            ),
            F.round(F.col(value) * 100).cast("long").alias("cents"),
        )
        .groupBy("minute_ms")
        .agg(F.sum("cents").alias("total_cents"))
    )
    # floor(sum/count), not cast(sum/count): Spark's double→long cast
    # truncates toward zero while DuckDB's CAST rounds — floor() is the
    # one form both engines agree on.
    tgt = minutes.agg(
        F.floor(F.sum("total_cents") / F.count(F.lit(1)))
        .cast("long")
        .alias("target_cents")
    )
    w_cum = Window.orderBy("minute_ms").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    with_dev = minutes.crossJoin(F.broadcast(tgt)).withColumn(
        "cum", F.sum(F.col("total_cents") - F.col("target_cents")).over(w_cum)
    )
    cusum = F.col("cum") - F.least(F.min("cum").over(w_cum), F.lit(0))
    return with_dev.select(
        "minute_ms",
        "total_cents",
        "target_cents",
        cusum.cast("long").alias("cusum_pos"),
        (cusum > threshold_mult * F.col("target_cents")).alias("is_drift"),
    )


def minute_gap_fill(
    events: DataFrame,
    ts_ms: str = "event_ms",
    value: str = "value",
    bucket_ms: int = 60_000,
) -> DataFrame:
    """Regularize an event stream onto a dense minute spine with linear
    interpolation across gaps — the resample step every downstream
    time-series model assumes.

    The spine is generated distributed (sequence + explode from the
    1-row min/max aggregate — never a driver-side range loop); observed
    minutes carry their true total, missing minutes interpolate between
    the previous and next observed totals:
        interp = prev + floor((next − prev) · (t − t_prev) / gap)
    computed as one float multiply-divide-floor over integer cents (no
    accumulation — cross-engine exact; floor, not integer `div`,
    because Spark's div truncates toward zero while DuckDB's // floors,
    and negative deltas are routine). Two ordered windows (last/next
    non-null) over the spine — one shuffle-free pass after the spine
    join; a per-key deployment partitions both windows by key.
    """
    from pyspark.sql import Window

    minutes = (
        events.select(
            ((F.col(ts_ms) / bucket_ms).cast("long") * bucket_ms).alias(
                "minute_ms"
            ),
            F.round(F.col(value) * 100).cast("long").alias("cents"),
        )
        .groupBy("minute_ms")
        .agg(F.sum("cents").alias("obs_cents"))
    )
    spine = (
        minutes.agg(
            F.min("minute_ms").alias("lo"), F.max("minute_ms").alias("hi")
        )
        .select(
            F.explode(
                F.sequence(
                    F.col("lo"), F.col("hi"), F.lit(int(bucket_ms))
                )
            ).alias("minute_ms")
        )
    )
    dense = spine.join(minutes, "minute_ms", "left")
    # BOTH directions as growing prefix frames: Spark's WindowExec
    # computes [unboundedPreceding, current] incrementally (O(n)) but
    # recomputes a [current, unboundedFollowing] frame from scratch per
    # row (O(n²) — measured 35 s on a 43k-minute spine); the forward
    # lookup is therefore a last() over the DESCENDING order instead of
    # a first() over the ascending one.
    w_asc = Window.orderBy("minute_ms").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_desc = Window.orderBy(F.col("minute_ms").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    obs_t = F.when(F.col("obs_cents").isNotNull(), F.col("minute_ms"))
    prev_v = F.last("obs_cents", ignorenulls=True).over(w_asc)
    prev_t = F.last(obs_t, ignorenulls=True).over(w_asc)
    next_v = F.last("obs_cents", ignorenulls=True).over(w_desc)
    next_t = F.last(obs_t, ignorenulls=True).over(w_desc)
    interp = F.col("pv") + F.floor(
        (F.col("nv") - F.col("pv"))
        * (F.col("minute_ms") - F.col("pt"))
        / (F.col("nt") - F.col("pt"))
    )
    return (
        dense.select(
            "minute_ms",
            "obs_cents",
            prev_v.alias("pv"),
            prev_t.alias("pt"),
            next_v.alias("nv"),
            next_t.alias("nt"),
        )
        .select(
            "minute_ms",
            "obs_cents",
            F.when(F.col("obs_cents").isNotNull(), F.col("obs_cents"))
            .otherwise(interp.cast("long"))
            .alias("filled_cents"),
            F.col("obs_cents").isNull().alias("is_interpolated"),
        )
    )

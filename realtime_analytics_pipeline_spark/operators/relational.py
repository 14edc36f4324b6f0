"""Relational operator suite over the TPC-H-ish tables.

Money arithmetic: revenue sums multiply DECIMAL(18,2)-cast factors and
sum in decimal — exact integer math, identical across engines (double
sums can land on opposite sides of a 2-decimal rounding boundary).

The reference engine contains no joins, set ops, sorts-with-limit,
OVER windows, or grouping sets (SURVEY §2.9) — its serving layer fakes
the few it needs in Python. A complete engine needs them, so they are
implemented here Spark-first, with the scale decision documented per
operator:

- dimension joins broadcast explicitly (``F.broadcast``) — at 100 TB
  the fact table never shuffles for a dim join;
- fact-fact joins (orders ⋈ lineitem) shuffle on the join key; AQE
  handles skew;
- top-N uses TakeOrderedAndProject (per-partition heap + driver merge,
  no global sort);
- the as-of join is the union + last-non-null-over-window formulation:
  one shuffle on (key), no range-explosion, no per-row lookups — the
  standard scalable as-of on Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pricing_summary(lineitem: DataFrame, cutoff: str = "2001-09-01") -> DataFrame:
    """TPC-H Q1 shape: grouped pricing aggregates with filter pushdown.

    The shipdate predicate sits directly on the scan → parquet
    PushedFilters; partial aggregation happens map-side before the
    single shuffle on the 6-value group key.
    """
    return (
        lineitem.where(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1998-01-01",
    n: int = 10,
) -> DataFrame:
    """TPC-H Q3 shape: 3-way join → grouped revenue → top-N.

    customer (selective filter) broadcasts; orders ⋈ lineitem is the
    one real shuffle. Top-N by (revenue desc, orderkey) — the orderkey
    tiebreak keeps the result set deterministic across engines.
    """
    cust = customer.where(F.col("c_mktsegment") == segment).select("c_custkey")
    cut = F.lit(cutoff).cast("timestamp")
    ord_f = orders.where(F.col("o_orderdate") < cut).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    li_f = lineitem.where(F.col("l_shipdate") > cut).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        li_f.join(
            # filtered customer scales with SF: AQE broadcasts while it
            # fits, shuffles when it doesn't (no hard hint)
            ord_f.join(cust, ord_f.o_custkey == cust.c_custkey),
            li_f.l_orderkey == ord_f.o_orderkey,
        )
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (F.lit(1.0) - F.col("l_discount")).cast("decimal(18,2)")
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .select(
            "o_orderkey",
            F.unix_millis("o_orderdate").alias("o_orderdate_ms"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(n)
    )


def regional_revenue(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    region_name: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q5 shape: 6-way join, revenue per nation.

    region/nation/supplier/customer broadcast (all tiny vs facts);
    the plan shuffles only for orders ⋈ lineitem and the final 25-key
    aggregate. The c_nationkey = s_nationkey condition is the classic
    Q5 'local supplier' constraint.
    """
    r = region.where(F.col("r_name") == region_name)
    n = nation.join(F.broadcast(r), nation.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    c = customer.join(
        F.broadcast(n), customer.c_nationkey == n.n_nationkey
    ).select("c_custkey", "c_nationkey", "n_name")
    o = orders.where(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    s = supplier.select("s_suppkey", "s_nationkey")
    joined = (
        lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        # customer/supplier scale linearly with SF — leave the
        # broadcast-vs-shuffle choice to AQE (nation/region above stay
        # hinted: constant-size)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(
            s,
            (F.col("l_suppkey") == s.s_suppkey)
            & (F.col("c_nationkey") == s.s_nationkey),
        )
    )
    return joined.groupBy("n_name").agg(
        F.round(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1.0) - F.col("l_discount")).cast("decimal(18,2)")
            ),
            2,
        )
        .cast("double")
        .alias("revenue")
    )


def top_customers_per_nation(
    customer: DataFrame, orders: DataFrame, nation: DataFrame, k: int = 3
) -> DataFrame:
    """OVER-window ranking: top-k customers per nation by order count.

    Deterministic rank key (count desc, custkey asc) — integer counts,
    no float-tie hazard. One shuffle for the count, one for the
    partitioned window.
    """
    counts = (
        orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("order_count"))
    )
    enriched = (
        customer.join(counts, customer.c_custkey == counts.o_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select("n_name", "c_custkey", "c_name", "order_count")
    )
    w = Window.partitionBy("n_name").orderBy(
        F.col("order_count").desc(), F.col("c_custkey")
    )
    return (
        enriched.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("n_name", "c_custkey", "c_name", "order_count", "rnk")
    )


def sliding_event_counts(
    events: DataFrame, window: str = "300 seconds", slide: str = "60 seconds"
) -> DataFrame:
    """Hopping-window counts (reference has tumble+session only — this
    completes the window family). Each event lands in window/slide
    buckets; Spark expands then aggregates, still one shuffle."""
    return (
        events.groupBy(F.window("event_time", window, slide), "event_type")
        .agg(F.count(F.lit(1)).alias("event_count"))
        .select(
            F.unix_millis("window.start").alias("window_start_ms"),
            F.unix_millis("window.end").alias("window_end_ms"),
            "event_type",
            "event_count",
        )
    )


def users_viewed_not_purchased(
    events: DataFrame, before: str = "2024-01-02"
) -> DataFrame:
    """Set op EXCEPT: users with view events but no purchase (within a
    time bound so the answer is non-trivial on the synthetic data)."""
    cut = F.lit(before).cast("timestamp")
    scoped = events.where(F.col("event_time") < cut)
    viewers = scoped.where(F.col("event_type") == "view").select("user_id")
    buyers = scoped.where(F.col("event_type") == "purchase").select("user_id")
    # subtract = set EXCEPT (exceptAll would be bag semantics: it removes
    # one viewer occurrence per buyer row, leaving duplicate viewers in)
    return viewers.subtract(buyers)


def users_viewed_and_clicked(
    events: DataFrame, before: str = "2024-01-02"
) -> DataFrame:
    """Set op INTERSECT: users with both view and click events."""
    cut = F.lit(before).cast("timestamp")
    scoped = events.where(F.col("event_time") < cut)
    viewers = scoped.where(F.col("event_type") == "view").select("user_id")
    clickers = scoped.where(F.col("event_type") == "click").select("user_id")
    return viewers.intersect(clickers)


def event_type_daily_rollup(events: DataFrame, min_count: int = 0) -> DataFrame:
    """ROLLUP grouping-set aggregation + HAVING (both absent from the
    reference): counts per (day, event_type) with subtotal and grand
    total rows. Day emitted as epoch-ms of midnight UTC."""
    day_ms = (F.unix_millis("event_time") / F.lit(86400000)).cast("long") * F.lit(
        86400000
    )
    rolled = (
        events.select(day_ms.alias("day_ms"), "event_type")
        .rollup("day_ms", "event_type")
        .agg(F.count(F.lit(1)).alias("event_count"))
    )
    if min_count > 0:
        rolled = rolled.where(F.col("event_count") >= min_count)
    return rolled


def asof_attribution(
    events: DataFrame,
    hit_type: str = "purchase",
    source_type: str = "view",
) -> DataFrame:
    """As-of join (custom operator — no Spark built-in): for each
    ``hit_type`` event, the most recent prior-or-equal ``source_type``
    event of the same user.

    Implementation is the scalable union formulation: tag both sides,
    union, and carry the last source timestamp forward with
    ``last(ignorenulls)`` over (user ORDER BY time) — one shuffle on
    user_id, no range-join row explosion, works identically at 100 TB.
    Ordering tiebreak: at identical timestamps sources sort before
    hits (side 0 < side 1), i.e. a same-instant source is visible to
    the hit — matching DuckDB ASOF JOIN's ``>=`` semantics.
    """
    src = events.where(F.col("event_type") == source_type).select(
        "user_id",
        F.col("event_time").alias("t"),
        F.lit(0).alias("side"),
        F.lit(None).cast("string").alias("hit_id"),
    )
    hits = events.where(F.col("event_type") == hit_type).select(
        "user_id",
        F.col("event_time").alias("t"),
        F.lit(1).alias("side"),
        F.col("event_id").alias("hit_id"),
    )
    unioned = src.unionByName(hits)
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    src_t = F.last(F.when(F.col("side") == 0, F.col("t")), ignorenulls=True).over(w)
    return (
        unioned.withColumn("src_t", src_t)
        .where(F.col("side") == 1)
        .select(
            "user_id",
            F.col("hit_id"),
            F.unix_millis("t").alias("hit_ms"),
            F.unix_millis("src_t").alias("last_view_ms"),
        )
    )


def sliding_event_counts_paned(
    events: DataFrame,
    pane: str = "60 seconds",
    panes_per_window: int = 5,
) -> DataFrame:
    """Pane-optimized hopping windows — identical results to
    ``sliding_event_counts`` with the event-replication term removed.

    The naive hopping aggregation lands EVERY EVENT in window/slide
    buckets (5× shuffle rows at 5m/1m). This computes non-overlapping
    pane aggregates first (one map-side-combined shuffle at 1× rows),
    then replicates the PANES — already windows × types cardinality,
    orders of magnitude smaller than events — into the hopping
    windows they belong to. The standard panes/stream-slicing
    optimization (Li et al., "No Pane, No Gain"); at 100 TB the 5×
    event replication is the dominant shuffle term, the pane rollup
    is noise.
    """
    pane_ms = 60000
    window_ms = pane_ms * panes_per_window
    panes = (
        events.groupBy(
            F.window("event_time", pane).alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("pane_count"))
        .select(
            F.unix_millis("w.start").alias("pane_ms"),
            "event_type",
            "pane_count",
        )
    )
    k = F.explode(
        F.sequence(F.lit(0), F.lit(panes_per_window - 1))
    ).alias("k")
    return (
        panes.select("pane_ms", "event_type", "pane_count", k)
        .select(
            (F.col("pane_ms") - F.col("k") * pane_ms).alias(
                "window_start_ms"
            ),
            "event_type",
            "pane_count",
        )
        .groupBy("window_start_ms", "event_type")
        .agg(F.sum("pane_count").alias("event_count"))
        .select(
            "window_start_ms",
            (F.col("window_start_ms") + window_ms).alias("window_end_ms"),
            "event_type",
            "event_count",
        )
    )


def asof_forward(
    events: DataFrame,
    hit_type: str = "purchase",
    source_type: str = "error",
) -> DataFrame:
    """FORWARD as-of join: for each ``hit_type`` event, the EARLIEST
    ``source_type`` event of the same user at-or-after the hit time
    (the mirror of ``asof_attribution`` — "did an error follow this
    purchase, and when?").

    Same scalable union formulation, reflected: tag both sides, union,
    and pull the next source time backward with ``first(ignorenulls)``
    over (user ORDER BY time ROWS CURRENT..UNBOUNDED FOLLOWING) — one
    shuffle on user_id, no range-join explosion. Tiebreak: at an
    identical timestamp the hit sorts BEFORE the source (side 0 < 1),
    so a same-instant source is visible — `<=` semantics, mirroring
    the backward operator's `>=`.
    """
    hits = events.where(F.col("event_type") == hit_type).select(
        "user_id",
        F.col("event_time").alias("t"),
        F.lit(0).alias("side"),
        F.col("event_id").alias("hit_id"),
        F.lit(None).cast("timestamp").alias("src_t"),
    )
    src = events.where(F.col("event_type") == source_type).select(
        "user_id",
        F.col("event_time").alias("t"),
        F.lit(1).alias("side"),
        F.lit(None).cast("string").alias("hit_id"),
        F.col("event_time").alias("src_t"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "side")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return (
        hits.unionByName(src)
        .withColumn("next_src_t", F.first("src_t", ignorenulls=True).over(w))
        .where(F.col("side") == 0)
        .select(
            F.col("user_id").cast("string").alias("user_id"),
            "hit_id",
            F.unix_millis("t").alias("hit_ms"),
            F.unix_millis("next_src_t").alias("next_error_ms"),
        )
    )

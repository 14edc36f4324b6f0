"""Gated queries: analytic completions — outer joins, window frames,
grouped-map pandas transforms."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from realtime_analytics_pipeline_spark.registry import register
from realtime_analytics_pipeline_spark.sources.batch import load_events, load_table

_OUTER_SQL = """
SELECT n_name,
       vol.n_orders,
       CAST(round(vol.total, 2) AS DOUBLE) AS total
FROM nation
LEFT JOIN (
    SELECT c_nationkey, count(*) AS n_orders, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_orderdate < TIMESTAMP '1995-02-01'
    GROUP BY 1
) vol ON n_nationkey = c_nationkey
"""




@register("nation_order_volume_outer", _OUTER_SQL)
def q_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join: every nation appears, null volume where the
    early-1995 window has no orders."""
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1995-02-01").cast("timestamp")
    )
    customer = load_table(spark, sf_dir, "customer")
    vol = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("total"),
        )
    )
    return nation.join(
        vol, nation.n_nationkey == vol.c_nationkey, "left"
    ).select(
        "n_name",
        "n_orders",
        F.round("total", 2).cast("double").alias("total"),
    )


_RUNNING_SQL = """
WITH daily AS (
    SELECT (epoch_ms(ts) // 86400000) * 86400000 AS day_ms,
           event_type,
           count(*) AS n
    FROM events GROUP BY 1, 2
)
SELECT day_ms, event_type, n,
       CAST(sum(n) OVER (
           PARTITION BY event_type ORDER BY day_ms
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS running_total
FROM daily
"""


@register("events_running_totals", _RUNNING_SQL)
def q_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window FRAME aggregation: per-type daily counts with a
    cumulative ROWS UNBOUNDED PRECEDING running sum."""
    ev = load_events(spark, sf_dir)
    day_ms = (
        (F.unix_millis("event_time") / F.lit(86400000)).cast("long")
        * F.lit(86400000)
    ).alias("day_ms")
    daily = ev.select(day_ms, "event_type").groupBy("day_ms", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day_ms")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.withColumn("running_total", F.sum("n").over(w))


_SALTED_COUNTS_SQL = """
SELECT (epoch_ms(ts) // 60000) * 60000 AS window_start_ms,
       (epoch_ms(ts) // 60000) * 60000 + 60000 AS window_end_ms,
       event_type,
       count(*) AS event_count
FROM events
GROUP BY 1, 2, 3
"""


@register("event_counts_salted", _SALTED_COUNTS_SQL)
def q_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof two-phase salted aggregation — must equal the plain
    group-by result exactly (same oracle shape as event_metrics)."""
    from realtime_analytics_pipeline_spark.operators.skew import (
        salted_event_counts,
    )

    out = salted_event_counts(load_events(spark, sf_dir))
    return out.select(
        F.unix_millis("window_start").alias("window_start_ms"),
        F.unix_millis("window_end").alias("window_end_ms"),
        "event_type",
        "event_count",
    )


_STATS_SQL = """
SELECT event_type,
       round(stddev_samp(value), 6) AS value_stddev,
       round(var_samp(value), 6) AS value_var,
       round(min(value), 6) AS value_min,
       round(max(value), 6) AS value_max,
       round(corr(value, epoch_ms(ts) % 86400000), 6) AS corr_time_of_day
FROM events
WHERE value IS NOT NULL
GROUP BY 1
"""


@register("value_stats_by_type", _STATS_SQL)
def q_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate surface: sample stddev/variance, min/max,
    Pearson correlation (value vs time-of-day)."""
    ev = load_events(spark, sf_dir).where(F.col("value").isNotNull())
    tod = (F.unix_millis("event_time") % F.lit(86400000)).cast("double")
    return ev.groupBy("event_type").agg(
        F.round(F.stddev_samp("value"), 6).alias("value_stddev"),
        F.round(F.var_samp("value"), 6).alias("value_var"),
        F.round(F.min("value"), 6).alias("value_min"),
        F.round(F.max("value"), 6).alias("value_max"),
        F.round(F.corr(F.col("value"), tod), 6).alias("corr_time_of_day"),
    )


_ARRAYAGG_SQL = """
SELECT CAST(user_id AS VARCHAR) AS user_id,
       array_to_string(list_sort(list(DISTINCT event_type)), ',')
           AS event_types,
       count(DISTINCT event_type) AS n_types
FROM events
GROUP BY 1
"""


@register("event_types_per_user", _ARRAYAGG_SQL)
def q_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: sorted distinct set of event types per user
    (collect_set + array_sort). The gated output serializes the array
    with array_join — the driver hashes str(value), and a pandas-side
    numpy array would never string-equal Spark's Python list."""
    ev = load_events(spark, sf_dir)
    return ev.groupBy("user_id").agg(
        F.array_join(
            F.array_sort(F.collect_set("event_type")), ","
        ).alias("event_types"),
        F.count_distinct("event_type").alias("n_types"),
    )


@register("event_types_per_user_array")  # rows-only: array-typed output
def q_array_agg_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The array-TYPED variant of event_types_per_user: the gated twin
    serializes with array_join because the driver hashes str(value)
    (a pandas numpy array never string-equals Spark's list repr); this
    registration keeps the genuine array<string> capability on the
    driver surface under the weaker rows-only check."""
    ev = load_events(spark, sf_dir)
    return ev.groupBy("user_id").agg(
        F.array_sort(F.collect_set("event_type")).alias("event_types"),
        F.count_distinct("event_type").alias("n_types"),
    )


_CASCADE_SQL = """
SELECT (epoch_ms(ts) // 3600000) * 3600000 AS hour_ms,
       event_type,
       count(*) AS event_count,
       CAST(round(sum(value), 2) AS DOUBLE) AS value_sum
FROM events
WHERE value IS NOT NULL
GROUP BY 1, 2
"""


@register("cascade_rollup_1m_to_1h", _CASCADE_SQL)
def q_cascade_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution rollup (hypertable-style): hourly metrics
    computed FROM the 1-minute aggregate, not from raw rows — the
    incremental re-aggregation a continuous-rollup store performs.
    Counts/sums re-aggregate exactly (algebraic); the oracle computes
    hourly direct from raw, proving cascade == direct. value_sum in
    DECIMAL so the two aggregation orders are bit-identical."""
    ev = load_events(spark, sf_dir).where(F.col("value").isNotNull())
    minute = (
        ev.groupBy(
            F.window("event_time", "60 seconds").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("vsum"),
        )
        .select(
            F.col("w.start").alias("minute_start"), "event_type", "cnt", "vsum"
        )
    )
    hour_ms = (
        (F.unix_millis("minute_start") / F.lit(3600000)).cast("long")
        * F.lit(3600000)
    ).alias("hour_ms")
    return (
        minute.select(hour_ms, "event_type", "cnt", "vsum")
        .groupBy("hour_ms", "event_type")
        .agg(
            F.sum("cnt").alias("event_count"),
            F.round(F.sum("vsum"), 2).cast("double").alias("value_sum"),
        )
    )


_Q17_SQL = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < (
      SELECT 0.2 * avg(l2.l_quantity)
      FROM lineitem l2 WHERE l2.l_partkey = p_partkey
  )
"""


@register("tpch_q17_small_quantity", _Q17_SQL)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (Q17 shape) through the SQL front
    door — Catalyst decorrelates it into an aggregate + join; no
    per-row re-execution (see tests/test_plans.py assertion)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "q17_lineitem"
    )
    load_table(spark, sf_dir, "part").createOrReplaceTempView("q17_part")
    return spark.sql(
        """
        SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM q17_lineitem
        JOIN q17_part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#1'
          AND l_quantity < (
              SELECT 0.2 * avg(l2.l_quantity)
              FROM q17_lineitem l2 WHERE l2.l_partkey = p_partkey
          )
        """
    )


_UNION_SQL = """
SELECT 'customer' AS kind, c_name AS name FROM customer WHERE c_custkey < 100
UNION ALL
SELECT 'supplier' AS kind, s_name AS name FROM supplier WHERE s_suppkey < 100
"""


@register("customer_supplier_union", _UNION_SQL)
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag union) across heterogeneous tables with a
    discriminator column."""
    c = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") < 100)
        .select(F.lit("customer").alias("kind"), F.col("c_name").alias("name"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_suppkey") < 100)
        .select(F.lit("supplier").alias("kind"), F.col("s_name").alias("name"))
    )
    return c.unionByName(s)


_LATEST_SQL = """
SELECT CAST(user_id AS VARCHAR) AS user_id,
       CAST(event_id AS VARCHAR) AS event_id,
       event_type,
       epoch_ms(ts) AS ts_ms
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
)
WHERE rn = 1
"""


@register("latest_event_per_user", _LATEST_SQL)
def q_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax / DISTINCT ON-equivalent: newest event per user via a
    deterministic row_number (ts desc, event_id desc tiebreak)."""
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("event_time").desc(), F.col("event_id").cast("long").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.unix_millis("event_time").alias("ts_ms"),
        )
    )


_PCTL_SQL = """
SELECT event_type,
       round(quantile_cont(value, 0.50), 6) AS p50,
       round(quantile_cont(value, 0.95), 6) AS p95,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events
WHERE value IS NOT NULL
GROUP BY 1
"""


@register("value_percentiles_by_type", _PCTL_SQL)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-quantile exact percentiles (interpolating) per group."""
    ev = load_events(spark, sf_dir).where(F.col("value").isNotNull())
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", 0.50), 6).alias("p50"),
        F.round(F.percentile("value", 0.95), 6).alias("p95"),
        F.round(F.percentile("value", 0.99), 6).alias("p99"),
    )


_RANKS_SQL = """
SELECT event_type,
       CAST(event_id AS VARCHAR) AS event_id,
       round(value, 6) AS value,
       CAST(ntile(10) OVER w AS BIGINT) AS decile,
       round(percent_rank() OVER w, 6) AS pr,
       round(cume_dist() OVER w, 6) AS cd
FROM events
WHERE value IS NOT NULL
WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
"""


@register("value_window_ranks", _RANKS_SQL)
def q_window_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function family per type: ntile deciles, percent_rank,
    cume_dist — deterministic via an event_id tiebreak in the window
    order (ntile assignment is order-dependent under value ties)."""
    ev = load_events(spark, sf_dir).where(F.col("value").isNotNull())
    w = Window.partitionBy("event_type").orderBy(
        "value", F.col("event_id").cast("long")
    )
    return ev.select(
        "event_type",
        "event_id",
        F.round("value", 6).alias("value"),
        F.ntile(10).over(w).cast("long").alias("decile"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


from realtime_analytics_pipeline_spark.registry import _PERF_PIVOT_SQL

_UNPIVOT_SQL = (
    "WITH pp AS (" + _PERF_PIVOT_SQL + ")\n"
    "SELECT window_start_ms, metric, round(value, 6) AS value FROM (\n"
    + "\nUNION ALL\n".join(
        f"SELECT window_start_ms, '{c}_{m}' AS metric, {c}_{m} AS value FROM pp"
        for c in ["view", "click", "purchase", "signup", "error"]
        for m in ("avg_load_time", "p95_load_time")
    )
    + "\n) WHERE value IS NOT NULL"
)


@register("serving_unpivot", _UNPIVOT_SQL)
def q_serving_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): the wide serving pivot back to long
    (window, metric, value) rows via DataFrame.unpivot — the inverse
    of T2 and the missing half of the pivot family."""
    from realtime_analytics_pipeline_spark.operators import serving
    from realtime_analytics_pipeline_spark.operators.performance_metrics import (
        performance_metrics,
    )
    from realtime_analytics_pipeline_spark.sources.batch import load_events

    pm = performance_metrics(load_events(spark, sf_dir)).select(
        "window_start",
        "window_end",
        "device_category",
        F.round("avg_load_time", 6).alias("avg_load_time"),
        F.round("p95_load_time", 6).alias("p95_load_time"),
    )
    cats = ["view", "click", "purchase", "signup", "error"]
    wide = serving.pivot_performance_metrics(pm, cats).select(
        F.unix_millis("window_start").alias("window_start_ms"),
        *[
            F.col(f"{c}_{m}")
            for c in cats
            for m in ("avg_load_time", "p95_load_time")
        ],
    )
    value_cols = [
        f"{c}_{m}" for c in cats for m in ("avg_load_time", "p95_load_time")
    ]
    return (
        wide.unpivot(
            ["window_start_ms"], value_cols, "metric", "value"
        )
        .where(F.col("value").isNotNull())
        .select("window_start_ms", "metric", F.round("value", 6).alias("value"))
    )


_GAPFILL_SQL = """
WITH daily AS (
    SELECT event_type, (epoch_ms(ts) // 86400000) * 86400000 AS day_ms, count(*) AS n
    FROM events GROUP BY 1, 2
),
bounds AS (
    SELECT (min(epoch_ms(ts)) // 86400000) AS d0, (max(epoch_ms(ts)) // 86400000) AS d1 FROM events
),
spine AS (
    SELECT t.event_type, (d0 + u.i) * 86400000 AS day_ms
    FROM bounds, (SELECT DISTINCT event_type FROM events) t,
         (SELECT unnest(range(0, 100000)) AS i) u
    WHERE d0 + u.i <= d1
)
SELECT s.event_type, s.day_ms,
       CAST(coalesce(d.n, 0) AS BIGINT) AS n,
       CAST(round(avg(coalesce(d.n, 0)) OVER (
           PARTITION BY s.event_type ORDER BY s.day_ms
           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS DOUBLE) AS ma7
FROM spine s LEFT JOIN daily d ON s.event_type = d.event_type AND s.day_ms = d.day_ms
"""


@register("events_daily_gapfill_ma7", _GAPFILL_SQL)
def q_gapfill_ma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling + trailing moving average: a generated
    date spine (sequence/explode — the distributed generate_series)
    LEFT-joined to daily counts, zero-filled, then a 7-day ROWS-frame
    mean per type. The gap fill is what makes a ROWS frame equal a
    RANGE-interval frame — missing days would silently shrink the
    window otherwise. Spine is #days × #types rows (tiny vs facts);
    one window shuffle on event_type."""
    ev = load_events(spark, sf_dir)
    day = (F.unix_millis("event_time") / F.lit(86400000)).cast("long")
    daily = (
        ev.select("event_type", day.alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bounds = ev.agg(
        F.min(day).alias("d0"), F.max(day).alias("d1")
    )
    types = ev.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day"),
    )
    joined = spine.join(daily, ["event_type", "day"], "left").select(
        "event_type",
        (F.col("day") * 86400000).alias("day_ms"),
        F.coalesce("n", F.lit(0)).cast("long").alias("n"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day_ms")
        .rowsBetween(-6, Window.currentRow)
    )
    return joined.withColumn(
        "ma7", F.round(F.avg("n").over(w), 6).cast("double")
    )


_CUBE_SQL = """
WITH base AS (
    SELECT (epoch_ms(ts) // 86400000) * 86400000 AS day_ms, event_type FROM events
)
SELECT day_ms, event_type,
       CAST(grouping(day_ms) * 2 + grouping(event_type) AS BIGINT) AS gid,
       count(*) AS n
FROM base
GROUP BY CUBE(day_ms, event_type)
HAVING count(*) >= 5
"""


@register("events_cube_day_type", _CUBE_SQL)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation (all four grouping sets of day × type) with
    grouping_id disambiguating the NULL-as-total rows — completes the
    ROLLUP/GROUPING SETS family."""
    ev = load_events(spark, sf_dir)
    day_ms = (
        (F.unix_millis("event_time") / F.lit(86400000)).cast("long")
        * F.lit(86400000)
    ).alias("day_ms")
    return (
        ev.select(day_ms, "event_type")
        .cube("day_ms", "event_type")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n"),
        )
        .where(F.col("n") >= 5)
        .select("day_ms", "event_type", "gid", "n")
    )


_ZSCORE_SQL = """
WITH stats AS (
    SELECT doc_id, source,
           len(string_split(text, ' ')) AS n_tokens,
           avg(len(string_split(text, ' '))) OVER (PARTITION BY source) AS mu,
           stddev_samp(len(string_split(text, ' '))) OVER (PARTITION BY source)
               AS sigma
    FROM documents
)
SELECT doc_id, source, n_tokens,
       round((n_tokens - mu) / sigma, 6) AS z_score
FROM stats
"""

_ZSCORE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("source", StringType()),
        StructField("n_tokens", LongType()),
        StructField("z_score", DoubleType()),
    ]
)


@register("doc_length_zscores", _ZSCORE_SQL)
def q_zscores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map transform (applyInPandas): per-source token-length
    z-scores. The normalization needs whole-group context — the shape
    where grouped pandas beats window functions for real feature
    engineering (here verifiable against a window-function oracle)."""

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["n_tokens"].mean()
        sigma = pdf["n_tokens"].std(ddof=1)
        out = pdf[["doc_id", "source", "n_tokens"]].copy()
        out["z_score"] = ((pdf["n_tokens"] - mu) / sigma).round(6)
        return out

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    return docs.groupBy("source").applyInPandas(normalize, _ZSCORE_SCHEMA)


_DRIFT_SQL = """
WITH daily AS (
    SELECT event_type,
           (epoch_ms(ts) // 86400000) * 86400000 AS day_ms,
           avg(value) AS day_avg,
           count(*) AS n
    FROM events WHERE value IS NOT NULL
    GROUP BY 1, 2
),
overall AS (
    SELECT event_type, avg(value) AS g_avg, stddev_samp(value) AS g_std
    FROM events WHERE value IS NOT NULL
    GROUP BY 1
)
SELECT d.event_type, d.day_ms,
       round(d.day_avg, 6) AS day_avg,
       d.n,
       round((d.day_avg - o.g_avg) / (o.g_std / sqrt(d.n)), 6) AS z,
       abs(round((d.day_avg - o.g_avg) / (o.g_std / sqrt(d.n)), 6)) > 3.0
           AS drifted
FROM daily d JOIN overall o ON d.event_type = o.event_type
"""


@register("value_drift_daily", _DRIFT_SQL)
def q_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality drift monitoring: each (event_type, day)'s
    mean value as a z-score against the type's overall distribution
    (standard error of the daily mean), with a |z| > 3 drift flag —
    the cheap monitor a data pipeline runs per ingestion window. Two
    partial→final aggregations + a per-type (broadcastable: one row
    per type) join; no window functions needed."""
    from pyspark.sql import functions as F

    ev = load_events(spark, sf_dir).where(F.col("value").isNotNull())
    day_ms = (
        F.expr("unix_millis(event_time) DIV 86400000") * F.lit(86400000)
    ).alias("day_ms")
    daily = ev.select("event_type", day_ms, "value").groupBy(
        "event_type", "day_ms"
    ).agg(
        F.avg("value").alias("day_avg"), F.count(F.lit(1)).alias("n")
    )
    overall = ev.groupBy("event_type").agg(
        F.avg("value").alias("g_avg"),
        F.stddev_samp("value").alias("g_std"),
    )
    z = F.round(
        (F.col("day_avg") - F.col("g_avg"))
        / (F.col("g_std") / F.sqrt(F.col("n"))),
        6,
    )
    return daily.join(F.broadcast(overall), "event_type").select(
        "event_type",
        "day_ms",
        F.round("day_avg", 6).alias("day_avg"),
        "n",
        z.alias("z"),
        (F.abs(z) > 3.0).alias("drifted"),
    )


_TREND_SQL = """
SELECT event_type,
       round(regr_slope(value, (epoch_ms(ts) - 1704067200000) / 86400000.0), 6)
           AS slope_per_day,
       round(regr_intercept(value, (epoch_ms(ts) - 1704067200000) / 86400000.0), 6)
           AS intercept,
       round(regr_r2(value, (epoch_ms(ts) - 1704067200000) / 86400000.0), 6)
           AS r2,
       count(value) AS n
FROM events
WHERE value IS NOT NULL
GROUP BY event_type
"""


@register("value_trend_by_type", _TREND_SQL)
def q_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type linear trend of value over time via the built-in
    regression aggregates (regr_slope/intercept/r2) — one
    partial→final aggregation, JVM-side; x is days since the corpus
    epoch so slopes sit in a round-6-stable range."""
    from pyspark.sql import functions as F

    ev = load_events(spark, sf_dir).where(F.col("value").isNotNull())
    x = (
        (F.unix_millis("event_time") - F.lit(1704067200000))
        / F.lit(86400000.0)
    )
    return ev.groupBy("event_type").agg(
        F.round(F.regr_slope("value", x), 6).alias("slope_per_day"),
        F.round(F.regr_intercept("value", x), 6).alias("intercept"),
        F.round(F.regr_r2("value", x), 6).alias("r2"),
        F.count("value").alias("n"),
    )


_FUNNEL_SQL = """
WITH v AS (
    SELECT user_id, min(ts) AS v_ts FROM events
    WHERE event_type = 'view' GROUP BY user_id
),
c AS (
    SELECT e.user_id, min(e.ts) AS c_ts
    FROM events e JOIN v ON e.user_id = v.user_id
    WHERE e.event_type = 'click' AND e.ts >= v.v_ts
    GROUP BY e.user_id
),
p AS (
    SELECT e.user_id, min(e.ts) AS p_ts
    FROM events e JOIN c ON e.user_id = c.user_id
    WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
    GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM v) AS viewed,
       (SELECT count(*) FROM c) AS clicked_after_view,
       (SELECT count(*) FROM p) AS purchased_after_click,
       round((SELECT count(*) FROM p) * 1.0
             / (SELECT count(*) FROM v), 6) AS view_to_purchase_rate
"""


@register("funnel_view_click_purchase", _FUNNEL_SQL)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → click → purchase): each stage's first
    event must occur AT OR AFTER the previous stage's first event —
    the order constraint is what distinguishes a funnel from three
    independent counts. Three conditional-min aggregations chained by
    joins on user_id (same key ⇒ the exchanges reuse); final counts
    are three 1-row aggregates cross-joined."""
    from pyspark.sql import functions as F

    ev = load_events(spark, sf_dir)
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("event_time").alias("v_ts"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("event_time") >= F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("event_time").alias("c_ts"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("event_time") >= F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("event_time").alias("p_ts"))
    )
    viewed = v.agg(F.count(F.lit(1)).alias("viewed"))
    clicked = c.agg(F.count(F.lit(1)).alias("clicked_after_view"))
    purchased = p.agg(F.count(F.lit(1)).alias("purchased_after_click"))
    return (
        viewed.crossJoin(clicked)
        .crossJoin(purchased)
        .select(
            "viewed",
            "clicked_after_view",
            "purchased_after_click",
            F.round(
                F.col("purchased_after_click") / F.col("viewed"), 6
            ).alias("view_to_purchase_rate"),
        )
    )


_SCD2_SQL = """
WITH daily AS (
    SELECT o_custkey, o_orderdate,
           sum(CAST(o_totalprice AS DECIMAL(18,2))) AS day_spend
    FROM orders
    GROUP BY 1, 2
)
SELECT o_custkey AS custkey,
       epoch_ms(o_orderdate) AS valid_from_ms,
       epoch_ms(lead(o_orderdate) OVER w) AS valid_to_ms,
       CAST(sum(day_spend) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate
           ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_spend,
       (lead(o_orderdate) OVER w IS NULL) AS is_current
FROM daily
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate)
"""


@register("customer_spend_scd2", _SCD2_SQL)
def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 (slowly-changing-dimension type 2) shape: each customer's
    cumulative spend as versioned rows with [valid_from, valid_to)
    intervals — valid_to = next change's date (lead), NULL ⇒ current
    row. Exact DECIMAL running sum (emitted as double); one window
    shuffle on the dimension key."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_custkey"), F.col("o_orderdate")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("day_spend")
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    cum = Window.partitionBy("o_custkey").orderBy("o_orderdate").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    nxt = F.lead("o_orderdate").over(w)
    return daily.select(
        F.col("o_custkey").alias("custkey"),
        F.unix_millis("o_orderdate").alias("valid_from_ms"),
        F.unix_millis(nxt).alias("valid_to_ms"),
        F.sum("day_spend").over(cum).cast("double").alias("cum_spend"),
        nxt.isNull().alias("is_current"),
    )


_DQ_SQL = """
SELECT 'orders_custkey_fk' AS rule, (
    SELECT count(*) FROM orders
    WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
) AS violations
UNION ALL
SELECT 'lineitem_orderkey_fk', (
    SELECT count(*) FROM lineitem
    WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
)
UNION ALL
SELECT 'lineitem_quantity_range', (
    SELECT count(*) FROM lineitem WHERE l_quantity <= 0 OR l_quantity > 50
)
UNION ALL
SELECT 'lineitem_discount_range', (
    SELECT count(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 1
)
UNION ALL
SELECT 'events_event_id_unique', (
    SELECT count(*) - count(DISTINCT event_id) FROM events
)
UNION ALL
SELECT 'events_type_nonnull', (
    SELECT count(*) FROM events WHERE event_type IS NULL
)
"""


@register("dq_constraint_report", _DQ_SQL)
def q_dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality constraint report: each rule (FK integrity via
    anti join, range checks, uniqueness, non-null) contributes one
    (rule, violations) row. Every rule is a filter/anti-join count —
    all pushdown-friendly; the FK anti joins build their key sets from
    the dimension side, which AQE broadcasts when small."""
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")

    def one(rule: str, cnt_df):
        return cnt_df.select(
            F.lit(rule).alias("rule"), F.col("violations")
        )

    fk_orders = one(
        "orders_custkey_fk",
        orders.join(
            customer, orders["o_custkey"] == customer["c_custkey"], "left_anti"
        ).agg(F.count(F.lit(1)).alias("violations")),
    )
    fk_lines = one(
        "lineitem_orderkey_fk",
        lineitem.join(
            orders, lineitem["l_orderkey"] == orders["o_orderkey"], "left_anti"
        ).agg(F.count(F.lit(1)).alias("violations")),
    )
    qty = one(
        "lineitem_quantity_range",
        lineitem.where(
            (F.col("l_quantity") <= 0) | (F.col("l_quantity") > 50)
        ).agg(F.count(F.lit(1)).alias("violations")),
    )
    disc = one(
        "lineitem_discount_range",
        lineitem.where(
            (F.col("l_discount") < 0) | (F.col("l_discount") > 1)
        ).agg(F.count(F.lit(1)).alias("violations")),
    )
    uniq = one(
        "events_event_id_unique",
        ev.agg(
            (F.count(F.lit(1)) - F.countDistinct("event_id")).alias(
                "violations"
            )
        ),
    )
    nonnull = one(
        "events_type_nonnull",
        ev.where(F.col("event_type").isNull()).agg(
            F.count(F.lit(1)).alias("violations")
        ),
    )
    return fk_orders.union(fk_lines).union(qty).union(disc).union(uniq).union(nonnull)


# --------------------------------------------------------------------------
# Distribution analytics: entropy, decay weighting, concentration
# --------------------------------------------------------------------------

_ENTROPY_SQL = """
WITH tc AS (
    SELECT CAST(user_id AS VARCHAR) AS user_id, event_type, count(*) AS c
    FROM events GROUP BY 1, 2)
SELECT user_id,
       CAST(sum(c) AS BIGINT) AS n_events,
       count(*) AS n_types,
       round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6) + 0.0 AS entropy
FROM tc GROUP BY 1
"""


@register("events_user_entropy", _ENTROPY_SQL)
def q_user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Shannon entropy of the event-type distribution via the
    single-pass identity H = ln(N) − Σ c·ln(c)/N — two partial-agg
    stages, no per-user probability materialization. ``+ 0.0``
    normalizes a −0.0 from the last-ULP cancellation when a user has
    one event type (H ≡ 0)."""
    ev = load_events(spark, sf_dir)
    tc = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    return tc.groupBy("user_id").agg(
        F.sum("c").alias("n_events"),
        F.count(F.lit(1)).alias("n_types"),
        (
            F.round(
                F.log(F.sum("c"))
                - F.sum(F.col("c") * F.log("c")) / F.sum("c"),
                6,
            )
            + F.lit(0.0)
        ).alias("entropy"),
    )


_DECAYED_SQL = """
WITH ref AS (SELECT max(epoch_ms(ts)) AS max_ms FROM events)
SELECT CAST(user_id AS VARCHAR) AS user_id,
       count(*) AS n_events,
       round(sum(value * exp(-((max_ms - epoch_ms(ts)) / 86400000.0) / 7.0)),
             6) + 0.0 AS decayed_value,
       round(sum(exp(-((max_ms - epoch_ms(ts)) / 86400000.0) / 7.0)),
             6) + 0.0 AS decayed_count
FROM events, ref
GROUP BY 1
"""


@register("events_decayed_engagement", _DECAYED_SQL)
def q_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed engagement (τ = 7 days, reference =
    corpus max event time) — the ranking-signal decay pattern expressed
    as ONE distributed aggregation: the weight is a closed-form column
    expression, so no recursion, no window, no state. The scalar
    reference time is a 1-row broadcast."""
    ev = load_events(spark, sf_dir)
    ref = ev.agg(F.max(F.unix_millis("event_time")).alias("max_ms"))
    age_days = (
        (F.col("max_ms") - F.unix_millis("event_time")) / F.lit(86400000.0)
    )
    weight = F.exp(-age_days / F.lit(7.0))
    return (
        ev.crossJoin(F.broadcast(ref))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.round(F.sum(F.col("value") * weight), 6) + F.lit(0.0)).alias(
                "decayed_value"
            ),
            (F.round(F.sum(weight), 6) + F.lit(0.0)).alias("decayed_count"),
        )
    )


_GINI_SQL = """
WITH rev AS (
    SELECT o_custkey, sum(CAST(o_totalprice AS DOUBLE)) AS r
    FROM orders GROUP BY 1),
ranked AS (
    SELECT r, row_number() OVER (ORDER BY r, o_custkey) AS i,
           count(*) OVER () AS n, sum(r) OVER () AS tot
    FROM rev)
SELECT CAST(max(n) AS BIGINT) AS n_customers,
       round(max(tot), 2) AS total_revenue,
       round(2.0 * sum(i * r) / (max(n) * max(tot))
             - (max(n) + 1.0) / max(n), 6) + 0.0 AS gini
FROM ranked
"""


@register("customers_gini_revenue", _GINI_SQL)
def q_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue concentration via the
    rank identity G = 2·Σ i·x₍ᵢ₎ / (n·Σx) − (n+1)/n (ties broken by
    custkey for determinism).

    Scale note: the global rank is an inherent order statistic, but it
    runs over the per-customer AGGREGATE (one row per customer, not
    per order) — the same pre-aggregate-then-sort shape as
    customers_revenue_pareto. At extreme customer counts the
    rank-free ECDF approximation over quantile buckets is the
    documented fallback."""
    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("double")).alias("r")
    )
    w = Window.orderBy("r", "o_custkey")
    ranked = rev.select("r", F.row_number().over(w).alias("i"))
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("r").alias("tot"),
        F.sum(F.col("i") * F.col("r")).alias("s"),
    )
    return agg.select(
        F.col("n").alias("n_customers"),
        F.round("tot", 2).alias("total_revenue"),
        (
            F.round(
                F.lit(2.0) * F.col("s") / (F.col("n") * F.col("tot"))
                - (F.col("n") + F.lit(1.0)) / F.col("n"),
                6,
            )
            + F.lit(0.0)
        ).alias("gini"),
    )


_INC_MERGE_SQL = """
SELECT (epoch_ms(ts) // 86400000) * 86400000 AS day_ms,
       event_type,
       count(*) AS n,
       round(sum(value), 6) + 0.0 AS value_sum
FROM events GROUP BY 1, 2
"""


@register("incremental_metric_merge", _INC_MERGE_SQL)
def q_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-materialization correctness: the corpus is split
    into two overlapping-key partial aggregates (odd/even event_id —
    every (day, type) group spans both), each aggregated independently,
    then MERGED by re-aggregating the mergeable partials (count→sum,
    sum→sum). The oracle is the direct one-shot aggregation — merge
    must be exact. Rounding happens only after the merge."""
    ev = load_table(spark, sf_dir, "events")
    from realtime_analytics_pipeline_spark.schema import raw_ts_ms

    day_ms = (
        (raw_ts_ms(ev) / F.lit(86400000)).cast("long") * F.lit(86400000)
    ).alias("day_ms")
    base = ev.select(
        day_ms, "event_type", "value", (F.col("event_id") % 2).alias("par")
    )
    partials = [
        base.where(F.col("par") == p)
        .groupBy("day_ms", "event_type")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum("value").alias("pv"),
        )
        for p in (0, 1)
    ]
    merged = (
        partials[0]
        .unionByName(partials[1])
        .groupBy("day_ms", "event_type")
        .agg(F.sum("pn").alias("n"), F.sum("pv").alias("vs"))
    )
    return merged.select(
        "day_ms",
        "event_type",
        "n",
        (F.round("vs", 6) + F.lit(0.0)).alias("value_sum"),
    )


_MONTHLY_GROWTH_SQL = """
WITH monthly AS (
    SELECT CAST(year(o_orderdate) AS INTEGER) AS y,
           CAST(month(o_orderdate) AS INTEGER) AS m,
           count(*) AS n_orders,
           round(sum(CAST(o_totalprice AS DOUBLE)), 2) AS revenue
    FROM orders GROUP BY 1, 2)
SELECT y, m, n_orders, revenue,
       round(100.0 * (revenue - lag(revenue) OVER w) / lag(revenue) OVER w,
             6) AS mom_pct,
       round(100.0 * (revenue - lag(revenue, 12) OVER w)
             / lag(revenue, 12) OVER w, 6) AS yoy_pct
FROM monthly WINDOW w AS (ORDER BY y, m)
"""


@register("orders_monthly_growth", _MONTHLY_GROWTH_SQL)
def q_monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month and year-over-year revenue growth: the lag
    window runs over the MONTHLY aggregate (bounded rows), and pct
    change divides pre-rounded revenues so both engines divide
    identical doubles. Timezone-safe because every loader pins the
    session to UTC and o_orderdate is a naive timestamp."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum(F.col("o_totalprice").cast("double")), 2).alias(
            "revenue"
        ),
    )
    w = Window.orderBy("y", "m")
    mom = F.lag("revenue").over(w)
    yoy = F.lag("revenue", 12).over(w)
    return monthly.select(
        "y",
        "m",
        "n_orders",
        "revenue",
        F.round(F.lit(100.0) * (F.col("revenue") - mom) / mom, 6).alias(
            "mom_pct"
        ),
        F.round(F.lit(100.0) * (F.col("revenue") - yoy) / yoy, 6).alias(
            "yoy_pct"
        ),
    )


_HOURLY_SEASONALITY_SQL = """
SELECT event_type,
       CAST((epoch_ms(ts) // 3600000) % 24 AS BIGINT) AS hour_of_day,
       count(*) AS n,
       round(count(*) * 1.0
             / sum(count(*)) OVER (PARTITION BY event_type), 6) AS share
FROM events GROUP BY 1, 2
"""


@register("events_hourly_seasonality", _HOURLY_SEASONALITY_SQL)
def q_hourly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day activity profile per event type with within-type
    share — the hour bucket is pure epoch arithmetic ((ms // 3600000)
    % 24), immune to session timezone on both engines."""
    ev = load_table(spark, sf_dir, "events")
    from realtime_analytics_pipeline_spark.schema import raw_ts_ms

    hod = ((raw_ts_ms(ev) / F.lit(3600000)).cast("long") % 24).alias(
        "hour_of_day"
    )
    counts = ev.select("event_type", hod).groupBy(
        "event_type", "hour_of_day"
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type")
    return counts.select(
        "event_type",
        "hour_of_day",
        "n",
        F.round(F.col("n") / F.sum("n").over(w), 6).alias("share"),
    )


_GROUPING_SETS_SQL = """
SELECT event_type,
       (epoch_ms(ts) // 86400000) * 86400000 AS day_ms,
       CAST(grouping(event_type) AS INTEGER) * 2
           + CAST(grouping((epoch_ms(ts) // 86400000) * 86400000)
                  AS INTEGER) AS gid,
       count(*) AS n,
       round(sum(value), 6) + 0.0 AS value_sum
FROM events
GROUP BY GROUPING SETS ((event_type, day_ms), (event_type), (day_ms), ())
"""


@register("events_grouping_sets", _GROUPING_SETS_SQL)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with a portable grouping-flag id
    (grouping(a)·2 + grouping(b)) — the generalized rollup surface;
    one shuffle, Catalyst expands the sets map-side."""
    ev = load_table(spark, sf_dir, "events")
    from realtime_analytics_pipeline_spark.schema import raw_ts_ms

    base = ev.select(
        "event_type",
        ((raw_ts_ms(ev) / F.lit(86400000)).cast("long") * F.lit(86400000)).alias(
            "day_ms"
        ),
        "value",
    )
    base.createOrReplaceTempView("_gs_events")
    return base.sparkSession.sql(
        """
        SELECT event_type, day_ms,
               CAST(grouping(event_type) AS INT) * 2
                   + CAST(grouping(day_ms) AS INT) AS gid,
               count(*) AS n,
               round(sum(value), 6) + 0.0 AS value_sum
        FROM _gs_events
        GROUP BY GROUPING SETS ((event_type, day_ms), (event_type),
                                (day_ms), ())
        """
    )


_BITMAP_DISTINCT_SQL = """
SELECT (epoch_ms(ts) // 86400000) * 86400000 AS day_ms,
       count(*) AS n_events,
       count(DISTINCT user_id) AS distinct_users
FROM events GROUP BY 1
"""


@register("events_distinct_users_bitmap", _BITMAP_DISTINCT_SQL)
def q_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT daily distinct users via Spark's bitmap aggregates — the
    mergeable exact-distinct pattern: per-(day, hour, bucket) bitmaps
    built map-side, OR-merged hour→day (proving re-aggregability the
    way HLL sketches merge, but lossless), then summed across disjoint
    buckets. At 100 TB this replaces the count-distinct shuffle of raw
    user ids with fixed-size bitmap pages. Oracle = plain
    COUNT(DISTINCT)."""
    ev = load_table(spark, sf_dir, "events")
    from realtime_analytics_pipeline_spark.schema import raw_ts_ms

    ms = raw_ts_ms(ev)
    base = ev.select(
        ((ms / F.lit(86400000)).cast("long") * F.lit(86400000)).alias(
            "day_ms"
        ),
        ((ms / F.lit(3600000)).cast("long") * F.lit(3600000)).alias(
            "hour_ms"
        ),
        "user_id",
    )
    hourly = base.groupBy(
        "day_ms",
        "hour_ms",
        F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias(
            "bm"
        ),
        F.count(F.lit(1)).alias("n"),
    )
    daily_buckets = hourly.groupBy("day_ms", "bucket").agg(
        F.expr("bitmap_or_agg(bm)").alias("bm"), F.sum("n").alias("n")
    )
    return daily_buckets.groupBy("day_ms").agg(
        F.sum("n").alias("n_events"),
        F.sum(F.expr("bitmap_count(bm)")).alias("distinct_users"),
    )


_CONCURRENCY_SQL = """
WITH g AS (
    SELECT user_id, epoch_us(ts) AS us,
           CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                THEN 1 ELSE 0 END AS brk
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
s AS (
    SELECT user_id, us,
           sum(brk) OVER (PARTITION BY user_id ORDER BY us
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
    FROM g),
sess AS (
    SELECT user_id, sid, min(us) AS s_us, max(us) AS e_us
    FROM s GROUP BY 1, 2),
pts AS (
    SELECT us, sum(st) AS starts, sum(en) AS ends FROM (
        SELECT s_us AS us, 1 AS st, 0 AS en FROM sess
        UNION ALL
        SELECT e_us AS us, 0 AS st, 1 AS en FROM sess)
    GROUP BY 1),
sweep AS (
    SELECT us,
           starts,
           sum(starts) OVER cum - (sum(ends) OVER cum - ends) AS active
    FROM pts
    WINDOW cum AS (ORDER BY us
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT (us // 86400000000) * 86400000 AS day_ms,
       CAST(max(active) AS BIGINT) AS peak_concurrency,
       CAST(sum(starts) AS BIGINT) AS n_sessions_started
FROM sweep
GROUP BY 1
"""


@register("sessions_max_concurrency_daily", _CONCURRENCY_SQL)
def q_session_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day via the +1/−1 interval sweep:
    sessionize (native session_window, same ≥30 min break as the
    session-metrics family), collapse endpoints to a per-timestamp
    grid, and take a running starts−ends balance; a session active at
    an instant counts its start before its end (closed interval).

    Scale note: the sweep's global cumulative window runs over the
    DISTINCT endpoint timestamps of SESSIONS — two rows per session,
    aggregated — not raw events; for extreme session counts the
    documented split is per-day sweeps plus a carried-in prefix
    balance, same math, one extra day-level aggregation."""
    ev = load_events(spark, sf_dir)
    sess = ev.groupBy(
        "user_id", F.session_window("event_time", "30 minutes")
    ).agg(
        F.unix_micros(F.min("event_time")).alias("s_us"),
        F.unix_micros(F.max("event_time")).alias("e_us"),
    )
    pts = (
        sess.select(
            F.col("s_us").alias("us"),
            F.lit(1).alias("st"),
            F.lit(0).alias("en"),
        )
        .unionByName(
            sess.select(
                F.col("e_us").alias("us"),
                F.lit(0).alias("st"),
                F.lit(1).alias("en"),
            )
        )
        .groupBy("us")
        .agg(F.sum("st").alias("starts"), F.sum("en").alias("ends"))
    )
    cum = Window.orderBy("us").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sweep = pts.select(
        "us",
        "starts",
        (
            F.sum("starts").over(cum)
            - (F.sum("ends").over(cum) - F.col("ends"))
        ).alias("active"),
    )
    return sweep.groupBy(
        (
            (F.col("us") / F.lit(86400000000)).cast("long")
            * F.lit(86400000)
        ).alias("day_ms")
    ).agg(
        F.max("active").alias("peak_concurrency"),
        F.sum("starts").alias("n_sessions_started"),
    )


_RATE_LIMIT_SQL = """
WITH ranked AS (
    SELECT event_id, user_id, event_type, ts,
           row_number() OVER (
               PARTITION BY user_id, (epoch_ms(ts) // 300000)
               ORDER BY ts, event_id) AS rn
    FROM events)
SELECT CAST(event_id AS VARCHAR) AS event_id,
       CAST(user_id AS VARCHAR) AS user_id,
       event_type,
       epoch_ms(ts) AS ts_ms
FROM ranked WHERE rn = 1
"""


@register("events_rate_limited", _RATE_LIMIT_SQL)
def q_rate_limited(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Throttling / rate limiting: keep the FIRST event per user per
    5-minute bucket (deterministic ts, event_id order) — the ingestion
    de-noising pass; one shuffle keyed (user, bucket)."""
    ev = load_events(spark, sf_dir)
    bucket = (F.unix_millis("event_time") / F.lit(300000)).cast("long")
    w = Window.partitionBy("user_id", bucket).orderBy(
        "event_time", F.col("event_id").cast("long")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.unix_millis("event_time").alias("ts_ms"),
        )
    )


_LINEAR_ATTR_SQL = """
WITH touches AS (
    SELECT p.event_id AS purchase_id,
           p.user_id,
           p.value AS revenue,
           count(*) OVER (PARTITION BY p.event_id) AS n_touches,
           v.event_id AS view_id,
           epoch_ms(v.ts) AS view_ms
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id
     AND v.ts <= p.ts
     AND v.ts >= p.ts - INTERVAL 1 HOUR)
SELECT (view_ms // 86400000) * 86400000 AS day_ms,
       count(*) AS n_credited_views,
       count(DISTINCT purchase_id) AS n_purchases,
       round(sum(coalesce(revenue, 0) / n_touches), 6) + 0.0
           AS attributed_revenue
FROM touches
GROUP BY 1
"""


@register("attribution_linear_credit", _LINEAR_ATTR_SQL)
def q_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch LINEAR attribution: every view within the 1 h
    lookback of a purchase shares the purchase's revenue equally
    (1/n_touches each), rolled up to the day the touch happened — the
    complement of the as-of join's last-touch model. The fan-out join
    is user-keyed + time-bounded (state-bounded streaming twin:
    streaming_interval_join); credit division happens on pre-aggregated
    integer touch counts so both engines divide identical values."""
    ev = load_events(spark, sf_dir)
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("u"),
        F.col("event_time").alias("p_time"),
        F.col("value").alias("revenue"),
    )
    v = ev.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("u"),
        F.col("event_id").alias("view_id"),
        F.col("event_time").alias("v_time"),
    )
    touches = p.join(
        v,
        (p["u"] == v["u"])
        & (v["v_time"] <= p["p_time"])
        & (v["v_time"] >= p["p_time"] - F.expr("INTERVAL 1 HOUR")),
    )
    wt = Window.partitionBy("purchase_id")
    credited = touches.select(
        "purchase_id",
        "revenue",
        F.unix_millis("v_time").alias("view_ms"),
        F.count(F.lit(1)).over(wt).alias("n_touches"),
    )
    day = (F.col("view_ms") / F.lit(86400000)).cast("long") * F.lit(
        86400000
    )
    return credited.groupBy(day.alias("day_ms")).agg(
        F.count(F.lit(1)).alias("n_credited_views"),
        F.count_distinct("purchase_id").alias("n_purchases"),
        (
            F.round(
                F.sum(
                    F.coalesce("revenue", F.lit(0.0)) / F.col("n_touches")
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("attributed_revenue"),
    )


_TWA_SQL = """
WITH pts AS (
    SELECT event_type,
           (epoch_ms(ts) // 86400000) * 86400000 AS day_ms,
           epoch_ms(ts) AS ms, value
    FROM events WHERE value IS NOT NULL),
seg AS (
    SELECT event_type, day_ms, value,
           coalesce(lead(ms) OVER (PARTITION BY event_type, day_ms
                                   ORDER BY ms, value),
                    day_ms + 86400000) - ms AS dt
    FROM pts)
SELECT event_type, day_ms,
       count(*) AS n_points,
       round(sum(value * dt) / sum(dt), 6) + 0.0 AS time_weighted_avg
FROM seg GROUP BY 1, 2
"""


@register("events_time_weighted_avg_daily", _TWA_SQL)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-WEIGHTED daily average (gauge semantics): each reading
    holds until the next one (last one until day end), so sparse busy
    periods don't drown quiet ones the way a plain AVG does. One
    window pass per (type, day) + one aggregation; integer millisecond
    weights keep both engines on identical arithmetic until the final
    division."""
    ev = load_table(spark, sf_dir, "events")
    from realtime_analytics_pipeline_spark.schema import raw_ts_ms

    ms = raw_ts_ms(ev)
    pts = ev.where(F.col("value").isNotNull()).select(
        "event_type",
        ((ms / F.lit(86400000)).cast("long") * F.lit(86400000)).alias(
            "day_ms"
        ),
        ms.alias("ms"),
        "value",
    )
    w = Window.partitionBy("event_type", "day_ms").orderBy("ms", "value")
    seg = pts.select(
        "event_type",
        "day_ms",
        "value",
        (
            F.coalesce(
                F.lead("ms").over(w), F.col("day_ms") + F.lit(86400000)
            )
            - F.col("ms")
        ).alias("dt"),
    )
    return seg.groupBy("event_type", "day_ms").agg(
        F.count(F.lit(1)).alias("n_points"),
        (
            F.round(
                F.sum(F.col("value") * F.col("dt")) / F.sum("dt"), 6
            )
            + F.lit(0.0)
        ).alias("time_weighted_avg"),
    )


_BOUNCE_SQL = """
WITH flagged AS (
    SELECT user_id, ts,
           CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                THEN 1 ELSE 0 END AS is_new
    FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
islands AS (
    SELECT user_id, ts,
           sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING) AS island
    FROM flagged),
sess AS (
    SELECT user_id, island,
           (epoch_ms(min(ts)) // 86400000) * 86400000 AS day_ms,
           count(*) AS page_count
    FROM islands GROUP BY 1, 2)
SELECT day_ms,
       count(*) AS n_sessions,
       CAST(sum(CASE WHEN page_count = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_bounces,
       round(sum(CASE WHEN page_count = 1 THEN 1 ELSE 0 END) * 1.0
             / count(*), 6) AS bounce_rate
FROM sess GROUP BY 1
"""


@register("sessions_bounce_rate_daily", _BOUNCE_SQL)
def q_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate: share of sessions with a single event,
    attributed to the day the session STARTED (native session_window,
    same ≥30 min break as the session-metrics family)."""
    ev = load_events(spark, sf_dir)
    sess = ev.groupBy(
        "user_id", F.session_window("event_time", "30 minutes")
    ).agg(
        F.unix_millis(F.min("event_time")).alias("start_ms"),
        F.count(F.lit(1)).alias("page_count"),
    )
    day = (F.col("start_ms") / F.lit(86400000)).cast("long") * F.lit(
        86400000
    )
    bounce = F.when(F.col("page_count") == 1, 1).otherwise(0)
    return sess.groupBy(day.alias("day_ms")).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(bounce).alias("n_bounces"),
        F.round(F.sum(bounce) / F.count(F.lit(1)), 6).alias("bounce_rate"),
    )


_DAILY_PCTL_SQL = """
SELECT event_type,
       (epoch_ms(ts) // 86400000) * 86400000 AS day_ms,
       count(value) AS n,
       round(quantile_cont(value, 0.50), 6) AS p50,
       round(quantile_cont(value, 0.95), 6) AS p95,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events
WHERE value IS NOT NULL
GROUP BY 1, 2
"""


@register("performance_daily_percentiles", _DAILY_PCTL_SQL)
def q_daily_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily latency percentiles per type (p50/p95/p99, continuous
    interpolation — identical to DuckDB quantile_cont): the reference
    PerformanceTracker's percentile surface at the daily monitoring
    rollup. Exact percentiles group-locally; the approx sketch path
    (percentile_approx, accuracy-pinned in pytest) is the
    unbounded-group fallback."""
    ev = load_table(spark, sf_dir, "events")
    from realtime_analytics_pipeline_spark.schema import raw_ts_ms

    day = ((raw_ts_ms(ev) / F.lit(86400000)).cast("long") * F.lit(86400000))
    return (
        ev.where(F.col("value").isNotNull())
        .groupBy("event_type", day.alias("day_ms"))
        .agg(
            F.count("value").alias("n"),
            F.round(F.expr("percentile(value, 0.50)"), 6).alias("p50"),
            F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
            F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
        )
    )


_OHLC_SQL = """
WITH pts AS (
    SELECT event_type,
           (epoch_ms(ts) // 3600000) * 3600000 AS hour_ms,
           epoch_ms(ts) AS ms, event_id, value
    FROM events WHERE value IS NOT NULL),
ranked AS (
    SELECT event_type, hour_ms, value,
           row_number() OVER (PARTITION BY event_type, hour_ms
               ORDER BY ms, event_id) AS rn_first,
           row_number() OVER (PARTITION BY event_type, hour_ms
               ORDER BY ms DESC, event_id DESC) AS rn_last
    FROM pts)
SELECT event_type, hour_ms,
       count(*) AS n,
       round(max(CASE WHEN rn_first = 1 THEN value END), 6) AS open,
       round(max(value), 6) AS high,
       round(min(value), 6) AS low,
       round(max(CASE WHEN rn_last = 1 THEN value END), 6) AS close
FROM ranked GROUP BY 1, 2
"""


@register("events_ohlc_hourly", _OHLC_SQL)
def q_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candles per (type, hour): open/close are time-ordered
    first/last values (event_id tiebreak — deterministic under equal
    timestamps), high/low plain extremes; one window pass + one
    aggregation, the same shuffle key throughout."""
    ev = load_table(spark, sf_dir, "events")
    from realtime_analytics_pipeline_spark.schema import raw_ts_ms

    ms = raw_ts_ms(ev)
    pts = ev.where(F.col("value").isNotNull()).select(
        "event_type",
        ((ms / F.lit(3600000)).cast("long") * F.lit(3600000)).alias(
            "hour_ms"
        ),
        ms.alias("ms"),
        "event_id",
        "value",
    )
    wf = Window.partitionBy("event_type", "hour_ms").orderBy(
        "ms", "event_id"
    )
    wl = Window.partitionBy("event_type", "hour_ms").orderBy(
        F.col("ms").desc(), F.col("event_id").desc()
    )
    ranked = pts.select(
        "event_type",
        "hour_ms",
        "value",
        F.row_number().over(wf).alias("rn_first"),
        F.row_number().over(wl).alias("rn_last"),
    )
    return ranked.groupBy("event_type", "hour_ms").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.max(F.when(F.col("rn_first") == 1, F.col("value"))), 6
        ).alias("open"),
        F.round(F.max("value"), 6).alias("high"),
        F.round(F.min("value"), 6).alias("low"),
        F.round(
            F.max(F.when(F.col("rn_last") == 1, F.col("value"))), 6
        ).alias("close"),
    )


_EQUIDEPTH_SQL = """
WITH vals AS (
    SELECT event_type, value, count(*) AS cnt
    FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
cum AS (
    SELECT event_type, value, cnt,
           sum(cnt) OVER (PARTITION BY event_type ORDER BY value
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cum,
           sum(cnt) OVER (PARTITION BY event_type) AS n
    FROM vals),
bnd AS (
    -- decile boundary k is the DATA VALUE at 0-based rank
    -- (k*(n-1))//10: pure integer rank selection, no interpolation
    SELECT event_type, t.k, value
    FROM cum CROSS JOIN
         (SELECT unnest([1, 2, 3, 4, 5, 6, 7, 8, 9]) AS k) t
    WHERE (t.k * (n - 1)) // 10 BETWEEN cum - cnt AND cum - 1),
bounds AS (
    SELECT event_type, list(value ORDER BY k) AS bs
    FROM bnd GROUP BY 1),
assigned AS (
    SELECT e.event_type,
           len(list_filter(b.bs, x -> x < e.value)) AS bucket,
           e.value
    FROM events e JOIN bounds b ON e.event_type = b.event_type
    WHERE e.value IS NOT NULL)
SELECT event_type, bucket,
       count(*) AS n,
       round(min(value), 6) AS lo,
       round(max(value), 6) AS hi
FROM assigned GROUP BY 1, 2
"""


@register("events_value_equidepth", _EQUIDEPTH_SQL)
def q_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram (decile buckets) per type. Round-13
    exactness upgrade (closes the scale-gate float-boundary skip):
    boundaries are DISCRETE order statistics — boundary k is the data
    value at 0-based rank (k·(n−1))//10, selected by pure integer rank
    arithmetic over a cumulative histogram of DISTINCT values — so no
    interpolation arithmetic exists to diverge between engines; bucket
    assignment compares raw stored doubles. The distinct-value
    histogram also bounds the sort: the per-type window runs over
    |distinct values| rows, not the fact table, and the fact table is
    never globally sorted — one small shuffle for the histogram, a
    broadcast of 9 boundaries per type, one aggregation."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
    )
    vals = ev.groupBy("event_type", "value").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    cum = vals.select(
        "event_type",
        "value",
        "cnt",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
    )
    bnd = cum.select(
        "event_type",
        "value",
        F.explode(
            F.expr(
                "filter(sequence(1, 9),"
                " k -> (k * (n - 1)) div 10"
                " between cum - cnt and cum - 1)"
            )
        ).alias("k"),
    )
    bounds = bnd.groupBy("event_type").agg(
        F.expr(
            "transform(sort_array(collect_list(struct(k, value))),"
            " p -> p.value)"
        ).alias("bs")
    )
    assigned = ev.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        F.size(F.filter("bs", lambda x: x < F.col("value"))).alias(
            "bucket"
        ),
        "value",
    )
    return assigned.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("value"), 6).alias("lo"),
        F.round(F.max("value"), 6).alias("hi"),
    )


_ERROR_SLO_SQL = """
SELECT (epoch_ms(ts) // 300000) * 300000 AS window_start_ms,
       count(*) AS n_events,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_errors,
       round(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) * 1.0
             / count(*), 6) AS error_rate,
       sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) * 1.0
           / count(*) > 0.05 AS slo_breach
FROM events GROUP BY 1
"""


@register("events_error_slo_5m", _ERROR_SLO_SQL)
def q_error_slo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's acceptance envelope (error rate ≤ 5%) as a
    5-minute windowed monitor with a breach flag — the alerting query
    a reference operator would run against the serving store."""
    ev = load_table(spark, sf_dir, "events")
    from realtime_analytics_pipeline_spark.schema import raw_ts_ms

    win = ((raw_ts_ms(ev) / F.lit(300000)).cast("long") * F.lit(300000))
    err = F.when(F.col("event_type") == "error", 1).otherwise(0)
    return ev.groupBy(win.alias("window_start_ms")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(err).alias("n_errors"),
        F.round(F.sum(err) / F.count(F.lit(1)), 6).alias("error_rate"),
        (F.sum(err) / F.count(F.lit(1)) > 0.05).alias("slo_breach"),
    )


_NEW_RETURNING_SQL = """
WITH firsts AS (
    SELECT user_id,
           min((epoch_ms(ts) // 86400000) * 86400000) AS first_day
    FROM events GROUP BY 1),
daily AS (
    SELECT (epoch_ms(e.ts) // 86400000) * 86400000 AS day_ms,
           e.user_id, f.first_day
    FROM events e JOIN firsts f ON e.user_id = f.user_id
    GROUP BY 1, 2, 3)
SELECT day_ms,
       CAST(sum(CASE WHEN day_ms = first_day THEN 1 ELSE 0 END) AS BIGINT)
           AS new_users,
       CAST(sum(CASE WHEN day_ms != first_day THEN 1 ELSE 0 END) AS BIGINT)
           AS returning_users
FROM daily GROUP BY 1
"""


@register("events_new_vs_returning", _NEW_RETURNING_SQL)
def q_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning user split: first-seen day per user is a
    per-user aggregate joined back onto the distinct user-day set (the
    growth-accounting shape — the fact table reduces to user-days
    before any join)."""
    ev = load_table(spark, sf_dir, "events")
    from realtime_analytics_pipeline_spark.schema import raw_ts_ms

    day = ((raw_ts_ms(ev) / F.lit(86400000)).cast("long") * F.lit(86400000))
    user_days = ev.select(
        day.alias("day_ms"), "user_id"
    ).distinct()
    firsts = user_days.groupBy("user_id").agg(
        F.min("day_ms").alias("first_day")
    )
    joined = user_days.join(firsts, "user_id")
    new_flag = F.when(F.col("day_ms") == F.col("first_day"), 1).otherwise(0)
    return joined.groupBy("day_ms").agg(
        F.sum(new_flag).alias("new_users"),
        F.sum(F.lit(1) - new_flag).alias("returning_users"),
    )


_MIX_DRIFT_SQL = """
WITH monthly AS (
    SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INTEGER)
               AS ym,
           o_orderpriority AS pr, count(*) AS n
    FROM orders GROUP BY 1, 2),
shares AS (
    SELECT ym, pr, n * 1.0 / sum(n) OVER (PARTITION BY ym) AS share
    FROM monthly),
seq AS (SELECT DISTINCT ym, dense_rank() OVER (ORDER BY ym) AS r
        FROM shares)
SELECT cur.ym,
       round(sum(abs(cur.share - coalesce(prev.share, 0))), 6) AS l1_shift
FROM shares cur
JOIN seq sc ON sc.ym = cur.ym
LEFT JOIN seq sp ON sp.r = sc.r - 1
LEFT JOIN shares prev ON prev.ym = sp.ym AND prev.pr = cur.pr
WHERE sc.r > 1
GROUP BY cur.ym
"""


@register("orders_priority_mix_drift", _MIX_DRIFT_SQL)
def q_priority_mix_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month categorical-distribution drift: L1 distance
    between consecutive months' order-priority mixes (categories
    missing from the previous month contribute their full share). All
    joins run on the months×priorities aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    ym = (F.year("o_orderdate") * 100 + F.month("o_orderdate")).cast("int")
    monthly = orders.groupBy(
        ym.alias("ym"), F.col("o_orderpriority").alias("pr")
    ).agg(F.count(F.lit(1)).alias("n"))
    wm = Window.partitionBy("ym")
    shares = monthly.select(
        "ym", "pr", (F.col("n") / F.sum("n").over(wm)).alias("share")
    )
    seq = shares.select("ym").distinct().select(
        "ym", F.dense_rank().over(Window.orderBy("ym")).alias("r")
    )
    cur = shares.alias("cur").join(
        seq.alias("sc"), F.col("cur.ym") == F.col("sc.ym")
    )
    prev_seq = seq.select(
        F.col("ym").alias("pym"), (F.col("r") + 1).alias("pr_next")
    )
    prev = shares.select(
        F.col("ym").alias("p_ym"),
        F.col("pr").alias("p_pr"),
        F.col("share").alias("p_share"),
    )
    joined = (
        cur.join(
            prev_seq, F.col("sc.r") == F.col("pr_next"), "left"
        )
        .join(
            prev,
            (F.col("p_ym") == F.col("pym"))
            & (F.col("p_pr") == F.col("cur.pr")),
            "left",
        )
        .where(F.col("sc.r") > 1)
    )
    return joined.groupBy(F.col("cur.ym").alias("ym")).agg(
        F.round(
            F.sum(
                F.abs(
                    F.col("cur.share") - F.coalesce("p_share", F.lit(0.0))
                )
            ),
            6,
        ).alias("l1_shift")
    )


_STREAKS_SQL = """
WITH ud AS (
    SELECT DISTINCT CAST(user_id AS VARCHAR) AS user_id,
           (epoch_ms(ts) // 86400000) AS day_n
    FROM events),
grp AS (
    SELECT user_id, day_n,
           day_n - row_number() OVER (
               PARTITION BY user_id ORDER BY day_n) AS g
    FROM ud),
streaks AS (
    SELECT user_id, count(*) AS streak_len
    FROM grp GROUP BY user_id, g)
SELECT user_id,
       CAST(sum(streak_len) AS BIGINT) AS n_active_days,
       CAST(max(streak_len) AS BIGINT) AS longest_streak,
       count(*) AS n_streaks
FROM streaks GROUP BY 1
"""


@register("events_user_streaks", _STREAKS_SQL)
def q_user_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user: the
    gaps-and-islands grouping key (day − row_number) is constant
    exactly along consecutive runs — all on the distinct user-day set,
    one window + two aggregations."""
    ev = load_events(spark, sf_dir)
    ud = ev.select(
        "user_id",
        (F.unix_millis("event_time") / F.lit(86400000))
        .cast("long")
        .alias("day_n"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day_n")
    grp = ud.select(
        "user_id",
        "day_n",
        (F.col("day_n") - F.row_number().over(w)).alias("g"),
    )
    streaks = grp.groupBy("user_id", "g").agg(
        F.count(F.lit(1)).alias("streak_len")
    )
    return streaks.groupBy("user_id").agg(
        F.sum("streak_len").alias("n_active_days"),
        F.max("streak_len").alias("longest_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
    )


_WEEKLY_ENGAGE_SQL = """
WITH ud AS (
    SELECT DISTINCT user_id,
           (epoch_ms(ts) // 86400000) // 7 AS week_n,
           epoch_ms(ts) // 86400000 AS day_n
    FROM events),
uw AS (
    SELECT user_id, week_n, count(*) AS days_active
    FROM ud GROUP BY 1, 2)
SELECT CAST(days_active AS BIGINT) AS days_active,
       count(*) AS n_user_weeks
FROM uw GROUP BY 1
"""


@register("events_weekly_engagement_histogram", _WEEKLY_ENGAGE_SQL)
def q_weekly_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement-frequency distribution: how many user-weeks had 1-7
    active days — computed on the distinct user-day set, so the
    histogram is user-weeks-sized regardless of event rate."""
    ev = load_table(spark, sf_dir, "events")
    from realtime_analytics_pipeline_spark.schema import raw_ts_ms

    day_n = (raw_ts_ms(ev) / F.lit(86400000)).cast("long")
    ud = ev.select(
        "user_id",
        (day_n / F.lit(7)).cast("long").alias("week_n"),
        day_n.alias("day_n"),
    ).distinct()
    uw = ud.groupBy("user_id", "week_n").agg(
        F.count(F.lit(1)).alias("days_active")
    )
    return uw.groupBy("days_active").agg(
        F.count(F.lit(1)).alias("n_user_weeks")
    )


_INTERPURCHASE_SQL = """
WITH gaps AS (
    SELECT o_custkey,
           (epoch_ms(o_orderdate) - epoch_ms(lag(o_orderdate) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)))
               / 86400000.0 AS gap_days
    FROM orders)
SELECT o_custkey,
       count(*) AS n_gaps,
       round(avg(gap_days), 6) AS avg_gap_days,
       round(quantile_cont(gap_days, 0.5), 6) AS median_gap_days
FROM gaps WHERE gap_days IS NOT NULL
GROUP BY 1
"""


@register("orders_interpurchase_time", _INTERPURCHASE_SQL)
def q_interpurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer purchase cadence: average and exact median days
    between consecutive orders (orderkey tiebreak for same-day
    orders) — one window pass keyed the same as the aggregation."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    gap = (
        F.unix_millis("o_orderdate")
        - F.unix_millis(F.lag("o_orderdate").over(w))
    ) / F.lit(86400000.0)
    gaps = orders.select(
        "o_custkey", gap.alias("gap_days")
    ).where(F.col("gap_days").isNotNull())
    return gaps.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(F.avg("gap_days"), 6).alias("avg_gap_days"),
        F.round(F.expr("percentile(gap_days, 0.5)"), 6).alias(
            "median_gap_days"
        ),
    )


_SURVIVAL_SQL = """
WITH spans AS (
    SELECT user_id,
           max(epoch_ms(ts) // 86400000) - min(epoch_ms(ts) // 86400000)
               AS lifespan_days
    FROM events GROUP BY 1),
n AS (SELECT count(*) AS total FROM spans),
grid AS (SELECT unnest(range(0, 31)) AS day_n)
SELECT CAST(day_n AS BIGINT) AS day_n,
       CAST((SELECT count(*) FROM spans WHERE lifespan_days >= day_n)
            AS BIGINT) AS surviving_users,
       round((SELECT count(*) FROM spans WHERE lifespan_days >= day_n)
             * 1.0 / total, 6) AS survival_rate
FROM grid, n
"""


@register("events_survival_curve", _SURVIVAL_SQL)
def q_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-lifespan survival curve S(n) = share of users still active
    ≥ n days after their first event, n = 0..30 — per-user lifespans
    aggregate first, then a tiny grid×lifespans count (31 × users,
    on the aggregated side)."""
    ev = load_table(spark, sf_dir, "events")
    from realtime_analytics_pipeline_spark.schema import raw_ts_ms

    day = (raw_ts_ms(ev) / F.lit(86400000)).cast("long")
    spans = ev.groupBy("user_id").agg(
        (F.max(day) - F.min(day)).alias("lifespan_days")
    )
    total = spans.agg(F.count(F.lit(1)).alias("total"))
    grid = spans.sparkSession.range(0, 31).select(
        F.col("id").alias("day_n")
    )
    joined = grid.crossJoin(F.broadcast(total)).join(
        spans, F.col("lifespan_days") >= F.col("day_n"), "left"
    )
    return joined.groupBy("day_n", "total").agg(
        F.count("user_id").alias("surviving_users")
    ).select(
        "day_n",
        "surviving_users",
        F.round(F.col("surviving_users") / F.col("total"), 6).alias(
            "survival_rate"
        ),
    )


_ATTR_LATENCY_SQL = """
WITH pairs AS (
    SELECT p.event_id AS purchase_id,
           (epoch_us(p.ts) - max(epoch_us(v.ts))) / 1000000.0
               AS latency_s
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id
     AND v.ts <= p.ts
     AND v.ts >= p.ts - INTERVAL 1 HOUR
    GROUP BY p.event_id, p.ts)
SELECT count(*) AS n_attributed,
       round(avg(latency_s), 6) AS avg_latency_s,
       round(quantile_cont(latency_s, 0.5), 6) AS p50_latency_s,
       round(quantile_cont(latency_s, 0.95), 6) AS p95_latency_s,
       round(max(latency_s), 6) AS max_latency_s
FROM pairs
"""


@register("attribution_latency_stats", _ATTR_LATENCY_SQL)
def q_attribution_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View→purchase conversion latency: time from the LAST qualifying
    view (the as-of touch) to the purchase, with exact percentile
    stats — the funnel-speed metric on the time-bounded join's
    per-purchase aggregate."""
    ev = load_events(spark, sf_dir)
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("u"),
        F.col("event_time").alias("p_time"),
    )
    v = ev.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("u"), F.col("event_time").alias("v_time")
    )
    pairs = (
        p.join(
            v,
            (p["u"] == v["u"])
            & (v["v_time"] <= p["p_time"])
            & (v["v_time"] >= p["p_time"] - F.expr("INTERVAL 1 HOUR")),
        )
        .groupBy("purchase_id", "p_time")
        .agg(F.max(F.unix_micros("v_time")).alias("last_view_us"))
        .select(
            (
                (F.unix_micros("p_time") - F.col("last_view_us"))
                / F.lit(1000000.0)
            ).alias("latency_s")
        )
    )
    return pairs.agg(
        F.count(F.lit(1)).alias("n_attributed"),
        F.round(F.avg("latency_s"), 6).alias("avg_latency_s"),
        F.round(F.expr("percentile(latency_s, 0.5)"), 6).alias(
            "p50_latency_s"
        ),
        F.round(F.expr("percentile(latency_s, 0.95)"), 6).alias(
            "p95_latency_s"
        ),
        F.round(F.max("latency_s"), 6).alias("max_latency_s"),
    )


_XCORR_SQL = """
WITH daily AS (
    SELECT (epoch_ms(ts) // 86400000) * 86400000 AS day_ms,
           event_type, count(*) AS n
    FROM events GROUP BY 1, 2)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(count(*) AS BIGINT) AS n_days,
       round(corr(a.n, b.n), 6) + 0.0 AS pearson_r
FROM daily a JOIN daily b
  ON a.day_ms = b.day_ms AND a.event_type < b.event_type
GROUP BY 1, 2
"""


@register("events_type_correlation", _XCORR_SQL)
def q_type_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which event types co-move: pairwise Pearson correlation of
    daily count series (day-equi self-join on the daily aggregate —
    types² pairs × days, never the fact table)."""
    ev = load_table(spark, sf_dir, "events")
    from realtime_analytics_pipeline_spark.schema import raw_ts_ms

    day = ((raw_ts_ms(ev) / F.lit(86400000)).cast("long") * F.lit(86400000))
    daily = ev.groupBy(day.alias("day_ms"), "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    a = daily.select(
        F.col("day_ms").alias("d"),
        F.col("event_type").alias("type_a"),
        F.col("n").alias("na"),
    )
    b = daily.select(
        F.col("day_ms").alias("d2"),
        F.col("event_type").alias("type_b"),
        F.col("n").alias("nb"),
    )
    return (
        a.join(
            b,
            (F.col("d") == F.col("d2"))
            & (F.col("type_a") < F.col("type_b")),
        )
        .groupBy("type_a", "type_b")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            (F.round(F.corr("na", "nb"), 6) + F.lit(0.0)).alias(
                "pearson_r"
            ),
        )
    )


_P95_SKETCH_SQL = """
WITH binned AS (
    SELECT event_type,
           (epoch_ms(ts) // 60000) * 60000 AS minute_ms,
           CAST(floor(value / 0.5) AS BIGINT) AS bin,
           count(*) AS cnt
    FROM events
    GROUP BY 1, 2, 3
),
hourly AS (
    -- merge the per-minute sketches into hourly ones: pure count adds
    SELECT event_type, (minute_ms // 3600000) * 3600000 AS hour_ms,
           bin, sum(cnt) AS cnt
    FROM binned GROUP BY 1, 2, 3
),
cum AS (
    SELECT event_type, hour_ms, bin, cnt,
           sum(cnt) OVER (PARTITION BY event_type, hour_ms ORDER BY bin) AS cum,
           sum(cnt) OVER (PARTITION BY event_type, hour_ms) AS total
    FROM hourly
)
SELECT event_type, hour_ms,
       CAST(total AS BIGINT) AS n_events,
       min((bin + 1) * 0.5) AS p95_upper
FROM cum
WHERE 20 * cum >= 19 * total
GROUP BY 1, 2, 3
"""


@register("value_p95_sketch_rollup_1h", _P95_SKETCH_SQL)
def q_value_p95_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-quantile rollup: per-minute histogram sketches
    (fixed 0.5-wide bins) merged into hourly sketches by pure count
    addition, then p95 read off the merged cumulative counts (first
    bin whose cumulative count reaches ceil(0.95*n), compared as
    20*cum >= 19*total in exact integer arithmetic).  This is the
    sketch answer to A4's PERCENTILE(0.95) (reference
    performance_analyzer.py window p95) when windows must re-roll
    without reprocessing raw events: histograms are the mergeable
    percentile structure — counts add across any window regroup,
    which exact percentiles don't.  At 100 TB the raw scan reduces to
    (type x minute x ~1k bins) rows once, and every wider rollup is
    sketch-sized.  Error is bounded by bin width (0.5), vs the exact
    per-window percentile gated in performance_metrics_5m."""
    events = load_events(spark, sf_dir)
    binned = (
        events.groupBy(
            "event_type",
            ((F.unix_millis("event_time") / 60000).cast("bigint") * 60000).alias(
                "minute_ms"
            ),
            F.floor(F.col("value") / 0.5).cast("bigint").alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    hourly = (
        binned.groupBy(
            "event_type",
            ((F.col("minute_ms") / 3600000).cast("bigint") * 3600000).alias(
                "hour_ms"
            ),
            "bin",
        )
        .agg(F.sum("cnt").alias("cnt"))
    )
    w_cum = (
        Window.partitionBy("event_type", "hour_ms")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type", "hour_ms")
    cum = hourly.select(
        "event_type",
        "hour_ms",
        "bin",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("total"),
    )
    return (
        cum.where(F.lit(20) * F.col("cum") >= F.lit(19) * F.col("total"))
        .groupBy(
            "event_type", "hour_ms", F.col("total").alias("n_events")
        )
        .agg(F.min((F.col("bin") + 1) * 0.5).alias("p95_upper"))
    )


_ROLLING_MEDIAN_SQL = """
WITH daily AS (
    SELECT (epoch_ms(o_orderdate) // 86400000) * 86400000 AS day_ms,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_cents
    FROM orders GROUP BY 1
)
SELECT day_ms,
       CAST(rev_cents AS DOUBLE) / 100 AS revenue,
       round(quantile_cont(rev_cents, 0.5) OVER (
           ORDER BY day_ms ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
       ) / 100, 6) AS rolling_median_7d
FROM daily
"""


@register("orders_rolling_median_7d", _ROLLING_MEDIAN_SQL)
def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact PERCENTILE as a WINDOW-FRAME aggregate (7-row rolling
    median of daily revenue) — the robust-trend twin of the mean-based
    orders_rolling_aov_28d.  Daily revenue is pre-reduced to integer
    cents (exact across engines; the interpolated median of ints is a
    half-integer, also exact), so the frame percentile is
    deterministic.  At 100 TB the frame runs over the DAY-sized
    aggregate, not the fact table — one shuffle to days, then a
    single-partition frame over ~10^3 rows."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        ((F.unix_millis("o_orderdate") / 86400000).cast("bigint") * 86400000
         ).alias("day_ms")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("rev_cents")
    )
    w = Window.orderBy("day_ms").rowsBetween(-6, 0)
    return daily.select(
        "day_ms",
        (F.col("rev_cents").cast("double") / 100).alias("revenue"),
        F.round(
            F.expr("percentile(rev_cents, 0.5)").over(w) / 100, 6
        ).alias("rolling_median_7d"),
    )


# --------------------------------------------------------------------------
# Holt's linear-trend smoothing as a per-series fold (no UDF, no loop).
# --------------------------------------------------------------------------

_HOLT_SQL = """
WITH RECURSIVE monthly AS (
    SELECT o_orderpriority AS priority,
           date_trunc('month', o_orderdate) AS m,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS y
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1999-09-01'
    GROUP BY 1, 2),
series AS (
    SELECT priority, list(CAST(y AS HUGEINT) ORDER BY m) AS ys,
           CAST(power(4, count(*) - 2) AS HUGEINT) AS fix
    FROM monthly GROUP BY priority),
h AS (
    -- exact dyadic fold: V = l * 4^(n-2), W = b * 4^(n-2) stay
    -- integral at every step (each halving divides an even integer),
    -- so the recurrence is EXACT at any SF/magnitude in HUGEINT
    SELECT priority, ys, fix, 2 AS i,
           ys[1] * fix AS v,
           (ys[2] - ys[1]) * fix AS w
    FROM series WHERE len(ys) >= 3
    UNION ALL
    SELECT priority, ys, fix, i + 1,
           (ys[i + 1] * fix + v + w) // 2 AS v,
           ((ys[i + 1] * fix + v + w) // 2 - v + w) // 2 AS w
    FROM h WHERE i < len(ys)),
fin AS (
    SELECT priority, CAST(len(ys) AS BIGINT) AS n_periods, fix, v, w
    FROM h WHERE i = len(ys))
SELECT priority, n_periods,
       CAST(CASE WHEN v < 0
            THEN -((-v * 2000000 + fix) // (2 * fix))
            ELSE (v * 2000000 + fix) // (2 * fix) END AS DOUBLE)
           / 1000000 + 0.0 AS level,
       CAST(CASE WHEN w < 0
            THEN -((-w * 2000000 + fix) // (2 * fix))
            ELSE (w * 2000000 + fix) // (2 * fix) END AS DOUBLE)
           / 1000000 + 0.0 AS trend,
       CAST(CASE WHEN v + w < 0
            THEN -((-(v + w) * 2000000 + fix) // (2 * fix))
            ELSE ((v + w) * 2000000 + fix) // (2 * fix) END AS DOUBLE)
           / 1000000 + 0.0 AS forecast_next
FROM fin
"""


@register("orders_holt_forecast", _HOLT_SQL)
def q_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend exponential smoothing (alpha=beta=0.5) over
    each priority's monthly revenue series — a SEQUENTIAL model run as
    a per-series ``aggregate()`` fold over the collected series array:
    no UDF, no driver loop, one shuffle to form the series rows. The
    oracle replays the identical recurrence step-by-step in a DuckDB
    recursive CTE, so both engines execute the same IEEE double
    operation sequence (bit-identical before the final round). At
    100 TB the series rows are tiny (one per key) regardless of event
    count — the fold costs O(series length) per key after the rollup,
    the standard shape for per-entity sequential models on Spark.

    Round-13 exactness upgrade (closes the scale-gate float-boundary
    skip): the fold runs in SCALED INTEGERS — V = l·4ⁿ, W = b·4ⁿ as
    DECIMAL(38,0) on Spark / HUGEINT in the oracle, where n is the
    step count. Every recurrence halving then divides an exactly-even
    integer (V_k and W_k are divisible by 4^(n-k)), so the recurrence
    is EXACT at ANY magnitude — no 2^52 mantissa ceiling, no last-ulp
    divergence at 30-100x SFs. The final round(·, 6) is an integer
    half-away-from-zero division, and only the single final
    CAST(int → DOUBLE) rounds (nearest-even, identical both engines).
    The 24-month window keeps V under ~1e29, far inside DECIMAL(38)/
    HUGEINT range even at sf100."""
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1999-09-01").cast("timestamp")
    )
    monthly = (
        orders.groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.date_trunc("month", "o_orderdate").alias("m"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .alias("y")
        )
    )
    series = monthly.groupBy("priority").agg(
        F.expr(
            "transform(sort_array(collect_list(struct(m, y))),"
            " p -> CAST(p.y AS DECIMAL(38,0)))"
        ).alias("ys"),
        F.expr(
            "CAST(pow(4, count(*) - 2) AS DECIMAL(38,0))"
        ).alias("fix"),
    )
    folded = series.where(F.size("ys") >= 3).select(
        "priority",
        "fix",
        F.size("ys").cast("long").alias("n_periods"),
        F.expr(
            """
            aggregate(
                slice(ys, 3, size(ys) - 2),
                struct(CAST(ys[0] * fix AS DECIMAL(38,0)) AS v,
                       CAST((ys[1] - ys[0]) * fix AS DECIMAL(38,0)) AS w),
                (acc, y) -> struct(
                    CAST((y * fix + acc.v + acc.w) / 2
                         AS DECIMAL(38,0)) AS v,
                    CAST((CAST((y * fix + acc.v + acc.w) / 2
                               AS DECIMAL(38,0)) - acc.v + acc.w) / 2
                         AS DECIMAL(38,0)) AS w))
            """
        ).alias("hb"),
    )

    def _round6(expr: str) -> F.Column:
        # round-half-away-from-zero((x/fix), 6) in pure integers:
        # floor((2|x|·10^6 + fix) / (2 fix)), sign restored; the lone
        # float op is the final int→double cast (nearest, identical
        # across engines).
        return F.expr(
            f"""CAST(CASE WHEN ({expr}) < 0
                THEN -CAST((-({expr}) * 2000000 + fix) div (2 * fix)
                           AS DECIMAL(38,0))
                ELSE CAST((({expr}) * 2000000 + fix) div (2 * fix)
                          AS DECIMAL(38,0)) END AS DOUBLE)
                / 1000000 + 0.0"""
        )

    return folded.select(
        "priority",
        "n_periods",
        _round6("hb.v").alias("level"),
        _round6("hb.w").alias("trend"),
        _round6("hb.v + hb.w").alias("forecast_next"),
    )


# --------------------------------------------------------------------------
# Time-series similarity search (EDBT'19 family): most-similar user
# pairs by cosine over their daily activity series.
# --------------------------------------------------------------------------

_TS_SIM_SQL = """
WITH sample_users AS (
    -- deterministic md5-ordered fixed cap: gate cost stays flat as
    -- the SF grows (cap does not bind at sf<=0.01, so driver results
    -- are unchanged there); the UNCAPPED form stays available as the
    -- library path (user_cap=None)
    SELECT user_id FROM (SELECT DISTINCT user_id FROM events)
    ORDER BY md5(CAST(user_id AS VARCHAR)), user_id LIMIT 500),
daily AS (
    SELECT user_id, date_trunc('day', ts) AS d,
           CAST(count(*) AS BIGINT) AS c
    FROM events
    WHERE user_id IN (SELECT user_id FROM sample_users)
    GROUP BY 1, 2),
norms AS (
    SELECT user_id, sum(c * c) AS s2, count(*) AS n_days
    FROM daily GROUP BY user_id),
pair_dot AS (
    SELECT a.user_id AS u1, b.user_id AS u2,
           sum(a.c * b.c) AS dot,
           count(*) AS shared_days
    FROM daily a JOIN daily b ON a.d = b.d AND a.user_id < b.user_id
    GROUP BY 1, 2)
SELECT CAST(u1 AS BIGINT) AS u1, CAST(u2 AS BIGINT) AS u2,
       round(dot / sqrt(n1.s2 * n2.s2), 6) + 0.0 AS cos_sim,
       shared_days
FROM (
    SELECT *, row_number() OVER (
        ORDER BY dot / sqrt(n1s2 * n2s2) DESC, u1, u2) AS rnk
    FROM (
        SELECT p.*, n1.s2 AS n1s2, n2.s2 AS n2s2
        FROM pair_dot p
        JOIN norms n1 ON p.u1 = n1.user_id
        JOIN norms n2 ON p.u2 = n2.user_id))
JOIN norms n1 ON u1 = n1.user_id
JOIN norms n2 ON u2 = n2.user_id
WHERE rnk <= 10
"""


@register("users_activity_similarity", _TS_SIM_SQL)
def q_users_activity_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity search: top-10 most-similar user pairs by
    cosine over each user's daily event-count series. Sparse identity:
    with zero-filled days contributing nothing to dot products or
    norms, NO date-grid alignment is needed — pairs meet through the
    per-day inverted index (self-join on day), so the candidate space
    is Σ_day active² rather than users², the same index-bucket bound
    as the shingle and LSH joins. Integer dot/norm sums keep both
    engines exact up to the single final division, ranked on the RAW
    ratio with (u1, u2) tiebreak before any display rounding.

    GATE COST CAP (round-4): the gated form restricts to a
    deterministic md5-ordered sample of 500 users so gate wall-time
    stays flat as the SF grows. The cap does not bind at sf<=0.01
    (150 users), leaving driver-gate semantics unchanged there; pass
    user_cap=None for the exact full-corpus form. Round-10: both
    forms route through the block-pair gemm kernel (bit-exact vs the
    retired day-bucketed pair join, which survives privately as
    _users_activity_similarity_join for pytest parity) — exact
    all-pairs flops are inherently quadratic, but the kernel
    vectorizes them and emits only per-block-pair top-10 partials."""
    return _users_activity_similarity(spark, sf_dir, user_cap=500)


_TS_SIM_BLAS_SQL = """
WITH daily AS (
    SELECT user_id, date_trunc('day', ts) AS d,
           CAST(count(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2),
norms AS (
    SELECT user_id, sum(c * c) AS s2 FROM daily GROUP BY user_id),
pair_dot AS (
    SELECT a.user_id AS u1, b.user_id AS u2,
           sum(a.c * b.c) AS dot,
           count(*) AS shared_days
    FROM daily a JOIN daily b ON a.d = b.d AND a.user_id < b.user_id
    GROUP BY 1, 2)
SELECT CAST(u1 AS BIGINT) AS u1, CAST(u2 AS BIGINT) AS u2,
       round(dot / sqrt(n1.s2 * n2.s2), 6) + 0.0 AS cos_sim,
       shared_days
FROM (
    SELECT *, row_number() OVER (
        ORDER BY dot / sqrt(n1s2 * n2s2) DESC, u1, u2) AS rnk
    FROM (
        SELECT p.*, n1.s2 AS n1s2, n2.s2 AS n2s2
        FROM pair_dot p
        JOIN norms n1 ON p.u1 = n1.user_id
        JOIN norms n2 ON p.u2 = n2.user_id))
JOIN norms n1 ON u1 = n1.user_id
JOIN norms n2 ON u2 = n2.user_id
WHERE rnk <= 10
"""


def _activity_topk_gemm(daily: DataFrame) -> DataFrame:
    """Top-10 user-activity cosine pairs from a (user_id, d, c) daily
    count frame via the block-pair gemm kernel — the shared engine for
    both the gated capped form and the uncapped library path
    (round-10). Bit-exact vs the day-bucketed join form and the SQL
    oracles: integer counts keep dot and s2 exact in float64, and
    raw = dot/sqrt(s2a·s2b) is the identical IEEE op sequence."""
    from pyspark.sql import Window

    from realtime_analytics_pipeline_spark.operators.similarity_blas import (
        activity_topk_pairs_blas,
        gemm_block_count,
    )

    # ONE driver action sizes everything (n_days for the dense matrix
    # width, n_users for the block count) — the kernel's own
    # vecs.count() fallback would re-aggregate the events scan
    stats = daily.agg(
        F.countDistinct("d").alias("nd"),
        F.countDistinct("user_id").alias("nu"),
    ).collect()[0]
    n_days = stats.nd
    spine = (
        daily.select("d")
        .distinct()
        .withColumn(
            "idx",
            (
                F.row_number().over(Window.orderBy("d")) - 1
            ).cast("int"),
        )
    )
    daily_idx = daily.join(F.broadcast(spine), "d").select(
        "user_id", "idx", "c"
    )
    parts = activity_topk_pairs_blas(
        daily_idx,
        n_days,
        top_k=10,
        n_blocks=gemm_block_count(stats.nu, block_rows=4096),
    )
    w = Window.orderBy(F.col("raw").desc(), F.col("u1"), F.col("u2"))
    return (
        parts.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 10)
        .select(
            "u1",
            "u2",
            (F.round("raw", 6) + F.lit(0.0)).alias("cos_sim"),
            "shared_days",
        )
    )


@register("users_activity_similarity_blas", _TS_SIM_BLAS_SQL)
def q_users_activity_similarity_blas(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """UNCAPPED exact activity-similarity top-10 via block-pair gemm
    (round-8) — the vectorized library path the md5-capped gated form
    above points at. Unlike the embedding gemm kernels (fractional
    floats ⇒ rows-only), user-day COUNTS are integers: dot and s2 are
    exact in float64, and raw = dot/sqrt(s2a·s2b) performs the same
    IEEE op sequence as the SQL — so this form carries the FULL
    uncapped DuckDB oracle. Each block pair emits only its local
    top-10 (partial-top-k combiner); the global window merges
    ~B²/2·10 rows, never users². See
    similarity_blas.activity_topk_pairs_blas."""
    from realtime_analytics_pipeline_spark.sources.batch import load_events

    ev = load_events(spark, sf_dir)
    daily = ev.groupBy(
        F.col("user_id").cast("bigint").alias("user_id"),
        F.date_trunc("day", "event_time").alias("d"),
    ).agg(F.count("*").alias("c"))
    return _activity_topk_gemm(daily)


def _users_activity_similarity(
    spark: SparkSession, sf_dir: str, user_cap: int | None = None
) -> DataFrame:
    """Round-10: routes through the block-pair gemm kernel
    (:func:`_activity_topk_gemm`) — the day-bucketed pair-join form it
    replaced survives privately as
    :func:`_users_activity_similarity_join` for pytest parity. Output
    and oracle semantics unchanged (bit-exact; see the gemm helper)."""
    from realtime_analytics_pipeline_spark.sources.batch import load_events

    ev = load_events(spark, sf_dir)
    daily = (
        ev.groupBy(
            # canonical user_id is STRING; pair ordering must be
            # numeric or (14, 4) sorts differently than in the oracle
            F.col("user_id").cast("bigint").alias("user_id"),
            F.date_trunc("day", "event_time").alias("d"),
        )
        .agg(F.count("*").alias("c"))
    )
    if user_cap is not None:
        sample = (
            daily.select("user_id")
            .distinct()
            .orderBy(F.md5(F.col("user_id").cast("string")), "user_id")
            .limit(user_cap)
        )
        daily = daily.join(F.broadcast(sample), "user_id", "left_semi")
    return _activity_topk_gemm(daily)


def _users_activity_similarity_join(
    spark: SparkSession, sf_dir: str, user_cap: int | None = None
) -> DataFrame:
    """Historical day-bucketed pair-join form — PRIVATE pytest parity
    reference for the gemm path (round-10); not on any gated or swept
    surface. Candidate space is Σ_day active² via the per-day inverted
    index."""
    from realtime_analytics_pipeline_spark.sources.batch import load_events

    ev = load_events(spark, sf_dir)
    daily = (
        ev.groupBy(
            F.col("user_id").cast("bigint").alias("user_id"),
            F.date_trunc("day", "event_time").alias("d"),
        )
        .agg(F.count("*").alias("c"))
    )
    if user_cap is not None:
        sample = (
            daily.select("user_id")
            .distinct()
            .orderBy(F.md5(F.col("user_id").cast("string")), "user_id")
            .limit(user_cap)
        )
        daily = daily.join(F.broadcast(sample), "user_id", "left_semi")
    norms = daily.groupBy("user_id").agg(F.sum(F.col("c") * F.col("c")).alias("s2"))
    a = daily.alias("a")
    b = daily.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.d") == F.col("b.d"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .groupBy(
            F.col("a.user_id").alias("u1"), F.col("b.user_id").alias("u2")
        )
        .agg(
            F.sum(F.col("a.c") * F.col("b.c")).alias("dot"),
            F.count("*").alias("shared_days"),
        )
    )
    n1 = norms.select(
        F.col("user_id").alias("u1"), F.col("s2").alias("s2_1")
    )
    n2 = norms.select(
        F.col("user_id").alias("u2"), F.col("s2").alias("s2_2")
    )
    from pyspark.sql import Window

    scored = (
        pair.join(n1, "u1")
        .join(n2, "u2")
        .withColumn(
            "raw", F.col("dot") / F.sqrt(F.col("s2_1") * F.col("s2_2"))
        )
    )
    w = Window.orderBy(F.col("raw").desc(), F.col("u1"), F.col("u2"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 10)
        .select(
            F.col("u1").cast("bigint").alias("u1"),
            F.col("u2").cast("bigint").alias("u2"),
            (F.round("raw", 6) + F.lit(0.0)).alias("cos_sim"),
            "shared_days",
        )
    )


_DTW_EXPR = """
list_reduce(
  list_prepend(
    list_reduce(
      list_prepend([abs(xs[1]-ys[1])],
                   list_transform(range(2, len(ys)+1),
                                  j -> [CAST(j AS DOUBLE)])),
      (row, e) -> list_append(
          row, abs(xs[1]-ys[CAST(e[1] AS INT)]) + row[-1])),
    list_transform(xs[2:], x -> [x])),
  (prev, e) -> list_reduce(
      list_prepend([abs(e[1]-ys[1]) + prev[1]],
                   list_transform(range(2, len(ys)+1),
                                  j2 -> [CAST(j2 AS DOUBLE)])),
      (row, e2) -> list_append(row,
          abs(e[1]-ys[CAST(e2[1] AS INT)]) +
          least(prev[CAST(e2[1] AS INT)], row[-1],
                prev[CAST(e2[1] AS INT)-1])))
)[len(ys)]
"""

_DTW_SQL = f"""
WITH daily AS (
    SELECT event_type, date_trunc('day', ts) AS d,
           CAST(count(*) AS DOUBLE) AS c
    FROM events GROUP BY 1, 2),
series AS (
    SELECT event_type, list(c ORDER BY d) AS ys0 FROM daily GROUP BY 1),
pairs AS (
    SELECT a.event_type AS t1, b.event_type AS t2,
           a.ys0 AS xs, b.ys0 AS ys
    FROM series a JOIN series b ON a.event_type < b.event_type)
SELECT t1, t2,
       CAST(len(xs) AS BIGINT) AS len1,
       CAST(len(ys) AS BIGINT) AS len2,
       round({_DTW_EXPR}, 6) + 0.0 AS dtw
FROM pairs
"""


@register("ts_dtw_pairs", _DTW_SQL)
def q_ts_dtw_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Dynamic Time Warping between every pair of event-type
    daily-count series — the "needs a UDF" operator run entirely as
    Catalyst higher-order folds (operators/timeseries.py::dtw_distance;
    DP row as array accumulator, no Python execution). Alignment-
    tolerant complement to users_activity_similarity's lockstep
    cosine. ORACLED since round 4: the identical row-fold recurrence
    replays in DuckDB lambdas (list_reduce with the seed-by-prepend
    trick for list-typed accumulators) — integer-valued daily counts
    keep every DP cell exact in both engines, so the former rows-only
    check is now a full value-hash gate. Also verified against a
    Python reference DP in pytest (tests/test_timeseries.py), plus
    Hypothesis random-series equality."""
    from realtime_analytics_pipeline_spark.operators.timeseries import (
        dtw_distance,
    )
    from realtime_analytics_pipeline_spark.sources.batch import load_events

    ev = load_events(spark, sf_dir)
    daily = (
        ev.groupBy(
            "event_type", F.date_trunc("day", "event_time").alias("d")
        )
        .agg(F.count("*").cast("double").alias("c"))
    )
    series = daily.groupBy("event_type").agg(
        F.expr(
            "transform(sort_array(collect_list(struct(d, c))), p -> p.c)"
        ).alias("ys")
    )
    a = series.select(
        F.col("event_type").alias("t1"), F.col("ys").alias("xs")
    )
    b = series.select(
        F.col("event_type").alias("t2"), F.col("ys").alias("ys")
    )
    pairs = a.crossJoin(F.broadcast(b)).where(F.col("t1") < F.col("t2"))
    return pairs.select(
        "t1",
        "t2",
        F.size("xs").cast("bigint").alias("len1"),
        F.size("ys").cast("bigint").alias("len2"),
        (F.round(dtw_distance("xs", "ys"), 6) + F.lit(0.0)).alias("dtw"),
    ).orderBy("t1", "t2")


# --------------------------------------------------------------------------
# CEP-lite: regex pattern matching over per-user event sequences
# (the MATCH_RECOGNIZE / FlinkCEP analog, SURVEY §2.9 extension).
# --------------------------------------------------------------------------

_CEP_SQL = """
WITH seq AS (
    SELECT user_id,
           string_agg(CASE event_type
               WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
               WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
               ELSE 'x' END, '' ORDER BY ts, event_id) AS s,
           count(*) AS n_events
    FROM events GROUP BY user_id),
m AS (
    SELECT user_id, n_events, s,
           regexp_extract_all(s, 'vc*p') AS hits
    FROM seq)
SELECT CAST(user_id AS BIGINT) AS user_id,
       n_events,
       CAST(len(hits) AS BIGINT) AS n_matches,
       CAST(list_max(list_transform(hits, h -> len(h))) AS BIGINT)
           AS longest_match
FROM m WHERE len(hits) > 0
"""


@register("events_cep_pattern", _CEP_SQL)
def q_events_cep_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-event-processing pattern detection — the
    MATCH_RECOGNIZE / FlinkCEP capability Spark SQL lacks — reduced to
    leftmost non-overlapping REGEX matching over each user's ordered
    event-type sequence: view (click)* purchase. One shuffle builds
    the per-user sequence string (bounded by events-per-user); the
    regex pass is map-only. Both engines see the byte-identical
    sequence (ordered by ts then event_id) and both use leftmost
    non-overlapping match semantics, so match counts and lengths are
    deterministic. At 100 TB, per-user sequences are the same state a
    sessionizer carries — this composes with the session splitter to
    bound string length when users are unbounded."""
    from realtime_analytics_pipeline_spark.sources.batch import load_events

    ev = load_events(spark, sf_dir)
    chr_col = (
        F.when(F.col("event_type") == "view", "v")
        .when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "purchase", "p")
        .when(F.col("event_type") == "signup", "s")
        .otherwise("x")
    )
    seq = (
        ev.select(
            F.col("user_id").cast("bigint").alias("user_id"),
            F.struct(
                F.unix_millis("event_time").alias("ts_ms"),
                F.col("event_id").cast("bigint").alias("eid"),
                chr_col.alias("ch"),
            ).alias("e"),
        )
        .groupBy("user_id")
        .agg(
            F.expr(
                "array_join(transform(sort_array(collect_list(e)),"
                " p -> p.ch), '')"
            ).alias("s"),
            F.count("*").alias("n_events"),
        )
    )
    m = seq.select(
        "user_id",
        "n_events",
        F.expr("regexp_extract_all(s, 'vc*p', 0)").alias("hits"),
    )
    return m.where(F.size("hits") > 0).select(
        "user_id",
        "n_events",
        F.size("hits").cast("bigint").alias("n_matches"),
        F.expr("array_max(transform(hits, h -> length(h)))")
        .cast("bigint")
        .alias("longest_match"),
    )


# --------------------------------------------------------------------------
# Cross-engine semantics anchors: ANSI null handling + DECIMAL money.
# --------------------------------------------------------------------------

_NULL_AUDIT_SQL = """
WITH e AS (
    SELECT nullif(event_type, 'error') AS type_key,
           CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
    FROM events)
SELECT type_key,
       count(*) AS n_rows,
       count(v) AS n_value,
       count(DISTINCT v) AS n_distinct_value,
       round(coalesce(sum(v), 0.0), 6) + 0.0 AS sum_value,
       round(coalesce(avg(v), -1.0), 6) + 0.0 AS avg_value,
       CAST(count(*) - count(v) AS BIGINT) AS n_null_value,
       CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_null_case
FROM e
GROUP BY 1
"""


@register("events_null_semantics", _NULL_AUDIT_SQL)
def q_events_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI null-semantics audit, pinned cross-engine: NULL grouping
    keys form their own group (NULLIF-derived), count(*) vs
    count(col) vs count(DISTINCT col) disagree exactly by the null
    rows, aggregate functions skip nulls (sum of all-null is NULL —
    coalesced identically on both sides). A switching user's silent-
    corruption checklist as one oracle row set."""
    from realtime_analytics_pipeline_spark.sources.batch import load_events

    ev = load_events(spark, sf_dir).select(
        F.nullif(F.col("event_type"), F.lit("error")).alias("type_key"),
        # the driver data has no null values; inject deterministic
        # nulls (event_id % 7) so every null-handling leg is live
        F.when(F.col("event_id").cast("bigint") % 7 == 0, None)
        .otherwise(F.col("value"))
        .alias("v"),
    )
    return (
        ev.groupBy("type_key")
        .agg(
            F.count("*").alias("n_rows"),
            F.count("v").alias("n_value"),
            F.countDistinct("v").alias("n_distinct_value"),
            (F.round(F.coalesce(F.sum("v"), F.lit(0.0)), 6) + F.lit(0.0))
            .alias("sum_value"),
            (F.round(F.coalesce(F.avg("v"), F.lit(-1.0)), 6) + F.lit(0.0))
            .alias("avg_value"),
            (F.count("*") - F.count("v"))
            .cast("bigint")
            .alias("n_null_value"),
            F.sum(F.when(F.col("v").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_null_case"),
        )
    )


_DECIMAL_SQL = """
SELECT o_orderpriority AS priority,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18, 2))) AS DOUBLE)
           AS total_decimal,
       CAST(min(CAST(o_totalprice AS DECIMAL(18, 2))) AS DOUBLE) AS min_p,
       CAST(max(CAST(o_totalprice AS DECIMAL(18, 2))) AS DOUBLE) AS max_p,
       count(*) AS n
FROM orders
GROUP BY 1
"""


@register("orders_decimal_money", _DECIMAL_SQL)
def q_orders_decimal_money(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact money arithmetic through DECIMAL(18,2): sums accumulate in
    decimal (no float drift — the alternative to this repo's
    integer-cents discipline), surfaced as DOUBLE only at the edge for
    the cross-engine hash. A double-typed sum of the same column
    drifts in the low decimals at scale; the decimal path must not."""
    orders = load_table(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    return (
        orders.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.sum(dec).cast("double").alias("total_decimal"),
            F.min(dec).cast("double").alias("min_p"),
            F.max(dec).cast("double").alias("max_p"),
            F.count("*").alias("n"),
        )
    )


# --------------------------------------------------------------------------
# Changepoint detection: CUSUM argmax in exact integer arithmetic.
# --------------------------------------------------------------------------

_CUSUM_SQL = """
WITH daily AS (
    SELECT o_orderpriority AS priority,
           date_trunc('day', o_orderdate) AS d,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS y
    FROM orders GROUP BY 1, 2),
walked AS (
    SELECT priority, d, y,
           sum(y) OVER (PARTITION BY priority ORDER BY d
                        ROWS UNBOUNDED PRECEDING) AS cum,
           row_number() OVER (PARTITION BY priority ORDER BY d) AS k,
           sum(y) OVER (PARTITION BY priority) AS total,
           count(*) OVER (PARTITION BY priority) AS n
    FROM daily),
scored AS (
    SELECT priority, d, n,
           CAST(n * cum - k * total AS BIGINT) AS scaled_cusum
    FROM walked)
SELECT priority,
       epoch_ms(d) AS change_day_ms,
       scaled_cusum,
       CAST(n AS BIGINT) AS n_days
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY priority
        ORDER BY abs(scaled_cusum) DESC, d) AS rnk
    FROM scored)
WHERE rnk = 1
"""


@register("orders_changepoint_cusum", _CUSUM_SQL)
def q_orders_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection on each priority's daily revenue:
    the day k maximizing |Σ_{i≤k}(y_i − ȳ)| is the most likely level
    shift. Multiplying through by N keeps the statistic in EXACT
    integer arithmetic (N·cum_k − k·total) — no float mean enters the
    argmax, so both engines rank identically with a date tiebreak.
    One aggregation plus one window pass per series; the complement
    to the distribution-drift monitors (value_drift_daily is
    scale-free z-scores, this detects sustained level shifts)."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.date_trunc("day", "o_orderdate").alias("d"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .alias("y")
        )
    )
    wseq = Window.partitionBy("priority").orderBy("d")
    wall = Window.partitionBy("priority")
    walked = daily.select(
        "priority",
        "d",
        F.sum("y").over(wseq.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
        F.row_number().over(wseq).alias("k"),
        F.sum("y").over(wall).alias("total"),
        F.count("*").over(wall).alias("n"),
    )
    scored = walked.select(
        "priority",
        "d",
        "n",
        (F.col("n") * F.col("cum") - F.col("k") * F.col("total"))
        .cast("bigint")
        .alias("scaled_cusum"),
    )
    wr = Window.partitionBy("priority").orderBy(
        F.abs("scaled_cusum").desc(), F.col("d")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(wr))
        .where(F.col("rnk") == 1)
        .select(
            "priority",
            F.unix_millis("d").alias("change_day_ms"),
            "scaled_cusum",
            F.col("n").cast("bigint").alias("n_days"),
        )
    )


_BENFORD_SQL = """
WITH digits AS (
    SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                AS VARCHAR), 1, 1) AS BIGINT) AS digit
    FROM orders WHERE o_totalprice >= 1),
counts AS (
    SELECT digit, count(*) AS n FROM digits GROUP BY digit),
tot AS (SELECT sum(n) AS t FROM counts)
SELECT digit,
       CAST(n AS BIGINT) AS n,
       round(n * 1.0 / t, 6) + 0.0 AS observed,
       round(log10(1.0 + 1.0 / digit), 6) + 0.0 AS benford,
       round(abs(n * 1.0 / t - log10(1.0 + 1.0 / digit)), 6) + 0.0
           AS abs_dev
FROM counts, tot
"""


@register("orders_benford_check", _BENFORD_SQL)
def q_orders_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the
    forensic data-quality screen (fabricated or capped monetary data
    departs from log10(1 + 1/d)). Map-side digit extraction, one
    9-row aggregation, exact integer counts with a single final
    division. Deviations here flag generator artifacts the
    distribution monitors (drift, KS) are blind to because they
    compare only against the data itself."""
    orders = load_table(spark, sf_dir, "orders")
    digits = orders.where(F.col("o_totalprice") >= 1).select(
        F.substring(
            F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
        )
        .cast("bigint")
        .alias("digit")
    )
    counts = digits.groupBy("digit").agg(F.count("*").alias("n"))
    tot = counts.agg(F.sum("n").alias("t"))
    benford = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return counts.crossJoin(F.broadcast(tot)).select(
        "digit",
        F.col("n").cast("bigint").alias("n"),
        (F.round(F.col("n") / F.col("t"), 6) + F.lit(0.0)).alias("observed"),
        (F.round(benford, 6) + F.lit(0.0)).alias("benford"),
        (
            F.round(F.abs(F.col("n") / F.col("t") - benford), 6)
            + F.lit(0.0)
        ).alias("abs_dev"),
    )


# --------------------------------------------------------------------------
# Incremental materialized-view refresh: prune-scan only the new days.
# --------------------------------------------------------------------------

_INCR_REFRESH_SQL = """
WITH hwm AS (
    SELECT date_trunc('day', max(ts)) - INTERVAL 7 DAY AS cut FROM events),
base AS (
    SELECT date_trunc('day', ts) AS d, event_type, count(*) AS n
    FROM events, hwm WHERE ts < hwm.cut GROUP BY 1, 2),
delta AS (
    SELECT date_trunc('day', ts) AS d, event_type, count(*) AS n
    FROM events, hwm WHERE ts >= hwm.cut GROUP BY 1, 2)
SELECT epoch_ms(d) AS day_ms, event_type, CAST(n AS BIGINT) AS n
FROM (SELECT * FROM base UNION ALL SELECT * FROM delta)
"""


@register("rollup_incremental_refresh", _INCR_REFRESH_SQL)
def q_rollup_incremental_refresh(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Materialized-view maintenance discipline: the daily rollup's
    frozen base (days before the high-water mark) is NOT recomputed —
    only the delta partitions (last 7 days) are scanned and appended.
    Both legs carry literal timestamp predicates, so each scan is
    pushed-filter pruned (at 100 TB with date-partitioned storage,
    the delta leg reads 7 partitions out of thousands). The oracle is
    the safety property itself: base ∪ delta ≡ the full recompute,
    because the high-water mark splits event time exactly."""
    from realtime_analytics_pipeline_spark.sources.batch import load_events

    ev = load_events(spark, sf_dir)
    # resolve the HWM once (driver-side scalar; at scale this comes
    # from the serving table's metadata, not a data scan)
    cut = ev.agg(
        F.date_trunc("day", F.max("event_time")).alias("m")
    ).collect()[0]["m"] - __import__("datetime").timedelta(days=7)

    def rollup(pred):
        return (
            ev.where(pred)
            .groupBy(
                F.date_trunc("day", "event_time").alias("d"), "event_type"
            )
            .agg(F.count("*").alias("n"))
        )

    base = rollup(F.col("event_time") < F.lit(cut))
    delta = rollup(F.col("event_time") >= F.lit(cut))
    return base.unionByName(delta).select(
        F.unix_millis("d").alias("day_ms"),
        "event_type",
        F.col("n").cast("bigint").alias("n"),
    )


@register("users_activity_similarity_lsh")  # rows-only: approximate
def q_users_activity_similarity_lsh(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SCALE PATH for users_activity_similarity (measured alpha=1.26
    in SCALING.md): densify each user's daily series onto the global
    day grid, hyperplane-hash it (6 md5-derived planes, 64 buckets),
    and compare only same-bucket pairs — the pair space drops from
    Σ_day active² to Σ_bucket users², tunable by bits, with recall
    traded per bit. Exact cosine re-scores candidates, so shared pairs
    carry identical scores to the exact twin (subset property + recall
    floor pinned in tests/test_timeseries.py)."""
    from realtime_analytics_pipeline_spark.operators.similarity import (
        _hyperplanes,
        lsh_bucket_expr,
    )
    from realtime_analytics_pipeline_spark.sources.batch import load_events

    ev = load_events(spark, sf_dir)
    daily = (
        ev.groupBy(
            F.col("user_id").cast("bigint").alias("user_id"),
            F.date_trunc("day", "event_time").alias("d"),
        )
        .agg(F.count("*").alias("c"))
    )
    bounds = daily.agg(
        F.min(F.unix_date(F.to_date("d"))).alias("lo"),
        F.max(F.unix_date(F.to_date("d"))).alias("hi"),
    ).collect()[0]
    n_days = int(bounds.hi - bounds.lo + 1)
    vecs = (
        daily.select(
            "user_id",
            (F.unix_date(F.to_date("d")) - F.lit(int(bounds.lo)))
            .cast("int")
            .alias("idx"),
            F.col("c").cast("double").alias("c"),
        )
        .groupBy("user_id")
        .agg(
            F.map_from_entries(F.collect_list(F.struct("idx", "c"))).alias(
                "m"
            )
        )
        .select(
            "user_id",
            F.expr(
                f"transform(sequence(0, {n_days - 1}),"
                " i -> coalesce(element_at(m, i), 0.0d))"
            ).alias("v"),
        )
    )
    planes = _hyperplanes(n_days, 6)
    bucketed = vecs.withColumn("bucket", lsh_bucket_expr("v", planes))
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    from realtime_analytics_pipeline_spark.functions.vectors import (
        cosine,
    )

    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.user_id") < F.col("b.user_id")),
    ).select(
        F.col("a.user_id").alias("u1"),
        F.col("b.user_id").alias("u2"),
        F.round(cosine(F.col("a.v"), F.col("b.v")), 6).alias("cos_sim"),
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("cos_sim").desc(), F.col("u1"), F.col("u2"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 10)
        .select("u1", "u2", "cos_sim", "rnk")
    )


_SESSION_CEP_SQL = """
WITH ordered AS (
    SELECT user_id, epoch_ms(ts) AS ts_ms, event_id,
           CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
                ELSE 'x' END AS ch,
           CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
                  OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
                THEN 1 ELSE 0 END AS is_start
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)),
grouped AS (
    SELECT user_id, ts_ms, event_id, ch,
           sum(is_start) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                               ROWS UNBOUNDED PRECEDING) AS grp
    FROM ordered),
sessions AS (
    SELECT user_id, grp,
           min(ts_ms) AS session_start_ms,
           string_agg(ch, '' ORDER BY ts_ms, event_id) AS seq
    FROM grouped GROUP BY user_id, grp)
SELECT CAST(session_start_ms // 86400000 AS BIGINT) AS day_idx,
       count(*) AS n_sessions,
       CAST(sum(CASE WHEN regexp_matches(seq, 'vc*p') THEN 1 ELSE 0 END)
            AS BIGINT) AS n_converted,
       round(sum(CASE WHEN regexp_matches(seq, 'vc*p') THEN 1 ELSE 0 END)
             * 1.0 / count(*), 6) + 0.0 AS conversion_rate
FROM sessions
GROUP BY 1
"""


@register("sessions_cep_conversion", _SESSION_CEP_SQL)
def q_sessions_cep_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operator COMPOSITION: sessionization (30-min gaps-and-islands)
    scoping the CEP pattern match — a session converts iff
    view (click)* purchase occurs INSIDE it — rolled up to daily
    conversion rates. Two window passes + one regex per session; the
    pattern can never leak across a session boundary, which is the
    semantic difference from the per-user-lifetime events_cep_pattern.
    Day bucket is an integer epoch-day of the session START (a session
    belongs to the day it began, the standard product-metric rule)."""
    from pyspark.sql import Window

    from realtime_analytics_pipeline_spark.sources.batch import load_events

    ev = load_events(spark, sf_dir).select(
        "user_id",
        F.unix_millis("event_time").alias("ts_ms"),
        F.col("event_id").cast("bigint").alias("event_id"),
        F.when(F.col("event_type") == "view", "v")
        .when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "purchase", "p")
        .when(F.col("event_type") == "signup", "s")
        .otherwise("x")
        .alias("ch"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    marked = ev.withColumn(
        "is_start",
        F.when(
            F.lag("ts_ms").over(w).isNull()
            | (F.col("ts_ms") - F.lag("ts_ms").over(w) > 1800000),
            1,
        ).otherwise(0),
    ).withColumn(
        "grp",
        F.sum("is_start").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    sessions = marked.groupBy("user_id", "grp").agg(
        F.min("ts_ms").alias("session_start_ms"),
        F.expr(
            "array_join(transform(sort_array(collect_list("
            "struct(ts_ms, event_id, ch))), p -> p.ch), '')"
        ).alias("seq"),
    )
    converted = F.when(
        F.col("seq").rlike("vc*p"), 1
    ).otherwise(0)
    return (
        sessions.groupBy(
            (F.col("session_start_ms") / F.lit(86400000))
            .cast("bigint")
            .alias("day_idx")
        )
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum(converted).cast("bigint").alias("n_converted"),
            (
                F.round(F.sum(converted) / F.count("*"), 6) + F.lit(0.0)
            ).alias("conversion_rate"),
        )
    )


_ENTROPY_RATE_SQL = """
WITH seq AS (
    SELECT event_type AS src,
           lead(event_type) OVER (
               PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
           ) AS dst
    FROM events),
pairs AS (
    SELECT src, dst, count(*) AS n_ij FROM seq
    WHERE dst IS NOT NULL GROUP BY src, dst),
rows_i AS (SELECT src, sum(n_ij) AS n_i FROM pairs GROUP BY src),
tot AS (SELECT sum(n_ij) AS n FROM pairs)
SELECT p.src AS event_type,
       CAST(r.n_i AS BIGINT) AS n_transitions,
       round(r.n_i * 1.0 / t.n, 6) + 0.0 AS pi,
       round(-sum((p.n_ij * 1.0 / r.n_i)
                  * ln(p.n_ij * 1.0 / r.n_i)), 6) + 0.0 AS h_row,
       round((r.n_i * 1.0 / t.n)
             * -sum((p.n_ij * 1.0 / r.n_i)
                    * ln(p.n_ij * 1.0 / r.n_i)), 6) + 0.0 AS rate_contrib
FROM pairs p JOIN rows_i r ON p.src = r.src CROSS JOIN tot t
GROUP BY p.src, r.n_i, t.n
"""


@register("events_markov_entropy_rate", _ENTROPY_RATE_SQL)
def q_events_markov_entropy_rate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Markov entropy rate of the per-user event process: per source
    state, the row entropy of its empirical transition distribution
    and its π-weighted contribution to the chain's entropy rate
    H = −Σ_i π_i Σ_j P_ij ln P_ij (summing rate_contrib gives the
    rate). Transition counts stay exact integers; every ratio divides
    once before the log. Information-theoretic companion to
    events_user_paths (the transition matrix) and events_user_entropy
    (the state-marginal entropy): high rate = unpredictable
    navigation, near-zero = deterministic funnels."""
    from pyspark.sql import Window

    from realtime_analytics_pipeline_spark.sources.batch import load_events

    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.unix_millis("event_time"), F.col("event_id").cast("bigint")
    )
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).where(F.col("dst").isNotNull())
    pairs = seq.groupBy("src", "dst").agg(F.count("*").alias("n_ij"))
    rows_i = pairs.groupBy("src").agg(F.sum("n_ij").alias("n_i"))
    tot = pairs.agg(F.sum("n_ij").alias("n"))
    p_ij = F.col("n_ij") / F.col("n_i")
    joined = pairs.join(rows_i, "src").crossJoin(F.broadcast(tot))
    return joined.groupBy(
        F.col("src").alias("event_type"), "n_i", "n"
    ).agg(
        (-F.sum(p_ij * F.log(p_ij))).alias("h_raw"),
    ).select(
        "event_type",
        F.col("n_i").cast("bigint").alias("n_transitions"),
        (F.round(F.col("n_i") / F.col("n"), 6) + F.lit(0.0)).alias("pi"),
        (F.round("h_raw", 6) + F.lit(0.0)).alias("h_row"),
        (
            F.round((F.col("n_i") / F.col("n")) * F.col("h_raw"), 6)
            + F.lit(0.0)
        ).alias("rate_contrib"),
    )


# --------------------------------------------------------------------------
# A/B experiment analysis (two-proportion z-test on conversion).
# --------------------------------------------------------------------------

_AB_TEST_SQL = """
WITH users AS (
    SELECT user_id,
           CAST(user_id % 2 AS BIGINT) AS arm,
           max(CASE WHEN event_type = 'purchase' AND value > 90
                    THEN 1 ELSE 0 END) AS converted
    FROM events GROUP BY user_id),
arms AS (
    SELECT arm, count(*) AS n, sum(converted) AS conv
    FROM users GROUP BY arm),
wide AS (
    SELECT max(CASE WHEN arm = 0 THEN n END) AS n0,
           max(CASE WHEN arm = 0 THEN conv END) AS c0,
           max(CASE WHEN arm = 1 THEN n END) AS n1,
           max(CASE WHEN arm = 1 THEN conv END) AS c1
    FROM arms)
SELECT CAST(n0 AS BIGINT) AS n_control,
       CAST(c0 AS BIGINT) AS conv_control,
       CAST(n1 AS BIGINT) AS n_treatment,
       CAST(c1 AS BIGINT) AS conv_treatment,
       round(c0 * 1.0 / n0, 6) + 0.0 AS rate_control,
       round(c1 * 1.0 / n1, 6) + 0.0 AS rate_treatment,
       round(c1 * 1.0 / n1 - c0 * 1.0 / n0, 6) + 0.0 AS abs_lift,
       round((c1 * 1.0 / n1 - c0 * 1.0 / n0)
             / sqrt(((c0 + c1) * 1.0 / (n0 + n1))
                    * (1 - (c0 + c1) * 1.0 / (n0 + n1))
                    * (1.0 / n0 + 1.0 / n1)), 6) + 0.0 AS z_score
FROM wide
"""


@register("events_ab_test_lift", _AB_TEST_SQL)
def q_events_ab_test_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experimentation analysis: a deterministic user split
    (user_id % 2 standing in for the assignment hash) compared on
    per-user HIGH-VALUE purchase conversion (value > 90 — plain
    purchase saturates at 100% for every user, degenerating the
    pooled SE to zero) via the standard two-proportion
    z-test (pooled standard error). Counts are exact integers through
    the per-user reduction and the arm rollup; every rate divides
    once at the end. The per-user MAX-conversion reduction is the
    shape that keeps this one shuffle on user_id then a 2-row
    aggregate — no event-grain data ever reaches the test."""
    from realtime_analytics_pipeline_spark.sources.batch import load_events

    ev = load_events(spark, sf_dir)
    users = (
        ev.groupBy(F.col("user_id").cast("bigint").alias("user_id"))
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") > 90),
                    1,
                ).otherwise(0)
            ).alias("converted")
        )
        .withColumn("arm", (F.col("user_id") % 2).cast("bigint"))
    )
    arms = users.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("conv")
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("arm") == 0, F.col("conv"))).alias("c0"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("arm") == 1, F.col("conv"))).alias("c1"),
    )
    r0 = F.col("c0") / F.col("n0")
    r1 = F.col("c1") / F.col("n1")
    pooled = (F.col("c0") + F.col("c1")) / (F.col("n0") + F.col("n1"))
    se = F.sqrt(
        pooled * (F.lit(1) - pooled)
        * (F.lit(1.0) / F.col("n0") + F.lit(1.0) / F.col("n1"))
    )
    return wide.select(
        F.col("n0").cast("bigint").alias("n_control"),
        F.col("c0").cast("bigint").alias("conv_control"),
        F.col("n1").cast("bigint").alias("n_treatment"),
        F.col("c1").cast("bigint").alias("conv_treatment"),
        (F.round(r0, 6) + F.lit(0.0)).alias("rate_control"),
        (F.round(r1, 6) + F.lit(0.0)).alias("rate_treatment"),
        (F.round(r1 - r0, 6) + F.lit(0.0)).alias("abs_lift"),
        (F.round((r1 - r0) / se, 6) + F.lit(0.0)).alias("z_score"),
    )


_CUPED_SQL = """
WITH u AS (
    SELECT user_id,
           CAST(user_id % 2 AS BIGINT) AS arm,
           CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END)
                AS DOUBLE) AS x,
           CAST(max(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                          AND event_type = 'purchase' AND value > 90
                         THEN 1 ELSE 0 END) AS DOUBLE) AS y
    FROM events GROUP BY user_id),
stats AS (
    SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
           sum(x * y) AS sxy, sum(x * x) AS sxx
    FROM u),
theta AS (
    SELECT n, sx / n AS xbar,
           (sxy - sx * sy / n) / (sxx - sx * sx / n) AS th
    FROM stats),
adj AS (
    SELECT u.arm, u.y - t.th * (u.x - t.xbar) AS y_adj, u.y AS y_raw
    FROM u, theta t)
SELECT arm,
       CAST(count(*) AS BIGINT) AS n_users,
       round(avg(y_raw), 6) + 0.0 AS mean_raw,
       round(avg(y_adj), 6) + 0.0 AS mean_cuped,
       round(var_samp(y_raw), 6) + 0.0 AS var_raw,
       round(var_samp(y_adj), 6) + 0.0 AS var_cuped
FROM adj GROUP BY arm
"""


@register("events_ab_cuped", _CUPED_SQL)
def q_events_ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng et al. 2013): the pre-period
    covariate (first-half event count) absorbs between-user variance
    from the experiment metric (second-half high-value conversion) via
    y' = y − θ(x − x̄), θ = cov(x,y)/var(x). θ and x̄ come from ONE
    moment aggregation (n, Σx, Σy, Σxy, Σx²) — integer-valued sums,
    exact in doubles at any realistic scale — broadcast back over the
    per-user rows; per-arm means and variances compare raw vs adjusted
    (var_cuped < var_raw is the method working). Same shuffle shape as
    the plain z-test: one reduction to user grain, then constants."""
    from realtime_analytics_pipeline_spark.sources.batch import load_events

    ev = load_events(spark, sf_dir)
    cut = F.lit("2024-01-16").cast("timestamp")
    u = (
        ev.groupBy(F.col("user_id").cast("bigint").alias("user_id"))
        .agg(
            F.sum(F.when(F.col("event_time") < cut, 1).otherwise(0))
            .cast("double")
            .alias("x"),
            F.max(
                F.when(
                    (F.col("event_time") >= cut)
                    & (F.col("event_type") == "purchase")
                    & (F.col("value") > 90),
                    1,
                ).otherwise(0)
            )
            .cast("double")
            .alias("y"),
        )
        .withColumn("arm", (F.col("user_id") % 2).cast("bigint"))
    )
    stats = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    ).select(
        (F.col("sx") / F.col("n")).alias("xbar"),
        (
            (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"))
            / (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
        ).alias("th"),
    )
    adj = u.crossJoin(F.broadcast(stats)).select(
        "arm",
        F.col("y").alias("y_raw"),
        (F.col("y") - F.col("th") * (F.col("x") - F.col("xbar"))).alias(
            "y_adj"
        ),
    )
    return adj.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        (F.round(F.avg("y_raw"), 6) + F.lit(0.0)).alias("mean_raw"),
        (F.round(F.avg("y_adj"), 6) + F.lit(0.0)).alias("mean_cuped"),
        (F.round(F.var_samp("y_raw"), 6) + F.lit(0.0)).alias("var_raw"),
        (F.round(F.var_samp("y_adj"), 6) + F.lit(0.0)).alias("var_cuped"),
    )


_BACKTEST_SQL = """
WITH daily AS (
    SELECT o_orderpriority AS priority,
           date_trunc('day', o_orderdate) AS d,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS y
    FROM orders GROUP BY 1, 2),
folds AS (
    SELECT priority, d, y,
           avg(y * 1.0) OVER (PARTITION BY priority ORDER BY d
                              ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
               AS yhat,
           count(*) OVER (PARTITION BY priority ORDER BY d
                          ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
               AS n_hist
    FROM daily)
SELECT priority,
       CAST(count(*) AS BIGINT) AS n_folds,
       round(avg(abs(y - yhat)) / 100.0, 6) + 0.0 AS mae_dollars,
       round(avg(abs(y - yhat) / y), 6) + 0.0 AS mape,
       round(avg(CASE WHEN y > yhat THEN 1.0 ELSE 0.0 END), 6) + 0.0
           AS frac_underforecast
FROM folds WHERE n_hist = 7
GROUP BY priority
"""


@register("orders_forecast_backtest", _BACKTEST_SQL)
def q_orders_forecast_backtest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Rolling-origin backtest of the trailing-7-day-mean forecaster:
    each day is a fold whose prediction uses only its preceding 7 days
    (the window frame ends at 1 PRECEDING — no leakage by
    construction); folds without a full history are excluded. Reports
    MAE, MAPE and the under-forecast fraction per series — the
    evaluation loop any production forecaster needs, as one window
    pass + one aggregation over integer-cents dailies."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.date_trunc("day", "o_orderdate").alias("d"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .alias("y")
        )
    )
    w = Window.partitionBy("priority").orderBy("d").rowsBetween(-7, -1)
    folds = daily.select(
        "priority",
        "y",
        F.avg(F.col("y") * 1.0).over(w).alias("yhat"),
        F.count("*").over(w).alias("n_hist"),
    ).where(F.col("n_hist") == 7)
    return folds.groupBy("priority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_folds"),
        (
            F.round(F.avg(F.abs(F.col("y") - F.col("yhat"))) / 100.0, 6)
            + F.lit(0.0)
        ).alias("mae_dollars"),
        (
            F.round(F.avg(F.abs(F.col("y") - F.col("yhat")) / F.col("y")), 6)
            + F.lit(0.0)
        ).alias("mape"),
        (
            F.round(
                F.avg(
                    F.when(F.col("y") > F.col("yhat"), 1.0).otherwise(0.0)
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("frac_underforecast"),
    )


_MWU_SQL = """
WITH u AS (
    SELECT user_id, CAST(user_id % 2 AS BIGINT) AS arm,
           round(avg(value), 6) AS metric
    FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
    GROUP BY user_id),
ranked AS (
    SELECT arm, metric,
           avg(rn) OVER (PARTITION BY metric) AS r
    FROM (SELECT arm, metric,
                 row_number() OVER (ORDER BY metric, user_id) * 1.0 AS rn
          FROM u)),
sums AS (
    SELECT sum(CASE WHEN arm = 1 THEN r END) AS r1,
           sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n1,
           sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n0
    FROM ranked)
SELECT CAST(n0 AS BIGINT) AS n_control,
       CAST(n1 AS BIGINT) AS n_treatment,
       round(r1 - n1 * (n1 + 1) / 2.0, 6) + 0.0 AS u_stat,
       round((r1 - n1 * (n1 + 1) / 2.0) / (n0 * n1), 6) + 0.0
           AS auc_effect
FROM sums
"""


@register("events_mann_whitney", _MWU_SQL)
def q_events_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nonparametric A/B comparison: the Mann-Whitney U statistic on
    per-user mean purchase value between the deterministic arms. Ranks
    come from one global sort with AVERAGE ranks on ties (mean of
    row_numbers per tied metric value — the tie rule both engines
    compute identically since the metric is pre-rounded to 6); the
    U→AUC normalization U/(n0·n1) is the probability a random
    treatment user outranks a random control user — the effect size
    robust to the heavy-tailed values that break the t-test. Rank
    arithmetic is exact (integers and .5 halves)."""
    from pyspark.sql import Window

    from realtime_analytics_pipeline_spark.sources.batch import load_events

    ev = load_events(spark, sf_dir)
    u = (
        ev.where(
            (F.col("event_type") == "purchase")
            & F.col("value").isNotNull()
        )
        .groupBy(F.col("user_id").cast("bigint").alias("user_id"))
        .agg(F.round(F.avg("value"), 6).alias("metric"))
        .withColumn("arm", (F.col("user_id") % 2).cast("bigint"))
    )
    wr = Window.orderBy("metric", "user_id")
    wt = Window.partitionBy("metric")
    ranked = u.withColumn(
        "rn", F.row_number().over(wr) * F.lit(1.0)
    ).withColumn("r", F.avg("rn").over(wt))
    sums = ranked.agg(
        F.sum(F.when(F.col("arm") == 1, F.col("r"))).alias("r1"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n0"),
    )
    u_stat = F.col("r1") - F.col("n1") * (F.col("n1") + 1) / 2.0
    return sums.select(
        F.col("n0").cast("bigint").alias("n_control"),
        F.col("n1").cast("bigint").alias("n_treatment"),
        (F.round(u_stat, 6) + F.lit(0.0)).alias("u_stat"),
        (F.round(u_stat / (F.col("n0") * F.col("n1")), 6) + F.lit(0.0))
        .alias("auc_effect"),
    )


_SRM_SQL = """
WITH u AS (
    SELECT DISTINCT user_id, CAST(user_id % 2 AS BIGINT) AS arm
    FROM events),
counts AS (
    SELECT sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n0,
           sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n1
    FROM u)
SELECT CAST(n0 AS BIGINT) AS n_control,
       CAST(n1 AS BIGINT) AS n_treatment,
       round((n0 + n1) / 2.0, 6) + 0.0 AS expected_each,
       round(power(n0 - (n0 + n1) / 2.0, 2) / ((n0 + n1) / 2.0)
             + power(n1 - (n0 + n1) / 2.0, 2) / ((n0 + n1) / 2.0), 6)
           + 0.0 AS chi2
FROM counts
"""


@register("events_ab_srm_check", _SRM_SQL)
def q_events_ab_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail: before reading any experiment
    result, check the observed arm sizes against the designed 50/50
    split (chi-square with 1 df; > 3.84 means the assignment itself is
    broken and every downstream metric is invalid). One distinct-user
    pass, exact integer counts, one 1-row statistic."""
    from realtime_analytics_pipeline_spark.sources.batch import load_events

    ev = load_events(spark, sf_dir)
    u = ev.select(
        F.col("user_id").cast("bigint").alias("user_id")
    ).distinct().withColumn("arm", (F.col("user_id") % 2).cast("bigint"))
    counts = u.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n1"),
    )
    e = (F.col("n0") + F.col("n1")) / 2.0
    chi2 = F.pow(F.col("n0") - e, 2) / e + F.pow(F.col("n1") - e, 2) / e
    return counts.select(
        F.col("n0").cast("bigint").alias("n_control"),
        F.col("n1").cast("bigint").alias("n_treatment"),
        (F.round(e, 6) + F.lit(0.0)).alias("expected_each"),
        (F.round(chi2, 6) + F.lit(0.0)).alias("chi2"),
    )


_DID_SQL = """
WITH cell AS (
    SELECT CAST(user_id % 2 AS BIGINT) AS arm,
           CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END
               AS post,
           user_id,
           sum(CASE WHEN event_type = 'purchase'
                    THEN CAST(round(value * 100) AS BIGINT)
                    ELSE 0 END) AS spend_cents
    FROM events GROUP BY 1, 2, 3),
means AS (
    SELECT arm, post,
           count(*) AS n_users,
           sum(spend_cents) AS total_cents
    FROM cell GROUP BY arm, post),
wide AS (
    SELECT max(CASE WHEN arm = 0 AND post = 0
                    THEN total_cents * 1.0 / n_users END) AS c_pre,
           max(CASE WHEN arm = 0 AND post = 1
                    THEN total_cents * 1.0 / n_users END) AS c_post,
           max(CASE WHEN arm = 1 AND post = 0
                    THEN total_cents * 1.0 / n_users END) AS t_pre,
           max(CASE WHEN arm = 1 AND post = 1
                    THEN total_cents * 1.0 / n_users END) AS t_post
    FROM means)
SELECT round(c_pre / 100, 6) + 0.0 AS control_pre,
       round(c_post / 100, 6) + 0.0 AS control_post,
       round(t_pre / 100, 6) + 0.0 AS treatment_pre,
       round(t_post / 100, 6) + 0.0 AS treatment_post,
       round(((t_post - t_pre) - (c_post - c_pre)) / 100, 6) + 0.0
           AS did_estimate
FROM wide
"""


@register("events_ab_did", _DID_SQL)
def q_events_ab_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: per-user purchase spend in the 2x2
    (arm x pre/post) design; the DiD estimate nets out both the
    between-arm baseline gap and the common time trend. Integer-cents
    totals per cell divide exactly once into per-user means — four
    rationals and one subtraction chain, no distributed float sums."""
    from realtime_analytics_pipeline_spark.sources.batch import load_events

    ev = load_events(spark, sf_dir)
    cut = F.lit("2024-01-16").cast("timestamp")
    cell = (
        ev.groupBy(
            (F.col("user_id").cast("bigint") % 2).alias("arm"),
            F.when(F.col("event_time") >= cut, 1).otherwise(0).alias(
                "post"
            ),
            F.col("user_id").cast("bigint").alias("user_id"),
        )
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100).cast("bigint"),
                ).otherwise(0)
            ).alias("spend_cents")
        )
    )
    means = cell.groupBy("arm", "post").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("spend_cents").alias("total_cents"),
    )

    def m(a, p):
        return F.max(
            F.when(
                (F.col("arm") == a) & (F.col("post") == p),
                F.col("total_cents") * 1.0 / F.col("n_users"),
            )
        )

    wide = means.agg(
        m(0, 0).alias("c_pre"),
        m(0, 1).alias("c_post"),
        m(1, 0).alias("t_pre"),
        m(1, 1).alias("t_post"),
    )
    return wide.select(
        (F.round(F.col("c_pre") / 100, 6) + F.lit(0.0)).alias(
            "control_pre"
        ),
        (F.round(F.col("c_post") / 100, 6) + F.lit(0.0)).alias(
            "control_post"
        ),
        (F.round(F.col("t_pre") / 100, 6) + F.lit(0.0)).alias(
            "treatment_pre"
        ),
        (F.round(F.col("t_post") / 100, 6) + F.lit(0.0)).alias(
            "treatment_post"
        ),
        (
            F.round(
                (
                    (F.col("t_post") - F.col("t_pre"))
                    - (F.col("c_post") - F.col("c_pre"))
                )
                / 100,
                6,
            )
            + F.lit(0.0)
        ).alias("did_estimate"),
    )


_POWER_SQL = """
WITH u AS (
    SELECT user_id, CAST(user_id % 2 AS BIGINT) AS arm,
           max(CASE WHEN event_type = 'purchase' AND value > 90
                    THEN 1 ELSE 0 END) AS converted
    FROM events GROUP BY user_id),
obs AS (
    SELECT sum(CASE WHEN arm = 0 THEN converted END) * 1.0
               / sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS p0,
           count(*) AS n_total
    FROM u)
SELECT round(p0, 6) + 0.0 AS rate_control,
       CAST(0.05 AS DOUBLE) AS mde_abs,
       CAST(ceil(2.0 * ((p0 + 0.025) * (1 - (p0 + 0.025)))
                 * power(1.959964 + 0.841621, 2) / power(0.05, 2))
            AS BIGINT) AS n_required_per_arm,
       CAST(n_total AS BIGINT) AS n_available,
       CAST(CASE WHEN n_total / 2.0 >= ceil(2.0
                * ((p0 + 0.025) * (1 - (p0 + 0.025)))
                * power(1.959964 + 0.841621, 2) / power(0.05, 2))
            THEN 1 ELSE 0 END AS BIGINT) AS is_powered
FROM obs
"""


@register("events_ab_power", _POWER_SQL)
def q_events_ab_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power analysis guardrail: per-arm sample size required to
    detect a 5-point absolute lift at alpha=0.05 / power=0.80
    (two-proportion formula, variance at the midpoint rate), against
    the users actually available — the pre-registration check that
    stops underpowered experiments from being read at all. The z
    quantiles are fixed 6-decimal literals so both engines compute
    the identical closed form."""
    from realtime_analytics_pipeline_spark.sources.batch import load_events

    ev = load_events(spark, sf_dir)
    u = (
        ev.groupBy(F.col("user_id").cast("bigint").alias("user_id"))
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") > 90),
                    1,
                ).otherwise(0)
            ).alias("converted")
        )
        .withColumn("arm", (F.col("user_id") % 2).cast("bigint"))
    )
    obs = u.agg(
        (
            F.sum(F.when(F.col("arm") == 0, F.col("converted")))
            * 1.0
            / F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        ).alias("p0"),
        F.count(F.lit(1)).alias("n_total"),
    )
    mid = F.col("p0") + F.lit(0.025)
    n_req = F.ceil(
        F.lit(2.0)
        * (mid * (F.lit(1) - mid))
        * F.pow(F.lit(1.959964) + F.lit(0.841621), 2)
        / F.pow(F.lit(0.05), 2)
    )
    return obs.select(
        (F.round("p0", 6) + F.lit(0.0)).alias("rate_control"),
        (F.lit(0.05) + F.lit(0.0)).alias("mde_abs"),
        n_req.cast("bigint").alias("n_required_per_arm"),
        F.col("n_total").cast("bigint").alias("n_available"),
        F.when(F.col("n_total") / 2.0 >= n_req, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("is_powered"),
    )


_STL_LITE_SQL = """
WITH hourly AS (
    SELECT date_trunc('hour', ts) AS h,
           extract(hour FROM ts) AS hod,
           CAST(count(*) AS DOUBLE) AS y
    FROM events GROUP BY 1, 2),
seasonal AS (
    SELECT hod, median(y) AS s FROM hourly GROUP BY hod),
resid AS (
    SELECT h.h, h.hod, h.y, s.s, h.y - s.s AS r
    FROM hourly h JOIN seasonal s ON h.hod = s.hod),
fences AS (
    SELECT median(r) AS m,
           median(abs(r - (SELECT median(r) FROM resid))) AS mad
    FROM resid)
SELECT epoch_ms(r.h) AS hour_ms,
       CAST(r.hod AS BIGINT) AS hour_of_day,
       CAST(r.y AS BIGINT) AS n_events,
       round(r.s, 6) + 0.0 AS seasonal_baseline,
       round(r.r, 6) + 0.0 AS residual,
       round((r.r - f.m) / (1.4826 * f.mad), 6) + 0.0 AS robust_z
FROM resid r, fences f
WHERE abs((r.r - f.m) / (1.4826 * f.mad)) > 3.5
"""


@register("events_hourly_anomaly_stl", _STL_LITE_SQL)
def q_events_hourly_anomaly_stl(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STL-lite anomaly detection: remove the hour-of-day seasonal
    component (per-slot MEDIAN — robust to the anomalies being
    hunted), then flag hours whose residual exceeds 3.5 robust-z
    (MAD-scaled). Composition of the seasonality and robust-fence
    operators into the shape production monitors actually run: an
    hourly spike only alerts if it is anomalous FOR THAT HOUR OF DAY.
    Exact medians on both engines (Spark median == DuckDB median on
    integer-valued doubles); one rollup + two tiny broadcast joins."""
    hourly = (
        load_events(spark, sf_dir)
        .groupBy(
            F.date_trunc("hour", "event_time").alias("h"),
            F.hour("event_time").alias("hod"),
        )
        .agg(F.count("*").cast("double").alias("y"))
    )
    seasonal = hourly.groupBy("hod").agg(F.median("y").alias("s"))
    resid = hourly.join(F.broadcast(seasonal), "hod").withColumn(
        "r", F.col("y") - F.col("s")
    )
    # two-step MAD: median first, then median absolute deviation
    m_val = resid.agg(F.median("r").alias("m"))
    resid_m = resid.crossJoin(F.broadcast(m_val))
    mad_val = resid_m.agg(
        F.median(F.abs(F.col("r") - F.col("m"))).alias("mad"),
        F.first("m").alias("m"),
    )
    scored = resid.crossJoin(F.broadcast(mad_val)).withColumn(
        "robust_z",
        (F.col("r") - F.col("m")) / (F.lit(1.4826) * F.col("mad")),
    )
    return scored.where(F.abs("robust_z") > 3.5).select(
        F.unix_millis("h").alias("hour_ms"),
        F.col("hod").cast("bigint").alias("hour_of_day"),
        F.col("y").cast("bigint").alias("n_events"),
        (F.round("s", 6) + F.lit(0.0)).alias("seasonal_baseline"),
        (F.round("r", 6) + F.lit(0.0)).alias("residual"),
        (F.round("robust_z", 6) + F.lit(0.0)).alias("robust_z"),
    )


# --------------------------------------------------------------------------
# Poisson bootstrap: resampling inference at scale, deterministically.
# --------------------------------------------------------------------------

def _boot_sql() -> str:
    from realtime_analytics_pipeline_spark.operators.sampling import (
        md5_bucket_sql,
    )

    u = md5_bucket_sql(
        "CAST(event_id AS VARCHAR) || ':' || CAST(b AS VARCHAR)", "boot"
    )
    return f"""
WITH x AS (
    SELECT event_id, CAST(round(value * 100) AS BIGINT) AS cents
    FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
rep AS (
    SELECT x.event_id, x.cents, t.b, {u} AS u
    FROM x, (SELECT unnest(range(50)) AS b) t),
weighted AS (
    SELECT b, cents,
           CASE WHEN u < 24109 THEN 0
                WHEN u < 48219 THEN 1
                WHEN u < 60274 THEN 2
                WHEN u < 64292 THEN 3
                ELSE 4 END AS w
    FROM rep),
means AS (
    SELECT b, sum(w * cents) * 1.0 / sum(w) AS m
    FROM weighted GROUP BY b),
obs AS (SELECT avg(cents * 1.0) AS om, count(*) AS n FROM x)
SELECT CAST(o.n AS BIGINT) AS n_purchases,
       round(o.om / 100, 6) + 0.0 AS observed_mean,
       round(stddev_samp(m.m) / 100, 6) + 0.0 AS boot_se,
       round((o.om - 1.959964 * stddev_samp(m.m)) / 100, 6) + 0.0 AS ci_lo,
       round((o.om + 1.959964 * stddev_samp(m.m)) / 100, 6) + 0.0 AS ci_hi
FROM means m, obs o
GROUP BY o.n, o.om
"""


@register("events_bootstrap_ci", _boot_sql())
def q_events_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap (the at-scale resampling method: weight each
    row ~Poisson(1) per replicate instead of materializing resamples)
    with DETERMINISTIC weights — the md5-uniform of (event_id,
    replicate) cut at the Poisson(1) pmf thresholds (24109/48219/
    60274/64292 of 65536; tail mass folded into w=4). 50 replicate
    means of integer-cents purchase value are each one exact-integer
    ratio; their sample stddev is the bootstrap SE and the normal-
    interval CI follows. Cost: one 50x row fan-out of the purchase
    subset, no data movement per replicate — the property that makes
    bootstrap viable at 100 TB."""
    from realtime_analytics_pipeline_spark.operators.sampling import (
        hash_bucket,
    )
    from realtime_analytics_pipeline_spark.sources.batch import load_events

    ev = load_events(spark, sf_dir)
    x = ev.where(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select(
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    rep = x.crossJoin(
        F.broadcast(
            spark.range(50).select(F.col("id").cast("int").alias("b"))
        )
    ).withColumn(
        "u",
        hash_bucket(
            F.concat(
                F.col("event_id").cast("string"),
                F.lit(":"),
                F.col("b").cast("string"),
            ),
            "boot",
        ),
    )
    w = (
        F.when(F.col("u") < 24109, 0)
        .when(F.col("u") < 48219, 1)
        .when(F.col("u") < 60274, 2)
        .when(F.col("u") < 64292, 3)
        .otherwise(4)
    )
    means = (
        rep.withColumn("w", w)
        .groupBy("b")
        .agg(
            (
                F.sum(F.col("w") * F.col("cents"))
                * 1.0
                / F.sum("w")
            ).alias("m")
        )
    )
    obs = x.agg(
        F.avg(F.col("cents") * 1.0).alias("om"),
        F.count(F.lit(1)).alias("n"),
    )
    z = F.lit(1.959964)
    return (
        means.crossJoin(F.broadcast(obs))
        .groupBy("n", "om")
        .agg(F.stddev_samp("m").alias("se"))
        .select(
            F.col("n").cast("bigint").alias("n_purchases"),
            (F.round(F.col("om") / 100, 6) + F.lit(0.0)).alias(
                "observed_mean"
            ),
            (F.round(F.col("se") / 100, 6) + F.lit(0.0)).alias("boot_se"),
            (
                F.round((F.col("om") - z * F.col("se")) / 100, 6)
                + F.lit(0.0)
            ).alias("ci_lo"),
            (
                F.round((F.col("om") + z * F.col("se")) / 100, 6)
                + F.lit(0.0)
            ).alias("ci_hi"),
        )
    )


_OLS_SQL = """
WITH daily AS (
    SELECT o_orderpriority AS priority,
           CAST(epoch_ms(date_trunc('day', o_orderdate)) // 86400000
                AS BIGINT) AS day_idx,
           sum(CAST(round(o_totalprice) AS BIGINT)) AS y
    FROM orders GROUP BY 1, 2),
moments AS (
    SELECT priority,
           CAST(count(*) AS HUGEINT) AS n,
           CAST(sum(day_idx) AS HUGEINT) AS sx,
           CAST(sum(y) AS HUGEINT) AS sy,
           CAST(sum(CAST(day_idx AS HUGEINT) * y) AS HUGEINT) AS sxy,
           CAST(sum(CAST(day_idx AS HUGEINT) * day_idx) AS HUGEINT) AS sxx,
           CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
    FROM daily GROUP BY priority),
parts AS (
    SELECT priority, n,
           n * sxy - sx * sy AS num,
           n * sxx - sx * sx AS den,
           n * syy - sy * sy AS deny,
           sy * (n * sxx - sx * sx) - (n * sxy - sx * sy) * sx AS inum
    FROM moments)
SELECT priority,
       CAST(n AS BIGINT) AS n_days,
       CAST(CASE WHEN num < 0
            THEN -((-num * 2000000 + den) // (2 * den))
            ELSE (num * 2000000 + den) // (2 * den) END AS DOUBLE)
           / 1000000 + 0.0 AS slope_dollars_per_day,
       CAST(CASE WHEN inum < 0
            THEN -((-inum * 2000000 + n * den) // (2 * n * den))
            ELSE (inum * 2000000 + n * den) // (2 * n * den)
            END AS DOUBLE) / 1000000 + 0.0 AS intercept_dollars,
       round((CAST(num AS DOUBLE) * CAST(num AS DOUBLE))
             / (CAST(den AS DOUBLE) * CAST(deny AS DOUBLE)), 6)
           + 0.0 AS r_squared
FROM parts
"""


@register("orders_revenue_trend_ols", _OLS_SQL)
def q_orders_revenue_trend_ols(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """OLS revenue trend per priority via the normal equations on raw
    moments (n, Σx, Σy, Σxy, Σx², Σy²) over epoch-day indexes and
    integer DOLLARS. Round-13 exactness upgrade (closes the scale-gate
    float-boundary skip): the moments and normal-equation parts are
    DECIMAL(38,0)-exact on Spark (HUGEINT in the oracle) at ANY SF —
    int64 second moments overflowed past sf0.3 — and slope/intercept
    are rounded by an integer half-away-from-zero division (exact
    integer ratios: slope = num/den, intercept = inum/(n·den)), so the
    only float ops are the final int→double casts (nearest, identical
    both engines). R² alone is a double ratio — num² needs 256-bit
    integers — but its four inputs are exact integers cast identically
    on both engines, so the IEEE op sequence matches bit-for-bit.
    This moment-sketch shape is why linear models ARE aggregations at
    100 TB: one partial-aggregated pass, six numbers per group, model
    on the driver side of the decimal point."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(
            F.col("o_orderpriority").alias("priority"),
            (
                F.unix_millis(F.date_trunc("day", "o_orderdate"))
                / F.lit(86400000)
            )
            .cast("bigint")
            .alias("day_idx"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice")).cast("bigint"))
            .alias("y")
        )
    )
    dec = "DECIMAL(38,0)"
    m = daily.groupBy("priority").agg(
        F.expr(f"CAST(count(*) AS {dec})").alias("n"),
        F.expr(f"CAST(sum(day_idx) AS {dec})").alias("sx"),
        F.expr(f"CAST(sum(y) AS {dec})").alias("sy"),
        F.expr(f"CAST(sum(CAST(day_idx AS {dec}) * y) AS {dec})").alias(
            "sxy"
        ),
        F.expr(
            f"CAST(sum(CAST(day_idx AS {dec}) * day_idx) AS {dec})"
        ).alias("sxx"),
        F.expr(f"CAST(sum(CAST(y AS {dec}) * y) AS {dec})").alias("syy"),
    )
    parts = m.select(
        "priority",
        "n",
        (m["n"] * m["sxy"] - m["sx"] * m["sy"]).alias("num"),
        (m["n"] * m["sxx"] - m["sx"] * m["sx"]).alias("den"),
        (m["n"] * m["syy"] - m["sy"] * m["sy"]).alias("deny"),
        (
            m["sy"] * (m["n"] * m["sxx"] - m["sx"] * m["sx"])
            - (m["n"] * m["sxy"] - m["sx"] * m["sy"]) * m["sx"]
        ).alias("inum"),
    )

    def _ratio6(numc: str, denc: str) -> F.Column:
        # round-half-away-from-zero(num/den, 6) in pure integers.
        return F.expr(
            f"""CAST(CASE WHEN ({numc}) < 0
                THEN -(CAST((-({numc}) * 2000000 + ({denc}))
                            div (2 * ({denc})) AS {dec}))
                ELSE CAST((({numc}) * 2000000 + ({denc}))
                          div (2 * ({denc})) AS {dec})
                END AS DOUBLE) / 1000000 + 0.0"""
        )

    return parts.select(
        "priority",
        F.col("n").cast("bigint").alias("n_days"),
        _ratio6("num", "den").alias("slope_dollars_per_day"),
        _ratio6("inum", "n * den").alias("intercept_dollars"),
        F.expr(
            """round((CAST(num AS DOUBLE) * CAST(num AS DOUBLE))
                     / (CAST(den AS DOUBLE) * CAST(deny AS DOUBLE)), 6)
               + 0.0"""
        ).alias("r_squared"),
    )


_TIMED_FUNNEL_SQL = """
WITH v AS (
    SELECT user_id, event_id AS vid, epoch_us(ts) AS vus
    FROM events WHERE event_type = 'view'),
c AS (
    SELECT user_id, epoch_us(ts) AS cus
    FROM events WHERE event_type = 'click'),
p AS (
    SELECT user_id, epoch_us(ts) AS pus
    FROM events WHERE event_type = 'purchase'),
first_click AS (
    SELECT v.user_id, v.vid, v.vus, min(c.cus) AS cus
    FROM v JOIN c ON v.user_id = c.user_id
     AND c.cus > v.vus AND c.cus <= v.vus + 600000000
    GROUP BY v.user_id, v.vid, v.vus),
completed AS (
    SELECT f.vid, min(p.pus) AS pus
    FROM first_click f JOIN p ON f.user_id = p.user_id
     AND p.pus > f.cus AND p.pus <= f.cus + 1800000000
    GROUP BY f.vid)
SELECT CAST(v.vus // 86400000000 AS BIGINT) AS day_idx,
       count(*) AS n_views,
       CAST(count(f.vid) AS BIGINT) AS n_clicked_10m,
       CAST(count(cp.vid) AS BIGINT) AS n_completed_30m,
       round(count(cp.vid) * 1.0 / count(*), 6) + 0.0 AS completion_rate
FROM v
LEFT JOIN first_click f ON v.vid = f.vid
LEFT JOIN completed cp ON v.vid = cp.vid
GROUP BY 1
"""


@register("funnel_time_constrained", _TIMED_FUNNEL_SQL)
def q_funnel_time_constrained(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Time-constrained conversion funnel: view → FIRST click within
    10 minutes → FIRST purchase within 30 minutes of that click, per
    view, rolled up to daily completion rates. Unlike the
    order-only funnel (funnel_view_click_purchase) and the
    session-scoped CEP, each step here carries its own deadline — the
    product definition growth teams actually use. Two cascaded
    windowed as-of joins (user-equi + range, min-aggregated to the
    first qualifying event), then one left-join rollup."""
    from realtime_analytics_pipeline_spark.sources.batch import load_events

    ev = load_events(spark, sf_dir)

    def typed(t, cols):
        return ev.where(F.col("event_type") == t).select(*cols)

    v = typed(
        "view",
        [
            F.col("user_id"),
            F.col("event_id").alias("vid"),
            F.unix_micros("event_time").alias("vus"),
        ],
    )
    c = typed(
        "click",
        [
            F.col("user_id").alias("c_user"),
            F.unix_micros("event_time").alias("cus"),
        ],
    )
    p = typed(
        "purchase",
        [
            F.col("user_id").alias("p_user"),
            F.unix_micros("event_time").alias("pus"),
        ],
    )
    first_click = (
        v.join(
            c,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("cus") > F.col("vus"))
            & (F.col("cus") <= F.col("vus") + 600000000),
        )
        .groupBy("user_id", "vid", "vus")
        .agg(F.min("cus").alias("cus"))
    )
    completed = (
        first_click.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("pus") > F.col("cus"))
            & (F.col("pus") <= F.col("cus") + 1800000000),
        )
        .groupBy("vid")
        .agg(F.min("pus").alias("pus"))
    )
    fc = first_click.select(F.col("vid").alias("f_vid"))
    cp = completed.select(F.col("vid").alias("c_vid"))
    return (
        v.join(fc, v["vid"] == fc["f_vid"], "left")
        .join(cp, v["vid"] == cp["c_vid"], "left")
        .groupBy(
            (F.col("vus") / F.lit(86400000000))
            .cast("bigint")
            .alias("day_idx")
        )
        .agg(
            F.count(F.lit(1)).alias("n_views"),
            F.count("f_vid").cast("bigint").alias("n_clicked_10m"),
            F.count("c_vid").cast("bigint").alias("n_completed_30m"),
            (
                F.round(F.count("c_vid") / F.count(F.lit(1)), 6)
                + F.lit(0.0)
            ).alias("completion_rate"),
        )
    )


_HBOS_SQL = """
WITH e AS (
    SELECT event_id, value,
           CAST(extract(hour FROM ts) AS BIGINT) AS hod,
           CAST(least(floor(value / 10.0), 9) AS BIGINT) AS vbin
    FROM events WHERE value IS NOT NULL AND value >= 0),
tot AS (SELECT count(*) AS n FROM e),
hv AS (SELECT vbin, count(*) AS c FROM e GROUP BY vbin),
hh AS (SELECT hod, count(*) AS c FROM e GROUP BY hod),
scored AS (
    SELECT e.event_id, e.vbin, e.hod,
           -ln(hv.c * 1.0 / t.n) - ln(hh.c * 1.0 / t.n) AS hbos
    FROM e
    JOIN hv ON e.vbin = hv.vbin
    JOIN hh ON e.hod = hh.hod
    CROSS JOIN tot t)
SELECT event_id, vbin, hod, round(hbos, 6) + 0.0 AS hbos
FROM (
    SELECT *, row_number() OVER (
        ORDER BY hbos DESC, event_id) AS rnk
    FROM scored)
WHERE rnk <= 50
"""


@register("events_hbos_outliers", _HBOS_SQL)
def q_events_hbos_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-Based Outlier Score (Goldstein & Dengel 2012): per
    feature (value decile bin, hour of day), an independent histogram;
    an event's score is the summed negative log density of its bins —
    rare feature COMBINATIONS via rare marginals, no pairwise
    covariance, no iterations. The density-estimation complement to
    the z-score/MAD fences: two tiny broadcast histograms scored
    against the full stream in one map pass, then a global top-50.
    Integer bin counts divide once before the log; event-id tiebreak
    pins the ranking."""
    from realtime_analytics_pipeline_spark.sources.batch import load_events

    ev = load_events(spark, sf_dir)
    e = ev.where(
        F.col("value").isNotNull() & (F.col("value") >= 0)
    ).select(
        F.col("event_id").cast("bigint").alias("event_id"),
        F.hour("event_time").cast("bigint").alias("hod"),
        F.least(F.floor(F.col("value") / 10.0), F.lit(9))
        .cast("bigint")
        .alias("vbin"),
    )
    tot = e.agg(F.count(F.lit(1)).alias("n"))
    hv = e.groupBy("vbin").agg(F.count(F.lit(1)).alias("cv"))
    hh = e.groupBy("hod").agg(F.count(F.lit(1)).alias("ch"))
    scored = (
        e.join(F.broadcast(hv), "vbin")
        .join(F.broadcast(hh), "hod")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "hbos",
            -F.log(F.col("cv") * 1.0 / F.col("n"))
            - F.log(F.col("ch") * 1.0 / F.col("n")),
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("hbos").desc(), F.col("event_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 50)
        .select(
            "event_id",
            "vbin",
            "hod",
            (F.round("hbos", 6) + F.lit(0.0)).alias("hbos"),
        )
    )


_ABC_XYZ_SQL = """
WITH monthly AS (
    SELECT l.l_partkey,
           date_trunc('month', o.o_orderdate) AS m,
           sum(CAST(round(l.l_extendedprice) AS BIGINT)) AS rev,
           sum(CAST(l.l_quantity AS BIGINT)) AS qty
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2),
parts AS (
    SELECT l_partkey,
           sum(rev) AS total_rev,
           count(*) AS n_months,
           sum(qty) AS sq,
           sum(qty * qty) AS sqq
    FROM monthly GROUP BY l_partkey),
cv AS (
    SELECT l_partkey, total_rev,
           round(sqrt((sqq * 1.0 / n_months)
                      - (sq * 1.0 / n_months) * (sq * 1.0 / n_months))
                 / (sq * 1.0 / n_months), 6) AS cv
    FROM parts WHERE n_months >= 3 AND sq > 0),
ranked AS (
    SELECT l_partkey, cv,
           sum(total_rev) OVER (ORDER BY total_rev DESC, l_partkey
                                ROWS UNBOUNDED PRECEDING) * 1.0
               / sum(total_rev) OVER () AS cum_share
    FROM cv),
classed AS (
    SELECT CASE WHEN cum_share <= 0.8 THEN 'A'
                WHEN cum_share <= 0.95 THEN 'B' ELSE 'C' END AS abc,
           CASE WHEN cv < 0.5 THEN 'X'
                WHEN cv < 1.0 THEN 'Y' ELSE 'Z' END AS xyz,
           cv
    FROM ranked)
SELECT abc, xyz,
       count(*) AS n_parts,
       round(avg(cv), 6) + 0.0 AS mean_cv
FROM classed GROUP BY abc, xyz
"""


@register("parts_abc_xyz_matrix", _ABC_XYZ_SQL)
def q_parts_abc_xyz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC-XYZ inventory matrix: revenue-concentration class (A/B/C by
    cumulative 80/95% share, deterministic partkey tiebreak in the
    running sum) crossed with demand-variability class (X/Y/Z by the
    coefficient of variation of monthly quantity, computed from exact
    integer moments and rounded BEFORE thresholding so both engines
    class identically). The planning matrix behind stocking policy —
    A-X (high value, stable) automates; C-Z (low value, erratic) gets
    dropped. One join + two aggregations + one window pass."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    monthly = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(
            "l_partkey", F.date_trunc("month", "o_orderdate").alias("m")
        )
        .agg(
            F.sum(F.round("l_extendedprice").cast("bigint")).alias("rev"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("qty"),
        )
    )
    parts = monthly.groupBy("l_partkey").agg(
        F.sum("rev").alias("total_rev"),
        F.count(F.lit(1)).alias("n_months"),
        F.sum("qty").alias("sq"),
        F.sum(F.col("qty") * F.col("qty")).alias("sqq"),
    )
    mean_q = F.col("sq") * 1.0 / F.col("n_months")
    cv = parts.where(
        (F.col("n_months") >= 3) & (F.col("sq") > 0)
    ).select(
        "l_partkey",
        "total_rev",
        F.round(
            F.sqrt(F.col("sqq") * 1.0 / F.col("n_months") - mean_q * mean_q)
            / mean_q,
            6,
        ).alias("cv"),
    )
    w = Window.orderBy(F.col("total_rev").desc(), "l_partkey").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = cv.select(
        "cv",
        (
            F.sum("total_rev").over(w)
            * 1.0
            / F.sum("total_rev").over(
                Window.partitionBy()
            )
        ).alias("cum_share"),
    )
    classed = ranked.select(
        F.when(F.col("cum_share") <= 0.8, "A")
        .when(F.col("cum_share") <= 0.95, "B")
        .otherwise("C")
        .alias("abc"),
        F.when(F.col("cv") < 0.5, "X")
        .when(F.col("cv") < 1.0, "Y")
        .otherwise("Z")
        .alias("xyz"),
        "cv",
    )
    return classed.groupBy("abc", "xyz").agg(
        F.count(F.lit(1)).alias("n_parts"),
        (F.round(F.avg("cv"), 6) + F.lit(0.0)).alias("mean_cv"),
    )


_MI_SQL = """
WITH joint AS (
    SELECT event_type AS t, CAST(extract(hour FROM ts) AS BIGINT) AS h,
           count(*) AS c
    FROM events GROUP BY 1, 2),
mt AS (SELECT t, sum(c) AS ct FROM joint GROUP BY t),
mh AS (SELECT h, sum(c) AS ch FROM joint GROUP BY h),
n AS (SELECT sum(c) AS n FROM joint)
SELECT CAST(count(*) AS BIGINT) AS n_cells,
       round(sum((j.c * 1.0 / n.n)
                 * ln((j.c * 1.0 / n.n)
                      / ((mt.ct * 1.0 / n.n) * (mh.ch * 1.0 / n.n)))), 6)
           + 0.0 AS mutual_information,
       round(-sum(CASE WHEN rn = 1
                       THEN (mt.ct * 1.0 / n.n) * ln(mt.ct * 1.0 / n.n)
                       ELSE 0 END), 6) + 0.0 AS type_entropy
FROM (
    SELECT *, row_number() OVER (PARTITION BY t ORDER BY h) AS rn
    FROM joint) j
JOIN mt ON j.t = mt.t
JOIN mh ON j.h = mh.h
CROSS JOIN n
"""


@register("events_type_hour_mi", _MI_SQL)
def q_events_type_hour_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between event type and hour of day — the
    categorical-association test (MI = 0 iff independent): do types
    have time-of-day structure, and how much of the type entropy does
    the hour explain? All probabilities come from one joint count
    table and its two marginals (exact integers, one division per
    term); the type-entropy term sums each type once via an rn=1
    guard so both engines add identical term sets."""
    from pyspark.sql import Window

    from realtime_analytics_pipeline_spark.sources.batch import load_events

    ev = load_events(spark, sf_dir)
    joint = ev.groupBy(
        F.col("event_type").alias("t"),
        F.hour("event_time").cast("bigint").alias("h"),
    ).agg(F.count(F.lit(1)).alias("c"))
    mt = joint.groupBy("t").agg(F.sum("c").alias("ct"))
    mh = joint.groupBy("h").agg(F.sum("c").alias("ch"))
    n = joint.agg(F.sum("c").alias("n"))
    w = Window.partitionBy("t").orderBy("h")
    j = joint.withColumn("rn", F.row_number().over(w))
    pxy = F.col("c") * 1.0 / F.col("n")
    px = F.col("ct") * 1.0 / F.col("n")
    py = F.col("ch") * 1.0 / F.col("n")
    return (
        j.join(F.broadcast(mt), "t")
        .join(F.broadcast(mh), "h")
        .crossJoin(F.broadcast(n))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cells"),
            (
                F.round(F.sum(pxy * F.log(pxy / (px * py))), 6)
                + F.lit(0.0)
            ).alias("mutual_information"),
            (
                F.round(
                    -F.sum(
                        F.when(F.col("rn") == 1, px * F.log(px)).otherwise(
                            0.0
                        )
                    ),
                    6,
                )
                + F.lit(0.0)
            ).alias("type_entropy"),
        )
    )


_ACF_SQL = """
WITH daily AS (
    SELECT event_type, date_trunc('day', ts) AS d,
           CAST(count(*) AS DOUBLE) AS y
    FROM events GROUP BY 1, 2),
lagged AS (
    SELECT event_type, d, y,
           lag(y, 1) OVER w AS y1,
           lag(y, 2) OVER w AS y2,
           lag(y, 7) OVER w AS y7
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY d)),
stats AS (
    SELECT event_type,
           count(*) AS n, sum(y) AS sy, sum(y * y) AS syy,
           sum(y * y1) AS p1, count(y1) AS n1, sum(y1) AS s1,
           sum(y * y2) AS p2, count(y2) AS n2, sum(y2) AS s2,
           sum(y * y7) AS p7, count(y7) AS n7, sum(y7) AS s7
    FROM lagged GROUP BY event_type)
SELECT event_type,
       CAST(n AS BIGINT) AS n_days,
       round((p1 - sy * s1 / n) / (syy - sy * sy / n), 6) + 0.0 AS acf_1,
       round((p2 - sy * s2 / n) / (syy - sy * sy / n), 6) + 0.0 AS acf_2,
       round((p7 - sy * s7 / n) / (syy - sy * sy / n), 6) + 0.0 AS acf_7
FROM stats
"""


@register("events_daily_acf", _ACF_SQL)
def q_events_daily_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of daily event counts at lags 1, 2, and 7 —
    the series-memory diagnostic (a strong lag-7 reveals weekly
    seasonality; near-zero everywhere says the gap-fill/forecast
    queries face noise). Standard large-n ACF normalization: lagged
    cross-moments over the full-series variance, every sum an exact
    integer-valued double, one window pass + one aggregation."""
    from pyspark.sql import Window

    from realtime_analytics_pipeline_spark.sources.batch import load_events

    ev = load_events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "event_time").alias("d")
    ).agg(F.count("*").cast("double").alias("y"))
    w = Window.partitionBy("event_type").orderBy("d")
    lagged = daily.select(
        "event_type",
        "y",
        F.lag("y", 1).over(w).alias("y1"),
        F.lag("y", 2).over(w).alias("y2"),
        F.lag("y", 7).over(w).alias("y7"),
    )
    s = lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("y") * F.col("y1")).alias("p1"),
        F.sum("y1").alias("s1"),
        F.sum(F.col("y") * F.col("y2")).alias("p2"),
        F.sum("y2").alias("s2"),
        F.sum(F.col("y") * F.col("y7")).alias("p7"),
        F.sum("y7").alias("s7"),
    )
    den = F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")

    def acf(p, sl):
        return (
            F.round(
                (F.col(p) - F.col("sy") * F.col(sl) / F.col("n")) / den, 6
            )
            + F.lit(0.0)
        )

    return s.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_days"),
        acf("p1", "s1").alias("acf_1"),
        acf("p2", "s2").alias("acf_2"),
        acf("p7", "s7").alias("acf_7"),
    )


_BULLWHIP_SQL = """
WITH m_orders AS (
    SELECT date_trunc('month', o_orderdate) AS m,
           CAST(count(*) AS DOUBLE) AS y
    FROM orders GROUP BY 1),
m_demand AS (
    SELECT date_trunc('month', o.o_orderdate) AS m,
           CAST(sum(l.l_quantity) AS DOUBLE) AS y
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1),
vo AS (
    SELECT count(*) AS n, sum(y) AS s, sum(y * y) AS ss FROM m_orders),
vd AS (
    SELECT count(*) AS n, sum(y) AS s, sum(y * y) AS ss FROM m_demand)
SELECT CAST(vo.n AS BIGINT) AS n_months,
       round((vo.ss / vo.n - (vo.s / vo.n) * (vo.s / vo.n))
             / ((vo.s / vo.n) * (vo.s / vo.n)), 6) + 0.0
           AS cv2_orders,
       round((vd.ss / vd.n - (vd.s / vd.n) * (vd.s / vd.n))
             / ((vd.s / vd.n) * (vd.s / vd.n)), 6) + 0.0
           AS cv2_demand,
       round(((vo.ss / vo.n - (vo.s / vo.n) * (vo.s / vo.n))
              / ((vo.s / vo.n) * (vo.s / vo.n)))
             / ((vd.ss / vd.n - (vd.s / vd.n) * (vd.s / vd.n))
                / ((vd.s / vd.n) * (vd.s / vd.n))), 6) + 0.0
           AS bullwhip_ratio
FROM vo, vd
"""


@register("orders_bullwhip_ratio", _BULLWHIP_SQL)
def q_orders_bullwhip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bullwhip measurement (Lee et al. 1997): squared coefficient of
    variation of the monthly ORDER stream over that of the underlying
    monthly DEMAND (summed line quantities) — ratio > 1 means order
    batching amplifies variability upstream. Two tiny moment
    aggregations (exact integer-valued sums, divisions at the end),
    one broadcast cross."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    mo = orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("m")
    ).agg(F.count("*").cast("double").alias("y"))
    md = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(F.date_trunc("month", "o_orderdate").alias("m"))
        .agg(F.sum("l_quantity").cast("double").alias("y"))
    )

    def moments(df, pfx):
        return df.agg(
            F.count(F.lit(1)).alias(f"{pfx}n"),
            F.sum("y").alias(f"{pfx}s"),
            F.sum(F.col("y") * F.col("y")).alias(f"{pfx}ss"),
        )

    vo = moments(mo, "o")
    vd = moments(md, "d")

    def cv2(pfx):
        mean = F.col(f"{pfx}s") / F.col(f"{pfx}n")
        var = F.col(f"{pfx}ss") / F.col(f"{pfx}n") - mean * mean
        return var / (mean * mean)

    return vo.crossJoin(F.broadcast(vd)).select(
        F.col("on").cast("bigint").alias("n_months"),
        (F.round(cv2("o"), 6) + F.lit(0.0)).alias("cv2_orders"),
        (F.round(cv2("d"), 6) + F.lit(0.0)).alias("cv2_demand"),
        (F.round(cv2("o") / cv2("d"), 6) + F.lit(0.0)).alias(
            "bullwhip_ratio"
        ),
    )


_CHURN_RISK_SQL = """
WITH per_cust AS (
    SELECT o_custkey,
           count(*) AS n_orders,
           max(o_orderdate) AS last_order,
           CAST(epoch_ms(max(o_orderdate)) - epoch_ms(min(o_orderdate))
                AS BIGINT) AS span_ms
    FROM orders GROUP BY o_custkey),
cadence AS (
    SELECT o_custkey, n_orders, last_order,
           span_ms / (n_orders - 1) AS mean_gap_ms
    FROM per_cust WHERE n_orders >= 3),
now_ref AS (SELECT max(o_orderdate) AS now FROM orders),
flags AS (
    SELECT c.o_custkey, c.n_orders,
           CAST(epoch_ms(r.now) - epoch_ms(c.last_order) AS BIGINT)
               AS silence_ms,
           c.mean_gap_ms,
           CASE WHEN epoch_ms(r.now) - epoch_ms(c.last_order)
                     > 2 * c.mean_gap_ms
                THEN 1 ELSE 0 END AS at_risk
    FROM cadence c, now_ref r)
SELECT CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(at_risk) AS BIGINT) AS n_at_risk,
       round(sum(at_risk) * 1.0 / count(*), 6) + 0.0 AS at_risk_rate,
       round(avg(silence_ms * 1.0 / mean_gap_ms), 6) + 0.0
           AS mean_silence_ratio
FROM flags
"""


@register("customers_churn_risk", _CHURN_RISK_SQL)
def q_customers_churn_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cadence-based churn risk: a repeat customer (≥3 orders) is
    at-risk when their silence since the last order exceeds twice
    their own mean inter-order gap — each customer judged against
    their OWN rhythm, not a global cutoff. Integer epoch-ms
    arithmetic throughout; "now" is the dataset's last order date so
    the flag is reproducible. One aggregation + one broadcast scalar."""

    orders = load_table(spark, sf_dir, "orders")
    per = orders.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        F.max("o_orderdate").alias("last_order"),
        (
            F.unix_millis(F.max("o_orderdate"))
            - F.unix_millis(F.min("o_orderdate"))
        )
        .cast("bigint")
        .alias("span_ms"),
    )
    cadence = per.where(F.col("n_orders") >= 3).withColumn(
        "mean_gap_ms", F.col("span_ms") / (F.col("n_orders") - 1)
    )
    now_ref = orders.agg(F.max("o_orderdate").alias("now"))
    flags = cadence.crossJoin(F.broadcast(now_ref)).select(
        "n_orders",
        (
            F.unix_millis("now") - F.unix_millis("last_order")
        )
        .cast("bigint")
        .alias("silence_ms"),
        "mean_gap_ms",
    ).withColumn(
        "at_risk",
        F.when(
            F.col("silence_ms") > 2 * F.col("mean_gap_ms"), 1
        ).otherwise(0),
    )
    return flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("at_risk").cast("bigint").alias("n_at_risk"),
        (
            F.round(F.sum("at_risk") / F.count(F.lit(1)), 6) + F.lit(0.0)
        ).alias("at_risk_rate"),
        (
            F.round(
                F.avg(F.col("silence_ms") * 1.0 / F.col("mean_gap_ms")), 6
            )
            + F.lit(0.0)
        ).alias("mean_silence_ratio"),
    )


_AGING_SQL = """
WITH now_ref AS (SELECT max(o_orderdate) AS now FROM orders),
open_orders AS (
    SELECT o.o_orderpriority AS priority,
           CAST((epoch_ms(r.now) - epoch_ms(o.o_orderdate)) // 86400000
                AS BIGINT) AS age_days,
           CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
    FROM orders o, now_ref r
    WHERE o.o_orderstatus = 'O'),
bucketed AS (
    SELECT priority,
           CASE WHEN age_days <= 30 THEN '0-30'
                WHEN age_days <= 90 THEN '31-90'
                WHEN age_days <= 365 THEN '91-365'
                ELSE '365+' END AS age_bucket,
           cents
    FROM open_orders)
SELECT priority, age_bucket,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS open_value_cents
FROM bucketed GROUP BY priority, age_bucket
"""


@register("orders_open_aging", _AGING_SQL)
def q_orders_open_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order aging report: orders still in status 'O', bucketed
    by days outstanding (against the dataset's last order date, so the
    report is reproducible) with the capital tied up in each bucket —
    the operations view behind fulfillment SLAs and working-capital
    analysis. Pushed status filter, integer day/cents arithmetic, one
    aggregation."""
    orders = load_table(spark, sf_dir, "orders")
    now_ref = orders.agg(F.max("o_orderdate").alias("now"))
    open_orders = (
        orders.where(F.col("o_orderstatus") == "O")
        .crossJoin(F.broadcast(now_ref))
        .select(
            F.col("o_orderpriority").alias("priority"),
            (
                (
                    F.unix_millis("now")
                    - F.unix_millis("o_orderdate")
                )
                / F.lit(86400000)
            )
            .cast("bigint")
            .alias("age_days"),
            F.round(F.col("o_totalprice") * 100)
            .cast("bigint")
            .alias("cents"),
        )
    )
    bucketed = open_orders.select(
        "priority",
        F.when(F.col("age_days") <= 30, "0-30")
        .when(F.col("age_days") <= 90, "31-90")
        .when(F.col("age_days") <= 365, "91-365")
        .otherwise("365+")
        .alias("age_bucket"),
        "cents",
    )
    return bucketed.groupBy("priority", "age_bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("cents").cast("bigint").alias("open_value_cents"),
    )


_SUPPLIER_RETURNS_SQL = """
WITH per_supp AS (
    SELECT l_suppkey,
           count(*) AS n_lines,
           sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS n_returned
    FROM lineitem GROUP BY l_suppkey),
g AS (
    SELECT sum(n_returned) * 1.0 / sum(n_lines) AS p0 FROM per_supp)
SELECT l_suppkey,
       CAST(n_lines AS BIGINT) AS n_lines,
       CAST(n_returned AS BIGINT) AS n_returned,
       round(n_returned * 1.0 / n_lines, 6) + 0.0 AS return_rate,
       round((n_returned * 1.0 / n_lines - p0)
             / sqrt(p0 * (1 - p0) / n_lines), 6) + 0.0 AS z_vs_global
FROM (
    SELECT s.*, g.p0,
           row_number() OVER (
               ORDER BY (s.n_returned * 1.0 / s.n_lines - g.p0)
                        / sqrt(g.p0 * (1 - g.p0) / s.n_lines) DESC,
                        s.l_suppkey) AS rnk
    FROM per_supp s, g
    WHERE s.n_lines >= 20)
WHERE rnk <= 10
"""


@register("suppliers_return_outliers", _SUPPLIER_RETURNS_SQL)
def q_suppliers_return_outliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Supplier quality scorecard: suppliers whose return rate exceeds
    the corpus rate by the most binomial standard errors — top-10
    worst offenders (volume gate keeps tiny suppliers from alerting on
    one return) — the proportion-test screen procurement teams run.
    Exact integer counts everywhere; one aggregation + a broadcast
    global rate + one rank."""
    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
        ).alias("n_returned"),
    )
    g = per.agg(
        (F.sum("n_returned") * 1.0 / F.sum("n_lines")).alias("p0")
    )
    rate = F.col("n_returned") * 1.0 / F.col("n_lines")
    z = (rate - F.col("p0")) / F.sqrt(
        F.col("p0") * (1 - F.col("p0")) / F.col("n_lines")
    )
    from pyspark.sql import Window

    scored = (
        per.crossJoin(F.broadcast(g))
        .where(F.col("n_lines") >= 20)
        .withColumn("z", z)
    )
    w = Window.orderBy(F.col("z").desc(), F.col("l_suppkey"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 10)
        .select(
            "l_suppkey",
            F.col("n_lines").cast("bigint").alias("n_lines"),
            F.col("n_returned").cast("bigint").alias("n_returned"),
            (F.round(rate, 6) + F.lit(0.0)).alias("return_rate"),
            (F.round("z", 6) + F.lit(0.0)).alias("z_vs_global"),
        )
    )


_DECILE_MIGRATION_SQL = """
WITH halves AS (
    SELECT o_custkey,
           CASE WHEN o_orderdate < TIMESTAMP '1998-06-01' THEN 0 ELSE 1 END
               AS half,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
    FROM orders GROUP BY 1, 2),
decile AS (
    SELECT o_custkey, half,
           ntile(10) OVER (PARTITION BY half
                           ORDER BY cents DESC, o_custkey) AS dec
    FROM halves),
paired AS (
    SELECT a.dec AS dec_h1, b.dec AS dec_h2
    FROM decile a JOIN decile b
      ON a.o_custkey = b.o_custkey AND a.half = 0 AND b.half = 1)
SELECT CAST(dec_h1 AS BIGINT) AS dec_h1,
       CAST(dec_h2 AS BIGINT) AS dec_h2,
       CAST(count(*) AS BIGINT) AS n_customers
FROM paired GROUP BY dec_h1, dec_h2
"""


@register("customers_decile_migration", _DECILE_MIGRATION_SQL)
def q_customers_decile_migration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Revenue-decile migration matrix: customers ranked into spend
    deciles in each half of the history (ntile with custkey tiebreak,
    so both engines cut identically), then the 10x10 transition counts
    for customers present in both — the retention-marketing staple
    showing whether top-decile customers stay on the diagonal or bleed
    down. Two window passes + one self-join on customer."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    cut = F.lit("1998-06-01").cast("timestamp")
    halves = orders.groupBy(
        "o_custkey",
        F.when(F.col("o_orderdate") < cut, 0).otherwise(1).alias("half"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "cents"
        )
    )
    w = Window.partitionBy("half").orderBy(
        F.col("cents").desc(), F.col("o_custkey")
    )
    dec = halves.withColumn("dec", F.ntile(10).over(w))
    a = dec.where(F.col("half") == 0).select(
        F.col("o_custkey").alias("ck"), F.col("dec").alias("dec_h1")
    )
    b = dec.where(F.col("half") == 1).select(
        F.col("o_custkey").alias("ck"), F.col("dec").alias("dec_h2")
    )
    return (
        a.join(b, "ck")
        .groupBy(
            F.col("dec_h1").cast("bigint").alias("dec_h1"),
            F.col("dec_h2").cast("bigint").alias("dec_h2"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))
    )


_VELOCITY_SQL = """
WITH now_ref AS (SELECT max(ts) AS now FROM events),
feats AS (
    SELECT e.user_id,
           count(*) AS n_30d,
           sum(CASE WHEN e.ts >= r.now - INTERVAL 7 DAY
                    THEN 1 ELSE 0 END) AS n_7d,
           sum(CASE WHEN e.ts >= r.now - INTERVAL 1 DAY
                    THEN 1 ELSE 0 END) AS n_1d,
           sum(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END)
               AS n_buy_30d
    FROM events e, now_ref r
    WHERE e.ts >= r.now - INTERVAL 30 DAY
    GROUP BY e.user_id)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(n_30d AS BIGINT) AS n_30d,
       CAST(n_7d AS BIGINT) AS n_7d,
       CAST(n_1d AS BIGINT) AS n_1d,
       CAST(n_buy_30d AS BIGINT) AS n_buy_30d,
       round(n_7d * 1.0 / n_30d, 6) + 0.0 AS recency_ratio_7_30,
       round(n_buy_30d * 1.0 / n_30d, 6) + 0.0 AS buy_ratio_30d
FROM feats
"""


@register("users_velocity_features", _VELOCITY_SQL)
def q_users_velocity_features(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Feature-store snapshot: per-user activity velocity at 1/7/30-day
    horizons plus purchase intensity, anchored at the dataset's last
    event (reproducible "now") — the multi-horizon conditional-count
    pattern behind churn/propensity features, computed in ONE pass
    (each horizon is a CASE inside the same aggregation, not a
    separate scan). Exact integer counts with two edge divisions."""
    from realtime_analytics_pipeline_spark.sources.batch import load_events

    ev = load_events(spark, sf_dir)
    now_ref = ev.agg(F.max("event_time").alias("now"))
    day_us = 86400 * 1000000
    feats = (
        ev.crossJoin(F.broadcast(now_ref))
        .where(
            F.unix_micros("event_time")
            >= F.unix_micros("now") - 30 * day_us
        )
        .groupBy(F.col("user_id").cast("bigint").alias("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_30d"),
            F.sum(
                F.when(
                    F.unix_micros("event_time")
                    >= F.unix_micros("now") - 7 * day_us,
                    1,
                ).otherwise(0)
            ).alias("n_7d"),
            F.sum(
                F.when(
                    F.unix_micros("event_time")
                    >= F.unix_micros("now") - day_us,
                    1,
                ).otherwise(0)
            ).alias("n_1d"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("n_buy_30d"),
        )
    )
    return feats.select(
        "user_id",
        F.col("n_30d").cast("bigint").alias("n_30d"),
        F.col("n_7d").cast("bigint").alias("n_7d"),
        F.col("n_1d").cast("bigint").alias("n_1d"),
        F.col("n_buy_30d").cast("bigint").alias("n_buy_30d"),
        (
            F.round(F.col("n_7d") / F.col("n_30d"), 6) + F.lit(0.0)
        ).alias("recency_ratio_7_30"),
        (
            F.round(F.col("n_buy_30d") / F.col("n_30d"), 6) + F.lit(0.0)
        ).alias("buy_ratio_30d"),
    )


_DUP_INVOICE_SQL = """
WITH o AS (
    SELECT o_orderkey, o_custkey,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
           epoch_ms(o_orderdate) AS ms
    FROM orders)
SELECT a.o_custkey AS custkey,
       a.o_orderkey AS order_a,
       b.o_orderkey AS order_b,
       CAST(abs(a.cents - b.cents) AS BIGINT) AS diff_cents,
       CAST(abs(b.ms - a.ms) // 86400000 AS BIGINT) AS days_apart
FROM o a JOIN o b
  ON a.o_custkey = b.o_custkey
 AND a.o_orderkey < b.o_orderkey
 AND abs(a.cents - b.cents) <= 100000
 AND abs(b.ms - a.ms) <= CAST(90 AS BIGINT) * 86400000
"""


@register("orders_duplicate_invoices", _DUP_INVOICE_SQL)
def q_orders_duplicate_invoices(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Similar-invoice audit: pairs of orders from the same customer
    with totals within $1000 and dates within 90 days — the AP
    double-billing screen (exact-equality matching finds nothing on
    continuous synthetic totals, so the tolerance form is the
    informative one). SCALE SHAPE: the probe side fans out to three
    adjacent $1000 amount bands so the join stays EQUI on (customer,
    band) — banding is complete because band width equals the
    tolerance — and the exact |diff| filter verifies after; a naive
    inequality self-join would be per-customer quadratic with no
    equi key. Ordered keys + distinct keep each pair once."""
    orders = load_table(spark, sf_dir, "orders")
    tol = 100000  # $1000 in cents; also the band width (complete)
    o = orders.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.unix_millis("o_orderdate").alias("ms"),
    ).withColumn("bucket", (F.col("cents") / F.lit(tol)).cast("bigint"))
    # probe side fans out to the 3 adjacent amount bands so the join
    # is EQUI on (custkey, band) — any pair within tol shares one of
    # them (banding complete because band width == tolerance)
    a = o.select(
        F.col("o_orderkey").alias("a_key"),
        F.col("o_custkey").alias("a_cust"),
        F.col("cents").alias("a_cents"),
        F.col("ms").alias("a_ms"),
        F.explode(
            F.array(
                F.col("bucket") - 1, F.col("bucket"), F.col("bucket") + 1
            )
        ).alias("band"),
    )
    b = o.select(
        F.col("o_orderkey").alias("b_key"),
        F.col("o_custkey").alias("b_cust"),
        F.col("cents").alias("b_cents"),
        F.col("ms").alias("b_ms"),
        F.col("bucket").alias("b_band"),
    )
    day_ms = 86400000
    return (
        a.join(
            b,
            (F.col("a_cust") == F.col("b_cust"))
            & (F.col("band") == F.col("b_band"))
            & (F.col("a_key") < F.col("b_key")),
        )
        .where(
            (F.abs(F.col("a_cents") - F.col("b_cents")) <= tol)
            & (F.abs(F.col("b_ms") - F.col("a_ms")) <= 90 * day_ms)
        )
        .select(
            F.col("a_cust").alias("custkey"),
            F.col("a_key").alias("order_a"),
            F.col("b_key").alias("order_b"),
            F.abs(F.col("a_cents") - F.col("b_cents"))
            .cast("bigint")
            .alias("diff_cents"),
            (F.abs(F.col("b_ms") - F.col("a_ms")) / F.lit(day_ms))
            .cast("bigint")
            .alias("days_apart"),
        )
        .distinct()
    )


_PRICE_INDEX_SQL = """
WITH li AS (
    SELECT l.l_partkey,
           date_trunc('month', o.o_orderdate) AS m,
           CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty,
           CAST(round(avg(l.l_extendedprice / l.l_quantity) * 100)
                AS BIGINT) AS unit_cents
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_quantity > 0
    GROUP BY 1, 2),
base AS (
    SELECT l_partkey,
           sum(qty) AS q0,
           CAST(round(sum(unit_cents * qty) * 1.0 / sum(qty)) AS BIGINT)
               AS p0
    FROM li WHERE m < TIMESTAMP '1996-01-01'
    GROUP BY l_partkey),
monthly AS (
    SELECT li.m,
           sum(li.unit_cents * b.q0) AS pt_q0,
           sum(b.p0 * b.q0) AS p0_q0
    FROM li JOIN base b ON li.l_partkey = b.l_partkey
    WHERE li.m >= TIMESTAMP '1996-01-01'
    GROUP BY li.m)
SELECT epoch_ms(m) AS month_ms,
       round(pt_q0 * 100.0 / p0_q0, 6) + 0.0 AS laspeyres_index
FROM monthly
"""


@register("orders_price_index_laspeyres", _PRICE_INDEX_SQL)
def q_orders_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres price index: monthly price level of the base-period
    basket (1995 quantities at base prices = 100) — the fixed-basket
    inflation measure, computed from integer unit-price cents and
    integer base quantities so every month's index is a single exact
    ratio. Parts unsold in a month simply drop from that month's
    numerator (chained imputation is a modeling choice this query
    deliberately avoids); the basket join broadcasts the base table."""
    li_t = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    li = (
        li_t.where(F.col("l_quantity") > 0)
        .join(orders, li_t["l_orderkey"] == orders["o_orderkey"])
        .groupBy(
            "l_partkey", F.date_trunc("month", "o_orderdate").alias("m")
        )
        .agg(
            F.sum(F.col("l_quantity").cast("bigint")).alias("qty"),
            F.round(
                F.avg(F.col("l_extendedprice") / F.col("l_quantity")) * 100
            )
            .cast("bigint")
            .alias("unit_cents"),
        )
    )
    cut = F.lit("1996-01-01").cast("timestamp")
    base = (
        li.where(F.col("m") < cut)
        .groupBy("l_partkey")
        .agg(
            F.sum("qty").alias("q0"),
            F.round(
                F.sum(F.col("unit_cents") * F.col("qty"))
                * 1.0
                / F.sum("qty")
            )
            .cast("bigint")
            .alias("p0"),
        )
    )
    monthly = (
        li.where(F.col("m") >= cut)
        .join(F.broadcast(base), "l_partkey")
        .groupBy("m")
        .agg(
            F.sum(F.col("unit_cents") * F.col("q0")).alias("pt_q0"),
            F.sum(F.col("p0") * F.col("q0")).alias("p0_q0"),
        )
    )
    return monthly.select(
        F.unix_millis("m").alias("month_ms"),
        (
            F.round(F.col("pt_q0") * 100.0 / F.col("p0_q0"), 6)
            + F.lit(0.0)
        ).alias("laspeyres_index"),
    )


# --------------------------------------------------------------------------
# CUSUM drift detection (round 6) — Page's test via prefix-sum minus
# prefix-min (the distributed closed form of the sequential recurrence).
# --------------------------------------------------------------------------

_CUSUM_SQL = """
WITH m AS (
    SELECT (epoch_ms(ts) // 60000) * 60000 AS minute_ms,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM events GROUP BY 1
),
t AS (
    SELECT CAST(floor(sum(total_cents) * 1.0 / count(*)) AS BIGINT)
        AS target_cents
    FROM m
),
c AS (
    SELECT minute_ms, total_cents, target_cents,
           sum(total_cents - target_cents) OVER (
               ORDER BY minute_ms ROWS UNBOUNDED PRECEDING) AS cum
    FROM m CROSS JOIN t
),
d AS (
    SELECT *, least(min(cum) OVER (
        ORDER BY minute_ms ROWS UNBOUNDED PRECEDING), 0) AS mn
    FROM c
)
SELECT minute_ms, total_cents, target_cents,
       CAST(cum - mn AS BIGINT) AS cusum_pos,
       (cum - mn) > 2 * target_cents AS is_drift
FROM d
"""


@register("events_cusum_drift", _CUSUM_SQL)
def q_events_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM over per-minute value mass, integer cents
    throughout (operators/timeseries.py::cusum_drift)."""
    from realtime_analytics_pipeline_spark.operators.timeseries import (
        cusum_drift,
    )

    ev = load_events(spark, sf_dir).select(
        F.unix_millis("event_time").alias("event_ms"), "value"
    )
    return cusum_drift(ev)


# --------------------------------------------------------------------------
# Salted skew join (round 6): the skew-mitigation TRANSFORM gated for
# correctness — the oracle is the plain relational join, so any salt
# mistake (lost rows, duplicated rows, salt leaking into the agg)
# hash-mismatches.
# --------------------------------------------------------------------------

_SALTED_SQL = """
SELECT c_nationkey,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS total_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1
"""


@register("orders_salted_skew_join", _SALTED_SQL)
def q_orders_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-side salt ×8 + dim-side replication: the standard hot-key
    defense when the dim is too big to broadcast and a handful of join
    keys dominate (AQE's skewedJoin handles stragglers adaptively;
    explicit salting is the deterministic form you reach for when one
    key alone exceeds an executor). The salt must vanish from the
    result — that is exactly what the plain-join oracle checks."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    n_salt = 8
    fact = orders.withColumn(
        "_fsalt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salt))
    )
    dim = customer.withColumn(
        "_dsalt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<long>")),
    )
    joined = fact.join(
        dim,
        (F.col("o_custkey") == F.col("c_custkey"))
        & (F.col("_fsalt") == F.col("_dsalt")),
    )
    return (
        joined.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("total_cents"),
        )
    )


_GAP_FILL_SQL = """
WITH m AS (
    SELECT (epoch_ms(ts) // 60000) * 60000 AS minute_ms,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS obs_cents
    FROM events GROUP BY 1
),
bounds AS (SELECT min(minute_ms) AS lo, max(minute_ms) AS hi FROM m),
spine AS (
    SELECT unnest(range(lo, hi + 60000, 60000)) AS minute_ms FROM bounds
),
dense AS (
    SELECT s.minute_ms, m.obs_cents FROM spine s
    LEFT JOIN m ON s.minute_ms = m.minute_ms
),
w AS (
    SELECT minute_ms, obs_cents,
           last_value(obs_cents IGNORE NULLS) OVER (
               ORDER BY minute_ms ROWS UNBOUNDED PRECEDING) AS pv,
           last_value(CASE WHEN obs_cents IS NOT NULL THEN minute_ms END
                      IGNORE NULLS) OVER (
               ORDER BY minute_ms ROWS UNBOUNDED PRECEDING) AS pt,
           first_value(obs_cents IGNORE NULLS) OVER (
               ORDER BY minute_ms
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
           first_value(CASE WHEN obs_cents IS NOT NULL THEN minute_ms END
                       IGNORE NULLS) OVER (
               ORDER BY minute_ms
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
    FROM dense
)
SELECT minute_ms, obs_cents,
       CAST(CASE WHEN obs_cents IS NOT NULL THEN obs_cents
                 ELSE pv + floor((nv - pv) * (minute_ms - pt) * 1.0
                                 / (nt - pt))
            END AS BIGINT) AS filled_cents,
       obs_cents IS NULL AS is_interpolated
FROM w
"""


@register("events_minute_gap_fill", _GAP_FILL_SQL)
def q_events_minute_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense-spine resampling with linear interpolation
    (operators/timeseries.py::minute_gap_fill)."""
    from realtime_analytics_pipeline_spark.operators.timeseries import (
        minute_gap_fill,
    )

    ev = load_events(spark, sf_dir).select(
        F.unix_millis("event_time").alias("event_ms"), "value"
    )
    return minute_gap_fill(ev)


_SEASONAL_ANOMALY_SQL = """
WITH m AS (
    SELECT (epoch_ms(ts) // 60000) * 60000 AS minute_ms,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM events GROUP BY 1
),
keyed AS (
    SELECT minute_ms, total_cents,
           ((minute_ms // 86400000) + 4) % 7 AS dow,
           (minute_ms % 86400000) // 3600000 AS hod
    FROM m
),
keyed2 AS (
    SELECT *, median(total_cents) OVER (PARTITION BY dow, hod)
        AS slot_med
    FROM keyed
),
baseline AS (
    SELECT dow, hod,
           median(total_cents) AS med,
           median(abs(total_cents - slot_med)) AS mad
    FROM keyed2 GROUP BY dow, hod
)
SELECT k.minute_ms, k.total_cents,
       b.med AS baseline_median,
       b.mad AS baseline_mad,
       k.total_cents > b.med + 3 * b.mad AS is_anomaly
FROM keyed k JOIN baseline b ON k.dow = b.dow AND k.hod = b.hod
"""


@register("events_seasonal_anomaly", _SEASONAL_ANOMALY_SQL)
def q_events_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-baseline anomaly monitor: each minute's value mass
    compared against the robust (median + 3·MAD) baseline of its
    (day-of-week, hour-of-day) slot — the production 'is this Tuesday
    9am normal for a Tuesday 9am' check. Integer cents in, exact
    dyadic medians out (continuous median of integers is .0/.5-exact,
    so the cross-engine hash can't flake); the 168-slot baseline
    broadcasts back to the minute stream."""
    from pyspark.sql import Window

    ev = load_events(spark, sf_dir)
    minutes = (
        ev.select(
            (
                (F.unix_millis("event_time") / 60000).cast("long") * 60000
            ).alias("minute_ms"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("minute_ms")
        .agg(F.sum("cents").alias("total_cents"))
    )
    keyed = minutes.select(
        "minute_ms",
        "total_cents",
        (
            (F.expr("minute_ms div 86400000") + 4) % 7
        ).alias("dow"),
        F.expr("(minute_ms % 86400000) div 3600000").alias("hod"),
    )
    slot_med = F.expr(
        "median(total_cents) OVER (PARTITION BY dow, hod)"
    )
    with_med = keyed.withColumn("slot_med", slot_med)
    baseline = with_med.groupBy("dow", "hod").agg(
        F.median("total_cents").alias("med"),
        F.median(F.abs(F.col("total_cents") - F.col("slot_med"))).alias(
            "mad"
        ),
    )
    return keyed.join(F.broadcast(baseline), ["dow", "hod"]).select(
        "minute_ms",
        "total_cents",
        F.col("med").alias("baseline_median"),
        F.col("mad").alias("baseline_mad"),
        (
            F.col("total_cents") > F.col("med") + 3 * F.col("mad")
        ).alias("is_anomaly"),
    )

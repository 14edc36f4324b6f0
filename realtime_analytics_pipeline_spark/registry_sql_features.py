"""Gated queries: Spark 4 SQL-surface features.

Three execution surfaces the engine exposes beyond the reference's
operator set (SURVEY §2.9 stance: implement what a switching user would
expect of a complete Spark engine):

- **Recursive CTE** (``WITH RECURSIVE``, Spark 4.x): calendar-spine
  generation + zero-filled monthly rollup. Both engines run a recursive
  query — DuckDB's oracle uses its own ``WITH RECURSIVE`` — so the
  recursion semantics themselves are cross-checked, not just the result
  shape. Spark restricts recursive CTEs to UNION ALL, so the spine
  terminates by predicate (bounded month ladder), never by dedup.
- **VARIANT** (Spark 4.0 semi-structured type): ``parse_json`` once into
  a binary variant, typed ``variant_get`` extraction after. At 100 TB
  this is the scale path for ragged JSON — parse once, push typed
  accesses into the columnar batch — vs ``get_json_object`` re-parsing
  the string per access (that legacy path is gated as
  ``props_json_extraction``).
- **Python UDTF with TABLE(...) PARTITION BY ORDER BY** (polymorphic
  table function): per-user sessionization where the UDTF instance sees
  one user's events in time order and emits one row per 30-minute-gap
  session. This is the row-at-a-time Python path — documented slow lane
  (SURVEY §2.8: zero row UDFs in the hot paths; this query exists to
  prove the SURFACE) — and its oracle is the same gaps-and-islands SQL
  the native ``session_window`` operator is checked against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_analytics_pipeline_spark.registry import register
from realtime_analytics_pipeline_spark.sources.batch import load_events, load_table

# -- recursive CTE ---------------------------------------------------------

_SPINE_SQL = """
WITH RECURSIVE months(m) AS (
    SELECT TIMESTAMP '1995-01-01'
    UNION ALL
    SELECT m + INTERVAL 1 MONTH FROM months
    WHERE m < TIMESTAMP '2001-12-01'
),
rev AS (
    SELECT date_trunc('month', o_orderdate) AS m,
           count(*) AS n_orders,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS revenue_cents
    FROM orders GROUP BY 1
)
SELECT epoch_ms(months.m) AS month_start_ms,
       coalesce(rev.n_orders, 0) AS n_orders,
       CAST(coalesce(rev.revenue_cents, 0) AS BIGINT) AS revenue_cents
FROM months LEFT JOIN rev ON months.m = rev.m
"""


@register("orders_monthly_spine_recursive", _SPINE_SQL)
def q_monthly_spine_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE calendar spine (84 months), LEFT JOIN to the
    monthly revenue rollup, zero-filled gaps. The spine is driver-tiny
    (bounded ladder) and broadcast into the join; the rollup is one
    partial-aggregated pass over orders. Integer-cents sums per the
    repo's cross-engine discipline."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_spine_src"
    )
    return spark.sql(
        """
        WITH RECURSIVE months(m) AS (
            SELECT TIMESTAMP '1995-01-01'
            UNION ALL
            SELECT m + INTERVAL '1' MONTH FROM months
            WHERE m < TIMESTAMP '2001-12-01'
        ),
        rev AS (
            SELECT date_trunc('MONTH', o_orderdate) AS m,
                   count(*) AS n_orders,
                   sum(CAST(round(o_totalprice * 100) AS BIGINT))
                       AS revenue_cents
            FROM orders_spine_src GROUP BY 1
        )
        SELECT unix_millis(months.m) AS month_start_ms,
               coalesce(rev.n_orders, 0) AS n_orders,
               coalesce(rev.revenue_cents, 0) AS revenue_cents
        FROM months LEFT JOIN rev ON months.m = rev.m
        """
    )


# -- VARIANT ---------------------------------------------------------------

_VARIANT_SQL = """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       min(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
       max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
FROM events
WHERE props IS NOT NULL
GROUP BY event_type
"""


@register("events_props_variant", _VARIANT_SQL)
def q_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """props parsed ONCE into a VARIANT column, then typed
    ``variant_get`` extraction feeding a plain aggregation. The parse
    is a single pass per row; every subsequent access is a binary
    field lookup, not a string re-parse — the semi-structured scale
    path. Oracle extracts the same field with DuckDB's JSON functions."""
    ev = load_events(spark, sf_dir)
    v = ev.where(F.col("props").isNotNull()).select(
        "event_type", F.parse_json("props").alias("pv")
    )
    return (
        v.select(
            "event_type",
            F.expr("variant_get(pv, '$.k', 'bigint')").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


# -- UDTF with TABLE(...) PARTITION BY ------------------------------------

_UDTF_SESSION_SQL = """
WITH ordered AS (
    SELECT user_id, epoch_ms(ts) AS ts_ms,
           lag(epoch_ms(ts)) OVER (
               PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
           ) AS prev_ms
    FROM events
),
marked AS (
    SELECT user_id, ts_ms,
           CASE WHEN prev_ms IS NULL OR ts_ms - prev_ms > 1800000
                THEN 1 ELSE 0 END AS is_start
    FROM ordered
),
grouped AS (
    SELECT user_id, ts_ms,
           sum(is_start) OVER (
               PARTITION BY user_id ORDER BY ts_ms
               ROWS UNBOUNDED PRECEDING
           ) AS grp
    FROM marked
)
SELECT CAST(user_id AS VARCHAR) AS user_id,
       min(ts_ms) AS session_start_ms,
       max(ts_ms) AS session_end_ms,
       count(*) AS n_events
FROM grouped GROUP BY user_id, grp
"""


@register("sessions_udtf", _UDTF_SESSION_SQL)
def q_sessions_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization as a polymorphic Python UDTF: ``TABLE(events)
    PARTITION BY user_id ORDER BY ts`` hands each UDTF instance one
    user's events in time order; a 30-minute gap closes a session.
    Distribution comes from the PARTITION BY clause (a hash exchange on
    user_id — identical shuffle shape to the native session_window
    operator); the Python loop is per-partition sequential, the
    documented slow lane. Ties on ts are broken by event_id in BOTH
    engines so cross-engine session boundaries are deterministic."""
    from pyspark.sql.functions import udtf

    @udtf(returnType=(
        "user_id string, session_start_ms bigint, "
        "session_end_ms bigint, n_events bigint"
    ))
    class Sessionize:
        GAP_MS = 1800000

        def __init__(self):
            self._user = None
            self._start = None
            self._end = None
            self._n = 0

        def eval(self, row):
            ts = row["ts_ms"]
            if self._end is not None and ts - self._end > self.GAP_MS:
                yield (self._user, self._start, self._end, self._n)
                self._start, self._n = ts, 0
            if self._start is None:
                self._start = ts
            self._user = str(row["user_id"])
            self._end = ts
            self._n += 1

        def terminate(self):
            if self._n:
                yield (self._user, self._start, self._end, self._n)

    spark.udtf.register("rtap_sessionize", Sessionize)
    load_events(spark, sf_dir).select(
        "user_id",
        F.unix_millis(F.col("event_time")).alias("ts_ms"),
        "event_id",
    ).createOrReplaceTempView("udtf_session_src")
    return spark.sql(
        """
        SELECT * FROM rtap_sessionize(
            TABLE(udtf_session_src)
            PARTITION BY user_id ORDER BY (ts_ms, event_id)
        )
        """
    )


# -- XML codec (S1/S5 sibling of the JSON wire path) -----------------------

_XML_SQL = """
SELECT event_type,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value,
       max(epoch_ms(ts)) AS max_ms
FROM events
GROUP BY event_type
"""


@register("events_xml_roundtrip", _XML_SQL)
def q_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → per-row XML document (``to_xml``) → parse back
    (``from_xml``) → typed aggregation. The XML sibling of
    ``wire_json_roundtrip`` (S1/S5 parse-chain parity): the oracle sees
    only the final aggregates, so it passes ONLY if the codec
    round-trips every row faithfully — types, nulls, and all. Spark 4
    ships the XML codec natively (no spark-xml package)."""
    ev = load_events(spark, sf_dir)
    doc = ev.select(
        F.to_xml(
            F.struct(
                F.col("event_id").cast("string").alias("id"),
                F.col("event_type").alias("type"),
                F.col("value").alias("value"),
                F.unix_millis("event_time").alias("ts_ms"),
            )
        ).alias("xml")
    )
    parsed = doc.select(
        F.from_xml(
            "xml", "id STRING, type STRING, value DOUBLE, ts_ms BIGINT"
        ).alias("e")
    )
    return (
        parsed.groupBy(F.col("e.type").alias("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("e.value"), 6).alias("sum_value"),
            F.max("e.ts_ms").alias("max_ms"),
        )
    )


# -- LATERAL join ----------------------------------------------------------

_LATERAL_SQL = """
SELECT c.c_custkey, t.o_orderkey, t.price_cents
FROM customer c
CROSS JOIN LATERAL (
    SELECT o_orderkey,
           CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
    FROM orders o
    WHERE o.o_custkey = c.c_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 3
) t
WHERE c.c_custkey % 7 = 0
"""


@register("orders_lateral_top3", _LATERAL_SQL)
def q_lateral_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: top-3 orders by price per sampled
    customer. Catalyst rewrites the correlation into a join +
    per-key window limit (no per-row re-execution — ``DomainJoin``
    decorrelation), so the plan scales like the window-rank idiom while
    the SQL stays the lateral shape a Postgres/DuckDB user writes.
    Price ties are broken by o_orderkey so both engines rank
    identically."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "lat_customer"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("lat_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.price_cents
        FROM lat_customer c
        JOIN LATERAL (
            SELECT o_orderkey,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
            FROM lat_orders o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 3
        ) t
        WHERE c.c_custkey % 7 = 0
        """
    )


# -- SQL pipe syntax -------------------------------------------------------

_PIPE_SQL = """
SELECT event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users
FROM events
WHERE value IS NOT NULL
GROUP BY event_type
"""


@register("sql_pipe_demo", _PIPE_SQL)
def q_sql_pipe_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4.1 ``|>`` operators): the linear
    FROM → WHERE → AGGREGATE form compiles to the identical logical
    plan as the nested SELECT the oracle runs — pure surface, zero
    plan cost, and the shape incremental query builders emit."""
    load_events(spark, sf_dir).createOrReplaceTempView("pipe_events")
    return spark.sql(
        """
        FROM pipe_events
        |> WHERE value IS NOT NULL
        |> AGGREGATE count(*) AS n_events,
                     count(DISTINCT user_id) AS n_users
           GROUP BY event_type
        |> SELECT event_type, n_events, n_users
        """
    )

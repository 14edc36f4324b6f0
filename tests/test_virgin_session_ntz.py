"""Round-5 post-mortem regression: the virgin-session TIMESTAMP_NTZ trap.

The correctness driver owns its SparkSession. In a *virgin* Spark 4
session, ``spark.sql.parquet.inferTimestampNTZ.enabled`` defaults to
true, so ``events.parquet``'s ``ts`` column surfaces as TIMESTAMP_NTZ —
and ``unix_millis(ts)`` throws DATATYPE_MISMATCH. Round 5's first-in-
window query (`http_ingestion_roundtrip`, registry_feed.py) died on
exactly this before any predecessor had flipped the conf.

Two independent defenses, both tested here:

1. every ``register``ed query self-tunes the session before its body
   runs (registry.py::register wraps with tune_session), so reads made
   INSIDE a query never see the NTZ flavor regardless of run order;
2. the raw-``ts`` helpers (schema.raw_ts_ms / raw_ts /
   normalize_testdata_events) carry a TimestampNTZType branch, so a
   DataFrame that was ALREADY read under the NTZ flavor still works.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_SMOKE

_VIRGIN_CONFS = {
    # Spark 4 virgin-session defaults the engine normally overrides
    "spark.sql.parquet.inferTimestampNTZ.enabled": "true",
    "spark.sql.legacy.parquet.nanosAsLong": "false",
}


def _with_confs(spark, confs):
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    return old


def _restore(spark, old):
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


@pytest.fixture()
def virgin_confs(spark):
    """Emulate the driver's untouched session: NTZ inference on,
    nanosAsLong off — the state before any query has tuned it."""
    old = _with_confs(spark, _VIRGIN_CONFS)
    yield
    _restore(spark, old)
    # tests after this one expect the engine flavors back
    from realtime_analytics_pipeline_spark.session import tune_session

    tune_session(spark)


def _events_ts_type(spark):
    return spark.read.parquet(f"{SF_SMOKE}/events.parquet").schema[
        "ts"
    ].dataType


def test_raw_ts_helpers_flavor_proof_under_ntz(spark, virgin_confs):
    """Helpers must work on a DF read while the NTZ flavor was active,
    even though no query ever tuned the session for them."""
    from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

    from realtime_analytics_pipeline_spark.schema import (
        normalize_testdata_events,
        raw_ts,
        raw_ts_ms,
    )

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    dt = ev.schema["ts"].dataType
    # whichever flavor this testdata generation produced under virgin
    # confs, the helpers must evaluate without AnalysisException
    assert isinstance(dt, (LongType, TimestampNTZType, TimestampType))

    got = ev.select(
        raw_ts_ms(ev).alias("ts_ms"),
        F.unix_millis(raw_ts(ev)).alias("ts_ms2"),
    ).agg(
        F.min("ts_ms").alias("lo"),
        F.max("ts_ms").alias("hi"),
        F.count(F.when(F.col("ts_ms") != F.col("ts_ms2"), 1)).alias("ne"),
    ).collect()[0]
    assert got.ne == 0, "raw_ts and raw_ts_ms disagree"

    norm = normalize_testdata_events(ev)
    lo, hi = (
        norm.agg(
            F.min(F.unix_millis("event_time")),
            F.max(F.unix_millis("event_time")),
        ).collect()[0]
    )

    # cross-check the epoch range against the tuned-session read
    from realtime_analytics_pipeline_spark.session import tune_session

    tune_session(spark)
    ev2 = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    lo2, hi2 = (
        ev2.select(raw_ts_ms(ev2).alias("m"))
        .agg(F.min("m"), F.max("m"))
        .collect()[0]
    )
    assert (got.lo, got.hi) == (lo2, hi2) == (lo, hi)


def test_registered_queries_position_independent(spark, virgin_confs):
    """Any registered query must run green as the FIRST query of a
    session still carrying virgin confs — the register() wrapper
    self-tunes before the body. Exercise the exact round-5 casualty
    plus another raw-parquet reader."""
    from realtime_analytics_pipeline_spark.registry import QUERIES as qs
    for name in ("http_ingestion_roundtrip", "events_iso_ts_coercion"):
        if name not in qs:
            continue
        # re-arm virgin confs before each: the wrapper must undo them
        _with_confs(spark, _VIRGIN_CONFS)
        df = qs[name](spark, SF_SMOKE)
        assert df.count() >= 0


def test_register_wrapper_tunes_session(spark, virgin_confs):
    """The wrapper must flip the session confs before the query body
    sees the SparkSession."""
    from realtime_analytics_pipeline_spark.registry import register

    seen = {}

    @register("_test_tune_probe")
    def _probe(s, sf_dir):
        seen["ntz"] = s.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled")
        seen["tz"] = s.conf.get("spark.sql.session.timeZone")
        return s.range(1)

    from realtime_analytics_pipeline_spark.registry import QUERIES

    try:
        QUERIES["_test_tune_probe"](spark, SF_SMOKE).collect()
    finally:
        QUERIES.pop("_test_tune_probe", None)
    assert seen == {"ntz": "false", "tz": "UTC"}

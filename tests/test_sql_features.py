"""Spark 4 SQL-surface features: recursive CTE, VARIANT, polymorphic UDTF.

Oracles for these queries live in registry_sql_features.py; these tests
pin the cross-operator invariants the oracles can't see.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_analytics_pipeline_spark import registry
from tests.conftest import SF_SMOKE


def test_recursive_spine_covers_every_month_with_zero_fill(spark):
    df = registry.QUERIES["orders_monthly_spine_recursive"](spark, SF_SMOKE)
    rows = df.collect()
    # 1995-01 .. 2001-12 inclusive = 84 months, no gaps, strictly monthly
    assert len(rows) == 84
    ms = sorted(r.month_start_ms for r in rows)
    assert len(set(ms)) == 84
    # zero-filled tail: orders end 2001-08-01, spine runs to 2001-12
    zero = [r for r in rows if r.n_orders == 0]
    assert len(zero) >= 1
    assert all(r.revenue_cents == 0 for r in zero)


def test_variant_extraction_equals_legacy_json_path(spark):
    """parse_json + variant_get == get_json_object on the same rows —
    the new binary path and the legacy string-reparse path must agree."""
    from realtime_analytics_pipeline_spark.sources.batch import load_events

    ev = load_events(spark, SF_SMOKE).where(F.col("props").isNotNull())
    legacy = ev.select(
        F.get_json_object("props", "$.k").cast("bigint").alias("k")
    )
    variant = ev.select(
        F.expr("variant_get(parse_json(props), '$.k', 'bigint')").alias("k")
    )
    assert sorted(r.k for r in legacy.collect()) == sorted(
        r.k for r in variant.collect()
    )


def test_udtf_sessions_match_native_session_windows(spark):
    """The UDTF sessionizer and the native session_window operator must
    produce the same number of sessions and the same total event count
    (same 30-minute gap rule)."""
    udtf_sessions = registry.QUERIES["sessions_udtf"](spark, SF_SMOKE)
    native = registry.QUERIES["session_metrics"](spark, SF_SMOKE)
    u = udtf_sessions.agg(
        F.count("*").alias("n"), F.sum("n_events").alias("ev")
    ).collect()[0]
    n = native.agg(F.count("*").alias("n")).collect()[0]
    assert u.n == n.n
    total_events = (
        registry.QUERIES["sessions_udtf"](spark, SF_SMOKE)
        .agg(F.sum("n_events"))
        .collect()[0][0]
    )
    from realtime_analytics_pipeline_spark.sources.batch import load_events

    assert total_events == load_events(spark, SF_SMOKE).count()
    assert u.ev == total_events


def test_udtf_plan_partitions_by_user(spark):
    """The TABLE(...) PARTITION BY clause must compile to one hash
    exchange on user_id — same shuffle shape as the native operator."""
    df = registry.QUERIES["sessions_udtf"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # Spark aliases the PARTITION BY expression as partition_by_0 before
    # the exchange; the UDTF evaluates after one hash exchange + sort
    assert "BatchEvalPythonUDTF" in plan
    assert "Exchange hashpartitioning(partition_by_0" in plan
    assert plan.count("Exchange") == 1


def test_lateral_join_is_decorrelated(spark):
    """The correlated LATERAL subquery must compile to a join +
    per-key limit — never a per-outer-row re-execution (no
    CartesianProduct / BroadcastNestedLoopJoin in the plan)."""
    df = registry.QUERIES["orders_lateral_top3"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_pipe_syntax_matches_standard_sql_results(spark):
    """|> pipeline and the equivalent nested SELECT agree row-for-row."""
    from realtime_analytics_pipeline_spark.sources.batch import load_events

    piped = registry.QUERIES["sql_pipe_demo"](spark, SF_SMOKE)
    ev = load_events(spark, SF_SMOKE).where(F.col("value").isNotNull())
    std = ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )
    assert sorted(map(tuple, piped.collect())) == sorted(
        map(tuple, std.collect())
    )


def test_xml_roundtrip_preserves_nulls(spark):
    """A null value column must survive to_xml -> from_xml."""
    df = spark.createDataFrame(
        [("a", 1.5), ("b", None)], "id string, value double"
    )
    back = df.select(
        F.from_xml(
            F.to_xml(F.struct("id", "value")), "id STRING, value DOUBLE"
        ).alias("e")
    ).select("e.id", "e.value")
    assert sorted(map(tuple, back.collect())) == [("a", 1.5), ("b", None)]


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@st.composite
def _type_seq(draw):
    return "".join(
        draw(
            st.lists(
                st.sampled_from("vcpsx"), min_size=0, max_size=40
            )
        )
    )


@given(seqs=st.lists(_type_seq(), min_size=1, max_size=8))
@settings(max_examples=20, deadline=None)
def test_cep_regex_semantics_match_python_re(spark, seqs):
    """The CEP queries assume Spark's (Java) regexp_extract_all and the
    oracle's (RE2) regexp_extract_all agree on leftmost non-overlapping
    matching for 'vc*p'. Pin Spark against Python re (also leftmost
    non-overlapping) on random sequences."""
    import re as _re

    df = spark.createDataFrame([(s,) for s in seqs], "s string")
    got = [
        (r.n, r.hits)
        for r in df.select(
            F.size(F.expr("regexp_extract_all(s, 'vc*p', 0)")).alias("n"),
            F.expr("regexp_extract_all(s, 'vc*p', 0)").alias("hits"),
        ).collect()
    ]
    want = [_re.findall("vc*p", s) for s in seqs]
    assert [h for _, h in got] == want
    assert [n for n, _ in got] == [len(w) for w in want]


def test_coerce_ts_ms_matches_reference_coercion(spark):
    """P9: _coerce_ts parity (message_parser.py:51-63) — ints pass
    through as epoch-ms, ISO strings (Z or offset or space form)
    parse, junk and null yield null, fractional ms preserved."""
    from realtime_analytics_pipeline_spark.functions.time import coerce_ts_ms

    df = spark.createDataFrame(
        [
            ("1704067200000", 1704067200000),
            ("2024-01-01T00:00:00.123456Z", 1704067200123),
            ("2024-01-01T00:00:00+00:00", 1704067200000),
            ("2024-01-01 12:30:00.5", 1704112200500),
            # compact ISO date: py3.11+ fromisoformat parses the basic
            # format; must NOT be read as an 8-digit epoch-ms (~1970)
            ("20240110", 1704844800000),
            # longer than bigint: try_cast must null, never raise (ANSI)
            ("99999999999999999999", None),
            # 9 digits: neither plausible epoch-ms nor a compact date
            ("123456789", None),
            # 10-digit DELIBERATE DIVERGENCE (time.py docstring): the
            # reference _coerce_ts nulls any bare-digit *string*; we
            # read 10-19 digits as epoch-ms so type-erased long columns
            # survive. 10-digit epoch-seconds → a 1970 instant here,
            # None in the reference.
            ("1704067200", 1704067200),
            ("not-a-ts", None),
            (None, None),
        ],
        "ts_wire string, want long",
    )
    rows = df.select("want", coerce_ts_ms("ts_wire").alias("got")).collect()
    for r in rows:
        assert r.got == r.want, (r.want, r.got)


def test_dynamic_coerce_matches_reference_convert_types(spark):
    """T7: the Column cascade and the Python wire mirror must route
    every value exactly as repository.py:117-127 does."""
    from realtime_analytics_pipeline_spark.functions.coerce import (
        convert_types,
        dynamic_coerce,
    )

    vals = ["42", "-7", "+3", "3.5", "1e3", "-0.25", "abc", "12px", "", "4.", "NaN"]
    # the reference implementation, verbatim semantics
    def ref(v):
        try:
            return int(v)
        except ValueError:
            try:
                return float(v)
            except ValueError:
                return v

    df = spark.createDataFrame([(v,) for v in vals], "v string")
    rows = df.select("v", dynamic_coerce("v").alias("c")).collect()
    for r in rows:
        expect = ref(r.v)
        got = {"int": r.c.i, "float": r.c.d, "str": r.c.s}[r.c.tag]
        if isinstance(expect, float) and expect != expect:  # NaN
            assert r.c.tag == "float" and got != got
        else:
            assert got == expect and (
                (r.c.tag == "int") == isinstance(expect, int)
            ), (r.v, r.c)
    # and the wire mirror is the reference function itself
    got_map = convert_types({v: v for v in vals})
    for v in vals:
        e = ref(v)
        g = got_map[v]
        if isinstance(e, float) and e != e:
            assert isinstance(g, float) and g != g
        else:
            assert g == e and type(g) is type(e), v

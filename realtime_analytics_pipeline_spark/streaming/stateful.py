"""Custom stateful streaming operator via applyInPandasWithState.

The reference has no custom process functions (all stateful logic is
window aggregation, SURVEY §2.4), but a complete engine needs the
escape hatch. This module implements **running cumulative metrics per
event type** — a carried-state operator no built-in window aggregation
expresses: each micro-batch emits, per event type, the cumulative
event/user-bloom counts since stream start.

Pattern notes (the part worth copying at 100 TB):

- state is keyed by the groupBy key → scales horizontally like any
  keyed aggregation;
- state payload is a tiny fixed-size tuple (counts + a 1024-bit bloom
  of user ids), NOT raw rows — bounded memory per key forever;
- the bloom stands in for the unbounded distinct-user set: the same
  sketch-over-state trade the HLL variant makes, shown explicitly.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("cumulative_events", LongType()),
        StructField("approx_cumulative_users", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("events", LongType()),
        StructField("bloom", StringType()),  # hex, 1024 bits
    ]
)

_BLOOM_BITS = 1024


def _bloom_add(bloom: int, key: str) -> int:
    for seed in (b"s1", b"s2", b"s3"):
        h = int.from_bytes(
            hashlib.md5(seed + key.encode()).digest()[:4], "big"
        )
        bloom |= 1 << (h % _BLOOM_BITS)
    return bloom


def _bloom_estimate(bloom: int) -> int:
    """Bloom fill-ratio cardinality estimate: n ≈ -m/k · ln(1 - X/m)."""
    import math

    x = bin(bloom).count("1")
    if x >= _BLOOM_BITS:
        return 10**9
    return int(-_BLOOM_BITS / 3 * math.log(1 - x / _BLOOM_BITS))


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        events, bloom_hex = state.get
        bloom = int(bloom_hex, 16)
    else:
        events, bloom = 0, 0
    for pdf in pdfs:
        events += len(pdf)
        for uid in pdf["user_id"]:
            bloom = _bloom_add(bloom, str(uid))
    state.update((events, format(bloom, "x")))
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "cumulative_events": [events],
            "approx_cumulative_users": [_bloom_estimate(bloom)],
        }
    )


def running_totals_per_type(events: DataFrame) -> DataFrame:
    """events (stream) -> per-type running totals, one row per type per
    micro-batch. Works on batch DataFrames too (single 'batch')."""
    return events.select("event_type", "user_id").groupBy("event_type").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

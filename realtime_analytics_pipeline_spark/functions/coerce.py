"""Dynamic type coercion (SURVEY §2 T7).

The reference's serving store is stringly typed (Redis hashes);
reads recover types with a try-int, then try-float, else-keep-string
cascade (services/cache/src/infrastructure/redis/repository.py:117-127
``_convert_types``). The engine's columns are typed end-to-end so this
is normally unnecessary (`.cast()`), but any STRINGLY external store
(Redis, env-style configs, CSV without schema) needs the cascade on
ingestion — here as a single Column expression and as the exact
Python wire mirror.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F


def dynamic_coerce(col: Column | str) -> Column:
    """String value -> struct(tag, i, d, s): the int → float → str
    fallback as one expression. Exactly one of i/d/s is non-null and
    ``tag`` names it ('int' | 'float' | 'str'); null input stays a
    null struct, as a missing Redis field would.

    Int detection is by the integer-literal SHAPE (optional sign +
    digits), matching Python's ``int(str)`` which the reference calls
    first — ``try_cast('3.0' as bigint)`` would otherwise round a
    float-shaped string into the int branch.
    """
    c = F.col(col) if isinstance(col, str) else col
    s = c.cast("string")
    # try_cast (never throws under ANSI mode); regex keeps float-shaped
    # strings out of the int branch, bigint-overflow falls through to
    # the float branch like Python would not — documented divergence
    # only beyond 2^63, unreachable for metric wire values
    as_i = s.try_cast("bigint")
    is_int = s.rlike(r"^[+-]?\d+$") & as_i.isNotNull()
    as_d = s.try_cast("double")
    return F.when(
        s.isNotNull(),
        F.when(
            is_int,
            F.struct(
                F.lit("int").alias("tag"),
                as_i.alias("i"),
                F.lit(None).cast("double").alias("d"),
                F.lit(None).cast("string").alias("s"),
            ),
        )
        .when(
            as_d.isNotNull(),
            F.struct(
                F.lit("float").alias("tag"),
                F.lit(None).cast("bigint").alias("i"),
                as_d.alias("d"),
                F.lit(None).cast("string").alias("s"),
            ),
        )
        .otherwise(
            F.struct(
                F.lit("str").alias("tag"),
                F.lit(None).cast("bigint").alias("i"),
                F.lit(None).cast("double").alias("d"),
                s.alias("s"),
            )
        ),
    )


def convert_types(data: dict[str, str]) -> dict[str, Any]:
    """Byte-exact Python mirror of repository.py:117-127 — the wire
    side of the same cascade, for stringly HTTP/Redis payloads."""
    out: dict[str, Any] = {}
    for k, v in data.items():
        try:
            out[k] = int(v)
        except ValueError:
            try:
                out[k] = float(v)
            except ValueError:
                out[k] = v
    return out

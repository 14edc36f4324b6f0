"""Vector column functions over ``array<float>`` embedding columns.

Built-in higher-order functions (``zip_with`` + ``aggregate``) — JVM
expression-tree evaluation, Arrow-free, no UDF. Cast to double before
arithmetic so results match DuckDB's ``::DOUBLE[]`` math exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(v: Column | str) -> Column:
    c = F.col(v) if isinstance(v, str) else v
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def unit(a: Column) -> Column:
    """Pre-normalized vector: cosine(a, b) == dot(unit(a), unit(b)).

    Normalizing once per vector instead of per pair turns an O(pairs)
    norm cost into O(vectors) — the difference between 3 and 1 array
    traversals per candidate pair in all-pairs/top-k similarity.

    Implementation note (optimization round 13, guide §4 per-task
    work): ``transform(a, x -> x / l2_norm(a))`` re-evaluates the
    norm subtree PER ELEMENT — higher-order lambdas are interpreted
    with no loop-invariant hoisting, so a d-dim vector paid O(d²).
    ``zip_with`` against ``array_repeat(norm, d)`` evaluates the norm
    ONCE per row (it is an argument expression, not a lambda-body
    subtree); each element still divides by the exact same double, so
    results are bit-identical."""
    n = l2_norm(a)
    return F.zip_with(
        a, F.array_repeat(n, F.size(a)), lambda x, nn: x / nn
    )

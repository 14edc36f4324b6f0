"""Text-analysis column functions (LLM-data-pipeline extensions).

All pure Column expressions — no Python UDFs, everything stays in
Catalyst/codegen. The document corpus is single-space tokenized, so
tokenization is a plain split mirrored exactly by the SQL oracles
(``string_split(text, ' ')``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# words acting as stopwords inside the synthetic corpus vocabulary
STOPWORDS = ("the", "a")


def tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("long")


def distinct_token_count(text: Column | str) -> Column:
    return F.size(F.array_distinct(tokens(text))).cast("long")


def shingle_expr(tokens_col: str, n: int = 3) -> Column:
    """Word n-gram shingles over an array column (0-based indexing).

    size-n+1 shingles per doc; empty array when the doc is shorter
    than n tokens (sequence(0, -1) is empty).
    """
    parts = ", ".join(f"{tokens_col}[i + {k}]" for k in range(n))
    # sequence(0, -1) would generate a DESCENDING range in Spark, so clamp
    # the stop at 0 and slice the (possibly 1 bogus) result to the true
    # shingle count — empty for docs shorter than n tokens.
    return F.expr(
        f"slice(transform(sequence(0, greatest(size({tokens_col}) - {n}, 0)), "
        f"i -> concat_ws(' ', {parts})), 1, greatest(size({tokens_col}) - {n} + 1, 0))"
    )


def stopword_count(toks: Column) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("long")


def fingerprint(text: Column | str) -> Column:
    """Deterministic content fingerprint (md5 hex — identical in DuckDB)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(c)

"""Generate local sf0.3 / sf1 slices of `events` and `documents` for the
extended scale sweep (one decade above the driver's sf0.1).

The driver's testdata tops out at sf0.1; alpha estimates from
sub-second sf0.01→sf0.1 steps can be flattered by fixed overhead. These
slices extend the sweep a decade using the SAME layout and marginal
distributions as the driver tables, measured empirically from sf0.1:

- events: event_id 0..N-1 (N = 1e6·sf), user_id uniform over 15000·sf
  users, ts uniform over the same 30-day January-2024 span, event_type
  uniform over the 5 driver types, value bootstrap-resampled from the
  sf0.1 empirical distribution, props = '{"k": <0..99>}'.
- documents: doc_id 0..M-1 (M = 5e4·sf), lang drawn with the sf0.1
  empirical mix, source uniform src0..src19, text a word salad drawn
  from the per-lang empirical word distribution of sf0.1 with uniform
  10..100 words per doc (matching the observed length stats).

Timing fidelity is the goal (same row widths, cardinalities, join/agg
selectivities); these slices carry no oracle and are NOT gate inputs.
Deterministic (fixed numpy seed). Output: .scale/sf{0.3,1}/ in the repo
root (gitignored — ~80 MB, regenerate with this script).

Usage: python scripts/gen_scale_slices.py
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale")

JAN1_US = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")
SPAN_US = 30 * 86400 * 1_000_000  # 30 days, the driver tables' span
TYPES = np.array(["view", "click", "purchase", "signup", "error"])


def gen_events(sf: float, rng: np.random.Generator, values_pool: np.ndarray) -> pa.Table:
    n = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    ts_us = JAN1_US + rng.integers(0, SPAN_US, n)
    return pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype="int64")),
            "ts": pa.array(ts_us).cast(pa.timestamp("us")),
            "user_id": pa.array(rng.integers(0, n_users, n)),
            "event_type": pa.array(TYPES[rng.integers(0, len(TYPES), n)]),
            "value": pa.array(values_pool[rng.integers(0, len(values_pool), n)]),
            "props": pa.array(
                np.char.add(
                    np.char.add('{"k": ', rng.integers(0, 100, n).astype(str)), "}"
                )
            ),
        }
    )


def gen_documents(sf: float, rng: np.random.Generator, lang_words: dict, lang_p) -> pa.Table:
    m = int(50_000 * sf)
    langs = list(lang_words)
    lang_idx = rng.choice(len(langs), m, p=lang_p)
    n_words = rng.integers(10, 101, m)
    texts, lang_col = [], []
    for i in range(m):
        lang = langs[lang_idx[i]]
        pool = lang_words[lang]
        texts.append(" ".join(pool[rng.integers(0, len(pool), n_words[i])]))
        lang_col.append(lang)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(m, dtype="int64")),
            "text": pa.array(texts),
            "lang": pa.array(lang_col),
            "source": pa.array([f"src{j}" for j in rng.integers(0, 20, m)]),
            "n_chars": pa.array(np.array([len(t) for t in texts], dtype="int64")),
        }
    )


def main() -> None:
    con = duckdb.connect()
    values_pool = (
        con.sql(f"SELECT value FROM '{SRC}/events.parquet'").fetchnumpy()["value"]
    )
    rows = con.sql(
        f"SELECT lang, string_split(text, ' ') FROM '{SRC}/documents.parquet'"
    ).fetchall()
    lang_words: dict[str, list[str]] = {}
    for lang, words in rows:
        lang_words.setdefault(lang, []).extend(words)
    lang_words = {k: np.array(v) for k, v in lang_words.items()}
    counts = np.array([len(v) for v in lang_words.values()], dtype="float64")
    lang_p = counts / counts.sum()

    for sf in (0.3, 1.0):
        rng = np.random.default_rng(20260814 + int(sf * 10))
        d = os.path.join(OUT, f"sf{sf:g}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(gen_events(sf, rng, values_pool), f"{d}/events.parquet")
        pq.write_table(
            gen_documents(sf, rng, lang_words, lang_p), f"{d}/documents.parquet"
        )
        print(f"wrote {d}: events={int(1e6 * sf)} docs={int(5e4 * sf)}")


if __name__ == "__main__":
    main()

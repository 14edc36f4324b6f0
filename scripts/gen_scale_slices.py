"""Generate local sf0.3 / sf1 slices of `events`, `documents` AND the
TPC-H join trio (`customer`, `orders`, `lineitem`) for the extended
scale sweep (one decade above the driver's sf0.1).

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
- customer/orders/lineitem (the q3/q18 join classes; VERDICT r04
  item 5): the driver tables are all-independent-uniform (verified
  empirically at sf0.1 — lines-per-order is Poisson(4) from uniform
  l_orderkey draws, shipdate independent of orderdate, every numeric
  uniform over its observed range), so the same cardinality rules
  reproduce the join selectivities exactly: customer 150k·sf, orders
  1.5M·sf, lineitem 6M·sf; keys uniform over the parent table;
  mktsegment/status/priority/returnflag/linestatus uniform over the
  observed category sets; dates uniform day-granular over
  [1995-01-01, 2001-08-01] (orders) / [1995-01-02, 2001-11-04]
  (lineitem); l_partkey over 200k·sf, l_suppkey over 10k·sf.

Timing fidelity is the goal (same row widths, cardinalities, join/agg
selectivities); these slices carry no oracle and are NOT gate inputs.
Deterministic (fixed numpy seed). Output: .scale/sf{0.3,1}/ in the repo
root (gitignored — ~80 MB, regenerate with this script).

Usage: python scripts/gen_scale_slices.py
"""

from __future__ import annotations

import os
import shutil
import time

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale")

JAN1_US = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")
SPAN_US = 30 * 86400 * 1_000_000  # 30 days, the driver tables' span
TYPES = np.array(["view", "click", "purchase", "signup", "error"])

N_EVENT_FILES = 8  # fixed per SF -> streaming replay batch count is
# CONSTANT across the sweep (round-10, VERDICT r09 item 6): with a
# single file, larger slices ran FEWER micro-batches per event and the
# streaming alpha went negative (overhead amortization, not speed)


def write_events_dir(t: pa.Table, path: str, n_files: int = N_EVENT_FILES) -> None:
    """Write events as a time-ordered n-file parquet DIRECTORY with
    ascending mtimes: the file stream source (maxFilesPerTrigger=1)
    then replays exactly n_files time-contiguous micro-batches, so the
    watermark only ever advances and no row is dropped as late."""
    order = pa.compute.sort_indices(t, sort_keys=[("ts", "ascending")])
    t = t.take(order)
    if os.path.isfile(path):  # pre-round-10 slices were single files
        os.remove(path)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path)
    per = -(-t.num_rows // n_files)
    now = time.time()
    for i in range(n_files):
        chunk = t.slice(i * per, per)
        if chunk.num_rows == 0:
            break
        fp = os.path.join(path, f"part-{i:03d}.parquet")
        pq.write_table(chunk, fp)
        os.utime(fp, (now + i, now + i))


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


def gen_documents_bounded(sf: float, rng: np.random.Generator) -> pa.Table:
    """Bounded-cluster dup corpus for the prefix-Jaccard sweep
    (VERDICT r08 item 4): the driver's synthetic documents are
    template-heavy (7.7% of ALL pairs are true >=0.9 near-dups), so
    every uncapped exact verifier's OUTPUT is Theta(n^2) on it and the
    sweep measures the output term. This corpus models a REALISTIC
    dedup workload instead: each base doc draws 30..80 words from a
    50k-word synthetic vocabulary (two random docs share almost
    nothing — cross-cluster Jaccard ~ 0), and ~3% of docs belong to
    planted dup clusters of size 2..4 whose members differ by one
    word (unigram Jaccard >= 0.9 guaranteed at these lengths). True
    pair count = sum over clusters of C(size,2) — LINEAR in corpus
    size, so the sweep measures algorithm overhead, not output."""
    m = int(50_000 * sf)
    vocab = np.array([f"w{i:05d}" for i in range(50_000)])
    texts: list[str] = []
    doc_words = [
        vocab[rng.integers(0, len(vocab), rng.integers(30, 81))]
        for _ in range(m)
    ]
    # plant clusters over ~3% of docs: walk ids in order, occasionally
    # make the next (size-1) docs near-copies of the current one
    i = 0
    in_cluster = np.zeros(m, dtype=bool)
    while i < m:
        if rng.random() < 0.012 and i + 3 < m:  # ~3% of docs in clusters
            size = int(rng.integers(2, 5))
            base = doc_words[i]
            for j in range(1, size):
                clone = base.copy()
                clone[int(rng.integers(0, len(clone)))] = vocab[
                    int(rng.integers(0, len(vocab)))
                ]
                doc_words[i + j] = clone
                in_cluster[i + j] = True
            in_cluster[i] = True
            i += size
        else:
            i += 1
    texts = [" ".join(w) for w in doc_words]
    return pa.table(
        {
            "doc_id": pa.array(np.arange(m, dtype="int64")),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * m),
            "source": pa.array([f"src{j}" for j in rng.integers(0, 20, m)]),
            "n_chars": pa.array(
                np.array([len(t) for t in texts], dtype="int64")
            ),
        }
    )


def gen_embeddings(sf: float, rng: np.random.Generator) -> pa.Table:
    """Bootstrap-resampled embeddings slice (round-12 — unblocks the
    docs_lsh_blocking_quality sweep row, whose k-means surface reads
    embeddings): (embedding, label) rows drawn with replacement from
    the sf0.1 driver table, new dense vec_ids. Resampling preserves
    the cluster geometry and label mix exactly, so the kmeans/ANN
    cost classes see the same value distribution; 2000 rows at sf0.1
    -> 20000 at sf1 (the driver's own 10x-per-decade ratio)."""
    n = int(20_000 * sf)
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT embedding, label FROM '{SRC}/embeddings.parquet'"
    ).fetchall()
    idx = rng.integers(0, len(rows), n)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype="int64")),
            "embedding": pa.array(
                [rows[i][0] for i in idx], type=pa.list_(pa.float32())
            ),
            "label": pa.array(
                [int(rows[i][1]) for i in idx], type=pa.int32()
            ),
        }
    )


_DAY_US = 86_400 * 1_000_000


def _days(rng: np.random.Generator, lo: str, hi: str, n: int) -> pa.Array:
    lo_d = np.datetime64(lo, "D").astype("int64")
    hi_d = np.datetime64(hi, "D").astype("int64")
    return pa.array(rng.integers(lo_d, hi_d + 1, n) * _DAY_US).cast(
        pa.timestamp("us")
    )


def gen_tpch(sf: float, rng: np.random.Generator, out_dir: str) -> None:
    n_cust = int(150_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    customer = pa.table(
        {
            "c_custkey": pa.array(np.arange(n_cust, dtype="int64")),
            "c_name": pa.array(
                [f"Customer#{i:09d}" for i in range(n_cust)]
            ),
            "c_nationkey": pa.array(
                rng.integers(0, 25, n_cust).astype("int32")
            ),
            "c_acctbal": pa.array(
                np.round(rng.uniform(-1000.0, 10000.0, n_cust), 2)
            ),
            "c_mktsegment": pa.array(
                np.array(
                    ["MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE"]
                )[rng.integers(0, 5, n_cust)]
            ),
        }
    )
    pq.write_table(customer, f"{out_dir}/customer.parquet")
    orders = pa.table(
        {
            "o_orderkey": pa.array(np.arange(n_ord, dtype="int64")),
            "o_custkey": pa.array(rng.integers(0, n_cust, n_ord)),
            "o_orderstatus": pa.array(
                np.array(["O", "P", "F"])[rng.integers(0, 3, n_ord)]
            ),
            "o_totalprice": pa.array(
                np.round(rng.uniform(1000.0, 500000.0, n_ord), 2)
            ),
            "o_orderdate": _days(rng, "1995-01-01", "2001-08-01", n_ord),
            "o_orderpriority": pa.array(
                np.array(
                    ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
                )[rng.integers(0, 5, n_ord)]
            ),
        }
    )
    pq.write_table(orders, f"{out_dir}/orders.parquet")
    lineitem = pa.table(
        {
            "l_orderkey": pa.array(rng.integers(0, n_ord, n_li)),
            "l_partkey": pa.array(rng.integers(0, int(200_000 * sf), n_li)),
            "l_suppkey": pa.array(rng.integers(0, int(10_000 * sf), n_li)),
            "l_linenumber": pa.array(
                rng.integers(1, 8, n_li).astype("int32")
            ),
            "l_quantity": pa.array(
                rng.integers(1, 51, n_li).astype("float64")
            ),
            "l_extendedprice": pa.array(
                np.round(rng.uniform(900.0, 105000.0, n_li), 2)
            ),
            "l_discount": pa.array(
                np.round(rng.uniform(0.0, 0.1, n_li), 2)
            ),
            "l_tax": pa.array(np.round(rng.uniform(0.0, 0.08, n_li), 2)),
            "l_returnflag": pa.array(
                np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]
            ),
            "l_linestatus": pa.array(
                np.array(["O", "F"])[rng.integers(0, 2, n_li)]
            ),
            "l_shipdate": _days(rng, "1995-01-02", "2001-11-04", n_li),
        }
    )
    pq.write_table(lineitem, f"{out_dir}/lineitem.parquet")


def main() -> None:
    import sys

    if "--embeddings-only" in sys.argv:
        for sf in (0.3, 1.0):
            rng = np.random.default_rng(20260816 + int(sf * 10))
            d = os.path.join(OUT, f"sf{sf:g}")
            os.makedirs(d, exist_ok=True)
            pq.write_table(gen_embeddings(sf, rng), f"{d}/embeddings.parquet")
            print(f"wrote {d}/embeddings.parquet: {int(2e4 * sf)} vecs")
        return
    bounded_only = "--bounded-only" in sys.argv
    if bounded_only:
        for sf in (0.1, 0.3, 1.0):
            rng = np.random.default_rng(20260815 + int(sf * 10))
            d = os.path.join(OUT, f"sf{sf:g}")
            os.makedirs(d, exist_ok=True)
            pq.write_table(
                gen_documents_bounded(sf, rng),
                f"{d}/documents_bounded.parquet",
            )
            print(f"wrote {d}/documents_bounded.parquet: {int(5e4 * sf)} docs")
        return
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
        write_events_dir(gen_events(sf, rng, values_pool), f"{d}/events.parquet")
        pq.write_table(
            gen_documents(sf, rng, lang_words, lang_p), f"{d}/documents.parquet"
        )
        gen_tpch(sf, rng, d)
        # Dedicated embeddings seed (matches --embeddings-only) so both
        # regen paths write identical embeddings.parquet (ADVICE r12).
        emb_rng = np.random.default_rng(20260816 + int(sf * 10))
        pq.write_table(gen_embeddings(sf, emb_rng), f"{d}/embeddings.parquet")
        print(
            f"wrote {d}: events={int(1e6 * sf)} docs={int(5e4 * sf)} "
            f"lineitem={int(6e6 * sf)}"
        )

    # streaming-sweep event slices at the LOWER SFs too (VERDICT r09
    # item 6): the streaming alpha rows must compare replays with the
    # SAME micro-batch count at every SF, and the read-only driver
    # testdata is single-file — so 8-file twins of sf0.01/sf0.1 events
    # live here (same generator, timing-fidelity only)
    for sf in (0.01, 0.1):
        rng = np.random.default_rng(20260814 + int(sf * 10))
        d = os.path.join(OUT, f"sf{sf:g}")
        os.makedirs(d, exist_ok=True)
        write_events_dir(
            gen_events(sf, rng, values_pool), f"{d}/events.parquet"
        )
        print(f"wrote {d}/events.parquet: {int(1e6 * sf)} events x 8 files")

    # bounded-dup corpus (VERDICT r08 item 4) — generated at sf0.1 too
    # (driver testdata is read-only, so the 0.1 slice lives here)
    for sf in (0.1, 0.3, 1.0):
        rng = np.random.default_rng(20260815 + int(sf * 10))
        d = os.path.join(OUT, f"sf{sf:g}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(
            gen_documents_bounded(sf, rng), f"{d}/documents_bounded.parquet"
        )
        print(f"wrote {d}/documents_bounded.parquet: {int(5e4 * sf)} docs")


if __name__ == "__main__":
    main()

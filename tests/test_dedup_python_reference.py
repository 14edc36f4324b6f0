"""Engine-independent reference checks for the round-8 dedup operators.

test_jaccard_prefix.py pins Spark-prefix == Spark-naive and the gate
pins Spark == DuckDB; this file adds a THIRD truth source — a direct
Python-set reimplementation of the specs — on randomized corpora, so a
shared-engine bug (same wrong answer from two Spark plans) cannot hide.
"""

from __future__ import annotations

import hashlib
import random
from fractions import Fraction

from realtime_analytics_pipeline_spark.operators import dedup as D


def _random_corpus(seed: int, n_docs: int = 40) -> list[tuple[int, str]]:
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(120)]
    header = "common header tokens here"
    rows = []
    for i in range(n_docs):
        body = " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 25)))
        rows.append((2 * i, f"{header} {body}"))
        if i % 4 == 0:  # inject near-dups and exact dups
            rows.append((2 * i + 1, f"{header} {body}" if i % 8 else body))
    return rows


def _py_jaccard_pairs(rows, threshold: float):
    fr = Fraction(str(threshold))
    sets = {d: frozenset(t.split(" ")) for d, t in rows if t}
    out = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            uni = len(sets[a] | sets[b])
            if uni and inter * fr.denominator >= uni * fr.numerator:
                out[(a, b)] = inter * 1_000_000 // uni
    return out


def _py_duplicate_spans(rows, w: int):
    # window fingerprints -> cross-doc duplicated -> merged spans
    wins: dict[int, list[tuple[int, str]]] = {}
    owners: dict[str, set[int]] = {}
    for d, t in rows:
        toks = t.split(" ")
        for p in range(1, len(toks) - w + 2):
            h = " ".join(toks[p - 1 : p - 1 + w])
            wins.setdefault(d, []).append((p, h))
            owners.setdefault(h, set()).add(d)
    spans = set()
    for d, pws in wins.items():
        dup_pos = sorted(p for p, h in pws if len(owners[h]) >= 2)
        start = prev = None
        for p in dup_pos:
            if start is None:
                start = prev = p
            elif p > prev + w:
                spans.add((d, start, prev + w - 1, prev + w - start))
                start = prev = p
            else:
                prev = p
        if start is not None:
            spans.add((d, start, prev + w - 1, prev + w - start))
    return spans


def _py_span_removal(rows, w: int):
    spans = _py_duplicate_spans(rows, w)
    per_doc: dict[int, list[tuple[int, int]]] = {}
    for d, lo, hi, _ in spans:
        per_doc.setdefault(d, []).append((lo, hi))
    out = {}
    for d, t in rows:
        toks = t.split(" ")
        covered = set()
        for lo, hi in per_doc.get(d, []):
            covered.update(range(lo, hi + 1))
        kept = [tok for i, tok in enumerate(toks, 1) if i not in covered]
        n, dup = len(toks), len(covered)
        out[d] = (
            n,
            dup,
            len(per_doc.get(d, [])),
            dup * 1_000_000 // n,
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )
    return out


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_prefix_jaccard_matches_python_reference(spark):
    for seed in (1, 2, 3):
        rows = _random_corpus(seed)
        for t in (0.5, 0.8, 0.9):
            got = {
                (r.doc_a, r.doc_b): r.jaccard_ppm
                for r in D.jaccard_pairs_prefix(
                    _docs(spark, rows), n=1, threshold=t
                ).collect()
            }
            assert got == _py_jaccard_pairs(rows, t), (seed, t)


def test_duplicate_spans_match_python_reference(spark):
    for seed in (4, 5):
        rows = _random_corpus(seed)
        got = {
            (r.doc_id, r.span_start, r.span_end, r.span_tokens)
            for r in D.duplicate_spans(
                _docs(spark, rows), window_tokens=5
            ).collect()
        }
        assert got == _py_duplicate_spans(rows, 5), seed


def test_span_removal_matches_python_reference(spark):
    rows = _random_corpus(6)
    got = {
        r.doc_id: (r.n_tokens, r.dup_tokens, r.n_spans, r.dup_ppm, r.clean_md5)
        for r in D.span_removal(_docs(spark, rows), window_tokens=5).collect()
    }
    assert got == _py_span_removal(rows, 5)

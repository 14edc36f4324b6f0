"""Propose the next round's 50-slot verification window.

The per-round discipline (VERDICT r03 item 1, executed in r04): demote
everything with a driver-green CORRECTNESS row, promote never-driver-
verified oracled queries. This script computes that mechanically:

1. read every CORRECTNESS_r*.json → the driver-green set;
2. pool = oracled queries with NO green row, ordered by registration;
3. emit the first 50 (or --all to dump the whole pool) as a ready-to-
   paste `_VERIFY_WINDOW` literal, annotated with registering module
   so capability diversity is reviewable at a glance.

The output is a PROPOSAL: re-order for capability diversity before
pasting (the window should cover shapes no green row exercises yet),
then replica-verify all 50 at sf0.01 BEFORE committing the swap:

    python scripts/check_queries.py $(python scripts/propose_window.py --names) \
        --sf /root/testdata/sf0.01
"""

from __future__ import annotations

import glob
import json
import sys

sys.path.insert(0, ".")

import __spark_entry__ as entry  # noqa: E402


def main() -> None:
    qs = entry.queries()
    oracles = entry.oracle_sql()
    green: set[str] = set()
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        for q, r in json.load(open(path)).items():
            if (
                r.get("rows_match")
                and r.get("err") is None
                and r.get("hash_match") is not False
            ):
                green.add(q)
    pool = [q for q in qs if q in oracles and q not in green]
    take = pool if "--all" in sys.argv else pool[:50]
    if "--names" in sys.argv:
        print(" ".join(take))
        return
    print(
        f"# pool: {len(pool)} never-driver-verified oracled queries "
        f"({len(green)} green so far); proposing {len(take)}:"
    )
    print("_VERIFY_WINDOW = [")
    for q in take:
        mod = qs[q].__module__.split(".")[-1]
        print(f'    "{q}",  # {mod}')
    print("]")


if __name__ == "__main__":
    main()

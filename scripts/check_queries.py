"""Spot-check named gated queries against their DuckDB oracles.

Usage: python scripts/check_queries.py name1 name2 ... [--sf SF_DIR]

Same type-exact comparison as verify_driver_gate.py, restricted to the
given names — the fast iteration loop while authoring a new query.
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402
from scripts.verify_driver_gate import (  # noqa: E402
    TABLES,
    _pdf_rows,
    get_pristine_spark,
    value_hash,
)


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    # driver-faithful: no engine sql confs at builder level; queries
    # self-tune via the register() wrapper (round-5 NTZ post-mortem)
    spark = get_pristine_spark()
    con = duckdb.connect()
    for t in TABLES:
        # .scale slices: events is an 8-file DIRECTORY (glob it) and
        # only events/documents/tpch-trio/embeddings exist — missing
        # tables get no view, so a query that needs one fails loudly
        # at SQL time instead of at setup
        path = f"{sf_dir}/{t}.parquet"
        if not os.path.exists(path):
            continue
        src = f"'{path}/*.parquet'" if os.path.isdir(path) else f"'{path}'"
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM {src}")
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name in args:
        if name not in queries:
            print(f"  {name}: NOT REGISTERED")
            failures.append(name)
            continue
        t0 = time.time()
        df = queries[name](spark, sf_dir)
        cols = df.columns
        rows = _pdf_rows(df.toPandas())
        dt = time.time() - t0
        if name not in oracles:
            print(f"  {name}: rows-only, {len(rows)} rows ({dt:.1f}s)")
            continue
        ddf = con.execute(oracles[name]).df()
        dcols = list(ddf.columns)
        drows = _pdf_rows(ddf)
        ok_rows = len(rows) == len(drows)
        ok_cols = sorted(cols) == sorted(dcols)
        ok_hash = value_hash(cols, rows) == value_hash(dcols, drows)
        status = "OK" if (ok_rows and ok_cols and ok_hash) else "FAIL"
        print(
            f"  {name}: {status} rows={len(rows)}/{len(drows)} "
            f"cols={'=' if ok_cols else 'DIFF'} hash={'=' if ok_hash else 'DIFF'} ({dt:.1f}s)"
        )
        if status == "FAIL":
            failures.append(name)
            if not ok_cols:
                print(f"    spark cols: {sorted(cols)}")
                print(f"    duck  cols: {sorted(dcols)}")
            elif ok_rows:
                spdf = df.toPandas().sort_values(cols).reset_index(drop=True)
                dsort = ddf.sort_values(cols).reset_index(drop=True)
                neq = (spdf.astype(str) != dsort.astype(str)).any(axis=1)
                print(spdf[neq].head(5))
                print(dsort[neq].head(5))
    if failures:
        print(f"FAILURES: {failures}")
        return 1
    print("ALL MATCH")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

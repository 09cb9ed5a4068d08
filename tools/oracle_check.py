"""Local stand-in for the driver's DuckDB-oracle correctness check.

Runs every query in __spark_entry__.queries() against the parquet
fixtures and compares with the oracle SQL in DuckDB: row count, sorted
column names, and an order-insensitive value comparison (rows sorted by
their string representation; doubles compared to 9 significant digits,
negative zero normalized). Comparison rules live in ONE place
(`mapreduce_server_development_spark.oracle_compare`), shared with the
pytest oracle-smoke suite.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
Unknown query names are an ERROR (exit 2), never a silent 0-query pass.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entrymod  # noqa: E402
from mapreduce_server_development_spark.oracle_compare import (  # noqa: E402
    canon_rows,
    register_duckdb_views,
)
from mapreduce_server_development_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    queries = entrymod.queries()
    unknown = only - set(queries)
    if unknown:
        # A typo'd name silently matching nothing would print
        # "0 pass, 0 fail" and exit 0 — a fake green.
        print(f"ERROR: unknown query name(s): {sorted(unknown)}")
        return 2
    spark = get_spark()
    con = duckdb.connect()
    register_duckdb_views(con, sf_dir)
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = [c.lower() for c in sdf.columns]
            srows = sdf.collect()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            res = con.sql(oracles[name])
            ocols = [c.lower() for c in res.columns]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={scols} duck={ocols}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duck={len(orows)}")
        if not problems:
            a = canon_rows([tuple(r) for r in srows], scols)
            b = canon_rows(orows, ocols)
            if a != b:
                diffs = [(x, y) for x, y in zip(a, b) if x != y]
                problems.append(f"values differ ({len(diffs)} rows); first: {diffs[:2]}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"pass  {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())

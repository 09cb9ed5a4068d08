"""Shared oracle-comparison helpers.

ONE definition of the value-normalization and canonicalization rules
used by both correctness harnesses (`tools/oracle_check.py` and
`tests/test_oracle_smoke.py`) — previously copy-pasted, where a policy
change (sig digits, NULL/NaN handling, the negative-zero fix below)
applied to one copy would silently fork the other.
"""

from __future__ import annotations

import math


def norm_value(v) -> str:
    """Canonical string for one cell: doubles at 9 significant digits,
    NULL/NaN spelled out, and NEGATIVE ZERO normalized to zero — the
    engines can disagree on the sign of a zero sum (different reduction
    orders), and '-0' vs '0' is a numeric non-difference that must not
    fail the compare."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            v = 0.0  # collapse -0.0
        return f"{v:.9g}"
    return str(v)


def canon_rows(rows, cols) -> list[tuple[str, ...]]:
    """Order-insensitive canonical form: columns sorted by name, rows
    sorted by their normalized string tuples."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_value(r[i]) for i in order) for r in rows)


def register_duckdb_views(con, sf_dir: str) -> None:
    """Register every fixture table as a DuckDB view over its parquet."""
    from .sources.tables import TABLES

    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

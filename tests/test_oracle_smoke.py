"""Per-query DuckDB-oracle smoke tests at sf0.001.

The same check the driver runs at sf0.01 (row count, column set,
order-insensitive value comparison at 9 significant digits), one
pytest case per registered query so a regression names the query.
Comparison rules are imported from the shared module
(`mapreduce_server_development_spark.oracle_compare`) — the exact same
code path tools/oracle_check.py uses, so the two harnesses cannot
drift.
"""

from __future__ import annotations

import pytest

from mapreduce_server_development_spark.oracle_compare import canon_rows

from .conftest import SF_SMOKE


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
        # Rows-only contract for non-SQL-expressible operators: no
        # value oracle, but the query must produce a non-empty result
        # with a real schema (a tautological >= 0 here once let any
        # regression through unnamed).
        assert scols, name
        assert len(srows) > 0, f"{name}: rows-only query returned no rows"
        return

    res = duck.sql(oracles[name])
    ocols = [c.lower() for c in res.columns]
    orows = res.fetchall()

    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows)
    assert canon_rows(srows, scols) == canon_rows(orows, ocols)

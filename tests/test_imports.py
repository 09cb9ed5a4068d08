"""Package integrity: imports, registry consistency, driver contract."""

from __future__ import annotations

import inspect


def test_package_imports():
    import mapreduce_server_development_spark as pkg

    assert pkg.__version__
    assert callable(pkg.get_spark)


def test_advertised_modules_exist():
    """Every module the package docstring advertises must import."""
    from mapreduce_server_development_spark import cli, operators, plans
    from mapreduce_server_development_spark.operators import mapreduce

    assert callable(mapreduce.run_job)
    assert callable(operators.run_job)
    assert callable(cli.main)
    assert plans.QUERIES


def test_driver_contract():
    import __spark_entry__ as entry

    queries = entry.queries()
    oracles = entry.oracle_sql()
    assert len(queries) >= 33
    for name, fn in queries.items():
        assert callable(fn), name
        params = list(inspect.signature(fn).parameters)
        assert len(params) == 2, f"{name} must take (spark, sf_dir)"
    # Every oracle refers to a registered query.
    assert set(oracles) <= set(queries)
    # The reference's own workloads are declared.
    assert "q_wordcount" in oracles and "q_grep" in oracles


def test_registry_no_duplicate_registration():
    from mapreduce_server_development_spark.plans import ORACLE, QUERIES

    assert set(ORACLE) <= set(QUERIES)
    assert len(QUERIES) == len(set(QUERIES))

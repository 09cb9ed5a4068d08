"""Bucketed co-located join: the no-shuffle criterion, asserted."""

from __future__ import annotations

from pyspark.sql import functions as F

from .conftest import SF_SMOKE


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    from mapreduce_server_development_spark.sources.bucketed import (
        bucketed_join,
        is_shuffle_free,
        write_bucketed,
    )
    from mapreduce_server_development_spark.sources.tables import load_table

    orders = load_table(spark, SF_SMOKE, "orders")
    lineitem = load_table(spark, SF_SMOKE, "lineitem")
    write_bucketed(orders, "orders_bkt", "o_orderkey", 4, str(tmp_path / "o"))
    write_bucketed(lineitem, "lineitem_bkt", "l_orderkey", 4, str(tmp_path / "l"))
    try:
        joined = bucketed_join(spark, "orders_bkt", "lineitem_bkt", "o_orderkey", "l_orderkey")
        # Co-located: SortMergeJoin with no Exchange on either side.
        assert is_shuffle_free(joined)
        # And the result matches the plain (shuffled) join.
        expected = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey).count()
        assert joined.count() == expected
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_bkt")
        spark.sql("DROP TABLE IF EXISTS lineitem_bkt")


def test_unbucketed_join_shuffles(spark):
    from mapreduce_server_development_spark.sources.bucketed import is_shuffle_free
    from mapreduce_server_development_spark.sources.tables import load_table

    orders = load_table(spark, SF_SMOKE, "orders")
    lineitem = load_table(spark, SF_SMOKE, "lineitem")
    joined = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey).filter(
        F.col("o_totalprice") > 0
    )
    # Control: the plain path DOES exchange (or broadcasts; either way
    # the bucketed variant's zero-Exchange plan is the differentiator).
    assert not is_shuffle_free(joined) or "Broadcast" in joined._jdf.queryExecution().executedPlan().toString()

"""Unit tests for the two-phase distributed global prefix sum."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from mapreduce_server_development_spark.functions.prefix import global_running_sum


def test_matches_sequential_cumsum(spark):
    random.seed(11)
    rows = [(i, random.randrange(0, 50)) for i in range(500)]
    random.shuffle(rows)  # input order must not matter
    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        r["k"]: r["running_sum"]
        for r in global_running_sum(df, "k", "v", num_partitions=13).collect()
    }
    acc = 0
    for k, v in sorted(rows):
        acc += v
        assert got[k] == acc, k


def test_is_distributed_not_single_window(spark):
    """The point of the operator: the heavy window must be partitioned
    (by the range-partition id), never a global single-task window —
    asserted with the engine-wide single-partition-Window detector."""
    from .test_no_antipatterns import single_partition_windows

    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    out = global_running_sum(df, "k", "v", num_partitions=8)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "__prefix_pid" in plan  # window partitioned by pid...
    assert not single_partition_windows(plan)  # ...never global
    # internal columns must not leak into the output schema
    assert "__prefix" not in str(out.columns)


def test_empty_and_single_row(spark):
    empty = spark.createDataFrame([], "k long, v long")
    assert global_running_sum(empty, "k", "v").count() == 0
    one = spark.createDataFrame([(5, 42)], "k long, v long")
    assert global_running_sum(one, "k", "v").collect()[0]["running_sum"] == 42


def test_running_min_with_null_partitions(spark):
    """A partition whose values are all NULL yields a NULL partition
    minimum; the driver cumulation must treat it as a no-op (like an
    empty partition), never min(acc, None). With many partitions and
    few rows, some partitions hold only the NULL rows."""
    from mapreduce_server_development_spark.functions.prefix import (
        global_running_min,
    )

    rows = [(1, 7), (2, None), (3, None), (4, 5), (5, None), (6, 9)]
    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        r["k"]: r["running_min"]
        for r in global_running_min(df, "k", "v", num_partitions=6).collect()
    }
    # prefix minima over non-null values; NULL rows inherit the prior
    # prefix min (Spark's min() ignores NULLs)
    assert got[1] == 7
    assert got[4] == 5
    assert got[6] == 5


def test_row_number_matches_sequential(spark):
    from mapreduce_server_development_spark.functions.prefix import global_row_number

    random.seed(23)
    rows = [(i, random.randrange(0, 40), f"u{i:04d}") for i in range(400)]
    random.shuffle(rows)
    df = spark.createDataFrame(rows, "id long, v long, u string")
    got = {
        r["id"]: r["rn"]
        for r in global_row_number(
            df, [F.col("v").desc(), F.col("u")], num_partitions=9
        ).collect()
    }
    expect = sorted(rows, key=lambda t: (-t[1], t[2]))
    for rk, (i, _, _) in enumerate(expect, start=1):
        assert got[i] == rk, i


def test_row_number_is_distributed(spark):
    from mapreduce_server_development_spark.functions.prefix import global_row_number

    from .test_no_antipatterns import single_partition_windows

    df = spark.range(100).select(F.col("id").alias("k"))
    out = global_row_number(df, ["k"], num_partitions=8)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "__prefix_pid" in plan
    assert not single_partition_windows(plan)
    assert "__prefix" not in str(out.columns)


def test_row_number_empty_and_nulls(spark):
    from mapreduce_server_development_spark.functions.prefix import global_row_number

    empty = spark.createDataFrame([], "k long")
    assert global_row_number(empty, ["k"]).count() == 0
    df = spark.createDataFrame([(None,), (3,), (1,)], "k long")
    got = {
        r["k"]: r["rn"]
        for r in global_row_number(df, [F.col("k").desc_nulls_last()]).collect()
    }
    assert got == {3: 1, 1: 2, None: 3}

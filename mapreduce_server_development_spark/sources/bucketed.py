"""Bucketed tables: shuffle-free co-located joins.

At 100 TB the dominant cost of a fact-fact join (e.g. orders ⋈
lineitem) is the shuffle. Writing both sides bucketed AND sorted by
the join key puts co-joinable rows in matching files at write time;
Spark's SortMergeJoin then runs with NO Exchange on either side —
the join is pre-shuffled once, amortized over every subsequent query.

Usage:
    write_bucketed(orders, "orders_b", "o_orderkey", 32, path)
    write_bucketed(lineitem, "lineitem_b", "l_orderkey", 32, path2)
    spark.table("orders_b").join(spark.table("lineitem_b"), ...)
    # .explain() shows SortMergeJoin with zero Exchange operators.

Both sides must use the same bucket count; bucketing survives only
through the table catalog (``spark.table``), not plain path reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    num_buckets: int,
    path: str,
) -> None:
    """Write ``df`` as a bucketed+sorted external parquet table."""
    (
        df.write.bucketBy(num_buckets, key)
        .sortBy(key)
        .option("path", path)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table_name)
    )


def is_shuffle_free(joined: DataFrame) -> bool:
    """True when the physical plan contains no shuffle Exchange —
    the bucketed-join success criterion (a BroadcastExchange moves a
    bounded build side, not the data)."""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" not in plan and "Exchange rangepartitioning" not in plan


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, left_key: str, right_key: str
) -> DataFrame:
    """Join two previously-bucketed catalog tables on their bucket keys.

    The ``merge`` hint pins SortMergeJoin — at fixture scale Catalyst
    would rather broadcast (which also disables the bucketed scan); at
    real fact-fact scale SMJ is what the planner picks anyway, and the
    matching bucket layout removes both shuffles.
    """
    left = spark.table(left_table).hint("merge")
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key])

"""Hive-style partitioned parquet layout — the standard 100 TB table
organization (one directory level per partition column, e.g.
``day=2024-01-07/``), giving Catalyst partition PRUNING: a filter on
the partition column eliminates whole directories at planning time, so
a one-day query over a 3-year table reads ~0.1% of the files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned_by_day(
    df: DataFrame, path: str, ts_col: str = "ts", partition_col: str = "day"
) -> None:
    """Write with a derived ``day`` partition column (dynamic overwrite
    would land per-partition at scale; full overwrite here)."""
    df.withColumn(partition_col, F.date_format(F.col(ts_col), "yyyy-MM-dd")).write.mode(
        "overwrite"
    ).partitionBy(partition_col).parquet(path)


def read_day(spark: SparkSession, path: str, day: str, partition_col: str = "day") -> DataFrame:
    """Read one day; the filter on the partition column prunes all
    other directories at planning time (PartitionFilters in the scan)."""
    return spark.read.parquet(path).filter(F.col(partition_col) == day)

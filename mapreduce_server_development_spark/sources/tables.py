"""Parquet star-schema table registry.

The driver's synthetic TPC-H-ish tables (TESTDATA.md) are one parquet
file per table under an ``sf*`` directory. Reading through
``spark.read.parquet`` keeps predicate pushdown / column pruning /
partition-splitting in Catalyst's hands — at 100 TB these would be
multi-file datasets and nothing here changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale
# (region/nation are fixed-size; supplier/part/customer grow with SF but
# stay orders of magnitude under the fact tables).
BROADCAST_DIMS = ("region", "nation", "supplier")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table. Plain parquet scan — pushdown-friendly.

    The ``events`` table's ``ts`` column is parquet
    ``INT64 TIMESTAMP(NANOS)``. How Spark surfaces it varies by
    version: 4.0 under ``spark.sql.legacy.parquet.nanosAsLong`` reads
    it as a raw nanosecond long; 4.1 reads it natively as
    ``timestamp_ntz`` truncated to microseconds. Normalize both to a
    session-zone ``timestamp`` so every downstream query (and
    ``unix_micros``) sees one canonical type.
    """
    # Timestamp semantics must match the UTC-naive DuckDB oracle no
    # matter what session the driver hands us.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # Integer division: ns values (~1.7e18) exceed double's exact
            # integer range, so a float path would corrupt microseconds.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # Wall-clock-preserving under the UTC session zone pinned above.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every table in the schema."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views for ``spark.sql`` use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)

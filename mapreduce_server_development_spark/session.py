"""SparkSession factory tuned for this engine.

Defaults are chosen for correctness-vs-oracle (UTC timestamps) and for
scale (AQE on, skew-join handling on, Arrow for the Pandas-UDF paths).
On a real cluster the same settings hold; only ``master`` and memory
sizing change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = "mapreduce-server-development-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    - ``spark.sql.session.timeZone=UTC``: the oracle (DuckDB) uses
      UTC-naive timestamps; pinning UTC makes timestamp semantics match.
    - AQE enabled: runtime partition coalescing + skew-join splitting,
      which is the 100 TB posture (no hand-tuned partition counts).
    - shuffle partitions default to the local core count; on a cluster
      AQE coalesces from a higher initial number anyway.
    """
    cores = _default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cores}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or max(cores, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.driver.maxResultSize", "2g")
        # Local mode runs the whole engine in the driver JVM; the 1g
        # default heap GC-thrashes once ~32 shuffle tasks run hot.
        # Upper bound, not an allocation; on a cluster use
        # executor-memory sizing instead.
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
        )
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()

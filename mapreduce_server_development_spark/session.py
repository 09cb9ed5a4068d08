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


def state_store_confs() -> dict[str, str]:
    """Streaming state-store configs, env-gated.

    A/B at sf0.1/local[32] (round 5, BENCH_DETAIL.json "state_store_ab"):
    the default HDFS-backed in-memory provider wins on every stateful
    query at fixture scale (q_stream_stream_join 9.35s vs 11.93s at 32
    state partitions, 3.37s vs 3.49s at 8) because per-micro-batch
    native open/commit overhead across many tiny RocksDB instances
    dominates when state is small. At 100 TB state exceeds executor
    heap and RocksDB (with changelog checkpointing, public Spark >= 3.4)
    is the correct provider — flip with SPARK_GRAFT_STATE_STORE=rocksdb;
    the RocksDB JNI jar ships with pyspark so this is config-only.
    """
    if os.environ.get("SPARK_GRAFT_STATE_STORE", "").lower() != "rocksdb":
        return {}
    return {
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider"
        ),
        "spark.sql.streaming.stateStore.rocksdb."
        "changelogCheckpointing.enabled": "true",
    }


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
    for k, v in state_store_confs().items():
        builder = builder.config(k, v)
    return builder.getOrCreate()

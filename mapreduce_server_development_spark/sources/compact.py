"""Small-file compaction — the standard maintenance pass for ingest
directories (a 100 TB training corpus arrives as millions of small
part-files; scans then pay per-file open/listing costs and executors
starve on tiny splits).

Spark-first shape: one distributed read + `repartition` + write. The
target partition count is derived from the ACTUAL byte size of the
input (via the file listing, no data pass), so output files land near
``target_mb`` regardless of input skew. No driver-side data movement.
"""

from __future__ import annotations

import math
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def dir_bytes(path: str) -> int:
    """Total bytes of data files under ``path`` (ignores _SUCCESS/.crc)."""
    return sum(
        p.stat().st_size
        for p in Path(path).rglob("*")
        if p.is_file() and not p.name.startswith((".", "_"))
    )


def plan_num_files(total_bytes: int, target_mb: int = 128) -> int:
    """Output file count that lands files near the target size."""
    return max(1, math.ceil(total_bytes / (target_mb * 1024 * 1024)))


def compact_parquet(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    target_mb: int = 128,
    sort_within_by: list[str] | None = None,
) -> DataFrame:
    """Compact a parquet directory into ~``target_mb`` files.

    ``sort_within_by`` optionally sorts rows inside each output file
    (``sortWithinPartitions`` — no global shuffle beyond the
    repartition) so downstream scans get better min/max pruning on
    those columns. Returns the compacted DataFrame (lazily re-read
    from the output).
    """
    df = spark.read.parquet(input_dir)
    n = plan_num_files(dir_bytes(input_dir), target_mb)
    out = df.repartition(n)
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    out.write.mode("overwrite").parquet(output_dir)
    return spark.read.parquet(output_dir)

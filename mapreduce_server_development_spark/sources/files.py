"""CSV / JSON (JSON-Lines) sources and sinks.

The reference's only I/O is newline-delimited text (SURVEY.md §2.3
"Scans/sources/sinks"); csv/json are additive connectors. Defaults
follow the reference's permissive-parse posture (SURVEY §1.3: malformed
records are tolerated and skippable, not fail-fast): ``PERMISSIVE``
mode with a ``_corrupt_record`` column for json, header+schema options
for csv. Explicit schemas are preferred at scale — inference costs an
extra full read of the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """CSV directory/file scan. Pass ``schema`` at scale (no inference
    pass); without it Spark reads the data once to infer types."""
    reader = (
        spark.read.option("header", header)
        .option("sep", delimiter)
        .option("mode", "PERMISSIVE")
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
) -> DataFrame:
    """JSON-Lines scan, permissive: malformed rows land in
    ``_corrupt_record`` instead of failing the read."""
    reader = spark.read.option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", "_corrupt_record"
    )
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    """CSV sink (overwrite) — one file per partition."""
    df.write.mode("overwrite").option("header", header).csv(path)


def write_json(df: DataFrame, path: str) -> None:
    """JSON-Lines sink (overwrite) — one file per partition."""
    df.write.mode("overwrite").json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source — columnar like parquet, schema embedded.

    ORC is Spark-native (vectorized reader, predicate pushdown, column
    pruning — same scan properties as the parquet plane).
    """
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink (overwrite) — one file per partition."""
    df.write.mode("overwrite").orc(path)


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema: StructType | str | None = None,
) -> DataFrame:
    """XML scan (Spark 4 built-in data source): one row per ``row_tag``
    element, attributes as ``_attr`` columns, nested elements as
    structs. PERMISSIVE like the json path — malformed elements land in
    ``_corrupt_record`` rather than failing the read. Pass ``schema``
    at scale (inference reads the data once)."""
    reader = (
        spark.read.format("xml")
        .option("rowTag", row_tag)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
    )
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
) -> DataFrame:
    """Whole-file binary ingestion (``binaryFile`` source): one row per
    file with (path, modificationTime, length, content binary) — the
    ingestion front door of the multimodal plane (images/audio/video
    drop as opaque blobs; see functions/multimodal.py for what runs on
    the ``content`` column). ``pathGlobFilter`` prunes at the listing,
    and large corpora should bound per-task memory with
    ``spark.sql.files.maxPartitionBytes`` since each file is one row."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)

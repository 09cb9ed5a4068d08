"""Text-directory source and sink — the reference's only I/O surface.

Reference parity (SURVEY.md §2.1):
- F1 directory scan: ``/root/reference mapreduce/manager/__main__.py:402-423``
  globs all files of a directory, sorted by name. Spark's ``spark.read.text``
  on a directory does the same listing and additionally splits large files.
- F8 sink: ``manager/__main__.py:738-761`` renames results to
  ``outputfile01..NN`` (zero-padded, overwriting the output dir).
  ``write_text_numbered`` reproduces that naming on top of ``df.write.text``.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def read_text_dir(spark: SparkSession, input_dir: str) -> DataFrame:
    """Scan a directory of newline-delimited text files (one row per line)."""
    return spark.read.text(input_dir)


def prepare_numbered_sink(output_dir: str) -> tuple[Path, Path]:
    """F8 sink setup shared by the DataFrame and RDD writers: delete +
    recreate the output dir (reference overwrite semantics) and return
    (out, empty staging path) for the writer to fill."""
    out = Path(output_dir)
    if out.exists():
        shutil.rmtree(out)
    staging = out.parent / (out.name + ".__staging__")
    if staging.exists():
        shutil.rmtree(staging)
    return out, staging


def collect_numbered_outputs(out: Path, staging: Path) -> list[str]:
    """F8 sink finish shared by the DataFrame and RDD writers: rename
    staged ``part-*`` files (sorted, .crc excluded) to
    ``outputfile01..NN`` and drop the staging dir."""
    out.mkdir(parents=True)
    parts = sorted(
        p for p in staging.glob("part-*") if not p.name.endswith(".crc")
    )
    renamed: list[str] = []
    for i, part in enumerate(parts, start=1):
        dest = out / f"outputfile{i:02d}"
        shutil.move(str(part), dest)
        renamed.append(str(dest))
    shutil.rmtree(staging)
    return renamed


def write_text_numbered(df: DataFrame, output_dir: str, num_files: int | None = None) -> list[str]:
    """Write a single-string-column DataFrame as ``outputfile01..NN``.

    Mirrors the reference sink semantics: the output directory is
    deleted and recreated (manager/__main__.py:747-749 overwrites), and
    part files are renamed to ``outputfileNN``. ``num_files`` pins the
    exact file count (the reference's ``num_reducers``); when given we
    repartition — exact output-file counts matter for golden parity, so
    AQE coalescing must not change them (repartition after the shuffle
    boundary keeps the count stable).
    """
    out, staging = prepare_numbered_sink(output_dir)
    if num_files is not None:
        df = df.repartition(num_files)
    df.write.mode("overwrite").text(str(staging))
    return collect_numbered_outputs(out, staging)

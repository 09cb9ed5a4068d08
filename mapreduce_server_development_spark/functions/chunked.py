"""Chunked trailing-row windows: ROWS BETWEEN N PRECEDING AND 1
PRECEDING without capping parallelism at the partition-key cardinality.

``Window.partitionBy(key)`` alone puts each key's WHOLE sequence in one
task — parallelism ~ |key|, dead at 100 TB for low-cardinality keys.
The standard chunked-window shape fixes it: given a contiguous 1-based
per-key sequence position, group rows into fixed-size chunks, copy each
chunk's last ``frame`` rows into the NEXT chunk's partition (the
overlap carry), run the trailing window inside (key, chunk), and keep
only the non-carry rows — every frame is complete locally, parallelism
follows rows / chunk_rows, and per-task state is one chunk + frame
rows. With order- and associativity-exact aggregates (counts, integer
or decimal sums) the result is bit-identical to the monolithic window.

No reference counterpart; public-knowledge technique (the chunked /
overlap-carry formulation of sliding windows).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def chunked_trailing_window(
    df: DataFrame,
    key_col: str,
    rn_col: str,
    frame: int,
    chunk_rows: int,
    aggs: Callable[[WindowSpec], list[Column]],
) -> DataFrame:
    """Apply trailing-window aggregates over ``ROWS BETWEEN frame
    PRECEDING AND 1 PRECEDING`` per ``key_col`` ordered by ``rn_col``
    (a contiguous 1-based per-key sequence, e.g. from the distributed
    row_number in ``prefix.py``), chunked for scale.

    ``aggs(window)`` returns the aggregate columns to add. Requires
    ``chunk_rows >= frame`` (the carry must cover the whole frame
    depth). Output: the input rows plus the aggregate columns.
    """
    if chunk_rows < frame:
        raise ValueError("chunk_rows must be >= frame")
    cols = df.columns
    cur = df.select(
        *cols,
        F.expr(f"({rn_col} - 1) DIV {chunk_rows}").alias("__chunk"),
        F.lit(True).alias("__is_cur"),
    )
    carry = df.filter(
        F.expr(f"({rn_col} - 1) % {chunk_rows} >= {chunk_rows - frame}")
    ).select(
        *cols,
        F.expr(f"({rn_col} - 1) DIV {chunk_rows} + 1").alias("__chunk"),
        F.lit(False).alias("__is_cur"),
    )
    w = (
        Window.partitionBy(key_col, "__chunk")
        .orderBy(rn_col)
        .rowsBetween(-frame, -1)
    )
    return (
        cur.unionByName(carry)
        .select(*cols, "__is_cur", *aggs(w))
        .filter("__is_cur")
        .drop("__is_cur")
    )

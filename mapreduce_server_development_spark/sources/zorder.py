"""Z-order (Morton-curve) layout: multi-dimensional data clustering.

Parquet scan pruning works off per-row-group min/max statistics, which
only help for the single column the data happens to be sorted by.
Interleaving the bits of TWO query dimensions into one z-value and
range-partitioning + sorting by it clusters the data so that row-group
min/max ranges are tight on BOTH dimensions — predicates on either
column (or both) skip most of a 100 TB table. This is the same layout
technique Delta Lake's OPTIMIZE ZORDER BY and Databricks liquid
clustering apply; here it is expressed with public Spark primitives
only: a pure-JVM bit-interleave expression, ``repartitionByRange`` (one
range shuffle over sampled split points) and ``sortWithinPartitions``.

All arithmetic is integer bit ops (shiftright/AND/shiftleft) — exactly
mirrored in the DuckDB oracle — and the write path guarantees files
with pairwise-disjoint z ranges (asserted in tests/test_sources.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_zvalue(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` of two non-negative ints: bit i of
    ``a`` lands at position 2i, bit i of ``b`` at 2i+1. Static
    expression tree of shift/AND/OR — whole-stage-codegen, no Python.
    """
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(
            F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    return z


def morton_zvalue_sql(a_expr: str, b_expr: str, bits: int = 16) -> str:
    """The identical interleave as DuckDB SQL (>>, &, << on BIGINT)."""
    terms = []
    for i in range(bits):
        terms.append(f"(((CAST({a_expr} AS BIGINT) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((CAST({b_expr} AS BIGINT) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    dim_a: str,
    dim_b: str,
    num_files: int = 8,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet clustered on the z-curve of two columns.

    ``repartitionByRange`` samples split points over the z-value (one
    shuffle) so output files hold pairwise-disjoint z ranges;
    ``sortWithinPartitions`` orders rows inside each file so parquet
    row-group (page) stats are tight too. Scans filtering either
    dimension then skip whole files/row-groups via min/max pruning.
    """
    z = morton_zvalue(F.col(dim_a), F.col(dim_b), bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )

"""Custom join operators Spark lacks as built-ins.

``asof_join`` — for each left row, attach the most recent right row
with ``right_ts < left_ts`` (strict) sharing the key. Implemented as
the union + last-non-null-window composition: ONE shuffle on the key
(both inputs exchange-partitioned together), no range explosion, no
per-key collect — the scale-correct plan for temporal point lookups.
A naive range join (``l.ts > r.ts`` + row_number) would explode to
O(|L|·|R|) per key before pruning; this stays O(|L|+|R|) log-sorted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Strict as-of join: latest right row with ``ts`` strictly before.

    Returns every left row (left outer semantics) plus
    ``prefix + c`` for each ``c`` in ``right_cols`` (null when no prior
    right row exists). Tag ordering makes the comparison strict: at
    equal timestamps the left row sorts BEFORE the right row, so a
    same-instant right row is never matched.
    """
    rtypes = dict(right.dtypes)
    l2 = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(rtypes[c]).alias(f"__r_{c}") for c in right_cols],
    )
    r2 = right.select(
        # Right rows keep their OWN key (it is the partition column);
        # every other left-shape column is a typed null.
        *[
            F.col(by).alias(c) if c == by else F.lit(None).cast(t).alias(c)
            for c, t in left.dtypes
        ],
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    u = l2.unionByName(r2)
    w = (
        Window.partitionBy(by)
        .orderBy("__ts", "__side", f"__r_{right_cols[0]}")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = [
        F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{prefix}{c}")
        for c in right_cols
    ]
    return (
        u.select("*", *matched)
        .filter(F.col("__side") == 0)
        .drop("__ts", "__side", *[f"__r_{c}" for c in right_cols])
    )

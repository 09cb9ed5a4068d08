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

    The right columns travel as ONE struct so the attached values all
    come from the SAME right row — per-column ``last(ignorenulls)``
    would stitch a composite row together whenever the most recent
    right row holds a NULL in one of its columns.
    """
    from pyspark.sql import types as T

    stype = T.StructType([right.schema[c] for c in right_cols])
    l2 = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(stype).alias("__r"),
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
        F.struct(*[F.col(c).alias(c) for c in right_cols])
        .cast(stype)
        .alias("__r"),
    )
    u = l2.unionByName(r2)
    w = (
        Window.partitionBy(by)
        .orderBy("__ts", "__side", "__r")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_r = F.last("__r", ignorenulls=True).over(w)
    matched = [
        last_r.getField(c).alias(f"{prefix}{c}") for c in right_cols
    ]
    return (
        u.select("*", *matched)
        .filter(F.col("__side") == 0)
        .drop("__ts", "__side", "__r")
    )


def packed_bloom_semijoin(
    build: DataFrame,
    probe: DataFrame,
    build_key: str,
    probe_key: str,
    bits: int = 4096,
    k: int = 3,
) -> DataFrame:
    """Bloom-filter semi-join with the filter packed into 64-bit lanes —
    the production shape of plans/sketches.py's q_bloom_semijoin
    (which keeps the readable explode-per-hash form for the oracle).

    Build: every key sets k md5-derived bit positions; positions
    aggregate into ``bits/64`` BIGINT words via bit-OR — a map-side
    combinable aggregate whose output is at most ``bits/64`` rows
    regardless of build cardinality. The words are collected (bounded:
    64 values for the default 4096 bits — same documented exception as
    functions/prefix.py's one-row-per-partition collect) and embedded
    as a LITERAL array in the probe predicate, so the probe side is a
    pure filter inside its own scan stage: zero shuffle, zero row
    fan-out, no join at all. Identical hash family to q_bloom_semijoin,
    so both admit exactly the same key set (asserted in
    tests/test_functions_unit.py).

    May admit false positives (size ``bits`` ~ 10x build keys for ~1%);
    never drops a true member. Returns passing probe rows unchanged.
    """
    if bits % 64 != 0 or bits <= 0:
        raise ValueError("bits must be a positive multiple of 64")
    if k < 1:
        raise ValueError("k must be >= 1")
    n_words = bits // 64

    def positions(key_col):
        return [
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"{i}:"), key_col.cast("string"))),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % bits
            )
            for i in range(k)
        ]

    contrib = None
    for pos in positions(F.col(build_key)):
        part = build.select(
            F.shiftright(pos, 6).alias("w"), (pos % 64).alias("b")
        ).select("w", F.expr("shiftleft(CAST(1 AS BIGINT), CAST(b AS INT))").alias("m"))
        contrib = part if contrib is None else contrib.unionAll(part)
    word_rows = contrib.groupBy("w").agg(F.bit_or("m").alias("bits")).collect()
    words = [0] * n_words
    for r in word_rows:
        words[r.w] = r.bits
    lit_words = F.array(*[F.lit(int(w)).cast("long") for w in words])

    cond = None
    for pos in positions(F.col(probe_key)):
        word = F.element_at(lit_words, F.shiftright(pos, 6).cast("int") + 1)
        # (word >> (pos % 64)) & 1 — shift amount is a column, so use
        # the SQL shiftright via call_function (the Python wrapper only
        # accepts literal shifts).
        bit = F.call_function(
            "shiftright", word, (pos % 64).cast("int")
        ).bitwiseAND(F.lit(1).cast("long"))
        this = bit == 1
        cond = this if cond is None else (cond & this)
    return probe.filter(cond)

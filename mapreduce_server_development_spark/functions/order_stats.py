"""Distributed exact interpolated percentiles from order statistics.

Shared machinery for the rank-based percentile queries
(q_conversion_lag, q_group_percentiles): Spark's exact ``percentile()``
is an ImperativeAggregate that buffers EVERY group member in one final
aggregation buffer — a relation-scale array on one executor at 100x.
The scale-safe formulation picks the k-th and (k+1)-th order statistics
off the distributed row_number (``prefix.py``) and interpolates:

    value(q) = v[k] + (v[k+1] - v[k]) * frac,
    k = floor((n-1)*q) + 1 (1-based), frac = (n-1)*q - floor((n-1)*q)

— the exact association Spark's percentile() and DuckDB's
quantile_cont use. The formula and the k-index are emitted as SQL TEXT
used verbatim by BOTH engines (Spark selectExpr and the DuckDB
oracle), so every double rounds identically.

Expected column protocol: ``n`` = group size; ``rk`` = 1-based rank;
``k<tag>`` = the broadcast index; ``lo<tag>``/``hi<tag>`` = the picked
order statistics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (tag, quantile-literal) pairs shared by the percentile queries.
P50_P90 = (("50", "0.5"), ("90", "0.9"))


def k_index_text(q: str, tag: str) -> str:
    """SQL text for the 1-based lower order-statistic index at q."""
    return (
        f"CAST(floor((CAST(n AS DOUBLE) - 1) * {q}) AS BIGINT) + 1 AS k{tag}"
    )


def interp_text(tag: str, q: str, divisor: str, digits: int = 4) -> str:
    """SQL text interpolating between lo<tag>/hi<tag> at quantile q,
    scaled down by ``divisor`` (e.g. '10000.0' for e4 fixed-point,
    '3600000000.0' for microseconds -> hours) and rounded."""
    lo, hi = f"lo{tag}", f"hi{tag}"
    pos = f"(CAST(n AS DOUBLE) - 1) * {q}"
    frac = f"({pos} - floor({pos}))"
    return (
        f"round((CAST({lo} AS DOUBLE)"
        f" + (CAST(COALESCE({hi}, {lo}) AS DOUBLE) - CAST({lo} AS DOUBLE))"
        f" * {frac}) / {divisor}, {digits})"
    )


def interp_raw_text(tag: str, q: str) -> str:
    """Unrounded interpolation text (for downstream arithmetic such as
    Tukey fences, where rounding belongs at the output boundary)."""
    lo, hi = f"lo{tag}", f"hi{tag}"
    pos = f"(CAST(n AS DOUBLE) - 1) * {q}"
    frac = f"({pos} - floor({pos}))"
    return (
        f"(CAST({lo} AS DOUBLE)"
        f" + (CAST(COALESCE({hi}, {lo}) AS DOUBLE) - CAST({lo} AS DOUBLE))"
        f" * {frac})"
    )


def pick_aggs(value_col: str, tags: tuple[tuple[str, str], ...] = P50_P90) -> list[Column]:
    """DataFrame-side aggregates picking lo/hi order statistics: rows
    whose rk equals the broadcast k (or k+1) surface via MAX(CASE)."""
    out: list[Column] = []
    for tag, _q in tags:
        out.append(
            F.max(
                F.when(F.col("rk") == F.col(f"k{tag}"), F.col(value_col))
            ).alias(f"lo{tag}")
        )
        out.append(
            F.max(
                F.when(F.col("rk") == F.col(f"k{tag}") + 1, F.col(value_col))
            ).alias(f"hi{tag}")
        )
    return out


def pick_sql(value_col: str, tags: tuple[tuple[str, str], ...] = P50_P90) -> str:
    """Oracle-side SELECT-list fragment equivalent to ``pick_aggs``."""
    parts = []
    for tag, _q in tags:
        parts.append(
            f"MAX(CASE WHEN rk = k{tag} THEN {value_col} END) AS lo{tag}"
        )
        parts.append(
            f"MAX(CASE WHEN rk = k{tag} + 1 THEN {value_col} END) AS hi{tag}"
        )
    return ", ".join(parts)

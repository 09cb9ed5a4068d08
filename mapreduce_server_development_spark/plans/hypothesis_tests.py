"""Hypothesis-test analytics: Welch's t, one-way ANOVA, burstiness.

Round-6 continuation of the stats_ml family (same house discipline —
see ``stats_ml.py``'s module docstring): every aggregation runs on
exact integers (scaled cents / counts) summed as DECIMAL(38,0)
Spark-side and HUGEINT DuckDB-side, and every floating-point formula
is ONE shared SQL text evaluated by both engines over those exact
sums, rounded before output. Per-group float terms that must be summed
again are rounded to integer units first (round-before-sum), so the
cross-engine comparison never depends on double-summation order.

No reference counterpart (the reference engine's surface stops at
wc/grep executables — ``/root/reference/tests/testdata/exec``);
public-knowledge statistics (Welch 1947, Fisher's ANOVA,
Welch–Satterthwaite df, Fano factor / Goh–Barabási burstiness).

Scale: each query is one fact-table hash aggregate whose reduce side
is group-count-sized (2 variants / |event_type| groups / |event_type|
× hours cells), then a tiny closed-form readout. No windows, no
joins on data-scale keys, map-side partial aggregation throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# ---------------------------------------------------------------------------
# q_welch_ttest — Welch's unequal-variance t-test between A/B variants
# ---------------------------------------------------------------------------

#: Purchase value in exact integer cents (shared text; round() is
#: half-away-from-zero for positive values in both engines).
_CENTS = "CAST(round(value * 100) AS BIGINT)"

#: Closed-form Welch readout over the exact sufficient statistics
#: (n, Σcents, Σcents²) per variant. Means/vars are in cents until the
#: final output conversion to dollars; the t statistic and df are
#: unit-free. Single shared expression text → identical IEEE trees.
_W_MA = "(CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE))"
_W_MB = "(CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))"
_W_VA = (
    "((CAST(ss_a AS DOUBLE)"
    f" - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE))"
    " / CAST(n_a - 1 AS DOUBLE))"
)
_W_VB = (
    "((CAST(ss_b AS DOUBLE)"
    f" - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))"
    " / CAST(n_b - 1 AS DOUBLE))"
)
_W_SEA = f"({_W_VA} / CAST(n_a AS DOUBLE))"
_W_SEB = f"({_W_VB} / CAST(n_b AS DOUBLE))"
_WELCH_FINAL = (
    "CAST(n_a AS BIGINT) AS n_a",
    "CAST(n_b AS BIGINT) AS n_b",
    f"round({_W_MA} / 100.0, 6) + 0.0 AS mean_a",
    f"round({_W_MB} / 100.0, 6) + 0.0 AS mean_b",
    f"round(({_W_MA} - {_W_MB})"
    f" / NULLIF(sqrt({_W_SEA} + {_W_SEB}), 0.0), 6) + 0.0 AS t_stat",
    f"round(({_W_SEA} + {_W_SEB}) * ({_W_SEA} + {_W_SEB})"
    f" / NULLIF({_W_SEA} * {_W_SEA} / CAST(n_a - 1 AS DOUBLE)"
    f" + {_W_SEB} * {_W_SEB} / CAST(n_b - 1 AS DOUBLE), 0.0), 6) + 0.0"
    " AS df_welch",
)


@query(
    "q_welch_ttest",
    oracle=f"""
    WITH p AS (
        SELECT user_id % 2 AS variant, {_CENTS} AS c
        FROM events WHERE event_type = 'purchase'
    ),
    s AS (
        SELECT CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_a,
               CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_b,
               SUM(CASE WHEN variant = 0 THEN c ELSE 0 END) AS s_a,
               SUM(CASE WHEN variant = 1 THEN c ELSE 0 END) AS s_b,
               SUM(CASE WHEN variant = 0 THEN c * c ELSE 0 END) AS ss_a,
               SUM(CASE WHEN variant = 1 THEN c * c ELSE 0 END) AS ss_b
        FROM p
    )
    SELECT {", ".join(_WELCH_FINAL)} FROM s
    """,
)
def q_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test: does mean purchase value
    differ between the user_id-parity A/B variants? The companion to
    q_ab_test's proportion z-test — this is the revenue-metric readout
    (continuous outcome, no equal-variance assumption), with the
    Welch–Satterthwaite degrees of freedom.

    Determinism: sufficient statistics are exact integers (cents as
    BIGINT, sums as DECIMAL(38,0) / HUGEINT so Σcents² cannot overflow
    at any SF); the t/df formulas are one shared text over those exact
    sums.

    Scale: one hash aggregate over the purchase slice (map-side
    combine → 6 counters), one row out. No shuffle wider than the
    six-counter partial-agg merge.
    """
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").selectExpr(
        "user_id % 2 AS variant", f"{_CENTS} AS c"
    )
    s = p.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
        F.sum(
            F.when(F.col("variant") == 0, F.col("c")).otherwise(0).cast(
                "decimal(38,0)"
            )
        ).alias("s_a"),
        F.sum(
            F.when(F.col("variant") == 1, F.col("c")).otherwise(0).cast(
                "decimal(38,0)"
            )
        ).alias("s_b"),
        F.sum(
            F.when(F.col("variant") == 0, F.col("c") * F.col("c"))
            .otherwise(0)
            .cast("decimal(38,0)")
        ).alias("ss_a"),
        F.sum(
            F.when(F.col("variant") == 1, F.col("c") * F.col("c"))
            .otherwise(0)
            .cast("decimal(38,0)")
        ).alias("ss_b"),
    )
    return s.selectExpr(*_WELCH_FINAL)


# ---------------------------------------------------------------------------
# q_anova_oneway — one-way ANOVA F-test across event types
# ---------------------------------------------------------------------------

#: Per-group between-groups term s_g²/n_g, rounded to integer cents²
#: BEFORE the cross-group sum (round-before-sum: both engines then sum
#: identical integers, so the result cannot depend on float-summation
#: order). s_g fits a double exactly far past any realistic SF's group
#: sum (2⁵³ cents ≈ 9·10¹³ dollars); the product is the same IEEE
#: double in both engines either way because the inputs and expression
#: text are identical.
_ANOVA_TERM = (
    "CAST(round(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE)"
    " / CAST(n_g AS DOUBLE)) AS DECIMAL(38,0))"
)

_A_SST = (
    "(CAST(ss AS DOUBLE)"
    " - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))"
)
_A_SSB = (
    "(CAST(bt AS DOUBLE)"
    " - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))"
)
_ANOVA_FINAL = (
    "CAST(k AS BIGINT) AS n_groups",
    "CAST(n AS BIGINT) AS n_rows",
    f"round({_A_SSB} / CAST(k - 1 AS DOUBLE)"
    f" / NULLIF(({_A_SST} - {_A_SSB}) / CAST(n - k AS DOUBLE), 0.0), 6)"
    " + 0.0 AS f_stat",
    f"round({_A_SSB} / NULLIF({_A_SST}, 0.0), 6) + 0.0 AS eta_squared",
)


@query(
    "q_anova_oneway",
    oracle=f"""
    WITH g AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_g,
               SUM({_CENTS}) AS s_g,
               SUM({_CENTS} * {_CENTS}) AS ss_g
        FROM events GROUP BY event_type
    ),
    s AS (
        SELECT COUNT(*) AS k, SUM(n_g) AS n, SUM(s_g) AS s,
               SUM(ss_g) AS ss, SUM({_ANOVA_TERM}) AS bt
        FROM g
    )
    SELECT {", ".join(_ANOVA_FINAL)} FROM s
    """,
)
def q_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA: does mean event value differ across the
    |event_type| groups? F = (SSB/(k−1)) / (SSW/(N−k)) plus the η²
    effect size — the k-group generalization of q_welch_ttest, and the
    standard gate for "does this categorical feature matter".

    Determinism: per-group sufficient statistics are exact integers;
    the one cross-group float term (s_g²/n_g) is rounded to integer
    cents² before the k-row sum (round-before-sum); SST/SSB/F are one
    shared closed-form text.

    Scale: one hash aggregate to |event_type| rows (map-side combine),
    one k-row reduction, one row out.
    """
    ev = load_table(spark, sf_dir, "events")
    g = (
        ev.selectExpr("event_type", f"{_CENTS} AS c")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_g"),
            F.sum(F.col("c").cast("decimal(38,0)")).alias("s_g"),
            F.sum((F.col("c") * F.col("c")).cast("decimal(38,0)")).alias(
                "ss_g"
            ),
        )
    )
    s = g.agg(
        F.count("*").alias("k"),
        F.sum("n_g").alias("n"),
        F.sum("s_g").alias("s"),
        F.sum("ss_g").alias("ss"),
        F.sum(F.expr(_ANOVA_TERM)).alias("bt"),
    )
    return s.selectExpr(*_ANOVA_FINAL)


# ---------------------------------------------------------------------------
# q_burstiness — Fano factor / burstiness of hourly arrivals per type
# ---------------------------------------------------------------------------

_B_MEAN = "(CAST(s AS DOUBLE) / CAST(h AS DOUBLE))"
_B_VAR = (
    "((CAST(ss AS DOUBLE)"
    " - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(h AS DOUBLE))"
    " / CAST(h - 1 AS DOUBLE))"
)
_BURST_FINAL = (
    "event_type",
    "CAST(h AS BIGINT) AS n_hours",
    "CAST(s AS BIGINT) AS n_events",
    f"round({_B_MEAN}, 6) + 0.0 AS mean_per_hour",
    f"round({_B_VAR} / NULLIF({_B_MEAN}, 0.0), 6) + 0.0 AS fano_factor",
    f"round((sqrt({_B_VAR}) - {_B_MEAN})"
    f" / NULLIF(sqrt({_B_VAR}) + {_B_MEAN}, 0.0), 6) + 0.0 AS burstiness",
)


@query(
    "q_burstiness",
    oracle=f"""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hr,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    s AS (
        SELECT event_type, COUNT(*) AS h, SUM(c) AS s, SUM(c * c) AS ss
        FROM hourly GROUP BY event_type
    )
    SELECT {", ".join(_BURST_FINAL)} FROM s
    """,
)
def q_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrival burstiness per event type: the Fano factor (variance /
    mean of hourly counts — 1.0 for a Poisson process, ≫1 for bursty
    traffic) and the Goh–Barabási burstiness index (σ−μ)/(σ+μ) ∈
    (−1, 1). The capacity-planning / anomaly-baseline readout: an
    event stream whose Fano factor drifts up is clumping.

    Hours with zero events are absent from both engines' histograms
    (observed-hours convention), so the statistics condition on
    activity — documented, and identical cross-engine.

    Determinism: hourly counts are exact integers; per-type
    (h, Σc, Σc²) are exact integer sums; the readout is one shared
    text. Scale: two stacked hash aggregates (events →
    |type|×|hours| cells → |type| rows), map-side combine on both.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.select("event_type", F.date_trunc("hour", "ts").alias("hr"))
        .groupBy("event_type", "hr")
        .agg(F.count("*").cast("long").alias("c"))
    )
    s = hourly.groupBy("event_type").agg(
        F.count("*").alias("h"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
    )
    return s.selectExpr(*_BURST_FINAL)

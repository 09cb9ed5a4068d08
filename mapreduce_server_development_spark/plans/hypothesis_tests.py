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
from .money import _rev
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


# ---------------------------------------------------------------------------
# q_hhi_concentration — Herfindahl–Hirschman supplier concentration
# ---------------------------------------------------------------------------

#: Supplier revenue in exact e4 fixed-point units: the decimal-exact
#: TPC-H revenue sum (money.py idiom) scaled to an integer. Both
#: engines compute the identical DECIMAL value, so the integer is the
#: same by construction — no float rounding anywhere.
_HHI_FINAL = (
    "n_name",
    "CAST(k AS BIGINT) AS n_suppliers",
    "round(CAST(r AS DOUBLE) / 10000.0, 2) + 0.0 AS revenue",
    "round(CAST(rr AS DOUBLE)"
    " / NULLIF(CAST(r AS DOUBLE) * CAST(r AS DOUBLE), 0.0), 6) + 0.0 AS hhi",
    "round(NULLIF(CAST(r AS DOUBLE) * CAST(r AS DOUBLE), 0.0)"
    " / CAST(rr AS DOUBLE), 6) + 0.0 AS effective_suppliers",
)


@query(
    "q_hhi_concentration",
    oracle=f"""
    WITH sup_rev AS (
        SELECT s_nationkey, l_suppkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,4))
                        * (CAST(1 AS DECIMAL(8,4))
                           - CAST(l_discount AS DECIMAL(8,4)))) * 10000
                    AS HUGEINT) AS r_e4
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_nationkey, l_suppkey
    ),
    per_nation AS (
        SELECT s_nationkey, COUNT(*) AS k, SUM(r_e4) AS r,
               SUM(r_e4 * r_e4) AS rr
        FROM sup_rev GROUP BY s_nationkey
    )
    SELECT {", ".join(_HHI_FINAL)}
    FROM per_nation JOIN nation ON s_nationkey = n_nationkey
    """,
)
def q_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman index of supplier revenue concentration
    per nation: HHI = Σ shareᵢ² (1/k for perfectly even markets, →1
    for a monopoly) plus its reciprocal, the "effective number of
    suppliers" — the procurement-risk readout that generalizes
    q_single_source_risk from top-1 to the whole distribution.

    Determinism: supplier revenue is the decimal-exact money idiom
    scaled to e4 integers (identical in both engines by construction);
    Σr and Σr² are exact DECIMAL(38,0)/HUGEINT sums; HHI is one shared
    closed-form text. Σr² fits DECIMAL(38,0) beyond 10¹⁹ revenue
    units per supplier — far past 100 TB.

    Scale: lineitem → per-supplier hash aggregate (suppkey key, no
    skew), per-nation rollup (|nation| rows), broadcast nation-name
    join. No windows, no data-scale joins besides the suppkey
    equi-join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    sup_rev = (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg((F.sum(_rev()) * 10000).cast("decimal(38,0)").alias("r_e4"))
    )
    per_nation = sup_rev.groupBy("s_nationkey").agg(
        F.count("*").alias("k"),
        F.sum("r_e4").alias("r"),
        F.sum(F.col("r_e4") * F.col("r_e4")).alias("rr"),
    )
    return per_nation.join(
        F.broadcast(nat), per_nation.s_nationkey == nat.n_nationkey
    ).selectExpr(*_HHI_FINAL)


# ---------------------------------------------------------------------------
# q_lorenz_deciles — decile revenue shares (Lorenz curve points)
# ---------------------------------------------------------------------------

_LORENZ_FINAL = (
    "CAST(decile AS BIGINT) AS decile",
    "CAST(nc AS BIGINT) AS n_customers",
    "round(CAST(rev AS DOUBLE) / 100.0, 2) + 0.0 AS revenue",
    "round(100.0 * CAST(rev AS DOUBLE) / CAST(tot AS DOUBLE), 6) + 0.0"
    " AS share_pct",
    "round(100.0 * CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE), 6) + 0.0"
    " AS cum_share_pct",
)


@query(
    "q_lorenz_deciles",
    oracle=f"""
    WITH cust_rev AS (
        SELECT o_custkey,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS HUGEINT)
                   AS rev_c
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT rev_c,
               ROW_NUMBER() OVER (ORDER BY rev_c, o_custkey) AS rn,
               COUNT(*) OVER () AS n
        FROM cust_rev
    ),
    d AS (
        SELECT 1 + ((rn - 1) * 10) // n AS decile,
               COUNT(*) AS nc, SUM(rev_c) AS rev
        FROM ranked GROUP BY 1
    ),
    c AS (
        SELECT d.decile, d.nc, d.rev,
               SUM(d2.rev) AS cum, (SELECT SUM(rev) FROM d) AS tot
        FROM d JOIN d d2 ON d2.decile <= d.decile
        GROUP BY d.decile, d.nc, d.rev
    )
    SELECT {", ".join(_LORENZ_FINAL)} FROM c
    """,
)
def q_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz-curve decile table of customer revenue: rank customers
    by lifetime spend, split into 10 equal-count bins, report each
    bin's revenue share and the cumulative share — the
    inequality-readout behind q_gini, materialized as the 10 curve
    points an analyst actually plots ("the top decile holds X%").

    Scale: the global rank uses functions/prefix.py's two-phase
    range-partitioned row_number (NO single-task global-sort window —
    the q_rfm_segments defect class); deciles come from integer
    arithmetic on (rn, N); the 10-row cumulative is a broadcast
    triangular self-join, not a window. Ties on revenue are broken by
    o_custkey, so the numbering (hence binning) is fully
    deterministic in both engines.
    """
    from ..functions.prefix import global_row_number

    orders = load_table(spark, sf_dir, "orders")
    cust_rev = orders.groupBy("o_custkey").agg(
        F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
        .cast("decimal(38,0)")
        .alias("rev_c")
    )
    ranked = global_row_number(
        cust_rev, [F.col("rev_c"), F.col("o_custkey")], out_col="rn"
    )
    n_tot = ranked.agg(F.count("*").alias("n"))
    d = (
        ranked.crossJoin(F.broadcast(n_tot))
        .selectExpr("1 + ((rn - 1) * 10) DIV n AS decile", "rev_c")
        .groupBy("decile")
        .agg(F.count("*").alias("nc"), F.sum("rev_c").alias("rev"))
    )
    d2 = d.selectExpr("decile AS decile2", "rev AS rev2")
    tot = d.agg(F.sum("rev").alias("tot"))
    c = (
        d.join(F.broadcast(d2), F.col("decile2") <= F.col("decile"))
        .groupBy("decile", "nc", "rev")
        .agg(F.sum("rev2").alias("cum"))
        .crossJoin(F.broadcast(tot))
    )
    return c.selectExpr(*_LORENZ_FINAL)


# ---------------------------------------------------------------------------
# q_spearman_corr — Spearman rank correlation over tie-heavy keys
# ---------------------------------------------------------------------------

#: Pearson over the 2×-scaled integer average ranks (the 2× keeps
#: midranks integral: r̄·2 = 2·|{u<v}| + count(v) + 1). Scale factors
#: cancel in the correlation.
_SPEAR_FINAL = (
    "CAST(n AS BIGINT) AS n_rows",
    "round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / NULLIF(sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    " * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
    " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 0.0), 6) + 0.0"
    " AS spearman_rho",
)

_Q_INT = "CAST(round(l_quantity) AS INT)"
_D_INT = "CAST(round(l_discount * 100) AS INT)"


@query(
    "q_spearman_corr",
    oracle=f"""
    WITH li AS (
        SELECT {_Q_INT} AS q, {_D_INT} AS d FROM lineitem
    ),
    qc AS (SELECT q AS v, COUNT(*) AS cnt FROM li GROUP BY q),
    qr AS (
        SELECT a.v, 2 * COALESCE(SUM(b.cnt), 0) + a.cnt + 1 AS r2
        FROM qc a LEFT JOIN qc b ON b.v < a.v GROUP BY a.v, a.cnt
    ),
    dc AS (SELECT d AS v, COUNT(*) AS cnt FROM li GROUP BY d),
    dr AS (
        SELECT a.v, 2 * COALESCE(SUM(b.cnt), 0) + a.cnt + 1 AS r2
        FROM dc a LEFT JOIN dc b ON b.v < a.v GROUP BY a.v, a.cnt
    ),
    s AS (
        SELECT COUNT(*) AS n,
               SUM(CAST(qr.r2 AS HUGEINT)) AS sx,
               SUM(CAST(dr.r2 AS HUGEINT)) AS sy,
               SUM(CAST(qr.r2 AS HUGEINT) * dr.r2) AS sxy,
               SUM(CAST(qr.r2 AS HUGEINT) * qr.r2) AS sxx,
               SUM(CAST(dr.r2 AS HUGEINT) * dr.r2) AS syy
        FROM li JOIN qr ON li.q = qr.v JOIN dr ON li.d = dr.v
    )
    SELECT {", ".join(_SPEAR_FINAL)} FROM s
    """,
)
def q_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between l_quantity and l_discount —
    the monotone-association companion to q_feature_corr's Pearson
    matrix (robust to the nonlinearity a raw Pearson misses), with
    textbook midrank tie handling (both keys are massively tied: 50
    and 11 distinct values).

    The rank maps are computed at VALUE level: per-value counts (a
    |domain|-row aggregate), midranks via a broadcast triangular
    self-join over that tiny relation — never a data-scale sort. Rows
    then pick up their integer 2×midranks through two broadcast joins,
    and Spearman ρ is Pearson over exact DECIMAL(38,0)/HUGEINT sums of
    those ranks (fits past 10¹² rows), one shared formula text.

    Scale: one |domain|-sized aggregate per key + two broadcast map
    joins + one six-counter reduction — no shuffle wider than the
    per-value counts.
    """
    li = load_table(spark, sf_dir, "lineitem").selectExpr(
        f"{_Q_INT} AS q", f"{_D_INT} AS d"
    )

    def rank_map(col: str) -> DataFrame:
        cnts = li.groupBy(F.col(col).alias("v")).agg(
            F.count("*").alias("cnt")
        )
        b = cnts.selectExpr("v AS v2", "cnt AS cnt2")
        return (
            cnts.join(F.broadcast(b), F.col("v2") < F.col("v"), "left")
            .groupBy("v", "cnt")
            .agg(
                (
                    2 * F.coalesce(F.sum("cnt2"), F.lit(0))
                    + F.col("cnt")
                    + 1
                ).alias("r2")
            )
            .select("v", "r2")
        )

    qr = rank_map("q").selectExpr("v AS qv", "r2 AS xr")
    dr = rank_map("d").selectExpr("v AS dv", "r2 AS yr")
    j = li.join(F.broadcast(qr), li.q == F.col("qv")).join(
        F.broadcast(dr), li.d == F.col("dv")
    )
    x = F.col("xr").cast("decimal(38,0)")
    y = F.col("yr").cast("decimal(38,0)")
    s = j.agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * F.col("yr")).alias("sxy"),
        F.sum(x * F.col("xr")).alias("sxx"),
        F.sum(y * F.col("yr")).alias("syy"),
    )
    return s.selectExpr(*_SPEAR_FINAL)


# ---------------------------------------------------------------------------
# q_mann_whitney — Mann–Whitney U rank-sum test (tie-corrected)
# ---------------------------------------------------------------------------

#: Readout over exact integers (na, nb, u2 = 2·U_a, t = Σ(t³−t)).
_MW_N = "(CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))"
_MW_SIG = (
    f"sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0"
    f" * (({_MW_N} + 1.0)"
    f" - CAST(t AS DOUBLE) / ({_MW_N} * ({_MW_N} - 1.0))))"
)
_MW_FINAL = (
    "CAST(na AS BIGINT) AS n_a",
    "CAST(nb AS BIGINT) AS n_b",
    "round(CAST(u2 AS DOUBLE) / 2.0, 2) + 0.0 AS u_stat",
    f"round((CAST(u2 AS DOUBLE) / 2.0"
    f" - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 2.0)"
    f" / NULLIF({_MW_SIG}, 0.0), 6) + 0.0 AS z_score",
)


@query(
    "q_mann_whitney",
    oracle=f"""
    WITH p AS (
        SELECT user_id % 2 AS variant, {_CENTS} AS c
        FROM events WHERE event_type = 'purchase'
    ),
    vc AS (
        SELECT c,
               CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS cnt_a,
               CAST(COUNT(*) AS BIGINT) AS n_v
        FROM p GROUP BY c
    ),
    cum AS (
        SELECT c, cnt_a, n_v,
               SUM(n_v) OVER (ORDER BY c) AS cum
        FROM vc
    ),
    s AS (
        SELECT SUM(cnt_a) AS na, SUM(n_v - cnt_a) AS nb,
               SUM(CAST(cnt_a AS HUGEINT) * (2 * cum - n_v + 1)) AS r2a,
               SUM(CAST(n_v AS HUGEINT) * n_v * n_v - n_v) AS t
        FROM cum
    ),
    u AS (
        SELECT na, nb, t,
               r2a - CAST(na AS HUGEINT) * (na + 1) AS u2
        FROM s
    )
    SELECT {", ".join(_MW_FINAL)} FROM u
    """,
)
def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U rank-sum test on purchase values between the
    user_id-parity A/B variants — the nonparametric twin of
    q_welch_ttest (no normality assumption; the robust default when
    revenue distributions are heavy-tailed), with the textbook tie
    correction Σ(t³−t) in the variance.

    Ranks never touch a data-scale sort: values collapse to a
    per-cents-value histogram (domain-bounded relation), the
    cumulative count comes from functions/prefix.py's two-phase
    distributed running sum over that histogram, and integral
    2×midranks (2·cum − t_v + 1) keep everything in exact
    DECIMAL(38,0)/HUGEINT arithmetic. U, the tie term, and the normal
    approximation z are one shared closed-form text.

    Scale: one data-scale hash aggregate (map-side combine to the
    value domain), the bounded prefix scan, a four-counter reduction.
    """
    from ..functions.prefix import global_running_sum

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").selectExpr(
        "user_id % 2 AS variant", f"{_CENTS} AS c"
    )
    vc = p.groupBy("c").agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .cast("long")
        .alias("cnt_a"),
        F.count("*").cast("long").alias("n_v"),
    )
    cum = global_running_sum(vc, "c", "n_v", out_col="cum")
    s = cum.agg(
        F.sum("cnt_a").cast("decimal(38,0)").alias("na"),
        F.sum(F.col("n_v") - F.col("cnt_a")).cast("decimal(38,0)").alias("nb"),
        F.sum(
            F.col("cnt_a").cast("decimal(38,0)")
            * (2 * F.col("cum") - F.col("n_v") + 1)
        ).alias("r2a"),
        F.sum(
            F.col("n_v").cast("decimal(38,0)") * F.col("n_v") * F.col("n_v")
            - F.col("n_v")
        ).alias("t"),
    )
    u = s.selectExpr(
        "na", "nb", "t", "r2a - na * (na + 1) AS u2"
    )
    return u.selectExpr(*_MW_FINAL)


# ---------------------------------------------------------------------------
# q_kendall_tau — Kendall τ-b from the joint contingency table
# ---------------------------------------------------------------------------

_KT_N0 = "(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) / 2.0)"
_KT_FINAL = (
    "CAST(n AS BIGINT) AS n_rows",
    f"round((CAST(conc AS DOUBLE) - CAST(disc AS DOUBLE))"
    f" / NULLIF(sqrt(({_KT_N0} - CAST(tq AS DOUBLE) / 2.0)"
    f" * ({_KT_N0} - CAST(td AS DOUBLE) / 2.0)), 0.0), 6) + 0.0"
    " AS kendall_tau_b",
)


@query(
    "q_kendall_tau",
    oracle=f"""
    WITH li AS (
        SELECT {_Q_INT} AS q, {_D_INT} AS d FROM lineitem
    ),
    cells AS (
        SELECT q, d, CAST(COUNT(*) AS BIGINT) AS m FROM li GROUP BY q, d
    ),
    pairs AS (
        SELECT
            SUM(CASE WHEN a.d < b.d THEN CAST(a.m AS HUGEINT) * b.m
                     ELSE 0 END) AS conc,
            SUM(CASE WHEN a.d > b.d THEN CAST(a.m AS HUGEINT) * b.m
                     ELSE 0 END) AS disc
        FROM cells a JOIN cells b ON a.q < b.q
    ),
    ties AS (
        SELECT SUM(m) AS n,
               (SELECT SUM(CAST(tm AS HUGEINT) * tm - tm)
                FROM (SELECT SUM(m) AS tm FROM cells GROUP BY q)) AS tq,
               (SELECT SUM(CAST(tm AS HUGEINT) * tm - tm)
                FROM (SELECT SUM(m) AS tm FROM cells GROUP BY d)) AS td
        FROM cells
    )
    SELECT {", ".join(_KT_FINAL)} FROM pairs, ties
    """,
)
def q_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall τ-b between l_quantity and l_discount — the
    concordance-based rank correlation (completing the set with
    q_feature_corr's Pearson and q_spearman_corr), with the τ-b tie
    normalization both keys need.

    The naive algorithm is O(n²) over rows; over a BOUNDED domain the
    joint contingency table is |q-domain| × |d-domain| cells (≤550
    here), and concordant/discordant pair counts are exact sums of
    mᵢ·mⱼ over cell pairs — a broadcast self-join on the tiny cell
    relation, never a row-level pairing. All counts are exact
    DECIMAL(38,0)/HUGEINT (mᵢ·mⱼ sums fit beyond 10¹² rows); τ-b is
    one shared text.

    Scale: one data-scale hash aggregate to the cell table, a ≤550²/2
    broadcast nested-loop pair scan, two domain-sized tie rollups.
    """
    li = load_table(spark, sf_dir, "lineitem").selectExpr(
        f"{_Q_INT} AS q", f"{_D_INT} AS d"
    )
    cells = li.groupBy("q", "d").agg(F.count("*").cast("long").alias("m"))
    b = cells.selectExpr("q AS q2", "d AS d2", "m AS m2")
    am = F.col("m").cast("decimal(38,0)")
    pairs = (
        cells.join(F.broadcast(b), F.col("q") < F.col("q2"))
        .agg(
            F.sum(
                F.when(F.col("d") < F.col("d2"), am * F.col("m2")).otherwise(0)
            ).alias("conc"),
            F.sum(
                F.when(F.col("d") > F.col("d2"), am * F.col("m2")).otherwise(0)
            ).alias("disc"),
        )
    )
    tq = (
        cells.groupBy("q")
        .agg(F.sum("m").cast("decimal(38,0)").alias("tm"))
        .agg(F.sum(F.col("tm") * F.col("tm") - F.col("tm")).alias("tq"))
    )
    td = (
        cells.groupBy("d")
        .agg(F.sum("m").cast("decimal(38,0)").alias("tm"))
        .agg(F.sum(F.col("tm") * F.col("tm") - F.col("tm")).alias("td"))
    )
    n = cells.agg(F.sum("m").cast("decimal(38,0)").alias("n"))
    out = (
        pairs.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(tq))
        .crossJoin(F.broadcast(td))
    )
    return out.selectExpr(*_KT_FINAL)


# ---------------------------------------------------------------------------
# q_cramers_v — Cramér's V association between order categoricals
# ---------------------------------------------------------------------------

#: Per-cell chi² term (O − E)²/E with E = r·c/n, evaluated in doubles
#: from exact integers and rounded to e6 units BEFORE the 15-cell sum.
_CV_E = "(CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE))"
_CV_TERM = (
    f"CAST(round((CAST(o AS DOUBLE) - {_CV_E}) * (CAST(o AS DOUBLE) - {_CV_E})"
    f" / {_CV_E} * 1000000) AS BIGINT)"
)

_CV_FINAL = (
    "CAST(n AS BIGINT) AS n_rows",
    "CAST((nr - 1) * (nc - 1) AS BIGINT) AS df",
    "round(CAST(chi_e6 AS DOUBLE) / 1000000.0, 4) + 0.0 AS chi_square",
    "round(sqrt(CAST(chi_e6 AS DOUBLE) / 1000000.0 / (CAST(n AS DOUBLE)"
    " * (CASE WHEN nr < nc THEN nr ELSE nc END - 1.0))), 6) + 0.0"
    " AS cramers_v",
)


@query(
    "q_cramers_v",
    oracle=f"""
    WITH obs AS (
        SELECT o_orderpriority AS pr, o_orderstatus AS st,
               CAST(COUNT(*) AS BIGINT) AS o
        FROM orders GROUP BY 1, 2
    ),
    rm AS (SELECT pr, SUM(o) AS r FROM obs GROUP BY pr),
    cm AS (SELECT st, SUM(o) AS c FROM obs GROUP BY st),
    tot AS (SELECT SUM(o) AS n, COUNT(DISTINCT pr) AS nr,
                   COUNT(DISTINCT st) AS nc
            FROM obs),
    cells AS (
        SELECT rm.pr, cm.st, rm.r, cm.c, tot.n, tot.nr, tot.nc,
               COALESCE(obs.o, 0) AS o
        FROM rm CROSS JOIN cm CROSS JOIN tot
        LEFT JOIN obs ON obs.pr = rm.pr AND obs.st = cm.st
    ),
    s AS (
        SELECT MAX(n) AS n, MAX(nr) AS nr, MAX(nc) AS nc,
               SUM({_CV_TERM}) AS chi_e6
        FROM cells
    )
    SELECT {", ".join(_CV_FINAL)} FROM s
    """,
)
def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V association between order priority and order status
    — the normalized [0,1] strength readout on top of a chi²
    independence test (q_chi_square's feature-pair sibling on the
    orders categoricals), including structurally-zero cells in the
    expected-count grid as the textbook test requires.

    Determinism: observed/marginal counts are exact integers; each
    cell's (O−E)²/E is one shared text rounded to e6 before the
    |priority|×|status| (=15) cell sum.

    Scale: one orders-scale hash aggregate to the contingency cells;
    margins, the full grid (broadcast cross of two tiny margins), and
    the rollup are all cell-sized.
    """
    orders = load_table(spark, sf_dir, "orders")
    obs = orders.groupBy(
        F.col("o_orderpriority").alias("pr"),
        F.col("o_orderstatus").alias("st"),
    ).agg(F.count("*").cast("long").alias("o"))
    rm = obs.groupBy("pr").agg(F.sum("o").alias("r"))
    cm = obs.groupBy("st").agg(F.sum("o").alias("c"))
    tot = obs.agg(
        F.sum("o").alias("n"),
        F.countDistinct("pr").alias("nr"),
        F.countDistinct("st").alias("nc"),
    )
    cells = (
        rm.crossJoin(F.broadcast(cm))
        .crossJoin(F.broadcast(tot))
        .join(F.broadcast(obs), ["pr", "st"], "left")
        .withColumn("o", F.coalesce(F.col("o"), F.lit(0)))
    )
    s = cells.agg(
        F.max("n").alias("n"),
        F.max("nr").alias("nr"),
        F.max("nc").alias("nc"),
        F.sum(F.expr(_CV_TERM)).alias("chi_e6"),
    )
    return s.selectExpr(*_CV_FINAL)


# ---------------------------------------------------------------------------
# q_cuped — CUPED variance-reduced A/B effect estimate
# ---------------------------------------------------------------------------

#: Pre-period length: purchases inside the user's first 48 hours form
#: the covariate X; everything after is the experiment metric Y.
_CUPED_SPLIT_H = 48

_CU_TH_NUM = (
    "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
)
_CU_TH_DEN = (
    "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
)
_CU_THETA = f"({_CU_TH_NUM} / NULLIF({_CU_TH_DEN}, 0.0))"
_CU_DIFF_RAW = (
    "(CAST(sya AS DOUBLE) / CAST(na AS DOUBLE)"
    " - CAST(syb AS DOUBLE) / CAST(nb AS DOUBLE))"
)
_CU_DIFF_X = (
    "(CAST(sxa AS DOUBLE) / CAST(na AS DOUBLE)"
    " - CAST(sxb AS DOUBLE) / CAST(nb AS DOUBLE))"
)
_CUPED_FINAL = (
    "CAST(na AS BIGINT) AS n_a",
    "CAST(nb AS BIGINT) AS n_b",
    f"round({_CU_THETA}, 6) + 0.0 AS theta",
    f"round({_CU_DIFF_RAW} / 100.0, 6) + 0.0 AS diff_raw",
    f"round(({_CU_DIFF_RAW} - {_CU_THETA} * {_CU_DIFF_X}) / 100.0, 6)"
    " + 0.0 AS diff_cuped",
    f"round(100.0 * {_CU_TH_NUM} * {_CU_TH_NUM}"
    f" / NULLIF({_CU_TH_DEN} * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
    " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 0.0), 6) + 0.0"
    " AS var_reduction_pct",
)


@query(
    "q_cuped",
    oracle=f"""
    WITH f AS (SELECT user_id, MIN(ts) AS t0 FROM events GROUP BY user_id),
    per_user AS (
        SELECT f.user_id, f.user_id % 2 AS variant,
               SUM(CASE WHEN e.event_type = 'purchase'
                        AND e.ts < f.t0 + INTERVAL {_CUPED_SPLIT_H} HOUR
                        THEN CAST(round(e.value * 100) AS BIGINT)
                        ELSE 0 END) AS x,
               SUM(CASE WHEN e.event_type = 'purchase'
                        AND e.ts >= f.t0 + INTERVAL {_CUPED_SPLIT_H} HOUR
                        THEN CAST(round(e.value * 100) AS BIGINT)
                        ELSE 0 END) AS y
        FROM events e JOIN f USING (user_id)
        GROUP BY f.user_id
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS na,
               CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS nb,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(CAST(x AS HUGEINT) * y) AS sxy,
               SUM(CAST(x AS HUGEINT) * x) AS sxx,
               SUM(CAST(y AS HUGEINT) * y) AS syy,
               SUM(CASE WHEN variant = 0 THEN x ELSE 0 END) AS sxa,
               SUM(CASE WHEN variant = 1 THEN x ELSE 0 END) AS sxb,
               SUM(CASE WHEN variant = 0 THEN y ELSE 0 END) AS sya,
               SUM(CASE WHEN variant = 1 THEN y ELSE 0 END) AS syb
        FROM per_user
    )
    SELECT {", ".join(_CUPED_FINAL)} FROM s
    """,
)
def q_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced experiment readout (Deng et al.,
    WSDM'13): each user's first-48-hour purchase spend is the
    pre-experiment covariate X, later spend is the metric Y; the
    adjusted effect diff_cuped = Δȳ − θ·Δx̄ with θ = cov(X,Y)/var(X)
    removes the between-user variance X explains (reported as
    var_reduction_pct = corr²·100) — the industry-standard sharpening
    of q_welch_ttest's raw difference.

    Determinism: per-user (x, y) are exact integer cents; all moment
    sums are exact DECIMAL(38,0)/HUGEINT; θ and every readout share
    one closed-form text.

    Scale: one user-keyed join + hash aggregate (the q_ab_test
    shape), then a 12-counter rollup; one row out.
    """
    ev = load_table(spark, sf_dir, "events")
    f0 = ev.groupBy("user_id").agg(F.min("ts").alias("t0"))
    split = F.col("t0") + F.expr(f"interval {_CUPED_SPLIT_H} hour")
    cents = F.expr("CAST(round(value * 100) AS BIGINT)")
    is_p = F.col("event_type") == "purchase"
    per_user = (
        ev.join(f0, "user_id")
        .groupBy("user_id")
        .agg(
            F.sum(F.when(is_p & (F.col("ts") < split), cents).otherwise(0))
            .cast("long")
            .alias("x"),
            F.sum(F.when(is_p & (F.col("ts") >= split), cents).otherwise(0))
            .cast("long")
            .alias("y"),
        )
        .selectExpr("user_id % 2 AS variant", "x", "y")
    )
    xd = F.col("x").cast("decimal(38,0)")
    yd = F.col("y").cast("decimal(38,0)")
    s = per_user.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .cast("long")
        .alias("na"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
        .cast("long")
        .alias("nb"),
        F.sum(xd).alias("sx"),
        F.sum(yd).alias("sy"),
        F.sum(xd * F.col("y")).alias("sxy"),
        F.sum(xd * F.col("x")).alias("sxx"),
        F.sum(yd * F.col("y")).alias("syy"),
        F.sum(F.when(F.col("variant") == 0, xd).otherwise(0)).alias("sxa"),
        F.sum(F.when(F.col("variant") == 1, xd).otherwise(0)).alias("sxb"),
        F.sum(F.when(F.col("variant") == 0, yd).otherwise(0)).alias("sya"),
        F.sum(F.when(F.col("variant") == 1, yd).otherwise(0)).alias("syb"),
    )
    return s.selectExpr(*_CUPED_FINAL)


# ---------------------------------------------------------------------------
# q_poisson_rate_test — two-sample arrival-rate (per-user) z-test
# ---------------------------------------------------------------------------

_PR_RA = "(CAST(ca AS DOUBLE) / CAST(ua AS DOUBLE))"
_PR_RB = "(CAST(cb AS DOUBLE) / CAST(ub AS DOUBLE))"
_PR_FINAL = (
    "CAST(ua AS BIGINT) AS users_a",
    "CAST(ub AS BIGINT) AS users_b",
    "CAST(ca AS BIGINT) AS purchases_a",
    "CAST(cb AS BIGINT) AS purchases_b",
    f"round({_PR_RA}, 6) + 0.0 AS rate_a",
    f"round({_PR_RB}, 6) + 0.0 AS rate_b",
    f"round(({_PR_RA} - {_PR_RB})"
    f" / NULLIF(sqrt(CAST(ca AS DOUBLE)"
    " / (CAST(ua AS DOUBLE) * CAST(ua AS DOUBLE))"
    " + CAST(cb AS DOUBLE)"
    " / (CAST(ub AS DOUBLE) * CAST(ub AS DOUBLE))), 0.0), 6) + 0.0"
    " AS z_score",
)


@query(
    "q_poisson_rate_test",
    oracle=f"""
    WITH u AS (
        SELECT user_id % 2 AS variant,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS nu
        FROM events GROUP BY user_id % 2
    ),
    c AS (
        SELECT user_id % 2 AS variant, CAST(COUNT(*) AS BIGINT) AS nc
        FROM events WHERE event_type = 'purchase' GROUP BY user_id % 2
    ),
    s AS (
        SELECT MAX(CASE WHEN u.variant = 0 THEN nu END) AS ua,
               MAX(CASE WHEN u.variant = 1 THEN nu END) AS ub,
               MAX(CASE WHEN c.variant = 0 THEN nc END) AS ca,
               MAX(CASE WHEN c.variant = 1 THEN nc END) AS cb
        FROM u JOIN c ON u.variant = c.variant
    )
    SELECT {", ".join(_PR_FINAL)} FROM s
    """,
)
def q_poisson_rate_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Poisson rate test: does the purchase-arrival rate
    per exposed user differ between the A/B variants? Counts are the
    Poisson observations, distinct exposed users the exposure; the
    z statistic uses the variance-of-a-rate normal approximation
    (var(c/T) = c/T² for Poisson counts) — the event-frequency
    companion to q_ab_test (conversion) and q_welch_ttest (value).

    Determinism: all four sufficient statistics are exact integer
    counts; the rate/z readout is one shared text.

    Scale: one distinct-count and one filtered count, both keyed by
    the 2-value variant (map-side partial aggregation collapses each
    task first), then a four-counter pivot; one row out.
    """
    ev = load_table(spark, sf_dir, "events")
    u = ev.selectExpr("user_id % 2 AS variant", "user_id").groupBy(
        "variant"
    ).agg(F.countDistinct("user_id").cast("long").alias("nu"))
    c = (
        ev.filter(F.col("event_type") == "purchase")
        .selectExpr("user_id % 2 AS variant")
        .groupBy("variant")
        .agg(F.count("*").cast("long").alias("nc"))
    )
    s = u.join(c, "variant").agg(
        F.max(F.when(F.col("variant") == 0, F.col("nu"))).alias("ua"),
        F.max(F.when(F.col("variant") == 1, F.col("nu"))).alias("ub"),
        F.max(F.when(F.col("variant") == 0, F.col("nc"))).alias("ca"),
        F.max(F.when(F.col("variant") == 1, F.col("nc"))).alias("cb"),
    )
    return s.selectExpr(*_PR_FINAL)


# ---------------------------------------------------------------------------
# q_price_elasticity — log-log demand elasticity over the bounded grid
# ---------------------------------------------------------------------------

#: e6 fixed-point log cells (shared texts; both engines round the same
#: doubles computed from the same small-integer inputs).
_PE_X = "CAST(round(ln(1.0 - CAST(d AS DOUBLE) / 100.0) * 1000000) AS BIGINT)"
_PE_Y = "CAST(round(ln(CAST(q AS DOUBLE)) * 1000000) AS BIGINT)"

#: Second-order weighted moments, e6-descaled on the PER-CELL term and
#: rounded to integers BEFORE the cross-cell sum (round-before-sum).
#: m·x·y is evaluated in doubles from exact small integers via ONE
#: shared text — identical IEEE product in both engines.
_PE_MXY = (
    "CAST(round(CAST(m AS DOUBLE) * CAST(x AS DOUBLE) * CAST(y AS DOUBLE)"
    " / 1000000.0) AS BIGINT)"
)
_PE_MXX = (
    "CAST(round(CAST(m AS DOUBLE) * CAST(x AS DOUBLE) * CAST(x AS DOUBLE)"
    " / 1000000.0) AS BIGINT)"
)
_PE_MYY = (
    "CAST(round(CAST(m AS DOUBLE) * CAST(y AS DOUBLE) * CAST(y AS DOUBLE)"
    " / 1000000.0) AS BIGINT)"
)

#: Unit discipline: sx/sy are e6-scaled, the second-order sums
#: sxy/sxx/syy are ALSO e6-scaled (their e12 cell products are
#: floor-divided by 1e6), so the n·Σ2nd-order terms must be re-scaled
#: by 1e6 before subtracting the e12 product-of-firsts — otherwise the
#: "slope" silently degenerates to sy/sx (caught by
#: test_price_elasticity_matches_hand_ols).
_PE_BNUM = (
    "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) * 1000000.0"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
)
_PE_BDEN = (
    "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) * 1000000.0"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
)
_PE_FINAL = (
    "CAST(n AS BIGINT) AS n_rows",
    f"round({_PE_BNUM} / NULLIF({_PE_BDEN}, 0.0), 6) + 0.0 AS elasticity",
    f"round((CAST(sy AS DOUBLE) - {_PE_BNUM} / NULLIF({_PE_BDEN}, 0.0)"
    " * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) / 1000000.0, 6) + 0.0"
    " AS intercept_ln_qty",
    f"round({_PE_BNUM} * {_PE_BNUM}"
    f" / NULLIF({_PE_BDEN} * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
    " * 1000000.0"
    " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 0.0), 6) + 0.0"
    " AS r_squared",
)


@query(
    "q_price_elasticity",
    oracle=f"""
    WITH li AS (SELECT {_Q_INT} AS q, {_D_INT} AS d FROM lineitem),
    cells AS (
        SELECT q, d, CAST(COUNT(*) AS BIGINT) AS m FROM li GROUP BY q, d
    ),
    t AS (
        SELECT q, d, m, {_PE_X} AS x, {_PE_Y} AS y FROM cells
    ),
    s AS (
        SELECT SUM(m) AS n,
               SUM(CAST(m AS HUGEINT) * x) AS sx,
               SUM(CAST(m AS HUGEINT) * y) AS sy,
               SUM({_PE_MXY}) AS sxy,
               SUM({_PE_MXX}) AS sxx,
               SUM({_PE_MYY}) AS syy
        FROM t
    )
    SELECT {", ".join(_PE_FINAL)} FROM s
    """,
)
def q_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-log price elasticity of demand: the OLS slope of ln(qty) on
    ln(1 − discount) across lineitems — the econometric readout of how
    strongly discounting moves volume (elasticity < 0 means discounts
    increase quantity), with intercept and R².

    The regression never touches row-scale floats: rows collapse to
    the bounded |quantity|×|discount| grid (≤550 cells), each cell's
    log coordinates are e6-rounded integers from shared texts, and the
    weighted moment sums are exact integers (second-order products
    floor-divided by e6 to stay in DECIMAL(38,0)/HUGEINT range at any
    SF — the same exact integer in both engines, since m·x·y is
    computed exactly first).

    Scale: one data-scale hash aggregate to the grid, a ≤550-row
    moment rollup, one row out.
    """
    li = load_table(spark, sf_dir, "lineitem").selectExpr(
        f"{_Q_INT} AS q", f"{_D_INT} AS d"
    )
    cells = li.groupBy("q", "d").agg(F.count("*").cast("long").alias("m"))
    t = cells.selectExpr("m", f"{_PE_X} AS x", f"{_PE_Y} AS y")
    md = F.col("m").cast("decimal(38,0)")
    s = t.agg(
        F.sum("m").cast("decimal(38,0)").alias("n"),
        F.sum(md * F.col("x")).alias("sx"),
        F.sum(md * F.col("y")).alias("sy"),
        F.sum(F.expr(_PE_MXY)).cast("decimal(38,0)").alias("sxy"),
        F.sum(F.expr(_PE_MXX)).cast("decimal(38,0)").alias("sxx"),
        F.sum(F.expr(_PE_MYY)).cast("decimal(38,0)").alias("syy"),
    )
    return s.selectExpr(*_PE_FINAL)


# ---------------------------------------------------------------------------
# q_bh_discoveries — Benjamini–Hochberg FDR over supplier return rates
# ---------------------------------------------------------------------------

_BH_ALPHA = "0.05"
_BH_MIN_N = 20

#: One-sided upper-tail normal p-value via the Abramowitz–Stegun
#: 26.2.17 polynomial (|error| < 7.5e-8) — pure exp/multiply
#: arithmetic, available identically in both engines. For z < 0 the
#: tail reflects: p = 1 − Q(−z).
_BH_T = "(1.0 / (1.0 + 0.2316419 * abs(z)))"
_BH_Q = (
    f"(exp(-z * z / 2.0) * 0.3989422804014327 * ((((("
    f"1.330274429 * {_BH_T} - 1.821255978) * {_BH_T} + 1.781477937)"
    f" * {_BH_T} - 0.356563782) * {_BH_T} + 0.319381530) * {_BH_T}))"
)
_BH_P = f"(CASE WHEN z >= 0.0 THEN {_BH_Q} ELSE 1.0 - {_BH_Q} END)"

_BH_Z = (
    "((CAST(k AS DOUBLE) / CAST(n AS DOUBLE) - p0)"
    " / sqrt(p0 * (1.0 - p0) / CAST(n AS DOUBLE)))"
)

_BH_FINAL = (
    "CAST(m AS BIGINT) AS m_tests",
    "round(p0, 6) + 0.0 AS pooled_rate",
    "CAST(n_disc AS BIGINT) AS n_discoveries",
    "CAST(n_raw AS BIGINT) AS n_raw_sig",
    "round(max_p, 6) + 0.0 AS max_p_rejected",
)


@query(
    "q_bh_discoveries",
    oracle=f"""
    WITH per_s AS (
        SELECT l_suppkey,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS BIGINT) AS k
        FROM lineitem GROUP BY l_suppkey
        HAVING COUNT(*) >= {_BH_MIN_N}
    ),
    pool AS (
        SELECT CAST(SUM(k) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS p0,
               CAST(COUNT(*) AS BIGINT) AS m
        FROM per_s
    ),
    scored AS (
        SELECT s.l_suppkey, pool.m, pool.p0, {_BH_Z} AS z
        FROM per_s s CROSS JOIN pool
    ),
    pv AS (
        SELECT l_suppkey, m, p0, {_BH_P} AS p FROM scored
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY p, l_suppkey) AS rn FROM pv
    ),
    thr AS (
        SELECT COALESCE(MAX(rn), 0) AS t
        FROM ranked
        WHERE p <= CAST(rn AS DOUBLE) * {_BH_ALPHA} / CAST(m AS DOUBLE)
    ),
    s AS (
        SELECT MAX(r.m) AS m, MAX(r.p0) AS p0,
               SUM(CASE WHEN r.rn <= thr.t THEN 1 ELSE 0 END) AS n_disc,
               SUM(CASE WHEN r.p <= {_BH_ALPHA} THEN 1 ELSE 0 END)
                   AS n_raw,
               COALESCE(MAX(CASE WHEN r.rn <= thr.t THEN r.p END), 0.0)
                   AS max_p
        FROM ranked r CROSS JOIN thr
    )
    SELECT {", ".join(_BH_FINAL)} FROM s
    """,
)
def q_bh_discoveries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini–Hochberg FDR control over one z-test per supplier
    ("is this supplier's return rate elevated vs the pooled rate?") —
    the multiple-testing discipline a platform needs the moment it
    screens thousands of entities at once (raw α=0.05 would flag ~5%
    of clean suppliers; BH bounds the FALSE-DISCOVERY fraction
    instead). Reports tests run, BH discoveries vs naive raw-α flags,
    and the largest rejected p.

    The normal tail probability uses the Abramowitz–Stegun 26.2.17
    polynomial — plain exp/multiply arithmetic in ONE shared text, so
    both engines produce identical p-values from the identical exact
    (n, k) integers. The p-value ranking rides
    ``functions/prefix.py global_row_number`` (range-partitioned
    two-phase rank over the supplier relation, suppkey tie-break) —
    never a single-task global sort; the BH cutoff is a bounded MAX +
    broadcast compare.

    Scale: one lineitem hash aggregate per supplier, the distributed
    rank, two scalar rollups.
    """
    from ..functions.prefix import global_row_number

    li = load_table(spark, sf_dir, "lineitem")
    per_s = (
        li.groupBy("l_suppkey")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("long")
            .alias("k"),
        )
        .filter(F.col("n") >= _BH_MIN_N)
    )
    pool = per_s.agg(
        (
            F.sum("k").cast("double") / F.sum("n").cast("double")
        ).alias("p0"),
        F.count("*").cast("long").alias("m"),
    )
    scored = per_s.crossJoin(F.broadcast(pool)).selectExpr(
        "l_suppkey", "m", "p0", f"{_BH_Z} AS z"
    )
    pv = scored.selectExpr("l_suppkey", "m", "p0", f"{_BH_P} AS p")
    ranked = global_row_number(
        pv, [F.col("p"), F.col("l_suppkey")], out_col="rn"
    )
    thr = ranked.filter(
        F.expr(f"p <= CAST(rn AS DOUBLE) * {_BH_ALPHA} / CAST(m AS DOUBLE)")
    ).agg(F.coalesce(F.max("rn"), F.lit(0)).alias("t"))
    s = ranked.crossJoin(F.broadcast(thr)).agg(
        F.max("m").alias("m"),
        F.max("p0").alias("p0"),
        F.sum(F.when(F.col("rn") <= F.col("t"), 1).otherwise(0)).alias(
            "n_disc"
        ),
        F.sum(
            F.when(F.col("p") <= F.expr(_BH_ALPHA), 1).otherwise(0)
        ).alias("n_raw"),
        F.coalesce(
            F.max(F.when(F.col("rn") <= F.col("t"), F.col("p"))),
            F.lit(0.0),
        ).alias("max_p"),
    )
    return s.selectExpr(*_BH_FINAL)


# ---------------------------------------------------------------------------
# q_hill_tail — Hill heavy-tail index of customer revenue
# ---------------------------------------------------------------------------

_HILL_K = 100

#: Per-order-statistic log-excess ln(x/thr), e6-rounded before the
#: k-row sum (round-before-sum).
_HILL_TERM = (
    "CAST(round(ln(CAST(rev AS DOUBLE) / CAST(thr AS DOUBLE)) * 1000000)"
    " AS BIGINT)"
)

_HILL_FINAL = (
    "CAST(k AS BIGINT) AS k_order_stats",
    "round(CAST(thr AS DOUBLE) / 100.0, 2) + 0.0 AS threshold_revenue",
    "round(CAST(k AS DOUBLE)"
    " / NULLIF(CAST(s_e6 AS DOUBLE) / 1000000.0, 0.0), 6) + 0.0"
    " AS hill_alpha",
)


@query(
    "q_hill_tail",
    oracle=f"""
    WITH cust AS (
        SELECT o_custkey,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS HUGEINT) AS rev
        FROM orders GROUP BY o_custkey
    ),
    top AS (
        SELECT rev, ROW_NUMBER() OVER (ORDER BY rev DESC, o_custkey) AS rn
        FROM cust
        ORDER BY rev DESC, o_custkey LIMIT {_HILL_K + 1}
    ),
    thr AS (SELECT rev AS thr FROM top WHERE rn = {_HILL_K + 1}),
    s AS (
        SELECT COUNT(*) AS k, SUM({_HILL_TERM}) AS s_e6, MAX(t.thr) AS thr
        FROM top CROSS JOIN thr t WHERE rn <= {_HILL_K}
    )
    SELECT {", ".join(_HILL_FINAL)} FROM s
    """,
)
def q_hill_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the heavy-tail index of customer lifetime
    revenue: α̂ = k / Σᵢ ln(xᵢ/x₍ₖ₊₁₎) over the k=100 largest
    customers — the tail-heaviness readout behind every "do whales
    dominate revenue" and skew-handling decision (α < 2 ⇒ infinite
    variance; compare q_pareto_share's share-based view).

    The k+1 order statistics arrive via TakeOrderedAndProject
    (partial per-partition heaps, never a global sort), deterministic
    under the (revenue, custkey) tie-break; per-statistic log
    excesses are e6-rounded integers before the bounded k-row sum.

    Scale: one orders-scale hash aggregate, a k+1 top-k heap, a
    101-row readout.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = orders.groupBy("o_custkey").agg(
        F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
        .cast("decimal(38,0)")
        .alias("rev")
    )
    top = (
        cust.orderBy(F.col("rev").desc(), F.col("o_custkey"))
        .limit(_HILL_K + 1)
        .select("rev")
    )
    # The (k+1)-row relation is driver-bounded; min(rev) of it IS the
    # threshold order statistic under the same tie-broken order.
    thr = top.agg(F.min("rev").alias("thr"))
    s = (
        top.orderBy(F.col("rev").desc())
        .limit(_HILL_K)
        .crossJoin(F.broadcast(thr))
        .agg(
            F.count("*").alias("k"),
            F.sum(F.expr(_HILL_TERM)).alias("s_e6"),
            F.max("thr").alias("thr"),
        )
    )
    return s.selectExpr(*_HILL_FINAL)


# ---------------------------------------------------------------------------
# q_kruskal_wallis — k-group rank test across event types
# ---------------------------------------------------------------------------

#: H statistic with tie correction, from exact integers: r2s = Σ over
#: groups of R_g² computed on 2×midranks (so R_g = r2g/2), t = Σ(t³−t).
_KW_N = "CAST(n AS DOUBLE)"
_KW_H = (
    f"((12.0 / ({_KW_N} * ({_KW_N} + 1.0))) * CAST(r2s AS DOUBLE) / 4.0"
    f" - 3.0 * ({_KW_N} + 1.0))"
)
_KW_CORR = (
    f"(1.0 - CAST(t AS DOUBLE) / ({_KW_N} * {_KW_N} * {_KW_N} - {_KW_N}))"
)
_KW_FINAL = (
    "CAST(k AS BIGINT) AS n_groups",
    "CAST(n AS BIGINT) AS n_rows",
    f"round({_KW_H} / NULLIF({_KW_CORR}, 0.0), 6) + 0.0 AS h_stat",
)


@query(
    "q_kruskal_wallis",
    oracle=f"""
    WITH v AS (
        SELECT event_type AS g, {_CENTS} AS c FROM events
    ),
    vc AS (
        SELECT c, g, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM v GROUP BY c, g
    ),
    tot AS (
        SELECT c, CAST(SUM(cnt) AS BIGINT) AS n_v FROM vc GROUP BY c
    ),
    cum AS (
        SELECT c, n_v, SUM(n_v) OVER (ORDER BY c) AS cum FROM tot
    ),
    rg AS (
        SELECT vc.g,
               CAST(SUM(vc.cnt) AS BIGINT) AS n_g,
               SUM(CAST(vc.cnt AS HUGEINT) * (2 * cum.cum - cum.n_v + 1))
                   AS r2g
        FROM vc JOIN cum ON cum.c = vc.c
        GROUP BY vc.g
    ),
    s AS (
        SELECT COUNT(*) AS k, SUM(n_g) AS n,
               SUM(CAST(round(CAST(r2g AS DOUBLE) * CAST(r2g AS DOUBLE)
                              / CAST(n_g AS DOUBLE)) AS HUGEINT)) AS r2s,
               (SELECT SUM(CAST(n_v AS HUGEINT) * n_v * n_v - n_v)
                FROM tot) AS t
        FROM rg
    )
    SELECT {", ".join(_KW_FINAL)} FROM s
    """,
)
def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal–Wallis H: the k-group nonparametric ANOVA — do the
    |event_type| value distributions differ in location? — with the
    standard tie correction. Completes the rank-test family
    (q_mann_whitney for 2 groups, this for k), sharing its machinery:
    values collapse to the cents-domain histogram, midranks come from
    the two-phase distributed running sum, and 2×midranks keep every
    rank sum an exact integer.

    The one per-group float term (R_g²/n_g) is rounded to integer
    units before the k-row sum (round-before-sum, the q_anova_oneway
    discipline).

    Scale: one (value, group) hash aggregate (domain × k cells), the
    bounded prefix scan, a k-row rollup.
    """
    from ..functions.prefix import global_running_sum

    ev = load_table(spark, sf_dir, "events")
    v = ev.selectExpr("event_type AS g", f"{_CENTS} AS c")
    vc = v.groupBy("c", "g").agg(F.count("*").cast("long").alias("cnt"))
    tot = vc.groupBy("c").agg(F.sum("cnt").cast("long").alias("n_v"))
    cum = global_running_sum(tot, "c", "n_v", out_col="cum")
    rg = (
        vc.join(cum.select("c", "n_v", "cum"), "c")
        .groupBy("g")
        .agg(
            F.sum("cnt").cast("long").alias("n_g"),
            F.sum(
                F.col("cnt").cast("decimal(38,0)")
                * (2 * F.col("cum") - F.col("n_v") + 1)
            ).alias("r2g"),
        )
    )
    t = tot.agg(
        F.sum(
            F.col("n_v").cast("decimal(38,0)") * F.col("n_v") * F.col("n_v")
            - F.col("n_v")
        ).alias("t")
    )
    s = rg.agg(
        F.count("*").alias("k"),
        F.sum("n_g").cast("decimal(38,0)").alias("n"),
        F.sum(
            F.expr(
                "CAST(round(CAST(r2g AS DOUBLE) * CAST(r2g AS DOUBLE)"
                " / CAST(n_g AS DOUBLE)) AS DECIMAL(38,0))"
            )
        ).alias("r2s"),
    ).crossJoin(F.broadcast(t))
    return s.selectExpr(*_KW_FINAL)


# ---------------------------------------------------------------------------
# q_did — difference-in-differences on the pre/post × A/B panel
# ---------------------------------------------------------------------------

_DID_M = {
    f"m_{v}{p}": f"(CAST(s_{v}{p} AS DOUBLE) / CAST(n_{v}{p} AS DOUBLE))"
    for v in "ab"
    for p in ("pre", "post")
}
_DID_VARTERM = {
    f"v_{v}{p}": (
        f"((CAST(ss_{v}{p} AS DOUBLE) - CAST(s_{v}{p} AS DOUBLE)"
        f" * CAST(s_{v}{p} AS DOUBLE) / CAST(n_{v}{p} AS DOUBLE))"
        f" / (CAST(n_{v}{p} AS DOUBLE) - 1.0) / CAST(n_{v}{p} AS DOUBLE))"
    )
    for v in "ab"
    for p in ("pre", "post")
}
_DID_EST = (
    f"(({_DID_M['m_apost']} - {_DID_M['m_apre']})"
    f" - ({_DID_M['m_bpost']} - {_DID_M['m_bpre']}))"
)
_DID_SE = (
    f"sqrt({_DID_VARTERM['v_apost']} + {_DID_VARTERM['v_apre']}"
    f" + {_DID_VARTERM['v_bpost']} + {_DID_VARTERM['v_bpre']})"
)
_DID_FINAL = (
    "CAST(n_apre + n_apost AS BIGINT) AS n_a",
    "CAST(n_bpre + n_bpost AS BIGINT) AS n_b",
    f"round(({_DID_M['m_apost']} - {_DID_M['m_apre']}) / 100.0, 6) + 0.0"
    " AS delta_a",
    f"round(({_DID_M['m_bpost']} - {_DID_M['m_bpre']}) / 100.0, 6) + 0.0"
    " AS delta_b",
    f"round({_DID_EST} / 100.0, 6) + 0.0 AS did_estimate",
    f"round({_DID_EST} / NULLIF({_DID_SE}, 0.0), 6) + 0.0 AS z_score",
)

_DID_SPLIT = "2024-01-16"


def _did_cell_sql(v: str, p: str) -> str:
    cond = (
        f"variant = {0 if v == 'a' else 1} AND "
        + (f"ts < TIMESTAMP '{_DID_SPLIT}'" if p == "pre"
           else f"ts >= TIMESTAMP '{_DID_SPLIT}'")
    )
    return (
        f"CAST(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS n_{v}{p},\n"
        f"SUM(CASE WHEN {cond} THEN c ELSE 0 END) AS s_{v}{p},\n"
        f"SUM(CASE WHEN {cond} THEN c * c ELSE 0 END) AS ss_{v}{p}"
    )


@query(
    "q_did",
    oracle=f"""
    WITH p AS (
        SELECT user_id % 2 AS variant, ts, {_CENTS} AS c
        FROM events WHERE event_type = 'purchase'
    ),
    s AS (
        SELECT {", ".join(_did_cell_sql(v, per) for v in "ab"
                          for per in ("pre", "post"))}
        FROM p
    )
    SELECT {", ".join(_DID_FINAL)} FROM s
    """,
)
def q_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: the causal-inference workhorse for
    when randomization is imperfect — compare each variant's purchase
    value change across a fixed event date (the mid-range split both
    engines share) and difference the changes, so any common time
    trend cancels; z uses the four-cell Welch-style variance.

    Determinism: twelve exact integer sufficient statistics (n, Σc,
    Σc² per pre/post × A/B cell) in one hash aggregate; every readout
    is one shared text.

    Scale: a single fact-scan 12-counter aggregate; one row out.
    """
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").selectExpr(
        "user_id % 2 AS variant", "ts", f"{_CENTS} AS c"
    )
    aggs = []
    for v in "ab":
        for per in ("pre", "post"):
            cond = (F.col("variant") == (0 if v == "a" else 1)) & (
                F.col("ts") < F.expr(f"TIMESTAMP '{_DID_SPLIT}'")
                if per == "pre"
                else F.col("ts") >= F.expr(f"TIMESTAMP '{_DID_SPLIT}'")
            )
            aggs.append(
                F.sum(F.when(cond, 1).otherwise(0))
                .cast("long")
                .alias(f"n_{v}{per}")
            )
            aggs.append(
                F.sum(F.when(cond, F.col("c")).otherwise(0).cast("decimal(38,0)"))
                .alias(f"s_{v}{per}")
            )
            aggs.append(
                F.sum(
                    F.when(cond, F.col("c") * F.col("c"))
                    .otherwise(0)
                    .cast("decimal(38,0)")
                ).alias(f"ss_{v}{per}")
            )
    s = p.agg(*aggs)
    return s.selectExpr(*_DID_FINAL)


# ---------------------------------------------------------------------------
# q_wilcoxon — Wilcoxon signed-rank test on paired pre/post spend
# ---------------------------------------------------------------------------

_WX_SIG = (
    "sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)"
    " * (2.0 * CAST(n AS DOUBLE) + 1.0) / 24.0"
    " - CAST(t AS DOUBLE) / 48.0)"
)
_WX_FINAL = (
    "CAST(n AS BIGINT) AS n_pairs",
    "round(CAST(w2p AS DOUBLE) / 2.0, 2) + 0.0 AS w_plus",
    f"round((CAST(w2p AS DOUBLE) / 2.0"
    f" - CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) / 4.0)"
    f" / NULLIF({_WX_SIG}, 0.0), 6) + 0.0 AS z_score",
)


@query(
    "q_wilcoxon",
    oracle=f"""
    WITH f AS (SELECT user_id, MIN(ts) AS t0 FROM events GROUP BY user_id),
    per_user AS (
        SELECT f.user_id,
               SUM(CASE WHEN e.event_type = 'purchase'
                        AND e.ts >= f.t0 + INTERVAL {_CUPED_SPLIT_H} HOUR
                        THEN {_CENTS} ELSE 0 END)
               - SUM(CASE WHEN e.event_type = 'purchase'
                          AND e.ts < f.t0 + INTERVAL {_CUPED_SPLIT_H} HOUR
                          THEN {_CENTS} ELSE 0 END) AS d
        FROM events e JOIN f USING (user_id)
        GROUP BY f.user_id
    ),
    nz AS (SELECT d FROM per_user WHERE d <> 0),
    vc AS (
        SELECT abs(d) AS a,
               CAST(COUNT(*) AS BIGINT) AS n_v,
               CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_pos
        FROM nz GROUP BY abs(d)
    ),
    cum AS (
        SELECT a, n_v, n_pos, SUM(n_v) OVER (ORDER BY a) AS cum FROM vc
    ),
    s AS (
        SELECT SUM(n_v) AS n,
               SUM(CAST(n_pos AS HUGEINT) * (2 * cum - n_v + 1)) AS w2p,
               SUM(CAST(n_v AS HUGEINT) * n_v * n_v - n_v) AS t
        FROM cum
    )
    SELECT {", ".join(_WX_FINAL)} FROM s
    """,
)
def q_wilcoxon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test: did per-user purchase spend SHIFT
    between each user's first 48 hours and everything after? The
    paired nonparametric member of the family (Mann–Whitney compares
    two groups of different users; this ranks each user against
    themselves), with the zero-difference drop and Σ(t³−t)/48 tie
    term of the textbook normal approximation.

    Same scale machinery as q_mann_whitney: per-user differences are
    exact integer cents from one user-keyed aggregate; |d| collapses
    to a histogram; midranks ride the two-phase distributed running
    sum; 2×W⁺ stays integral; z is one shared text.
    """
    from ..functions.prefix import global_running_sum

    ev = load_table(spark, sf_dir, "events")
    f0 = ev.groupBy("user_id").agg(F.min("ts").alias("t0"))
    split = F.col("t0") + F.expr(f"interval {_CUPED_SPLIT_H} hour")
    cents = F.expr(_CENTS)
    is_p = F.col("event_type") == "purchase"
    per_user = (
        ev.join(f0, "user_id")
        .groupBy("user_id")
        .agg(
            (
                F.sum(
                    F.when(is_p & (F.col("ts") >= split), cents).otherwise(0)
                )
                - F.sum(
                    F.when(is_p & (F.col("ts") < split), cents).otherwise(0)
                )
            ).alias("d")
        )
    )
    nz = per_user.filter(F.col("d") != 0)
    vc = nz.groupBy(F.abs(F.col("d")).alias("a")).agg(
        F.count("*").cast("long").alias("n_v"),
        F.sum(F.when(F.col("d") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_pos"),
    )
    cum = global_running_sum(vc, "a", "n_v", out_col="cum")
    s = cum.agg(
        F.sum("n_v").cast("decimal(38,0)").alias("n"),
        F.sum(
            F.col("n_pos").cast("decimal(38,0)")
            * (2 * F.col("cum") - F.col("n_v") + 1)
        ).alias("w2p"),
        F.sum(
            F.col("n_v").cast("decimal(38,0)") * F.col("n_v") * F.col("n_v")
            - F.col("n_v")
        ).alias("t"),
    )
    return s.selectExpr(*_WX_FINAL)


# ---------------------------------------------------------------------------
# q_srm_check — sample-ratio-mismatch health check for the A/B split
# ---------------------------------------------------------------------------

_SRM_FINAL = (
    "CAST(na AS BIGINT) AS n_a",
    "CAST(nb AS BIGINT) AS n_b",
    "round((CAST(na AS DOUBLE) - e) * (CAST(na AS DOUBLE) - e) / e"
    " + (CAST(nb AS DOUBLE) - e) * (CAST(nb AS DOUBLE) - e) / e, 6)"
    " + 0.0 AS srm_chi2",
    "CAST(CASE WHEN (CAST(na AS DOUBLE) - e) * (CAST(na AS DOUBLE) - e) / e"
    " + (CAST(nb AS DOUBLE) - e) * (CAST(nb AS DOUBLE) - e) / e > 3.841459"
    " THEN 1 ELSE 0 END AS BIGINT) AS srm_flag",
)


@query(
    "q_srm_check",
    oracle=f"""
    WITH u AS (
        SELECT user_id % 2 AS variant,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS nu
        FROM events GROUP BY user_id % 2
    ),
    s AS (
        SELECT MAX(CASE WHEN variant = 0 THEN nu END) AS na,
               MAX(CASE WHEN variant = 1 THEN nu END) AS nb
        FROM u
    ),
    e AS (SELECT na, nb, CAST(na + nb AS DOUBLE) / 2.0 AS e FROM s)
    SELECT {", ".join(_SRM_FINAL)} FROM e
    """,
)
def q_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio mismatch: is the A/B user split actually 50/50?
    The mandatory experiment health gate — a skewed split means the
    assignment mechanism is broken and EVERY downstream readout
    (q_ab_test, q_welch_ttest, q_cuped, q_did) is invalid. χ² against
    the expected half-half allocation; flagged at the 0.05 critical
    value (3.841) — the standard "halt the experiment" alarm.

    Scale: one distinct-count keyed by the 2-value variant, a 2-cell
    χ² in one shared text, one row out.
    """
    ev = load_table(spark, sf_dir, "events")
    u = ev.selectExpr("user_id % 2 AS variant", "user_id").groupBy(
        "variant"
    ).agg(F.countDistinct("user_id").cast("long").alias("nu"))
    s = u.agg(
        F.max(F.when(F.col("variant") == 0, F.col("nu"))).alias("na"),
        F.max(F.when(F.col("variant") == 1, F.col("nu"))).alias("nb"),
    )
    e = s.selectExpr("na", "nb", "CAST(na + nb AS DOUBLE) / 2.0 AS e")
    return e.selectExpr(*_SRM_FINAL)


# ---------------------------------------------------------------------------
# q_mde_power — minimum detectable effect at 80% power
# ---------------------------------------------------------------------------

#: z_{alpha/2}=1.959964 (two-sided 5%), z_beta=0.841621 (80% power) —
#: fixed literals shared by both engines.
_MDE_SD = (
    "sqrt((CAST(ss AS DOUBLE)"
    " - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))"
    " / (CAST(n AS DOUBLE) - 1.0))"
)
_MDE = (
    f"((1.959964 + 0.841621) * {_MDE_SD}"
    " * sqrt(2.0 / (CAST(n AS DOUBLE) / 2.0)))"
)
_MDE_FINAL = (
    "CAST(n AS BIGINT) AS n_users",
    f"round({_MDE_SD} / 100.0, 6) + 0.0 AS metric_sd",
    f"round({_MDE} / 100.0, 6) + 0.0 AS mde_absolute",
    f"round(100.0 * {_MDE}"
    " / NULLIF(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 0.0), 4) + 0.0"
    " AS mde_relative_pct",
)


@query(
    "q_mde_power",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
               SUM(CASE WHEN event_type = 'purchase' THEN {_CENTS}
                        ELSE 0 END) AS m
        FROM events GROUP BY user_id
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(m) AS s,
               SUM(CAST(m AS HUGEINT) * m) AS ss
        FROM per_user
    )
    SELECT {", ".join(_MDE_FINAL)} FROM s
    """,
)
def q_mde_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power analysis for the revenue experiment: from the observed
    per-user spend variance, the minimum detectable effect an equal
    two-arm split of this population can resolve at α=0.05 / 80%
    power — MDE = (z_{{α/2}}+z_β)·σ·√(2/(n/2)) — reported absolute
    (dollars) and relative to the current mean. The planning readout
    that precedes every q_ab_test: "is this experiment even big
    enough to see the effect we care about".

    Determinism: per-user metrics and moment sums are exact integers
    (DECIMAL(38,0)/HUGEINT); the z constants are shared literals; the
    MDE is one closed-form text.

    Scale: one user-keyed aggregate, one 3-counter rollup, one row.
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", F.expr(_CENTS)).otherwise(
                0
            )
        )
        .cast("long")
        .alias("m")
    )
    s = per_user.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("m").cast("decimal(38,0)")).alias("s"),
        F.sum(
            (F.col("m").cast("decimal(38,0)") * F.col("m"))
        ).alias("ss"),
    )
    return s.selectExpr(*_MDE_FINAL)


# ---------------------------------------------------------------------------
# q_logrank — two-group log-rank survival test (time to first purchase)
# ---------------------------------------------------------------------------

#: Per-event-time hypergeometric terms, e9-rounded before the
#: cross-time integer sums (round-before-sum). n1/n2 are at-risk
#: counts, d1/d2 deaths at this time.
_LR_N = "(CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))"
_LR_D = "(CAST(d1 AS DOUBLE) + CAST(d2 AS DOUBLE))"
_LR_OE_E9 = (
    f"CAST(round((CAST(d1 AS DOUBLE) - {_LR_D} * CAST(n1 AS DOUBLE)"
    f" / {_LR_N}) * 1000000000) AS BIGINT)"
)
_LR_V_E9 = (
    f"CAST(round(CASE WHEN {_LR_N} > 1.0 THEN"
    f" {_LR_D} * (CAST(n1 AS DOUBLE) / {_LR_N})"
    f" * (CAST(n2 AS DOUBLE) / {_LR_N})"
    f" * ({_LR_N} - {_LR_D}) / ({_LR_N} - 1.0)"
    f" ELSE 0.0 END * 1000000000) AS BIGINT)"
)
_LR_FINAL = (
    "CAST(deaths_a AS BIGINT) AS conversions_a",
    "CAST(deaths_b AS BIGINT) AS conversions_b",
    "round(CAST(oe AS DOUBLE) / 1000000000.0, 4) + 0.0"
    " AS observed_minus_expected",
    "round(CAST(oe AS DOUBLE) / 1000000000.0"
    " / NULLIF(sqrt(CAST(v AS DOUBLE) / 1000000000.0), 0.0), 6) + 0.0"
    " AS logrank_z",
)


@query(
    "q_logrank",
    oracle=f"""
    WITH f AS (
        SELECT user_id, user_id % 2 AS g, MIN(ts) AS t0, MAX(ts) AS le,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS fp
        FROM events GROUP BY user_id
    ),
    pu AS (
        SELECT g,
               CAST(datediff('second', t0, COALESCE(fp, le)) // 3600
                    AS BIGINT) AS t,
               CASE WHEN fp IS NOT NULL THEN 1 ELSE 0 END AS death
        FROM f
    ),
    hist AS (
        SELECT t,
               CAST(SUM(CASE WHEN g = 0 THEN death ELSE 0 END) AS BIGINT)
                   AS d1,
               CAST(SUM(CASE WHEN g = 1 THEN death ELSE 0 END) AS BIGINT)
                   AS d2,
               CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS a1,
               CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS a2
        FROM pu GROUP BY t
    ),
    tot AS (
        SELECT CAST(SUM(a1) AS BIGINT) AS nt1,
               CAST(SUM(a2) AS BIGINT) AS nt2
        FROM hist
    ),
    cum AS (
        SELECT t, d1, d2,
               SUM(a1) OVER (ORDER BY t) - a1 AS gone1,
               SUM(a2) OVER (ORDER BY t) - a2 AS gone2
        FROM hist
    ),
    risk AS (
        SELECT c.t, c.d1, c.d2,
               tot.nt1 - c.gone1 AS n1, tot.nt2 - c.gone2 AS n2
        FROM cum c CROSS JOIN tot
        WHERE c.d1 + c.d2 > 0
    ),
    s AS (
        SELECT SUM(d1) AS deaths_a, SUM(d2) AS deaths_b,
               SUM({_LR_OE_E9}) AS oe, SUM({_LR_V_E9}) AS v
        FROM risk
    )
    SELECT {", ".join(_LR_FINAL)} FROM s
    """,
)
def q_logrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test: do the A/B variants differ in time-to-first-
    purchase SURVIVAL (hours since each user's first event, censored
    at their last observed event)? The hypothesis-test completion of
    q_kaplan_meier's curves — at every conversion time the observed
    group-A conversions are compared to the hypergeometric
    expectation given the at-risk sets, O−E and its variance summed
    over times, z = (O−E)/√V.

    At-risk counts come from the duration HISTOGRAM: one user-keyed
    aggregate to (group, duration, death), one (duration)-keyed
    histogram, and the exclusive cumulative via the two-phase
    distributed running sum — never a per-user sort. Per-time
    hypergeometric terms are e9-rounded before the cross-time integer
    sums.

    Scale: one fact-scan user aggregate + duration-bounded histogram
    work (≤ observation-window hours).
    """
    from ..functions.prefix import global_running_sum

    ev = load_table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.min("ts").alias("t0"),
        F.max("ts").alias("le"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("fp"),
    )
    pu = f.selectExpr(
        "user_id % 2 AS g",
        "CAST((unix_timestamp(COALESCE(fp, le)) - unix_timestamp(t0))"
        " DIV 3600 AS BIGINT) AS t",
        "CASE WHEN fp IS NOT NULL THEN 1 ELSE 0 END AS death",
    )
    hist = pu.groupBy("t").agg(
        F.sum(F.when(F.col("g") == 0, F.col("death")).otherwise(0))
        .cast("long")
        .alias("d1"),
        F.sum(F.when(F.col("g") == 1, F.col("death")).otherwise(0))
        .cast("long")
        .alias("d2"),
        F.sum(F.when(F.col("g") == 0, 1).otherwise(0))
        .cast("long")
        .alias("a1"),
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0))
        .cast("long")
        .alias("a2"),
    )
    tot = hist.agg(
        F.sum("a1").cast("long").alias("nt1"),
        F.sum("a2").cast("long").alias("nt2"),
    )
    cum1 = global_running_sum(hist, "t", "a1", out_col="cum1")
    cum = global_running_sum(cum1, "t", "a2", out_col="cum2")
    risk = (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.col("d1") + F.col("d2") > 0)
        .selectExpr(
            "t",
            "d1",
            "d2",
            "nt1 - (cum1 - a1) AS n1",
            "nt2 - (cum2 - a2) AS n2",
        )
    )
    s = risk.agg(
        F.sum("d1").cast("long").alias("deaths_a"),
        F.sum("d2").cast("long").alias("deaths_b"),
        F.sum(F.expr(_LR_OE_E9)).alias("oe"),
        F.sum(F.expr(_LR_V_E9)).alias("v"),
    )
    return s.selectExpr(*_LR_FINAL)

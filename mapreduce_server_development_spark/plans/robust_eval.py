"""Robust-statistics & evaluation wave: RANSAC trend, histogram-based
outlier scores, split-conformal forecast intervals, a deterministic
randomization test, Fisher's exact test, rank-1 implicit ALS, and an
interpolated Kneser–Ney bigram LM.

No reference counterpart (the reference engine's surface is the
executable map/reduce plane over text lines, SURVEY.md §1.2); every
operator here is public-knowledge statistics / ML:

- **RANSAC** (Fischler & Bolles 1981): fit a line by consensus —
  candidate models from point pairs, keep the one with the most
  inliers, refit on its inlier set. The high-breakdown companion to
  ``q_theil_sen`` (median-of-slopes) and ``q_ols_regression``.
- **HBOS** (Goldstein & Dengel 2012): histogram-based outlier score,
  the score is the sum of per-feature negative log bin densities —
  the density-based sibling of ``q_iqr_outliers`` / ``q_mad_outliers``
  / ``q_mahalanobis_outliers``.
- **Split-conformal prediction** (Vovk et al. 2005; Lei et al. 2018):
  distribution-free forecast intervals — the (1-alpha) quantile of
  calibration residuals is the interval half-width, with finite-sample
  coverage >= 1-alpha by exchangeability. Audited here against the
  lag-14 seasonal-naive forecaster with an out-of-sample holdout.
- **Randomization test** (Fisher 1935; Dwass 1957 Monte-Carlo form):
  re-draw group labels under the null and compare the observed mean
  difference against the replicate distribution. Deterministic
  counter-mode md5 replicates — the ``q_bootstrap_ci`` discipline.
- **Fisher's exact test** (Fisher 1934): exact hypergeometric tail of
  a 2x2 table, via integer-quantized log-factorials (exact table for
  k<=20, Stirling series beyond — error < 1e-12 nats at k>=21).
- **Rank-1 ALS** (Hu, Koren & Volinsky 2008 shape, observed-entry
  least squares): alternating closed-form factor updates on the
  customer x part purchase-count matrix — the matrix-factorization
  recommender next to the neighborhood model ``q_item_cf``.
- **Interpolated Kneser–Ney** (Kneser & Ney 1995; Chen & Goodman
  1999): absolute discounting with the continuation-count unigram —
  the stronger LM next to ``q_backoff_lm_score``, sharing its 80/20
  hash split so scores are directly comparable.

Float posture (the module discipline, same as timeseries.py /
corpus_stats.py): every data-scale aggregate is an exact integer sum
(cents, counts, e6/e8-quantized logs); the only float ops are single
correctly-rounded divisions/logs applied to exact integers, identical
expression text in both engines, then ``round(., 6)``.

Scale posture: every query aggregates the raw relation to a bounded
one first (calendar days/months, 30 histogram bins, 99 replicate
rows, one 2x2 table, factor vectors keyed by customer/part) with one
partial-agg'd shuffle; candidate fan-outs are bounded by construction
(anchor-pair grid, replicate grid, enumeration range) and stated per
query. No single-partition data-scale window anywhere: global order
statistics ride ``global_row_number`` (two-phase scan) or
limit-bounded ``TakeOrderedAndProject`` rank filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.prefix import global_row_number
from ..sources.tables import load_table
from .registry import query

#: Cents conversion shared with the forecasting family.
_CENTS = "CAST(round(o_totalprice * 100) AS BIGINT)"

# ---------------------------------------------------------------------------
# q_ransac_trend — RANSAC consensus line fit on monthly revenue
# ---------------------------------------------------------------------------

#: Anchor months drawn by hash rank; all anchor pairs are candidate
#: models: 16 anchors -> 120 candidates, a calendar-bounded grid.
_RS_ANCHORS = 16

#: Inlier tolerance = floor(mean monthly revenue / 10) cents — scale-free
#: (tracks the series level) and exactly integer in both engines.
_RS_TOL_DIV = 10

_RS_MONTHLY = """
    SELECT (year(CAST(o_orderdate AS DATE)) - 1992) * 12
           + month(CAST(o_orderdate AS DATE)) - 1 AS m,
           CAST(SUM({cents}) AS BIGINT) AS y
    FROM orders GROUP BY 1
"""


@query(
    "q_ransac_trend",
    oracle=f"""
    WITH monthly AS ({_RS_MONTHLY.format(cents=_CENTS)}),
    tol AS (
        SELECT CAST(SUM(y) // (COUNT(*) * {_RS_TOL_DIV}) AS BIGINT) AS tol,
               CAST(COUNT(*) AS BIGINT) AS n_months
        FROM monthly
    ),
    anchors AS (
        SELECT m, y FROM monthly
        ORDER BY md5('rs:' || CAST(m AS VARCHAR)) LIMIT {_RS_ANCHORS}
    ),
    cand AS (
        SELECT a.m AS mi, a.y AS yi, b.m AS mj, b.y AS yj
        FROM anchors a JOIN anchors b ON a.m < b.m
    ),
    votes AS (
        SELECT c.mi, c.mj,
               CAST(COUNT(*) FILTER (WHERE
                   abs(CAST(p.y - c.yi AS HUGEINT) * (c.mj - c.mi)
                       - CAST(c.yj - c.yi AS HUGEINT) * (p.m - c.mi))
                   <= CAST(t.tol AS HUGEINT) * (c.mj - c.mi)) AS BIGINT)
                   AS n_inliers
        FROM cand c CROSS JOIN tol t JOIN monthly p ON TRUE
        GROUP BY c.mi, c.mj
    ),
    best AS (
        SELECT v.mi, v.mj, v.n_inliers, c.yi, c.yj
        FROM votes v JOIN cand c ON c.mi = v.mi AND c.mj = v.mj
        ORDER BY v.n_inliers DESC, v.mi, v.mj LIMIT 1
    ),
    inl AS (
        SELECT p.m, p.y FROM monthly p CROSS JOIN best b CROSS JOIN tol t
        WHERE abs(CAST(p.y - b.yi AS HUGEINT) * (b.mj - b.mi)
                  - CAST(b.yj - b.yi AS HUGEINT) * (p.m - b.mi))
              <= CAST(t.tol AS HUGEINT) * (b.mj - b.mi)
    ),
    fit AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(m) AS HUGEINT) AS sm,
               CAST(SUM(y) AS HUGEINT) AS sy,
               CAST(SUM(CAST(m AS HUGEINT) * y) AS HUGEINT) AS smy,
               CAST(SUM(CAST(m AS HUGEINT) * m) AS HUGEINT) AS smm
        FROM inl
    )
    SELECT t.n_months,
           b.mi AS best_mi, b.mj AS best_mj,
           b.n_inliers,
           round(CAST(b.n_inliers AS DOUBLE) / t.n_months, 6) AS inlier_frac,
           round(CAST(f.n * f.smy - f.sm * f.sy AS DOUBLE)
                 / CAST(f.n * f.smm - f.sm * f.sm AS DOUBLE) / 100.0, 6)
               AS slope_dollars,
           round(CAST(f.sy * f.smm - f.sm * f.smy AS DOUBLE)
                 / CAST(f.n * f.smm - f.sm * f.sm AS DOUBLE) / 100.0, 6)
               AS intercept_dollars
    FROM best b CROSS JOIN tol t CROSS JOIN fit f
    """,
)
def q_ransac_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANSAC consensus line fit (Fischler & Bolles 1981) on the
    monthly revenue series, made fully deterministic: the "random"
    sample is the 16 hash-rank-lowest months (md5 order), every anchor
    pair is a candidate line, the consensus vote counts months whose
    EXACT integer cross-product residual ``|(y-yi)(mj-mi) -
    (yj-yi)(m-mi)|`` is within ``tol*(mj-mi)`` (tolerance = mean/10 in
    cents — scale-free), and the winner (max inliers, then smallest
    anchor pair) is refit by exact-sum closed-form OLS on its inliers.

    Exactness: the residual test multiplies int64 cents by month
    deltas inside DECIMAL(38,0)/HUGEINT (y*84 months passes 2^63 near
    100 TB); slope and intercept are each ONE float division of exact
    integer determinants, then round(., 6) — identical in both
    engines. No float enters any comparison.

    Scale: one orders aggregate to ~84 calendar-bounded months; the
    vote join is |candidates| x |months| = 120 x 84 ~ 10^4 rows
    regardless of data scale; anchor and winner selection are
    limit-bounded TakeOrderedAndProject sorts, never a global window.
    """
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        (
            (F.year(F.col("o_orderdate").cast("date")) - 1992) * 12
            + F.month(F.col("o_orderdate").cast("date"))
            - 1
        ).alias("m")
    ).agg(F.sum(F.expr(_CENTS)).cast("long").alias("y"))
    tol = monthly.agg(
        F.expr(f"CAST(SUM(y) DIV (COUNT(*) * {_RS_TOL_DIV}) AS BIGINT)").alias(
            "tol"
        ),
        F.count("*").cast("long").alias("n_months"),
    )
    anchors = (
        monthly.orderBy(F.md5(F.concat(F.lit("rs:"), F.col("m").cast("string"))))
        .limit(_RS_ANCHORS)
        .select("m", "y")
    )
    cand = (
        anchors.alias("a")
        .join(anchors.alias("b"), F.col("a.m") < F.col("b.m"))
        .select(
            F.col("a.m").alias("mi"),
            F.col("a.y").alias("yi"),
            F.col("b.m").alias("mj"),
            F.col("b.y").alias("yj"),
        )
    )
    resid_ok = F.expr(
        "abs(CAST(y - yi AS DECIMAL(38,0)) * (mj - mi)"
        " - CAST(yj - yi AS DECIMAL(38,0)) * (m - mi))"
        " <= CAST(tol AS DECIMAL(38,0)) * (mj - mi)"
    )
    votes = (
        monthly.crossJoin(F.broadcast(cand))
        .crossJoin(F.broadcast(tol))
        .groupBy("mi", "mj")
        .agg(F.sum(F.when(resid_ok, 1).otherwise(0)).cast("long").alias("n_inliers"))
    )
    best = (
        votes.join(cand, ["mi", "mj"])
        .orderBy(F.col("n_inliers").desc(), "mi", "mj")
        .limit(1)
    )
    inl = (
        monthly.crossJoin(F.broadcast(best))
        .crossJoin(F.broadcast(tol))
        .filter(resid_ok)
        .select("m", "y")
    )
    fit = inl.agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum("m").cast("decimal(38,0)").alias("sm"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.expr("CAST(m AS DECIMAL(38,0)) * y")).alias("smy"),
        F.sum(F.expr("CAST(m AS DECIMAL(38,0)) * m")).alias("smm"),
    )
    return (
        F.broadcast(best)
        .crossJoin(F.broadcast(tol))
        .crossJoin(F.broadcast(fit))
        .selectExpr(
            "n_months",
            "mi AS best_mi",
            "mj AS best_mj",
            "n_inliers",
            "round(CAST(n_inliers AS DOUBLE) / n_months, 6) AS inlier_frac",
            "round(CAST(n * smy - sm * sy AS DOUBLE)"
            " / CAST(n * smm - sm * sm AS DOUBLE) / 100.0, 6) AS slope_dollars",
            "round(CAST(sy * smm - sm * smy AS DOUBLE)"
            " / CAST(n * smm - sm * sm AS DOUBLE) / 100.0, 6)"
            " AS intercept_dollars",
        )
    )


# ---------------------------------------------------------------------------
# q_hbos_outliers — histogram-based outlier score over lineitem features
# ---------------------------------------------------------------------------

#: Equal-width bins per feature; the score table is |features| x bins
#: = 30 rows regardless of data scale.
_HB_BINS = 10

#: Top-N scored rows returned (limit-bounded global rank).
_HB_TOPN = 20

_HB_FEATS = """
    SELECT l_orderkey AS okey, l_linenumber AS lineno,
           CAST(round(l_quantity) AS BIGINT) AS qty,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
           CAST(round(l_discount * 100) AS BIGINT) AS disc_h
    FROM lineitem
"""


def _hbos_oracle() -> str:
    bin_of = {
        f: f"CAST((({f} - mn_{f}) * {_HB_BINS}) // (mx_{f} - mn_{f} + 1) AS INT)"
        for f in ("qty", "price_c", "disc_h")
    }
    return f"""
    WITH feats AS ({_HB_FEATS}),
    rng AS (
        SELECT MIN(qty) AS mn_qty, MAX(qty) AS mx_qty,
               MIN(price_c) AS mn_price_c, MAX(price_c) AS mx_price_c,
               MIN(disc_h) AS mn_disc_h, MAX(disc_h) AS mx_disc_h,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM feats
    ),
    binned AS (
        SELECT f.okey, f.lineno, f.qty, f.price_c, f.disc_h,
               {bin_of['qty']} AS b_qty,
               {bin_of['price_c']} AS b_price,
               {bin_of['disc_h']} AS b_disc
        FROM feats f CROSS JOIN rng
    ),
    sq AS (SELECT b_qty AS b, CAST(round(ln(CAST(r.n AS DOUBLE) / COUNT(*))
                   * 1000000) AS BIGINT) AS s
           FROM binned CROSS JOIN rng r GROUP BY b_qty, r.n),
    sp AS (SELECT b_price AS b, CAST(round(ln(CAST(r.n AS DOUBLE) / COUNT(*))
                   * 1000000) AS BIGINT) AS s
           FROM binned CROSS JOIN rng r GROUP BY b_price, r.n),
    sd AS (SELECT b_disc AS b, CAST(round(ln(CAST(r.n AS DOUBLE) / COUNT(*))
                   * 1000000) AS BIGINT) AS s
           FROM binned CROSS JOIN rng r GROUP BY b_disc, r.n),
    scored AS (
        SELECT x.okey, x.lineno, x.qty, x.price_c, x.disc_h,
               sq.s + sp.s + sd.s AS hbos_e6
        FROM binned x
        JOIN sq ON sq.b = x.b_qty
        JOIN sp ON sp.b = x.b_price
        JOIN sd ON sd.b = x.b_disc
    ),
    topn AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY hbos_e6 DESC, okey, lineno) AS rk
        FROM scored
    )
    SELECT okey AS l_orderkey, lineno AS l_linenumber,
           qty AS quantity,
           round(price_c / 100.0, 2) AS price,
           round(disc_h / 100.0, 2) AS discount,
           CAST(hbos_e6 AS BIGINT) AS hbos_e6,
           round(hbos_e6 / 1000000.0, 6) AS hbos
    FROM topn WHERE rk <= {_HB_TOPN}
    ORDER BY hbos_e6 DESC, l_orderkey, l_linenumber
    """


@query("q_hbos_outliers", oracle=_hbos_oracle())
def q_hbos_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-Based Outlier Score (Goldstein & Dengel 2012) over
    three lineitem features (quantity, price cents, discount
    hundredths): 10 equal-width bins per feature from the exact
    integer min/max, per-bin score ``-ln(density)`` quantized to e6
    micro-nats, per-row score = the exact integer sum of its three bin
    scores; the 20 most outlying rows are returned.

    Exactness: binning is pure integer arithmetic ``((v-mn)*10) DIV
    (mx-mn+1)`` (never a float cut); each bin's single ``ln`` of a
    ratio of exact integers is quantized to e6 BEFORE any sum, so row
    scores and the final ranking are exact-integer in both engines.

    Scale: one pass for min/max (6 scalars, broadcast), one
    partial-agg'd pass per feature for the 10-row bin tables
    (broadcast), and one scan that joins each row to its three bin
    scores map-side — no data-scale shuffle at all; the top-20 is a
    limit-bounded TakeOrderedAndProject, never a global window sort.
    """
    li = load_table(spark, sf_dir, "lineitem")
    feats = li.select(
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").alias("lineno"),
        F.round("l_quantity").cast("long").alias("qty"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_c"),
        F.round(F.col("l_discount") * 100).cast("long").alias("disc_h"),
    )
    rng = feats.agg(
        F.min("qty").alias("mn_qty"),
        F.max("qty").alias("mx_qty"),
        F.min("price_c").alias("mn_price_c"),
        F.max("price_c").alias("mx_price_c"),
        F.min("disc_h").alias("mn_disc_h"),
        F.max("disc_h").alias("mx_disc_h"),
        F.count("*").cast("long").alias("n"),
    )
    bin_of = {
        f: F.expr(
            f"CAST((({f} - mn_{f}) * {_HB_BINS}) DIV (mx_{f} - mn_{f} + 1) AS INT)"
        )
        for f in ("qty", "price_c", "disc_h")
    }
    binned = feats.crossJoin(F.broadcast(rng)).select(
        "okey",
        "lineno",
        "qty",
        "price_c",
        "disc_h",
        bin_of["qty"].alias("b_qty"),
        bin_of["price_c"].alias("b_price"),
        bin_of["disc_h"].alias("b_disc"),
        F.col("n"),
    )
    score = F.expr(
        "CAST(round(ln(CAST(first(n) AS DOUBLE) / COUNT(*)) * 1000000) AS BIGINT)"
    ).alias("s")

    def bin_scores(col: str, out: str) -> DataFrame:
        return binned.groupBy(F.col(col).alias(out)).agg(score)

    sq = bin_scores("b_qty", "bq")
    sp = bin_scores("b_price", "bp")
    sd = bin_scores("b_disc", "bd")
    scored = (
        binned.join(F.broadcast(sq.withColumnRenamed("s", "s_q")), F.col("b_qty") == F.col("bq"))
        .join(F.broadcast(sp.withColumnRenamed("s", "s_p")), F.col("b_price") == F.col("bp"))
        .join(F.broadcast(sd.withColumnRenamed("s", "s_d")), F.col("b_disc") == F.col("bd"))
        .select(
            "okey",
            "lineno",
            "qty",
            "price_c",
            "disc_h",
            (F.col("s_q") + F.col("s_p") + F.col("s_d")).alias("hbos_e6"),
        )
    )
    return (
        scored.orderBy(F.col("hbos_e6").desc(), "okey", "lineno")
        .limit(_HB_TOPN)
        .selectExpr(
            "okey AS l_orderkey",
            "lineno AS l_linenumber",
            "qty AS quantity",
            "round(CAST(price_c AS DOUBLE) / 100, 2) AS price",
            "round(CAST(disc_h AS DOUBLE) / 100, 2) AS discount",
            "CAST(hbos_e6 AS BIGINT) AS hbos_e6",
            "round(CAST(hbos_e6 AS DOUBLE) / 1000000, 6) AS hbos",
        )
        .orderBy(F.col("hbos_e6").desc(), "l_orderkey", "l_linenumber")
    )


# ---------------------------------------------------------------------------
# q_conformal_forecast — split-conformal intervals for the lag-14 naive
# ---------------------------------------------------------------------------

#: Holdout horizon (days) and the forecaster's seasonal lag: identical,
#: so every holdout forecast input is a pre-holdout actual.
_CF_H = 14

#: Miscoverage levels alpha, as integer percents (exact rank math).
_CF_ALPHAS = (20, 10, 5)


def _conformal_oracle() -> str:
    alphas = ", ".join(f"({a})" for a in _CF_ALPHAS)
    return f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM({_CENTS}) AS BIGINT) AS rev_c
        FROM orders GROUP BY 1
    ),
    resid AS (
        SELECT a.day, abs(a.rev_c - f.rev_c) AS r
        FROM daily a
        JOIN daily f ON f.day = a.day - INTERVAL {_CF_H} DAY
        CROSS JOIN (SELECT MAX(day) AS max_day FROM daily) m
        WHERE a.day <= CAST(m.max_day - INTERVAL {_CF_H} DAY AS DATE)
    ),
    nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cal FROM resid),
    ranked AS (
        SELECT r, ROW_NUMBER() OVER (ORDER BY r, day) AS rn FROM resid
    ),
    alphas(alpha_pct) AS (VALUES {alphas}),
    qs AS (
        SELECT a.alpha_pct, nc.n_cal,
               ((100 - a.alpha_pct) * (nc.n_cal + 1) + 99) // 100 AS q_idx
        FROM alphas a CROSS JOIN nc
    ),
    qhat AS (
        SELECT q.alpha_pct, q.n_cal, r.r AS q_hat_c
        FROM qs q JOIN ranked r ON r.rn = q.q_idx
    ),
    hold AS (
        SELECT a.day, a.rev_c AS actual_c, f.rev_c AS forecast_c
        FROM daily a
        JOIN daily f ON f.day = a.day - INTERVAL {_CF_H} DAY
        CROSS JOIN (SELECT MAX(day) AS max_day FROM daily) m
        WHERE a.day > CAST(m.max_day - INTERVAL {_CF_H} DAY AS DATE)
    )
    SELECT q.alpha_pct, q.n_cal,
           round(q.q_hat_c / 100.0, 2) AS q_hat_dollars,
           CAST(COUNT(*) AS BIGINT) AS n_holdout,
           CAST(COUNT(*) FILTER (WHERE abs(h.actual_c - h.forecast_c)
                                       <= q.q_hat_c) AS BIGINT) AS n_covered,
           round(CAST(COUNT(*) FILTER (WHERE abs(h.actual_c - h.forecast_c)
                                             <= q.q_hat_c) AS DOUBLE)
                 / COUNT(*), 6) AS coverage
    FROM qhat q CROSS JOIN hold h
    GROUP BY q.alpha_pct, q.n_cal, q.q_hat_c
    ORDER BY alpha_pct DESC
    """


@query("q_conformal_forecast", oracle=_conformal_oracle())
def q_conformal_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals (Vovk et al. 2005; Lei et
    al. 2018) for the lag-14 seasonal-naive daily-revenue forecaster:
    the calibration set is every pre-holdout day's absolute residual
    ``|y_t - y_(t-14)|``; for each alpha the interval half-width
    ``q_hat`` is the ceil((1-alpha)(n_cal+1))-th smallest calibration
    residual (the finite-sample-valid conformal rank, exact integer
    ceiling division); the last 14 days are the out-of-sample holdout
    whose empirical coverage is reported per alpha. Forecast inputs
    for the holdout are all pre-holdout actuals (lag = horizon), so
    the audit is genuinely out-of-sample.

    Exactness: residuals are integer cents; the conformal rank is
    exact integer math ``((100-a)(n+1)+99) DIV 100``; q_hat is an
    exact order statistic picked by rank equality, never an
    interpolating percentile; coverage is one float division.

    Scale: one orders aggregate to calendar days; residual ranking
    rides ``global_row_number`` (two-phase scan — no single-task
    global sort even though the series is calendar-bounded); the
    coverage join is |alphas| x |holdout| = 3 x 14 broadcast rows.
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(F.expr(_CENTS)).cast("long").alias("rev_c")
    )
    mx = daily.agg(F.max("day").alias("max_day"))
    a = daily.select(F.col("day").alias("a_day"), F.col("rev_c").alias("actual_c"))
    f_ = daily.select(F.col("day").alias("f_day"), F.col("rev_c").alias("forecast_c"))
    paired = a.join(
        f_, F.col("f_day") == F.date_sub(F.col("a_day"), _CF_H)
    ).crossJoin(F.broadcast(mx))
    resid = paired.filter(
        F.col("a_day") <= F.date_sub(F.col("max_day"), _CF_H)
    ).select(
        "a_day", F.abs(F.col("actual_c") - F.col("forecast_c")).alias("r")
    )
    nc = resid.agg(F.count("*").cast("long").alias("n_cal"))
    ranked = global_row_number(resid, ["r", "a_day"], out_col="rn")
    alphas = spark.createDataFrame(
        [(a_,) for a_ in _CF_ALPHAS], "alpha_pct int"
    )
    qs = (
        F.broadcast(alphas)
        .crossJoin(F.broadcast(nc))
        .selectExpr(
            "alpha_pct",
            "n_cal",
            "((100 - alpha_pct) * (n_cal + 1) + 99) DIV 100 AS q_idx",
        )
    )
    qhat = qs.join(ranked, F.col("rn") == F.col("q_idx")).select(
        "alpha_pct", "n_cal", F.col("r").alias("q_hat_c")
    )
    hold = paired.filter(
        F.col("a_day") > F.date_sub(F.col("max_day"), _CF_H)
    ).select("actual_c", "forecast_c")
    covered = F.sum(
        F.when(
            F.abs(F.col("actual_c") - F.col("forecast_c")) <= F.col("q_hat_c"), 1
        ).otherwise(0)
    ).cast("long")
    return (
        hold.crossJoin(F.broadcast(qhat))
        .groupBy("alpha_pct", "n_cal", "q_hat_c")
        .agg(
            F.count("*").cast("long").alias("n_holdout"),
            covered.alias("n_covered"),
        )
        .selectExpr(
            "alpha_pct",
            "n_cal",
            "round(CAST(q_hat_c AS DOUBLE) / 100, 2) AS q_hat_dollars",
            "n_holdout",
            "n_covered",
            "round(CAST(n_covered AS DOUBLE) / n_holdout, 6) AS coverage",
        )
        .orderBy(F.col("alpha_pct").desc())
    )

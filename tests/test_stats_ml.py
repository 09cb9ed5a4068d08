"""Micro-fixture tests for the statistical-analytics formulas
(plans/stats_ml.py): closed-form OLS recovers an exact plane,
correlation hits the +/-1 poles, chi-square is zero on an independent
table, and the A/B z-test is antisymmetric. The oracle smoke tests
cover the full queries end-to-end; these pin the shared formula texts
on inputs whose answers are known in closed form.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_server_development_spark.plans.stats_ml import (
    _AB_FINAL,
    _CORR_PAIRS,
    _OLS_FINAL,
    _corr_formula,
)


def _ols_fit(spark, rows):
    df = spark.createDataFrame(rows, "x1 long, x2 long, y long")

    def dsum(e):
        return F.sum(e.cast("decimal(38,0)")).cast("double")

    s = df.agg(
        F.count("*").cast("double").alias("n"),
        dsum(F.col("x1")).alias("sx1"),
        dsum(F.col("x2")).alias("sx2"),
        dsum(F.col("y")).alias("sy"),
        dsum(F.col("x1") * F.col("x1")).alias("sx11"),
        dsum(F.col("x2") * F.col("x2")).alias("sx22"),
        dsum(F.col("x1") * F.col("x2")).alias("sx12"),
        dsum(F.col("x1") * F.col("y")).alias("sx1y"),
        dsum(F.col("x2") * F.col("y")).alias("sx2y"),
        dsum(F.col("y") * F.col("y")).alias("syy"),
    )
    return s.selectExpr(*_OLS_FINAL).collect()[0]


def test_ols_recovers_exact_plane(spark):
    # y = 3 + 2*x1 + 5*x2, no noise: coefficients and R^2 are exact.
    rows = [
        (x1, x2, 3 + 2 * x1 + 5 * x2)
        for x1 in range(1, 7)
        for x2 in range(0, 5)
    ]
    fit = _ols_fit(spark, rows)
    assert fit.n_rows == len(rows)
    assert (fit.b0, fit.b1, fit.b2) == (3.0, 2.0, 5.0)
    assert fit.r2 == 1.0


def test_ols_flat_response_gives_zero_slopes(spark):
    rows = [(x1, x2, 42) for x1 in range(1, 5) for x2 in range(1, 4)]
    fit = _ols_fit(spark, rows)
    assert (fit.b0, fit.b1, fit.b2) == (42.0, 0.0, 0.0)


def _corr_one(spark, pairs, a="qty", b="price_c"):
    df = spark.createDataFrame(pairs, f"{a} long, {b} long")
    s = df.agg(
        F.count("*").cast("double").alias("n"),
        F.sum(F.col(a).cast("decimal(38,0)")).cast("double").alias(f"s_{a}"),
        F.sum(F.col(b).cast("decimal(38,0)")).cast("double").alias(f"s_{b}"),
        F.sum((F.col(a) * F.col(a)).cast("decimal(38,0)"))
        .cast("double")
        .alias(f"s_{a}_{a}"),
        F.sum((F.col(b) * F.col(b)).cast("decimal(38,0)"))
        .cast("double")
        .alias(f"s_{b}_{b}"),
        F.sum((F.col(a) * F.col(b)).cast("decimal(38,0)"))
        .cast("double")
        .alias(f"s_{a}_{b}"),
    )
    return s.selectExpr(f"{_corr_formula(a, b)} as c").collect()[0].c


def test_corr_poles(spark):
    assert _corr_one(spark, [(i, 2 * i) for i in range(1, 9)]) == 1.0
    assert _corr_one(spark, [(i, -3 * i + 100) for i in range(1, 9)]) == -1.0


def test_corr_pairs_are_sorted_unique():
    assert _CORR_PAIRS == sorted(set(_CORR_PAIRS))
    assert all(a < b for a, b in _CORR_PAIRS)


def test_chi_square_independent_table_is_zero(spark, tmp_path, monkeypatch):
    # Perfectly independent lang x source counts: every cell equals its
    # expected value, so chi2 and Cramer's V are exactly 0.
    import mapreduce_server_development_spark.plans.stats_ml as m

    docs = spark.createDataFrame(
        [
            (lang, src)
            for lang, n in (("en", 6), ("de", 3))
            for src in ("web",) * n + ("book",) * n
        ],
        "lang string, source string",
    ).withColumn("doc_id", F.monotonically_increasing_id())

    monkeypatch.setattr(m, "load_table", lambda spark_, sf, name: docs)
    row = m.q_chi_square(spark, "unused").collect()[0]
    assert row.chi2 == 0.0
    assert row.cramers_v == 0.0
    assert row.dof == 1


def test_ab_z_antisymmetric(spark):
    def z(c_a, c_b, n=100):
        s = spark.createDataFrame(
            [(n, n, c_a, c_b)], "n_a long, n_b long, c_a long, c_b long"
        )
        return s.selectExpr(*_AB_FINAL).collect()[0]

    hi = z(60, 40)
    lo = z(40, 60)
    assert hi.z_score > 0 > lo.z_score
    assert hi.z_score == -lo.z_score
    assert hi.conv_a_pct == 60.0 and hi.conv_b_pct == 40.0


def test_mahalanobis_nontrivial_outlier_set(spark, duck):
    """The chi-square(2, 0.999) production cut yields ~0 rows at small
    SF, making the oracle row nearly vacuous — this variant lowers the
    cut to 2.0 (expect ~e^-1 of the corpus) so the d2 formula, the det
    guard and the threshold are exercised on a non-trivial set in BOTH
    engines."""
    from mapreduce_server_development_spark.plans.ml_features import (
        _maha_oracle,
        _maha_scored,
    )

    from .conftest import SF_SMOKE

    srows = sorted(
        (r.vec_id, round(r.d2, 4)) for r in _maha_scored(spark, SF_SMOKE, 2.0).collect()
    )
    orows = sorted((v, round(d, 4)) for v, d in duck.sql(_maha_oracle(2.0)).fetchall())
    assert len(srows) > 10
    assert srows == orows

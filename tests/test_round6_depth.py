"""Independent SEMANTIC checks for the round-6 depth queries.

The DuckDB oracle proves cross-engine identity; these tests prove the
math is *right* by recomputing each statistic a third way (numpy /
pure Python from the raw parquet) and comparing:

- q_kaplan_meier vs a direct product-limit computation over per-user
  durations;
- q_pca_power vs numpy's eigendecomposition of the projection
  covariance (loading up to sign, eigenvalue, variance share);
- q_mutual_info vs a direct plug-in MI/entropy computation (the e6
  per-cell rounding bounds the allowed drift);
- q_label_propagation vs a pure-Python synchronous LPA on the same
  support-2 edge set (exact label-table equality);
- q_link_prediction vs a brute-force RA index with the same hub cap.
"""

from __future__ import annotations

import math

import pytest

from .conftest import SF_SMOKE

pytestmark = pytest.mark.usefixtures("spark")


def _queries():
    import __spark_entry__ as entry

    return entry.queries()


def test_kaplan_meier_matches_direct_product_limit(spark, duck):
    rows = {
        r["day"]: r
        for r in _queries()["q_kaplan_meier"](spark, SF_SMOKE).collect()
    }
    pu = duck.sql(
        """
        SELECT MIN(ts) AS birth,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS death,
               (SELECT MAX(ts) FROM events) AS mx
        FROM events GROUP BY user_id
        """
    ).fetchall()
    durs = []
    for birth, death, mx in pu:
        end = death if death is not None else mx
        day = int((end - birth).total_seconds() * 1e6) // 86_400_000_000
        durs.append((day, death is not None))
    n_at_risk = len(durs)
    s = 1.0
    expected = {}
    for day in sorted({d for d, _ in durs}):
        deaths = sum(1 for d, obs in durs if d == day and obs)
        cens = sum(1 for d, obs in durs if d == day and not obs)
        if deaths > 0:
            s = s * (n_at_risk - deaths) / n_at_risk
            expected[day] = (n_at_risk, deaths, s)
        n_at_risk -= deaths + cens
    assert set(rows) == set(expected)
    for day, (at_risk, deaths, surv) in expected.items():
        r = rows[day]
        assert r["at_risk"] == at_risk
        assert r["deaths"] == deaths
        assert abs(r["survival"] - surv) < 1e-6, (day, r["survival"], surv)
    # survival is a strictly decreasing product-limit curve
    surv_seq = [rows[d]["survival"] for d in sorted(rows)]
    assert all(a > b for a, b in zip(surv_seq, surv_seq[1:]))


def test_pca_power_matches_numpy_eig(spark):
    np = pytest.importorskip("numpy")
    out = sorted(
        _queries()["q_pca_power"](spark, SF_SMOKE).collect(),
        key=lambda r: r["dim"],
    )
    from mapreduce_server_development_spark.plans.ml_features import (
        _SIGNS,
        D_IN,
        D_OUT,
    )

    import duckdb

    emb = duckdb.sql(
        f"SELECT embedding FROM read_parquet('{SF_SMOKE}/embeddings.parquet')"
    ).fetchnumpy()["embedding"]
    X = np.stack([np.asarray(v, dtype=np.float64) for v in emb])
    S = np.array(_SIGNS, dtype=np.float64)  # D_OUT x D_IN
    P = np.round(np.round(X @ S.T / math.sqrt(D_OUT), 4) * 10000.0)
    C = np.cov(P, rowvar=False, bias=True)
    w, v = np.linalg.eigh(C)
    lead = v[:, -1]
    if lead[np.argmax(np.abs(lead))] < 0:
        lead = -lead
    got = np.array([r["loading"] for r in out])
    assert np.allclose(got, lead, atol=2e-3), (got, lead)
    assert abs(out[0]["eigenvalue"] - w[-1] / 1e8) < max(1e-3, w[-1] * 1e-5 / 1e8)
    assert abs(out[0]["var_share"] - w[-1] / np.trace(C)) < 1e-3
    assert X.shape[1] == D_IN


def test_mutual_info_matches_direct_plugin_estimate(spark, duck):
    row = _queries()["q_mutual_info"](spark, SF_SMOKE).collect()[0]
    cells = duck.sql(
        "SELECT event_type, hour(ts), COUNT(*) FROM events GROUP BY 1, 2"
    ).fetchall()
    n = sum(c for _, _, c in cells)
    nx: dict[str, int] = {}
    ny: dict[int, int] = {}
    for x, y, c in cells:
        nx[x] = nx.get(x, 0) + c
        ny[y] = ny.get(y, 0) + c
    mi = sum(
        c / n * math.log(c * n / (nx[x] * ny[y])) for x, y, c in cells
    )
    hx = -sum(c / n * math.log(c / n) for c in nx.values())
    hy = -sum(c / n * math.log(c / n) for c in ny.values())
    # e6 fixed-point with per-cell rounding: allow a few micro-nats
    assert abs(row["mi_e6"] / 1e6 - mi) < 5e-6
    assert abs(row["h_type_e6"] / 1e6 - hx) < 5e-6
    assert abs(row["h_hour_e6"] / 1e6 - hy) < 5e-6
    assert 0 <= row["nmi_e6"] <= 1_000_000


def _support2_edges(duck):
    return duck.sql(
        """
        WITH po AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        SELECT a.l_partkey, b.l_partkey
        FROM po a JOIN po b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
        """
    ).fetchall()


def test_label_propagation_matches_pure_python_sync_lpa(spark, duck):
    out = _queries()["q_label_propagation"](spark, SF_SMOKE).collect()
    edges = _support2_edges(duck)
    nbrs: dict[int, list[int]] = {}
    for a, b in edges:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    lbl = {v: v for v in nbrs}
    for _ in range(4):
        new = {}
        for v, ns in nbrs.items():
            votes: dict[int, int] = {lbl[v]: 1}
            for u in ns:
                votes[lbl[u]] = votes.get(lbl[u], 0) + 1
            best = max(votes.values())
            new[v] = min(l for l, c in votes.items() if c == best)
        lbl = new
    sizes: dict[int, int] = {}
    for l in lbl.values():
        sizes[l] = sizes.get(l, 0) + 1
    top = sorted(sizes.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [(r["community"], r["size"]) for r in out]
    assert got == top
    assert all(r["n_communities"] == len(sizes) for r in out)


def test_link_prediction_matches_bruteforce_ra(spark, duck):
    out = _queries()["q_link_prediction"](spark, SF_SMOKE).collect()
    edges = duck.sql(
        """
        WITH po AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        SELECT a.l_partkey, b.l_partkey
        FROM po a JOIN po b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        """
    ).fetchall()
    eset = {(a, b) for a, b in edges}
    nbrs: dict[int, set[int]] = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    scores: dict[tuple[int, int], list[int]] = {}
    for z, ns in nbrs.items():
        d = len(ns)
        if not (2 <= d <= 64):
            continue
        ns_sorted = sorted(ns)
        for i, u in enumerate(ns_sorted):
            for w in ns_sorted[i + 1 :]:
                if (u, w) in eset:
                    continue
                cn, s = scores.get((u, w), (0, 0))
                scores[(u, w)] = (cn + 1, s + 10**12 // d)
    top = sorted(
        ((u, w, cn, s) for (u, w), (cn, s) in scores.items()),
        key=lambda t: (-t[3], t[0], t[1]),
    )[:20]
    got = [
        (r["part_a"], r["part_b"], r["common_neighbors"], r["ra_score_e12"])
        for r in out
    ]
    assert got == top


def test_holt_forecast_matches_pure_python_recurrence(spark, duck):
    out = sorted(
        _queries()["q_holt_forecast"](spark, SF_SMOKE).collect(),
        key=lambda r: r["h"],
    )
    daily = duck.sql(
        """
        SELECT CAST(o_orderdate AS DATE) AS day,
               SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev
        FROM orders GROUP BY 1 ORDER BY day
        """
    ).fetchall()
    ys = [float(r) for _, r in daily]
    t_train = len(ys) - 14
    l, b = ys[0], ys[1] - ys[0]
    for y in ys[1:t_train]:
        nl = 0.5 * y + 0.5 * (l + b)
        b = 0.3 * (nl - l) + 0.7 * b
        l = nl
    assert len(out) == 14
    for r in out:
        h = r["h"]
        f = l + h * b
        assert r["forecast_c"] == round(f), (h, r["forecast_c"], f)
        actual = ys[t_train + h - 1]
        assert r["actual_c"] == int(actual)
        assert r["ape_micro"] == round(abs(actual - f) / actual * 1e6)
        assert r["day"] == daily[t_train + h - 1][0]


def test_markov_attribution_invariants(spark):
    """Semantic invariants of the removal-effect model: removing a
    channel can only LOWER the absorption probability (each removal
    redirects probability mass into NULL), removal effects are
    non-negative, and the normalized shares sum to 1 over exactly the
    four schema channels."""
    rows = {
        r["channel"]: r
        for r in _queries()["q_attribution_markov"](spark, SF_SMOKE).collect()
    }
    assert set(rows) == {"click", "error", "signup", "view"}
    shares = 0.0
    for r in rows.values():
        assert 0 < r["p_conv_full_e6"] <= 1_000_000
        assert 0 <= r["p_conv_removed_e6"] <= r["p_conv_full_e6"]
        assert 0 <= r["removal_e6"] <= 1_000_000
        shares += r["share"]
    assert abs(shares - 1.0) < 5e-6


def test_quantile_sketch_bounds_exact_rank(spark):
    """The log-binned estimate must land inside the selected bin, and
    the TRUE quantile inside the same bin (the sketch's accuracy
    contract: relative error bounded by the bin width, ~9%)."""
    for r in _queries()["q_quantile_sketch"](spark, SF_SMOKE).collect():
        # bin width at value v is < v * 2^-3 (8 sub-bins per octave),
        # so est and exact agree to ~12.5% relative — assert a safe 15%.
        assert abs(r["est_c"] - r["exact_c"]) <= 0.15 * r["exact_c"], r
        assert r["err_ppm"] <= 150_000


def test_seasonality_indices_average_to_one(spark):
    """The day-count-weighted mean of the seven seasonal indices is 1
    by construction (ratio-to-grand-mean decomposition identity)."""
    rows = _queries()["q_seasonality"](spark, SF_SMOKE).collect()
    assert len(rows) == 7
    tot_days = sum(r["n_days"] for r in rows)
    wmean = sum(r["seasonal_index"] * r["n_days"] for r in rows) / tot_days
    assert abs(wmean - 1.0) < 1e-4


def test_cumulative_users_is_monotone_and_totals(spark):
    """The growth curve is non-decreasing, its increments are the
    per-day new users, and the final value equals the exact global
    distinct-user count."""
    rows = sorted(
        _queries()["q_cumulative_users"](spark, SF_SMOKE).collect(),
        key=lambda r: r["day"],
    )
    run = 0
    for r in rows:
        run += r["new_users"]
        assert r["cum_users"] == run
    import duckdb

    exact = duckdb.sql(
        f"SELECT COUNT(DISTINCT user_id) FROM '{SF_SMOKE}/events.parquet'"
    ).fetchone()[0]
    assert rows[-1]["cum_users"] == exact

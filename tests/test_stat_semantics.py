"""Independent semantic checks for the hypothesis-test family.

The DuckDB oracle catches Spark↔DuckDB divergence but NOT a formula
that is wrong in BOTH engines at once (the round-6 BPE-merge lesson).
These tests re-derive each statistic with a brute-force pure-Python
reference on tiny hand-built tables, then run the QUERY'S OWN ORACLE
SQL against those tables in a fresh DuckDB — if the shared formula
text drifts from the textbook definition, the brute force disagrees.

No Spark involved: the oracle SQL *is* the shared formula text (the
Spark side evaluates the identical expressions), so checking it
against an independent implementation checks both engines' semantics.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from mapreduce_server_development_spark.plans import ORACLE


def _run(tables: dict[str, tuple[list[str], list[tuple]]], name: str):
    con = duckdb.connect()
    for tname, (cols, rows) in tables.items():
        col_sql = ", ".join(cols)
        con.execute(f"CREATE TABLE {tname} ({col_sql})")
        if rows:
            ph = ", ".join("?" for _ in rows[0])
            con.executemany(f"INSERT INTO {tname} VALUES ({ph})", rows)
    res = con.sql(ORACLE[name])
    out = [dict(zip([c.lower() for c in res.columns], r)) for r in res.fetchall()]
    con.close()
    return out


def _events(rows):
    """rows: (user_id, event_type, value); ts/event_id filled in."""
    return (
        ["event_id BIGINT", "ts TIMESTAMP", "user_id BIGINT",
         "event_type VARCHAR", "value DOUBLE", "props VARCHAR"],
        [
            (i, f"2024-01-{(i % 28) + 1:02d} 00:00:00", u, t, v, "{}")
            for i, (u, t, v) in enumerate(rows)
        ],
    )


def _midranks(values):
    """value -> average rank (1-based) with ties."""
    s = sorted(values)
    ranks = {}
    i = 0
    while i < len(s):
        j = i
        while j < len(s) and s[j] == s[i]:
            j += 1
        ranks[s[i]] = (i + 1 + j) / 2.0
        i = j
    return ranks


# ---------------------------------------------------------------------------
# Welch's t
# ---------------------------------------------------------------------------


def test_welch_matches_textbook():
    a = [10.0, 12.0, 9.0, 11.0, 13.0]          # even user_ids
    b = [20.0, 25.0, 22.0, 28.0]               # odd user_ids
    rows = [(2 * i, "purchase", v) for i, v in enumerate(a)]
    rows += [(2 * i + 1, "purchase", v) for i, v in enumerate(b)]
    rows += [(1, "click", 999.0)]              # must be ignored
    out = _run({"events": _events(rows)}, "q_welch_ttest")[0]

    ma, mb = sum(a) / len(a), sum(b) / len(b)
    va = sum((x - ma) ** 2 for x in a) / (len(a) - 1)
    vb = sum((x - mb) ** 2 for x in b) / (len(b) - 1)
    sea, seb = va / len(a), vb / len(b)
    t = (ma - mb) / math.sqrt(sea + seb)
    df = (sea + seb) ** 2 / (
        sea**2 / (len(a) - 1) + seb**2 / (len(b) - 1)
    )
    assert out["n_a"] == len(a) and out["n_b"] == len(b)
    assert abs(out["mean_a"] - ma) < 2e-6
    assert abs(out["t_stat"] - t) < 2e-6
    assert abs(out["df_welch"] - df) < 2e-6


# ---------------------------------------------------------------------------
# Mann–Whitney U with ties
# ---------------------------------------------------------------------------


def test_mann_whitney_matches_brute_force():
    a = [5.0, 7.0, 7.0, 9.0, 12.0]
    b = [6.0, 7.0, 10.0, 10.0, 11.0, 15.0]
    rows = [(2 * i, "purchase", v) for i, v in enumerate(a)]
    rows += [(2 * i + 1, "purchase", v) for i, v in enumerate(b)]
    out = _run({"events": _events(rows)}, "q_mann_whitney")[0]

    allv = a + b
    mr = _midranks(allv)
    ra = sum(mr[v] for v in a)
    na, nb, n = len(a), len(b), len(allv)
    u = ra - na * (na + 1) / 2.0
    from collections import Counter

    ties = Counter(allv)
    tsum = sum(t**3 - t for t in ties.values())
    sigma = math.sqrt(
        na * nb / 12.0 * ((n + 1) - tsum / (n * (n - 1)))
    )
    z = (u - na * nb / 2.0) / sigma
    assert out["n_a"] == na and out["n_b"] == nb
    assert abs(out["u_stat"] - u) < 1e-6
    assert abs(out["z_score"] - z) < 2e-6


# ---------------------------------------------------------------------------
# Kendall τ-b via O(n²) brute force
# ---------------------------------------------------------------------------


def _lineitem(pairs):
    return (
        ["l_quantity DOUBLE", "l_discount DOUBLE", "l_extendedprice DOUBLE",
         "l_tax DOUBLE", "l_returnflag VARCHAR", "l_suppkey BIGINT",
         "l_orderkey BIGINT", "l_partkey BIGINT", "l_shipdate TIMESTAMP",
         "l_linestatus VARCHAR", "l_linenumber BIGINT"],
        [
            (q, d, 100.0, 0.0, "N", 1, i, 1, "2024-01-01 00:00:00", "O", i)
            for i, (q, d) in enumerate(pairs)
        ],
    )


def test_kendall_tau_b_matches_brute_force():
    pairs = [(1, 0.00), (1, 0.02), (2, 0.02), (3, 0.01), (3, 0.04),
             (4, 0.04), (5, 0.00), (5, 0.05), (2, 0.05), (4, 0.01)]
    out = _run({"lineitem": _lineitem(pairs)}, "q_kendall_tau")[0]

    n = len(pairs)
    conc = disc = tq = td = 0
    for i in range(n):
        for j in range(i + 1, n):
            dq = pairs[i][0] - pairs[j][0]
            dd = round(pairs[i][1] * 100) - round(pairs[j][1] * 100)
            if dq == 0 and dd == 0:
                tq += 1
                td += 1
            elif dq == 0:
                tq += 1
            elif dd == 0:
                td += 1
            elif (dq > 0) == (dd > 0):
                conc += 1
            else:
                disc += 1
    n0 = n * (n - 1) / 2.0
    tau = (conc - disc) / math.sqrt((n0 - tq) * (n0 - td))
    assert out["n_rows"] == n
    assert abs(out["kendall_tau_b"] - tau) < 2e-6


# ---------------------------------------------------------------------------
# Spearman ρ with ties via midranks + Pearson
# ---------------------------------------------------------------------------


def test_spearman_matches_brute_force():
    pairs = [(1, 0.00), (2, 0.01), (2, 0.03), (3, 0.03), (4, 0.02),
             (5, 0.05), (1, 0.05), (3, 0.00)]
    out = _run({"lineitem": _lineitem(pairs)}, "q_spearman_corr")[0]

    qs = [p[0] for p in pairs]
    ds = [round(p[1] * 100) for p in pairs]
    rq, rd = _midranks(qs), _midranks(ds)
    xs = [rq[v] for v in qs]
    ys = [rd[v] for v in ds]
    n = len(pairs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    rho = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    assert abs(out["spearman_rho"] - rho) < 2e-6


# ---------------------------------------------------------------------------
# Kruskal–Wallis H with tie correction
# ---------------------------------------------------------------------------


def test_kruskal_wallis_matches_brute_force():
    groups = {
        "click": [1.0, 2.0, 2.0, 5.0],
        "view": [3.0, 4.0, 4.0],
        "purchase": [2.0, 6.0, 7.0, 7.0, 9.0],
    }
    rows = []
    uid = 0
    for g, vs in groups.items():
        for v in vs:
            rows.append((uid, g, v))
            uid += 1
    out = _run({"events": _events(rows)}, "q_kruskal_wallis")[0]

    allv = [v for vs in groups.values() for v in vs]
    n = len(allv)
    mr = _midranks(allv)
    h = (12.0 / (n * (n + 1))) * sum(
        sum(mr[v] for v in vs) ** 2 / len(vs) for vs in groups.values()
    ) - 3.0 * (n + 1)
    from collections import Counter

    ties = Counter(allv)
    corr = 1.0 - sum(t**3 - t for t in ties.values()) / (n**3 - n)
    assert out["n_groups"] == len(groups)
    assert abs(out["h_stat"] - h / corr) < 2e-6


# ---------------------------------------------------------------------------
# One-way ANOVA F and η²
# ---------------------------------------------------------------------------


def test_anova_matches_textbook():
    groups = {
        "click": [1.0, 2.0, 3.0],
        "view": [4.0, 5.0, 6.0, 7.0],
        "purchase": [2.0, 2.0, 4.0],
    }
    rows = []
    uid = 0
    for g, vs in groups.items():
        for v in vs:
            rows.append((uid, g, v))
            uid += 1
    out = _run({"events": _events(rows)}, "q_anova_oneway")[0]

    allv = [v for vs in groups.values() for v in vs]
    n, k = len(allv), len(groups)
    gm = sum(allv) / n
    ssb = sum(len(vs) * (sum(vs) / len(vs) - gm) ** 2 for vs in groups.values())
    sst = sum((v - gm) ** 2 for v in allv)
    ssw = sst - ssb
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert out["n_groups"] == k and out["n_rows"] == n
    assert abs(out["f_stat"] - f) < 2e-4  # e6-rounded between-terms
    assert abs(out["eta_squared"] - ssb / sst) < 2e-4


# ---------------------------------------------------------------------------
# Cramér's V
# ---------------------------------------------------------------------------


def test_cramers_v_matches_brute_force():
    cells = {("1-URGENT", "O"): 8, ("1-URGENT", "F"): 2,
             ("2-HIGH", "O"): 3, ("2-HIGH", "F"): 7,
             ("3-LOW", "O"): 5, ("3-LOW", "F"): 5}
    rows = []
    for (pr, st), m in cells.items():
        rows += [(pr, st)] * m
    tables = {
        "orders": (
            ["o_orderkey BIGINT", "o_custkey BIGINT",
             "o_orderpriority VARCHAR", "o_orderstatus VARCHAR",
             "o_totalprice DOUBLE", "o_orderdate TIMESTAMP"],
            [(i, 1, pr, st, 1.0, "2024-01-01 00:00:00")
             for i, (pr, st) in enumerate(rows)],
        )
    }
    out = _run(tables, "q_cramers_v")[0]

    n = len(rows)
    prs = sorted({p for p, _ in rows})
    sts = sorted({s for _, s in rows})
    rm = {p: sum(1 for x, _ in rows if x == p) for p in prs}
    cm = {s: sum(1 for _, x in rows if x == s) for s in sts}
    chi = 0.0
    for p in prs:
        for s in sts:
            e = rm[p] * cm[s] / n
            o = cells.get((p, s), 0)
            chi += (o - e) ** 2 / e
    v = math.sqrt(chi / (n * (min(len(prs), len(sts)) - 1)))
    assert out["df"] == (len(prs) - 1) * (len(sts) - 1)
    assert abs(out["chi_square"] - chi) < 1e-3   # e6 per-cell rounding
    assert abs(out["cramers_v"] - v) < 1e-4


# ---------------------------------------------------------------------------
# Hill tail index
# ---------------------------------------------------------------------------


def test_hill_matches_brute_force():
    import mapreduce_server_development_spark.plans.hypothesis_tests as ht

    # 150 customers with Pareto-ish revenues; one order each.
    revs = [round(1000.0 * (1.0 + (i % 37)) ** 1.7, 2) for i in range(150)]
    tables = {
        "orders": (
            ["o_orderkey BIGINT", "o_custkey BIGINT",
             "o_orderpriority VARCHAR", "o_orderstatus VARCHAR",
             "o_totalprice DOUBLE", "o_orderdate TIMESTAMP"],
            [(i, i, "1-URGENT", "O", r, "2024-01-01 00:00:00")
             for i, r in enumerate(revs)],
        )
    }
    out = _run(tables, "q_hill_tail")[0]

    k = ht._HILL_K
    cents = sorted((round(r * 100) for r in revs), reverse=True)
    top, thr = cents[:k], cents[k]
    alpha = k / sum(math.log(x / thr) for x in top)
    assert out["k_order_stats"] == k
    assert abs(out["threshold_revenue"] - thr / 100.0) < 1e-9
    assert abs(out["hill_alpha"] - alpha) < 1e-4


# ---------------------------------------------------------------------------
# Wilcoxon signed-rank (paired pre/post, 48h split)
# ---------------------------------------------------------------------------


def _events_ts(rows):
    """rows: (event_id, ts, user_id, event_type, value)."""
    return (
        ["event_id BIGINT", "ts TIMESTAMP", "user_id BIGINT",
         "event_type VARCHAR", "value DOUBLE", "props VARCHAR"],
        [(i, ts, u, t, v, "{}") for i, (ts, u, t, v) in enumerate(rows)],
    )


def test_wilcoxon_matches_brute_force():
    # Per user: one pre purchase (day 1) and one post purchase (day 5);
    # first event at day 1 00:00 anchors the 48h split.
    pre = [10.0, 20.0, 15.0, 8.0, 30.0, 12.0]
    post = [14.0, 18.0, 15.0, 20.0, 35.0, 9.0]   # user 2 ties (d=0, drops)
    rows = []
    for u, (a, b) in enumerate(zip(pre, post)):
        rows.append((f"2024-01-01 01:00:00", u, "purchase", a))
        rows.append((f"2024-01-05 01:00:00", u, "purchase", b))
    out = _run({"events": _events_ts(rows)}, "q_wilcoxon")[0]

    ds = [round((b - a) * 100) for a, b in zip(pre, post) if b != a]
    mr = _midranks([abs(d) for d in ds])
    n = len(ds)
    w_plus = sum(mr[abs(d)] for d in ds if d > 0)
    from collections import Counter

    ties = Counter(abs(d) for d in ds)
    sig = math.sqrt(
        n * (n + 1) * (2 * n + 1) / 24.0
        - sum(t**3 - t for t in ties.values()) / 48.0
    )
    z = (w_plus - n * (n + 1) / 4.0) / sig
    assert out["n_pairs"] == n
    assert abs(out["w_plus"] - w_plus) < 1e-6
    assert abs(out["z_score"] - z) < 2e-6


# ---------------------------------------------------------------------------
# CUPED theta and adjusted difference
# ---------------------------------------------------------------------------


def test_cuped_matches_brute_force():
    # user_id parity = variant; pre (day 1) and post (day 5) spends.
    data = {  # user -> (pre, post)
        0: (10.0, 30.0), 2: (20.0, 50.0), 4: (5.0, 12.0),
        1: (12.0, 20.0), 3: (25.0, 40.0), 5: (8.0, 30.0),
    }
    rows = []
    for u, (a, b) in data.items():
        rows.append(("2024-01-01 01:00:00", u, "purchase", a))
        rows.append(("2024-01-05 01:00:00", u, "purchase", b))
    out = _run({"events": _events_ts(rows)}, "q_cuped")[0]

    xs = {u: round(a * 100) for u, (a, _) in data.items()}
    ys = {u: round(b * 100) for u, (_, b) in data.items()}
    n = len(data)
    sx, sy = sum(xs.values()), sum(ys.values())
    sxy = sum(xs[u] * ys[u] for u in data)
    sxx = sum(x * x for x in xs.values())
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    a_us = [u for u in data if u % 2 == 0]
    b_us = [u for u in data if u % 2 == 1]
    d_raw = sum(ys[u] for u in a_us) / len(a_us) - sum(
        ys[u] for u in b_us
    ) / len(b_us)
    d_x = sum(xs[u] for u in a_us) / len(a_us) - sum(
        xs[u] for u in b_us
    ) / len(b_us)
    assert abs(out["theta"] - theta) < 2e-6
    assert abs(out["diff_raw"] - d_raw / 100.0) < 2e-6
    assert abs(out["diff_cuped"] - (d_raw - theta * d_x) / 100.0) < 2e-6


# ---------------------------------------------------------------------------
# Difference-in-differences
# ---------------------------------------------------------------------------


def test_did_matches_brute_force():
    # Pre = before 2024-01-16, post = after; variant = parity.
    cells = {
        ("a", "pre"): [10.0, 12.0, 14.0],
        ("a", "post"): [20.0, 26.0],
        ("b", "pre"): [11.0, 13.0],
        ("b", "post"): [15.0, 17.0, 19.0],
    }
    rows = []
    uid = {"a": 0, "b": 1}
    for (v, p), vals in cells.items():
        ts = "2024-01-10 00:00:00" if p == "pre" else "2024-01-20 00:00:00"
        for x in vals:
            rows.append((ts, uid[v], "purchase", x))
    out = _run({"events": _events_ts(rows)}, "q_did")[0]

    m = {k: sum(v) / len(v) for k, v in cells.items()}
    da = m[("a", "post")] - m[("a", "pre")]
    db = m[("b", "post")] - m[("b", "pre")]
    assert abs(out["delta_a"] - da) < 2e-6
    assert abs(out["delta_b"] - db) < 2e-6
    assert abs(out["did_estimate"] - (da - db)) < 2e-6


# ---------------------------------------------------------------------------
# GMM EM (3 iterations, fixed init) vs a pure-Python replay
# ---------------------------------------------------------------------------


def test_gmm_em_matches_python_replay():
    vals = [5.0, 6.0, 7.0, 5.5, 6.5, 200.0, 210.0, 190.0, 205.0, 7.5,
            6.2, 195.0]
    rows = [(u, "purchase", v) for u, v in enumerate(vals)]
    out = _run({"events": _events(rows)}, "q_gmm_em")[0]

    import mapreduce_server_development_spark.plans.stats_ml as sm

    hist = {}
    for v in vals:
        c = round(v * 100)
        hist[c] = hist.get(c, 0) + 1
    mu1, mu2, v1, v2, pi = 2000.0, 30000.0, 1e8, 1e8, 0.5
    nn = float(sum(hist.values()))
    ss = float(sum(m * c for c, m in hist.items()))
    qq = float(sum(m * c * c for c, m in hist.items()))
    for _ in range(sm._GMM_ITERS):
        n1 = s1 = q1 = 0.0
        for c, m in hist.items():
            cc = float(c)
            d1 = math.exp(-((cc - mu1) ** 2) / (2.0 * v1)) / math.sqrt(v1)
            d2 = math.exp(-((cc - mu2) ** 2) / (2.0 * v2)) / math.sqrt(v2)
            den = pi * d1 + (1.0 - pi) * d2
            if den > 0.0:
                r = pi * d1 / den
            else:
                r = 1.0 if abs(cc - mu1) <= abs(cc - mu2) else 0.0
            n1 += m * r
            s1 += m * r * cc
            q1 += m * r * cc * cc
        pi = n1 / nn
        mu1 = s1 / n1
        v1 = max(q1 / n1 - mu1 * mu1, 100.0)
        mu2 = (ss - s1) / (nn - n1)
        v2 = max((qq - q1) / (nn - n1) - mu2 * mu2, 100.0)
    assert abs(out["weight_1"] - pi) < 1e-5
    assert abs(out["mean_1"] - mu1 / 100.0) < 1e-3
    assert abs(out["mean_2"] - mu2 / 100.0) < 1e-3
    assert abs(out["sigma_1"] - math.sqrt(v1) / 100.0) < 1e-3
    # The two components must actually separate the bimodal input.
    assert out["mean_1"] < 20.0 < out["mean_2"]


# ---------------------------------------------------------------------------
# Granger F vs a hand-solved 2-regressor OLS
# ---------------------------------------------------------------------------


def test_granger_matches_hand_ols():
    # Hourly series where errors lag purchases by one hour exactly.
    xs = [10, 12, 8, 15, 20, 9, 14, 11, 16, 13]
    ys = [3 + x // 2 for x in [7] + xs[:-1]]       # y_t driven by x_{t-1}
    rows = []
    eid = 0
    for h, (x, y) in enumerate(zip(xs, ys)):
        for _ in range(x):
            rows.append((f"2024-01-01 {h:02d}:30:00", 1, "purchase", 1.0))
            eid += 1
        for _ in range(y):
            rows.append((f"2024-01-01 {h:02d}:30:00", 1, "error", 1.0))
            eid += 1
    out = _run({"events": _events_ts(rows)}, "q_granger")[0]

    pairs = [(ys[t], ys[t - 1], xs[t - 1]) for t in range(1, len(xs))]
    n = len(pairs)
    sy = sum(p[0] for p in pairs)
    sl = sum(p[1] for p in pairs)
    sx = sum(p[2] for p in pairs)
    syy = sum(p[0] * p[0] for p in pairs)
    sll = sum(p[1] * p[1] for p in pairs)
    sxx = sum(p[2] * p[2] for p in pairs)
    syl = sum(p[0] * p[1] for p in pairs)
    syx = sum(p[0] * p[2] for p in pairs)
    slx = sum(p[1] * p[2] for p in pairs)
    a11 = sll - sl * sl / n
    a12 = slx - sl * sx / n
    a22 = sxx - sx * sx / n
    b1 = syl - sy * sl / n
    b2 = syx - sy * sx / n
    cyy = syy - sy * sy / n
    det = a11 * a22 - a12 * a12
    byl = (b1 * a22 - b2 * a12) / det
    bxl = (a11 * b2 - a12 * b1) / det
    sse_u = cyy - byl * b1 - bxl * b2
    sse_r = cyy - b1 * b1 / a11
    f = (sse_r - sse_u) * (n - 3) / sse_u
    assert out["n_hour_pairs"] == n
    assert abs(out["granger_coef"] - bxl) < 2e-6
    assert abs(out["f_stat"] - f) < 1e-3


# ---------------------------------------------------------------------------
# Shapley attribution vs itertools over the coalition lattice
# ---------------------------------------------------------------------------


def test_shapley_matches_itertools():
    # Controlled touchsets within each user's first 24h; conversion =
    # purchase inside that window. Channels: click=1,error=2,signup=4,view=8.
    users = [
        (0, ["click"], True),
        (1, ["click"], True),
        (2, ["view"], False),
        (3, ["view"], True),
        (4, ["click", "view"], True),
        (5, ["click", "view"], False),
        (6, [], False),
        (7, ["signup"], False),
        (8, ["signup", "click"], True),
    ]
    rows = []
    for u, touches, conv in users:
        # anchor event defines t0 (hour 0); touches at hour 1..;
        # conversion purchase at hour 12 (inside 24h) if conv.
        if touches:
            for i, t in enumerate(touches):
                rows.append((f"2024-01-01 0{i + 1}:00:00", u, t, 1.0))
        else:
            rows.append(("2024-01-01 01:00:00", u, "error", 1.0))
        if conv:
            rows.append(("2024-01-01 12:00:00", u, "purchase", 5.0))
    # Give the no-touch user a mask: user 6 touches 'error' above, so
    # adjust expectations accordingly (error IS a channel).
    out = {r["channel"]: r for r in _run(
        {"events": _events_ts(rows)}, "q_attribution_shapley"
    )}

    import itertools

    bits = {"click": 1, "error": 2, "signup": 4, "view": 8}
    masks = {}
    for u, touches, conv in users:
        ts = touches if touches else ["error"]
        m = sum(bits[t] for t in ts)
        n, c = masks.get(m, (0, 0))
        masks[m] = (n + 1, c + (1 if conv else 0))
    v = {m: (c / n if n else 0.0) for m, (n, c) in masks.items()}

    def val(m):
        return v.get(m, 0.0)

    k = 4
    for ch, bit in bits.items():
        others = [b for b in bits.values() if b != bit]
        phi = 0.0
        for r in range(len(others) + 1):
            for combo in itertools.combinations(others, r):
                sub = sum(combo)
                w = (
                    math.factorial(r) * math.factorial(k - 1 - r)
                    / math.factorial(k)
                )
                phi += w * (val(sub + bit) - val(sub))
        assert abs(out[ch]["shapley_value"] - phi) < 2e-6, ch


# ---------------------------------------------------------------------------
# Jensen–Shannon divergence vs a direct implementation
# ---------------------------------------------------------------------------


def _documents(rows):
    """rows: (doc_id, text, lang, source)."""
    return (
        ["doc_id BIGINT", "text VARCHAR", "lang VARCHAR", "source VARCHAR",
         "n_chars BIGINT"],
        [(d, t, lg, s, len(t)) for d, t, lg, s in rows],
    )


def test_js_divergence_matches_direct():
    rows = [
        (1, "apple banana apple cherry", "en", "s1"),
        (2, "banana banana date", "en", "s1"),
        (3, "apple elderberry elderberry fig", "en", "s2"),
        (4, "fig fig grape apple", "en", "s2"),
    ]
    out = _run({"documents": _documents(rows)}, "q_js_divergence")
    assert len(out) == 1
    got = out[0]

    from collections import Counter

    c1 = Counter("apple banana apple cherry banana banana date".split())
    c2 = Counter("apple elderberry elderberry fig fig fig grape apple".split())
    n1, n2 = sum(c1.values()), sum(c2.values())
    js = 0.0
    for tok in set(c1) | set(c2):
        p = c1.get(tok, 0) / n1
        q = c2.get(tok, 0) / n2
        if p > 0 and q > 0:
            js += p * math.log2(2 * p / (p + q)) + q * math.log2(
                2 * q / (p + q)
            )
        elif p > 0:
            js += p
        else:
            js += q
    js *= 0.5
    common = len(set(c1) & set(c2))
    assert got["n_common_tokens"] == common
    assert abs(got["js_divergence_bits"] - js) < 1e-5


# ---------------------------------------------------------------------------
# Modularity on a constructed two-clique graph
# ---------------------------------------------------------------------------


def test_modularity_two_cliques():
    # Two disjoint triangles {1,2,3} and {10,11,12}; each edge gets
    # support 2 via two orders containing the clique.
    po = []
    ok = 0
    for clique in ([1, 2, 3], [10, 11, 12]):
        for _ in range(2):
            ok += 1
            for p in clique:
                po.append((ok, p))
    tables = {
        "lineitem": (
            ["l_orderkey BIGINT", "l_partkey BIGINT", "l_quantity DOUBLE",
             "l_discount DOUBLE", "l_extendedprice DOUBLE", "l_tax DOUBLE",
             "l_returnflag VARCHAR", "l_suppkey BIGINT",
             "l_shipdate TIMESTAMP", "l_linestatus VARCHAR",
             "l_linenumber BIGINT"],
            [(o, p, 1.0, 0.0, 1.0, 0.0, "N", 1,
              "2024-01-01 00:00:00", "O", i)
             for i, (o, p) in enumerate(po)],
        )
    }
    out = _run(tables, "q_modularity")[0]
    # Two triangles, 6 edges total; LPA labels each triangle with its
    # min vertex; Q = sum over the 2 communities of
    # (3/6 - (6/12)^2) = 2 * (0.5 - 0.25) = 0.5.
    assert out["n_communities"] == 2
    assert out["n_edges"] == 6
    assert abs(out["modularity"] - 0.5) < 1e-6


# ---------------------------------------------------------------------------
# Log-rank test vs a per-time brute force
# ---------------------------------------------------------------------------


def test_logrank_matches_brute_force():
    # Per user: first event at hour 0; group A converts fast, B slow,
    # with some censoring (no purchase).
    spec = [  # (user_id, death_hour or None, censor_hour)
        (0, 2, None), (2, 3, None), (4, 3, None), (6, None, 8),
        (1, 5, None), (3, 7, None), (5, None, 6), (7, 9, None),
    ]
    rows = []
    for u, death, censor in spec:
        rows.append(("2024-01-01 00:00:00", u, "view", 1.0))
        if death is not None:
            rows.append((f"2024-01-01 0{death}:00:00", u, "purchase", 5.0))
        else:
            rows.append((f"2024-01-01 0{censor}:00:00", u, "click", 1.0))
    out = _run({"events": _events_ts(rows)}, "q_logrank")[0]

    pu = []
    for u, death, censor in spec:
        g = u % 2
        t = death if death is not None else censor
        pu.append((g, t, death is not None))
    times = sorted({t for _, t, d in pu if d})
    oe = v = 0.0
    for t in times:
        n1 = sum(1 for g, tt, _ in pu if g == 0 and tt >= t)
        n2 = sum(1 for g, tt, _ in pu if g == 1 and tt >= t)
        d1 = sum(1 for g, tt, d in pu if g == 0 and tt == t and d)
        d2 = sum(1 for g, tt, d in pu if g == 1 and tt == t and d)
        n, d = n1 + n2, d1 + d2
        oe += d1 - d * n1 / n
        if n > 1:
            v += d * (n1 / n) * (n2 / n) * (n - d) / (n - 1)
    z = oe / math.sqrt(v)
    assert out["conversions_a"] == sum(
        1 for g, _, d in pu if g == 0 and d
    )
    assert abs(out["observed_minus_expected"] - oe) < 1e-4
    assert abs(out["logrank_z"] - z) < 1e-4


def test_audience_kmv_matches_pure_python():
    # Three segments over 220 users with seeded deterministic
    # membership — segment sizes exceed k=64 so the bottom-k
    # truncation (the actual sketch path) is exercised, not the
    # degenerate |audience| <= k case.
    import hashlib

    segs = ["1-URGENT", "2-HIGH", "3-MEDIUM"]
    members: dict[str, set[int]] = {s: set() for s in segs}
    rows = []
    for u in range(220):
        for i, s in enumerate(segs):
            if (u * 7 + i * 13) % 10 < 6:  # ~60% membership, overlapping
                members[s].add(u)
                rows.append((u, s))
    out = _run(
        {
            "orders": (
                ["o_custkey BIGINT", "o_orderpriority VARCHAR"],
                rows,
            )
        },
        "q_audience_kmv",
    )

    def h(u: int) -> int:
        return int(hashlib.md5(f"kmv:{u}".encode()).hexdigest()[:15], 16)

    k = 64
    bot = {s: set(sorted(h(u) for u in members[s])[:k]) for s in segs}
    got = {(r["ta"], r["tb"]): r for r in out}
    assert set(got) == {
        (a, b) for i, a in enumerate(segs) for b in segs[i + 1:]
    }
    for (a, b), r in got.items():
        union_sample = sorted(bot[a] | bot[b])[:k]
        matches = sum(1 for x in union_sample if x in bot[a] and x in bot[b])
        exact = len(members[a] & members[b]) / len(members[a] | members[b])
        assert r["k"] == k
        assert r["union_sample"] == len(union_sample)
        assert r["matches"] == matches
        assert abs(r["jaccard_est"] - matches / len(union_sample)) < 1e-6
        assert abs(r["jaccard_exact"] - exact) < 1e-6
        # k=64 on ~130-member audiences: the estimate should land
        # within a loose 4/sqrt(k) of truth (sanity, not a proof).
        assert abs(r["jaccard_est"] - exact) < 0.5


def test_burstiness_matches_brute_force():
    # One event type, hand-placed hourly counts [3, 1, 2] -> Fano and
    # Goh-Barabasi from the textbook definitions over observed hours.
    rows = []
    for hr, n in [(0, 3), (1, 1), (2, 2)]:
        for i in range(n):
            rows.append((f"2024-01-01 0{hr}:{i:02d}:00", 1, "view", 1.0))
    out = _run({"events": _events_ts(rows)}, "q_burstiness")[0]
    counts = [3, 1, 2]
    h = len(counts)
    mean = sum(counts) / h
    var = sum((c - mean) ** 2 for c in counts) / (h - 1)
    assert out["n_hours"] == h and out["n_events"] == sum(counts)
    assert abs(out["mean_per_hour"] - mean) < 1e-6
    assert abs(out["fano_factor"] - var / mean) < 1e-6
    sd = math.sqrt(var)
    assert abs(out["burstiness"] - (sd - mean) / (sd + mean)) < 1e-6


def test_poisson_rate_matches_brute_force():
    # Variant 0 (even users): 3 users, 6 purchases; variant 1 (odd):
    # 2 users, 2 purchases. Rate z from the count/exposure normal
    # approximation Var(c/u) = c/u^2.
    rows = []
    for u, k in [(0, 3), (2, 2), (4, 1), (1, 1), (3, 1)]:
        rows.append(("2024-01-01 00:00:00", u, "view", 1.0))
        for i in range(k):
            rows.append((f"2024-01-01 0{i + 1}:00:00", u, "purchase", 5.0))
    out = _run({"events": _events_ts(rows)}, "q_poisson_rate_test")[0]
    ua, ub, ca, cb = 3, 2, 6, 2
    ra, rb = ca / ua, cb / ub
    z = (ra - rb) / math.sqrt(ca / ua**2 + cb / ub**2)
    assert (out["users_a"], out["users_b"]) == (ua, ub)
    assert (out["purchases_a"], out["purchases_b"]) == (ca, cb)
    assert abs(out["rate_a"] - ra) < 1e-6
    assert abs(out["rate_b"] - rb) < 1e-6
    assert abs(out["z_score"] - z) < 1e-5


def test_srm_and_mde_match_brute_force():
    # 6 even users vs 2 odd users -> chi2 = (6-4)^2/4 + (2-4)^2/4 = 2,
    # below 3.841 -> no flag; with per-user purchase totals the MDE
    # formula is replayed directly.
    rows = []
    spend = {0: 10.0, 2: 20.0, 4: 30.0, 6: 40.0, 8: 0.0, 10: 0.0,
             1: 15.0, 3: 25.0}
    for u, v in spend.items():
        rows.append(("2024-01-01 00:00:00", u, "view", 1.0))
        if v:
            rows.append(("2024-01-01 01:00:00", u, "purchase", v))
    out = _run({"events": _events_ts(rows)}, "q_srm_check")[0]
    assert (out["n_a"], out["n_b"]) == (6, 2)
    assert abs(out["srm_chi2"] - 2.0) < 1e-6
    assert out["srm_flag"] == 0

    out = _run({"events": _events_ts(rows)}, "q_mde_power")[0]
    m = list(spend.values())
    n = len(m)
    mean = sum(m) / n
    sd = math.sqrt(sum((x - mean) ** 2 for x in m) / (n - 1))
    mde = (1.959964 + 0.841621) * sd * math.sqrt(2.0 / (n / 2.0))
    assert out["n_users"] == n
    assert abs(out["metric_sd"] - sd) < 1e-4
    assert abs(out["mde_absolute"] - mde) < 1e-4
    assert abs(out["mde_relative_pct"] - 100.0 * mde / mean) < 1e-3


def test_token_diversity_matches_brute_force():
    # One source, tokens: the=3, cat=2, sat=1 -> N=6, V=3, hapax=1;
    # entropy/TTR/Simpson replayed from the definitions.
    docs = (
        ["doc_id BIGINT", "text VARCHAR", "lang VARCHAR",
         "source VARCHAR", "n_chars BIGINT"],
        [(1, "the cat the", "en", "web", 11),
         (2, "the cat sat", "en", "web", 11)],
    )
    out = _run({"documents": docs}, "q_token_diversity")[0]
    counts = {"the": 3, "cat": 2, "sat": 1}
    n = sum(counts.values())
    entropy = -sum(c / n * math.log2(c / n) for c in counts.values())
    simpson = sum(c * (c - 1) for c in counts.values()) / (n * (n - 1))
    assert out["n_tokens"] == n and out["vocab"] == 3 and out["hapax"] == 1
    assert abs(out["ttr"] - 3 / n) < 1e-6
    assert abs(out["hapax_rate"] - 1 / 3) < 1e-6
    assert abs(out["entropy_bits"] - entropy) < 1e-3
    assert abs(out["simpson_index"] - simpson) < 1e-6


def test_price_elasticity_matches_hand_ols():
    # Hand grid: quantity q with discount d on each row; weighted OLS
    # of ln(q) on ln(1-d) replayed in floats (the query's e6 cell
    # rounding perturbs ~1e-6, so compare at 1e-3).
    rows = [(10, 0.00)] * 3 + [(12, 0.05)] * 2 + [(15, 0.10)] * 4 + [
        (20, 0.10)
    ] * 1 + [(8, 0.00)] * 2
    li = (
        ["l_quantity DOUBLE", "l_discount DOUBLE"],
        [(float(q), d) for q, d in rows],
    )
    out = _run({"lineitem": li}, "q_price_elasticity")[0]
    xs = [math.log(1.0 - d) for _, d in rows]
    ys = [math.log(q) for q, _ in rows]
    n = len(rows)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    r2 = (n * sxy - sx * sy) ** 2 / (
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    assert out["n_rows"] == n
    assert abs(out["elasticity"] - slope) < 1e-3
    assert abs(out["intercept_ln_qty"] - intercept) < 1e-3
    assert abs(out["r_squared"] - r2) < 1e-3


def test_chi_square_matches_brute_force():
    # 2x2 grid with one EMPTY cell — the textbook statistic includes
    # the zero-observed cell's expected count (this test caught the
    # observed-cells-only variant understating chi2).
    rows = []
    i = 0
    for lang, src, k in [("en", "web", 4), ("en", "books", 2),
                         ("fr", "web", 3)]:
        for _ in range(k):
            rows.append((i, "x", lang, src, 1))
            i += 1
    docs = (
        ["doc_id BIGINT", "text VARCHAR", "lang VARCHAR",
         "source VARCHAR", "n_chars BIGINT"],
        rows,
    )
    out = _run({"documents": docs}, "q_chi_square")[0]
    obs = {("en", "web"): 4, ("en", "books"): 2,
           ("fr", "web"): 3, ("fr", "books"): 0}
    rt = {"en": 6, "fr": 3}
    ct = {"web": 7, "books": 2}
    g = 9
    chi = sum(
        (o - rt[l] * ct[s] / g) ** 2 / (rt[l] * ct[s] / g)
        for (l, s), o in obs.items()
    )
    assert out["dof"] == 1
    assert abs(out["chi2"] - chi) < 1e-4
    assert abs(out["cramers_v"] - math.sqrt(chi / g)) < 1e-4


def test_ab_test_matches_brute_force():
    # Even users (variant A): 3 exposed, 2 convert within 24h of first
    # event; odd users (B): 2 exposed, 0 convert (one buys late).
    rows = [
        ("2024-01-01 00:00:00", 0, "view", 1.0),
        ("2024-01-01 05:00:00", 0, "purchase", 9.0),   # within 24h
        ("2024-01-01 00:00:00", 2, "view", 1.0),
        ("2024-01-01 23:00:00", 2, "purchase", 9.0),   # within 24h
        ("2024-01-01 00:00:00", 4, "view", 1.0),       # never buys
        ("2024-01-01 00:00:00", 1, "view", 1.0),
        ("2024-01-03 00:00:00", 1, "purchase", 9.0),   # too late
        ("2024-01-01 00:00:00", 3, "view", 1.0),       # never buys
    ]
    out = _run({"events": _events_ts(rows)}, "q_ab_test")[0]
    na, nb, ca, cb = 3, 2, 2, 0
    p = (ca + cb) / (na + nb)
    z = (ca / na - cb / nb) / math.sqrt(p * (1 - p) * (1 / na + 1 / nb))
    assert (out["n_a"], out["n_b"]) == (na, nb)
    assert abs(out["conv_a_pct"] - 100 * ca / na) < 1e-6
    assert abs(out["conv_b_pct"] - 0.0) < 1e-6
    assert abs(out["z_score"] - z) < 1e-5


def test_gini_matches_brute_force():
    # Four customers with revenues 10, 20, 30, 40 dollars.
    orders = (
        ["o_custkey BIGINT", "o_totalprice DOUBLE"],
        [(1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0)],
    )
    out = _run({"orders": orders}, "q_gini")[0]
    x = sorted([1000, 2000, 3000, 4000])
    n, tot = len(x), sum(x)
    wsum = sum((i + 1) * v for i, v in enumerate(x))
    gini = 2.0 * wsum / (n * tot) - (n + 1.0) / n
    assert out["n_customers"] == n
    assert abs(out["total_revenue"] - tot / 100.0) < 1e-6
    assert abs(out["gini"] - gini) < 1e-6


def test_benford_matches_brute_force():
    # Prices chosen so first digits of cents are 1,1,2,9.
    li = (
        ["l_extendedprice DOUBLE"],
        [(1.00,), (15.00,), (2.50,), (95.00,)],
    )
    rows = _run({"lineitem": li}, "q_benford")
    # first digit of round(price*100): 100->1, 1500->1, 250->2, 9500->9
    obs = {1: 2, 2: 1, 9: 1}
    n = 4
    got = {r["digit"]: r for r in rows}
    assert {d: r["obs"] for d, r in got.items()} == obs
    for d, r in got.items():
        e = n * math.log10(1 + 1 / d)
        assert abs(r["expected"] - e) < 0.01
        assert abs(r["chi_term_micro"] / 1e6 - (obs[d] - e) ** 2 / e) < 1e-4


def test_changepoint_matches_brute_force():
    # One type, values 1,1,1,5,5 -> cumulative deviates most from the
    # overall trend at k=3 (the last pre-shift point).
    vals = [1.0, 1.0, 1.0, 5.0, 5.0]
    rows = [
        (f"2024-01-01 0{i}:00:00", 1, "view", v) for i, v in enumerate(vals)
    ]
    out = _run({"events": _events_ts(rows)}, "q_changepoint")[0]
    cents = [round(v * 100) for v in vals]
    n, tot = len(cents), sum(cents)
    cum = 0
    best_k, best_dev = None, -1
    for k, c in enumerate(cents, start=1):
        cum += c
        dev = abs(n * cum - k * tot)
        if dev > best_dev:
            best_k, best_dev = k, dev
    assert out["cp_position"] == best_k == 3
    assert abs(out["max_rel_dev"] - best_dev / (n * tot)) < 1e-6


def test_partial_corr_matches_brute_force():
    # Hand lineitems where discount confounds qty<->price.
    rows = [  # (l_quantity, l_extendedprice, l_discount, l_tax)
        (1, 10.0, 0.00, 0.0), (2, 9.0, 0.01, 0.0), (3, 8.5, 0.02, 0.0),
        (4, 7.0, 0.03, 0.0), (5, 6.0, 0.05, 0.0), (6, 5.5, 0.06, 0.0),
        (2, 11.0, 0.00, 0.0), (5, 6.5, 0.04, 0.0),
    ]
    li = (
        ["l_quantity DOUBLE", "l_extendedprice DOUBLE",
         "l_discount DOUBLE", "l_tax DOUBLE"],
        [(float(q), p, d, t) for q, p, d, t in rows],
    )
    out = _run({"lineitem": li}, "q_partial_corr")[0]
    qty = [q for q, _, _, _ in rows]
    price = [round(p * 100) for _, p, _, _ in rows]
    disc = [round(d * 100) for _, _, d, _ in rows]

    def corr(a, b):
        n = len(a)
        num = n * sum(x * y for x, y in zip(a, b)) - sum(a) * sum(b)
        den = math.sqrt(
            (n * sum(x * x for x in a) - sum(a) ** 2)
            * (n * sum(y * y for y in b) - sum(b) ** 2)
        )
        return num / den

    rxy, rxz, ryz = corr(qty, price), corr(qty, disc), corr(price, disc)
    part = (rxy - rxz * ryz) / math.sqrt((1 - rxz**2) * (1 - ryz**2))
    assert out["n_rows"] == len(rows)
    assert abs(out["corr_raw"] - rxy) < 1e-5
    assert abs(out["corr_partial"] - part) < 1e-5


def test_markov_entropy_matches_brute_force():
    # One user journey: view->click->view->click->purchase; another:
    # view->view. Entropy rate H = -sum (n_ij/N) log2(n_ij/n_i).
    rows = []
    for i, et in enumerate(["view", "click", "view", "click", "purchase"]):
        rows.append((f"2024-01-01 0{i}:00:00", 1, et, 1.0))
    for i, et in enumerate(["view", "view"]):
        rows.append((f"2024-01-01 0{i}:00:00", 2, et, 1.0))
    out = _run({"events": _events_ts(rows)}, "q_markov_entropy")[0]
    trans = {}
    for seq in (["view", "click", "view", "click", "purchase"],
                ["view", "view"]):
        for a, b in zip(seq, seq[1:]):
            trans[(a, b)] = trans.get((a, b), 0) + 1
    nn = sum(trans.values())
    outs = {}
    for (a, _), n in trans.items():
        outs[a] = outs.get(a, 0) + n
    h = -sum(
        (n / nn) * math.log2(n / outs[a]) for (a, _), n in trans.items()
    )
    k = len(outs)
    assert out["n_transitions"] == nn and out["n_states"] == k
    assert abs(out["entropy_rate_bits"] - h) < 1e-4
    assert abs(out["predictability"] - (1 - h / math.log2(k))) < 1e-4


def test_iv_woe_matches_brute_force():
    # Two discount buckets with different return (bad) rates.
    rows = [  # (l_discount, l_returnflag) expanded below
        (0.00, "N", 6), (0.00, "R", 1),
        (0.05, "N", 2), (0.05, "R", 4),
    ]
    li_rows = []
    for d, fl, k in rows:
        li_rows += [(d, fl)] * k
    li = (["l_discount DOUBLE", "l_returnflag VARCHAR"], li_rows)
    out = _run({"lineitem": li}, "q_iv_woe")
    got = {r["bucket"]: r for r in out}
    bins = {0: (6, 1), 5: (2, 4)}  # bucket -> (good, bad)
    t_good, t_bad, nb = 8, 5, 2
    for b, (g, bad) in bins.items():
        bs = (bad + 1) / (t_bad + nb)
        gs = (g + 1) / (t_good + nb)
        woe = math.log(bs / gs)
        iv = (bs - gs) * woe
        assert got[b]["n_good"] == g and got[b]["n_bad"] == bad
        assert abs(got[b]["woe_e6"] / 1e6 - woe) < 1e-5
        assert abs(got[b]["iv_nano"] / 1e9 - iv) < 1e-6


def test_median_ci_matches_brute_force():
    # n=9 orders, values 1..9 dollars -> median 5; binomial 95% CI
    # ranks floor((9 - 1.96*3)/2)=1 and ceil(1 + (9 + 1.96*3)/2)=9.
    orders = (
        ["o_orderkey BIGINT", "o_totalprice DOUBLE"],
        [(i, float(i)) for i in range(1, 10)],
    )
    out = _run({"orders": orders}, "q_median_ci")[0]
    n = 9
    z = 1.959964
    k_lo = max(1, math.floor((n - z * math.sqrt(n)) / 2))
    k_hi = min(n, math.ceil(1 + (n + z * math.sqrt(n)) / 2))
    vals = sorted(range(1, 10))
    assert out["n_orders"] == n
    assert abs(out["median"] - 5.0) < 1e-6
    assert abs(out["ci_lo"] - vals[k_lo - 1]) < 1e-6
    assert abs(out["ci_hi"] - vals[k_hi - 1]) < 1e-6


def test_ols_regression_matches_numpy():
    # y ~ b0 + b1*x1 + b2*x2 via numpy lstsq on the same integer-cents
    # features the query builds (qty, disc*100 -> price*100).
    import numpy as np

    rows = [  # (l_quantity, l_discount, l_extendedprice)
        (1, 0.00, 10.0), (2, 0.01, 19.5), (3, 0.02, 28.0),
        (4, 0.00, 41.0), (5, 0.05, 44.0), (6, 0.04, 55.5),
        (7, 0.03, 67.0), (8, 0.10, 70.0),
    ]
    li = (
        ["l_quantity DOUBLE", "l_discount DOUBLE", "l_extendedprice DOUBLE"],
        [(float(q), d, p) for q, d, p in rows],
    )
    out = _run({"lineitem": li}, "q_ols_regression")[0]
    x1 = np.array([q for q, _, _ in rows], dtype=float)
    x2 = np.array([round(d * 100) for _, d, _ in rows], dtype=float)
    y = np.array([round(p * 100) for _, _, p in rows], dtype=float)
    A = np.column_stack([np.ones_like(x1), x1, x2])
    beta, _, _, _ = np.linalg.lstsq(A, y, rcond=None)
    resid = y - A @ beta
    sst = ((y - y.mean()) ** 2).sum()
    r2 = 1.0 - (resid**2).sum() / sst
    assert out["n_rows"] == len(rows)
    assert abs(out["b0"] - beta[0]) < 1e-3
    assert abs(out["b1"] - beta[1]) < 1e-3
    assert abs(out["b2"] - beta[2]) < 1e-3
    assert abs(out["r2"] - r2) < 1e-5


def test_seasonal_strength_matches_brute_force():
    # Two days x 3 observed hours-of-day with a clear diurnal pattern:
    # hod 0 -> 5 events, hod 1 -> 1, hod 2 -> 3 (both days), so the
    # clock explains ALL variance (eta^2 = 1, residual sd 0).
    # Plus a third day where hod 0 has 4 events, breaking perfection.
    counts = {  # (day, hod) -> events
        (1, 0): 5, (1, 1): 1, (1, 2): 3,
        (2, 0): 5, (2, 1): 1, (2, 2): 3,
        (3, 0): 4,
    }
    rows = []
    for (day, hod), k in counts.items():
        for i in range(k):
            rows.append((f"2024-01-0{day} 0{hod}:{i:02d}:00", 1, "view", 1.0))
    out = _run({"events": _events_ts(rows)}, "q_seasonal_strength")[0]
    groups = {}
    for (_, hod), c in counts.items():
        groups.setdefault(hod, []).append(c)
    allc = [c for cs in groups.values() for c in cs]
    n = len(allc)
    ss, qq = sum(allc), sum(c * c for c in allc)
    sst = qq - ss * ss / n
    # Replay the query's round-before-sum: each group's s^2/n term is
    # rounded to an integer before the cross-group sum (negligible at
    # count scale in production, visible on this toy fixture).
    bt = sum(round(sum(cs) ** 2 / len(cs)) for cs in groups.values())
    ssb = bt - ss * ss / n
    assert out["n_hours"] == n
    assert abs(out["seasonal_strength"] - ssb / sst) < 1e-4
    # n <= 24 observed hours: residual dof is non-positive, the query
    # reports NULL (guarded shared text) rather than diverging engines.
    assert out["residual_sd"] is None


def test_forecast_eval_matches_brute_force():
    # 14 days of revenue; last 7 days scored against the value 7 days
    # earlier (seasonal-naive). Day 10 is MISSING — the day-keyed join
    # must skip both its actual and its would-be forecast role.
    rev = {1: 10.0, 2: 12.0, 3: 9.0, 4: 11.0, 5: 15.0, 6: 8.0, 7: 13.0,
           8: 11.0, 9: 14.0, 11: 12.0, 12: 16.0, 13: 7.0, 14: 12.5}
    orders = (
        ["o_orderdate DATE", "o_totalprice DOUBLE"],
        [(f"2024-01-{d:02d}", v) for d, v in rev.items()],
    )
    out = _run({"orders": orders}, "q_forecast_eval")[0]
    cents = {d: round(v * 100) for d, v in rev.items()}
    pairs = [(cents[d], cents[d - 7]) for d in rev if d - 7 in cents]
    n = len(pairs)
    mape = sum(round(abs(a - f) / a * 1e6) for a, f in pairs) / n / 1e4
    bias = sum(f - a for a, f in pairs) / sum(a for a, _ in pairs) * 100
    assert out["n_days"] == n == 6  # day 10 absent, day 3->10 unused
    assert abs(out["mape_pct"] - mape) < 1e-4
    assert abs(out["bias_pct"] - bias) < 1e-4


def test_bm25_matches_brute_force():
    # Three docs, query terms fixed by the query itself
    # ("filter", "window", "stream"); Lucene BM25 replayed in Python.
    texts = {
        1: "the filter keeps the window open",
        2: "stream stream stream filter",
        3: "no match here at all",
    }
    docs = (
        ["doc_id BIGINT", "text VARCHAR", "lang VARCHAR",
         "source VARCHAR", "n_chars BIGINT"],
        [(i, t, "en", "web", len(t)) for i, t in texts.items()],
    )
    rows = _run({"documents": docs}, "q_bm25")
    toks = {i: t.split() for i, t in texts.items()}
    n_docs = len(texts)
    avgdl = sum(len(v) for v in toks.values()) / n_docs
    terms = ["filter", "window", "stream"]
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    exp = {}
    for i, v in toks.items():
        s = 0
        for t in terms:
            tf = v.count(t)
            if not tf:
                continue
            idf = math.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            c = idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(v) / avgdl))
            s += round(c * 1e6)
        if s:
            exp[i] = round(s / 1e6, 4)
    got = {r["doc_id"]: r["bm25"] for r in rows}
    assert got.keys() == exp.keys()
    for i in exp:
        assert abs(got[i] - exp[i]) < 1e-6


def test_backoff_lm_matches_brute_force():
    # Replay the whole Stupid-Backoff pipeline in pure Python: the
    # md5 80/20 split, train counts, and the three scoring branches
    # (seen bigram / backoff to unigram / OOV floor).
    import hashlib

    texts = {
        1: "the cat sat on the mat",
        2: "the dog sat on the rug",
        3: "a cat and a dog",
        4: "the mat and the rug",
        5: "on the mat sat a cat",
        6: "dog and cat and dog",
        # doc_ids 13/15/17 hash into the held-out 20% bucket — they
        # exercise the genuine backoff and OOV-floor branches.
        13: "the cat zzz qqq",
        15: "purple zzz the cat",
        17: "mat on rug on mat",
    }
    docs = (
        ["doc_id BIGINT", "text VARCHAR", "lang VARCHAR",
         "source VARCHAR", "n_chars BIGINT"],
        [(i, t, "en", "web", len(t)) for i, t in texts.items()],
    )
    rows = _run({"documents": docs}, "q_backoff_lm_score")

    def bucket(salt, key):
        h = hashlib.md5(f"{salt}:{key}".encode()).hexdigest()
        return int(h[:4], 16) % 1000

    is_old = {i: bucket("inc", i) % 10 < 8 for i in texts}
    assert not all(is_old.values()), "need at least one held-out doc"
    uni, bi = {}, {}
    for i, t in texts.items():
        if not is_old[i]:
            continue
        toks = t.split()
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    n = sum(uni.values())
    got = {r["doc_id"]: r for r in rows}
    for i, t in texts.items():
        toks = t.split()
        lps = []
        for a, b in zip(toks, toks[1:]):
            if (a, b) in bi:
                s = bi[(a, b)] / uni[a]
            elif b in uni:
                s = 0.4 * uni[b] / n
            else:
                s = 0.4 / n
            lps.append(round(math.log(s) * 10000))
        assert got[i]["n_bigrams"] == len(lps)
        assert got[i]["score_tenk"] == sum(lps)


def test_naive_bayes_matches_pure_python():
    # Replay the full NB train+score pipeline: md5 80/20 split, add-1
    # multinomial with the OOV floor 1/(tot+V), log-prior, argmax with
    # class-name tie-break. Feeds the whole _nb_scored cluster
    # (q_naive_bayes, q_nb_class_metrics, q_nb_calibration, q_mcnemar).
    # doc_ids 3/7/13 hash into the held-out bucket for salt 'nb'.
    texts = {
        1: ("web", "click buy cart buy"),
        2: ("web", "cart click deal"),
        4: ("web", "buy deal deal cart"),
        5: ("books", "read page chapter read"),
        6: ("books", "page read story"),
        8: ("books", "chapter story page page"),
        3: ("web", "buy cart unknowntok"),
        7: ("books", "read chapter story"),
        13: ("web", "deal deal read"),
    }
    docs = (
        ["doc_id BIGINT", "text VARCHAR", "lang VARCHAR",
         "source VARCHAR", "n_chars BIGINT"],
        [(i, t, "en", s, len(t)) for i, (s, t) in texts.items()],
    )
    rows = _run({"documents": docs}, "q_naive_bayes")

    train = {i: v for i, v in texts.items() if i in (1, 2, 4, 5, 6, 8)}
    test = {i: v for i, v in texts.items() if i in (3, 7, 13)}
    counts, totals, n_train = {}, {}, len(train)
    for _, (src, t) in train.items():
        for w in t.split():
            counts[(src, w)] = counts.get((src, w), 0) + 1
            totals[src] = totals.get(src, 0) + 1
    vocab = len({w for (_, w) in counts})
    classes = sorted(totals)
    prior = {
        s: round(math.log(
            sum(1 for v in train.values() if v[0] == s) / n_train) * 1e6)
        for s in classes
    }

    def lp(s, w):
        c = counts.get((s, w), 0)
        return round(math.log((c + 1.0) / (totals[s] + vocab)) * 1e6) if c \
            else round(math.log(1.0 / (totals[s] + vocab)) * 1e6)

    confusion = {}
    for i, (actual, t) in test.items():
        scores = {
            s: sum(lp(s, w) for w in t.split()) + prior[s] for s in classes
        }
        best = max(scores.values())
        pred = min(s for s in classes if scores[s] == best)  # name tiebreak
        confusion[(actual, pred)] = confusion.get((actual, pred), 0) + 1
    got = {(r["actual"], r["predicted"]): r["n"] for r in rows}
    assert got == confusion


def test_theil_sen_matches_brute_force():
    # Five months of revenue with one outlier month: the median of
    # the 10 pairwise slopes must shrug the outlier off.
    rev = {"2024-01": 100.0, "2024-02": 110.0, "2024-03": 9.0,  # outlier
           "2024-04": 130.0, "2024-05": 140.0}
    orders = (
        ["o_orderdate DATE", "o_totalprice DOUBLE"],
        [(f"{m}-15", v) for m, v in rev.items()],
    )
    out = _run({"orders": orders}, "q_theil_sen")[0]
    ms = {2024 * 12 + i + 1: round(v * 100)
          for i, v in enumerate(rev.values())}
    keys = sorted(ms)
    slopes = []
    for i, a in enumerate(keys):
        for b in keys[i + 1:]:
            slopes.append((ms[b] - ms[a]) / (b - a))
    slopes.sort()
    n = len(slopes)
    med = (slopes[(n + 1) // 2 - 1] + slopes[(n + 2) // 2 - 1]) / 2
    assert out["n_pairs"] == n == 10
    assert out["n_up"] == sum(1 for s in slopes if s > 0)
    assert out["n_down"] == sum(1 for s in slopes if s < 0)
    assert abs(out["slope_cents_per_month"] - med) < 1e-6


def test_acf_matches_brute_force():
    # Ten consecutive days with a period-2 alternating pattern:
    # even lags correlate positively, odd lags negatively.
    vals = [10.0, 20.0, 11.0, 21.0, 12.0, 22.0, 13.0, 23.0, 14.0, 24.0]
    orders = (
        ["o_orderdate DATE", "o_totalprice DOUBLE"],
        [(f"2024-01-{d + 1:02d}", v) for d, v in enumerate(vals)],
    )
    rows = _run({"orders": orders}, "q_acf")
    cents = [round(v * 100) for v in vals]
    n, s = len(cents), sum(cents)
    dv = [n * x - s for x in cents]
    den = sum(d * d for d in dv)
    got = {r["lag"]: r for r in rows}
    for k in [1, 2, 3, 4, 5, 6, 7]:
        num = sum(dv[t] * dv[t + k] for t in range(n - k))
        assert got[k]["n_pairs"] == n - k
        assert abs(got[k]["acf"] - num / den) < 1e-6
    assert 14 not in got and 30 not in got  # no pairs at those lags


def test_ewma_matches_brute_force():
    # 35 consecutive days: rows emit only where the full 30-day kernel
    # fits (days 29..34, 6 output rows); each is the truncated,
    # renormalized exponential convolution.
    vals = [100.0 + 7 * (d % 5) for d in range(35)]
    import datetime

    d0 = datetime.date(2024, 1, 1)
    orders = (
        ["o_orderdate DATE", "o_totalprice DOUBLE"],
        [((d0 + datetime.timedelta(days=d)).isoformat(), v)
         for d, v in enumerate(vals)],
    )
    rows = _run({"orders": orders}, "q_ewma")
    alpha, depth = 0.2, 30
    wgt = [round(alpha * (1 - alpha) ** k * 1_000_000_000)
           for k in range(depth)]
    cents = [round(v * 100) for v in vals]
    exp = {}
    for t in range(depth - 1, len(vals)):
        num = sum(cents[t - k] * wgt[k] for k in range(depth))
        exp[(d0 + datetime.timedelta(days=t)).isoformat()] = round(
            num / sum(wgt) / 100.0, 4
        )
    got = {str(r["day"]): r["ewma_revenue"] for r in rows}
    assert got.keys() == exp.keys() and len(got) == 6
    for k in exp:
        assert abs(got[k] - exp[k]) < 1e-6


def test_rolling_corr_matches_brute_force():
    # 32 consecutive ship days with co-moving revenue/quantity plus
    # noise; complete 30-day windows exist for the last 3 days.
    import datetime

    d0 = datetime.date(2024, 1, 1)
    days = [(d0 + datetime.timedelta(days=d)).isoformat() for d in range(32)]
    price = [10.0 + d + (3.0 if d % 7 == 0 else 0.0) for d in range(32)]
    qty = [5.0 + 2 * d + (d % 3) for d in range(32)]
    li = (
        ["l_shipdate DATE", "l_extendedprice DOUBLE", "l_quantity DOUBLE"],
        list(zip(days, price, qty)),
    )
    rows = _run({"lineitem": li}, "q_rolling_corr")
    x = [round(p * 100) for p in price]
    y = [round(q) for q in qty]

    def pearson(xs, ys):
        n = len(xs)
        num = n * sum(a * b for a, b in zip(xs, ys)) - sum(xs) * sum(ys)
        den = math.sqrt(
            (n * sum(a * a for a in xs) - sum(xs) ** 2)
            * (n * sum(b * b for b in ys) - sum(ys) ** 2)
        )
        return num / den

    exp = {
        days[t]: pearson(x[t - 29: t + 1], y[t - 29: t + 1])
        for t in range(29, 32)
    }
    got = {str(r["day"]): r["corr_30d"] for r in rows}
    assert got.keys() == exp.keys()
    for k in exp:
        assert abs(got[k] - exp[k]) < 1e-5


def test_seasonal_anomaly_matches_brute_force():
    # Three weeks of flat revenue with one shock day: only the shock
    # (and possibly its weekday-mean echo) can cross the 2-sigma gate.
    import datetime

    d0 = datetime.date(2024, 1, 1)  # a Monday
    vals = [100.0] * 21
    vals[10] = 400.0  # Thursday shock
    orders = (
        ["o_orderdate DATE", "o_totalprice DOUBLE"],
        [((d0 + datetime.timedelta(days=d)).isoformat(), v)
         for d, v in enumerate(vals)],
    )
    rows = _run({"orders": orders}, "q_seasonal_anomaly")
    cents = [round(v * 100) for v in vals]
    dow_sum, dow_n = {}, {}
    for d, c in enumerate(cents):
        dow_sum[d % 7] = dow_sum.get(d % 7, 0) + c
        dow_n[d % 7] = dow_n.get(d % 7, 0) + 1
    ratios = [
        1_000_000 * c * dow_n[d % 7] // dow_sum[d % 7]
        for d, c in enumerate(cents)
    ]
    n, s1 = len(ratios), sum(ratios)
    s2 = sum(r * r for r in ratios)
    sd = math.sqrt((n * s2 - s1 * s1) / (n * n))
    exp = {}
    for d, r in enumerate(ratios):
        z = round((r - s1 / n) / sd, 6)
        if abs(z) >= 2.0:
            exp[(d0 + datetime.timedelta(days=d)).isoformat()] = (r, z)
    got = {str(r["day"]): (r["ratio_e6"], r["z"]) for r in rows}
    assert got.keys() == exp.keys() and len(exp) >= 1
    for k, (r, z) in exp.items():
        assert got[k][0] == r
        assert abs(got[k][1] - z) < 1e-6


def test_peak_days_matches_brute_force():
    # Days 0..6 revenues with two local maxima; only the one clearing
    # 120% of the all-days mean survives. A gap at day 7 means day 8
    # has no left neighbor and cannot qualify however large.
    import datetime

    d0 = datetime.date(2024, 1, 1)
    series = {0: 100.0, 1: 180.0, 2: 90.0, 3: 105.0, 4: 101.0,
              5: 95.0, 6: 100.0, 8: 150.0, 9: 100.0}
    orders = (
        ["o_orderdate DATE", "o_totalprice DOUBLE"],
        [((d0 + datetime.timedelta(days=d)).isoformat(), v)
         for d, v in series.items()],
    )
    rows = _run({"orders": orders}, "q_peak_days")
    cents = {d: round(v * 100) for d, v in series.items()}
    tot, n = sum(cents.values()), len(cents)
    exp = {}
    for d, c in cents.items():
        if (d - 1) in cents and (d + 1) in cents \
                and c > cents[d - 1] and c > cents[d + 1] \
                and 100 * c * n > 120 * tot:
            exp[(d0 + datetime.timedelta(days=d)).isoformat()] = (
                c, 100 * c * n // tot
            )
    got = {str(r["day"]): (r["rev_c"], r["pct_of_mean"]) for r in rows}
    # day 1 (180) is a local max clearing the 120%-of-mean floor ->
    # kept; day 3 is a local max but below the floor; day 8 (150,
    # above the floor) has no left neighbor -> correctly disqualified
    # by the calendar-gap rule.
    assert list(exp) == [(d0 + datetime.timedelta(days=1)).isoformat()]
    assert got == exp


def test_doclen_hist_matches_brute_force():
    # Token counts 1..9 across two langs -> log2 buckets 0..3 with
    # exact min/max/sum per (lang, bucket); empty docs dropped.
    texts = [("en", "a"), ("en", "a b"), ("en", "a b c"),
             ("en", "a b c d e"), ("fr", "x y z w"),
             ("fr", " ".join("t" * 1 for _ in range(9))), ("fr", "")]
    docs = (
        ["doc_id BIGINT", "text VARCHAR", "lang VARCHAR",
         "source VARCHAR", "n_chars BIGINT"],
        [(i, t, l, "web", len(t)) for i, (l, t) in enumerate(texts)],
    )
    rows = _run({"documents": docs}, "q_doclen_hist")
    exp = {}
    for l, t in texts:
        n = len([w for w in t.split(" ") if w])
        if n == 0:
            continue
        b = n.bit_length() - 1
        k = (l, b)
        c, mn, mx, sm = exp.get(k, (0, 10**9, 0, 0))
        exp[k] = (c + 1, min(mn, n), max(mx, n), sm + n)
    got = {
        (r["lang"], r["log2_tokens"]): (
            r["n_docs"], r["min_tokens"], r["max_tokens"], r["sum_tokens"]
        )
        for r in rows
    }
    assert got == exp


def test_winnow_fingerprint_matches_pure_python():
    # Schleimer-style winnowing (k=5 char-grams, window w=4, min hash,
    # dedupe) replayed with hashlib over hand texts, including one
    # shorter than k (no grams -> 0 fingerprints).
    import hashlib

    texts = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "abcdefabcdefabcdef",
        3: "tiny",  # len < 5 -> no 5-grams
    }
    docs = (
        ["doc_id BIGINT", "text VARCHAR", "lang VARCHAR",
         "source VARCHAR", "n_chars BIGINT"],
        [(i, t, "en", "web", len(t)) for i, t in texts.items()],
    )
    rows = _run({"documents": docs}, "q_winnow_fingerprint")
    got = {r["doc_id"]: r for r in rows}
    for i, t in texts.items():
        lt = t.lower()
        hs = [hashlib.md5(lt[p:p + 5].encode()).hexdigest()
              for p in range(len(lt) - 4)]
        fps = []
        for j in range(max(0, len(hs) - 3)):
            m = min(hs[j:j + 4])
            if m not in fps:
                fps.append(m)
        assert got[i]["n_fp"] == len(fps)
        if fps:
            digest = hashlib.md5("".join(sorted(fps)).encode()).hexdigest()
            assert got[i]["fp_digest"] == digest
        else:
            # No grams (len < k): both engines emit NULL, not md5('').
            assert got[i]["fp_digest"] is None


def test_tfidf_topk_matches_brute_force():
    # Three docs; idf = ln(N/df); top-3 per doc with (score desc,
    # term) tie-break.
    texts = {
        1: "spark spark shuffle join",
        2: "spark join window",
        3: "window window agg agg agg",
    }
    docs = (
        ["doc_id BIGINT", "text VARCHAR", "lang VARCHAR",
         "source VARCHAR", "n_chars BIGINT"],
        [(i, t, "en", "web", len(t)) for i, t in texts.items()],
    )
    rows = _run({"documents": docs}, "q_tfidf_topk")
    tf = {}
    for i, t in texts.items():
        for w in t.split():
            tf[(i, w)] = tf.get((i, w), 0) + 1
    df = {}
    for (_, w) in tf:
        df[w] = df.get(w, 0) + 1
    n = len(texts)
    exp = {}
    for i in texts:
        scores = sorted(
            ((round(c * math.log(n / df[w]), 6), w)
             for (d, w), c in tf.items() if d == i),
            key=lambda p: (-p[0], p[1]),
        )[:3]
        exp[i] = [(w, s) for s, w in scores]
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], []).append((r["term"], r["score"]))
    for i in exp:
        assert [w for w, _ in got[i]] == [w for w, _ in exp[i]]
        for (wg, sg), (we, se) in zip(got[i], exp[i]):
            assert abs(sg - se) < 1e-6


def test_lang_id_matches_brute_force():
    # Stopword-hit argmax with (score desc, lang) tie-break, replayed
    # against the shared STOPWORDS table — including an all-zero doc
    # (falls to the alphabetically first language) and an en/fr tie.
    from mapreduce_server_development_spark.functions.text import STOPWORDS

    texts = {
        1: "the cat and the dog",            # en wins (3 hits)
        2: "le chat et la maison est ici",   # fr wins (4 hits)
        3: "qqq www zzz",                    # 0 hits -> 'de' (alpha first)
        4: "the le",                         # 1-1 en/fr tie -> 'en' < 'fr'
    }
    docs = (
        ["doc_id BIGINT", "text VARCHAR", "lang VARCHAR",
         "source VARCHAR", "n_chars BIGINT"],
        [(i, t, "xx", "web", len(t)) for i, t in texts.items()],
    )
    rows = _run({"documents": docs}, "q_lang_id")
    got = {r["doc_id"]: (r["lang_pred"], r["score"]) for r in rows}
    for i, t in texts.items():
        toks = t.split()
        scores = {
            lang: sum(1 for w in toks if w in words)
            for lang, words in STOPWORDS.items()
        }
        best = max(scores.values())
        pred = min(l for l, s in scores.items() if s == best)
        assert got[i] == (pred, best), (i, got[i], pred, best)


# ---------------------------------------------------------------------------
# Round-7 wave: remaining oracle-only formula queries
# ---------------------------------------------------------------------------


def _rnd_half_away(x: float) -> int:
    """DuckDB/Spark ROUND: half away from zero (Python round() banks)."""
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_ipf_raking_matches_pure_python():
    """3-round IPF on the type x dow grid: replay row/column scaling
    literally in Python and compare weights + reweighted counts."""
    from mapreduce_server_development_spark.plans.sampling import _IPF_ITERS

    # 2 types over Mon(2024-01-01), Tue, Wed with skewed counts.
    rows = []
    counts = {("click", 0): 6, ("click", 1): 2, ("click", 2): 4,
              ("view", 0): 1, ("view", 1): 5, ("view", 2): 3}
    day = {0: "2024-01-01", 1: "2024-01-02", 2: "2024-01-03"}
    for (t, d), m in counts.items():
        for i in range(m):
            rows.append((f"{day[d]} 0{i}:00:00", 1, t, 1.0))
    out = _run({"events": _events_ts(rows)}, "q_ipf_raking")

    cells = {k: [m, 1.0] for k, m in counts.items()}
    total = sum(counts.values())
    types = {t for t, _ in counts}
    dows = {d for _, d in counts}
    rt, ct = total / len(types), total / len(dows)
    for _ in range(_IPF_ITERS):
        for t in types:
            s = sum(m * w for (tt, _), (m, w) in cells.items() if tt == t)
            for k in cells:
                if k[0] == t:
                    cells[k][1] *= rt / s
        for d in dows:
            s = sum(m * w for (_, dd), (m, w) in cells.items() if dd == d)
            for k in cells:
                if k[1] == d:
                    cells[k][1] *= ct / s
    got = {(r["event_type"], r["dow"]): r for r in out}
    assert set(got) == set(cells)
    for k, (m, w) in cells.items():
        assert got[k]["n_events"] == m
        assert abs(got[k]["weight"] - w) < 1e-6, k
        assert abs(got[k]["weighted_count"] - m * w) < 0.01, k
    # raking must actually hit the margins: each row/col weighted sum
    # ~ its uniform target after 3 rounds on this small grid
    for d in dows:
        s = sum(m * w for (_, dd), (m, w) in cells.items() if dd == d)
        assert abs(s - ct) < 1e-6  # column scale ran last -> exact


def test_ks_test_matches_brute_force():
    """Two-sample KS D-stat vs a literal ECDF scan."""
    click = [1.0, 2.0, 2.0, 3.5, 7.25, 9.0]
    view = [0.5, 2.0, 4.0, 4.0, 8.0]
    rows = [(u, "click", v) for u, v in enumerate(click)]
    rows += [(u, "view", v) for u, v in enumerate(view)]
    rows += [(99, "purchase", 100.0)]  # filtered out by the query
    out = _run({"events": _events(rows)}, "q_ks_test")[0]

    n1, n2 = len(click), len(view)
    grid = sorted(set(click) | set(view))
    d = max(
        abs(sum(1 for x in click if x <= g) / n1
            - sum(1 for x in view if x <= g) / n2)
        for g in grid
    )
    crit = 1.358 * math.sqrt((n1 + n2) / (n1 * n2))
    assert out["n1"] == n1 and out["n2"] == n2
    assert abs(out["d_stat"] - d) < 1e-6
    assert abs(out["crit_05"] - crit) < 1e-6
    assert out["reject_05"] == (d > crit)


def test_kaplan_meier_matches_brute_force():
    """KM product-limit estimator vs a literal risk-set walk,
    including right-censoring at the corpus max timestamp."""
    # (user, birth_day, death_day or None); one 'signup' event at
    # birth, one 'purchase' at death. Corpus max ts = day 9.
    users = [(1, 0, 3), (2, 0, 5), (3, 0, None), (4, 1, 3),
             (5, 2, None), (6, 0, 3), (7, 3, 9)]
    rows = []
    for u, b, d in users:
        rows.append((f"2024-01-{b+1:02d} 00:00:00", u, "signup", 1.0))
        if d is not None:
            rows.append((f"2024-01-{d+1:02d} 00:00:00", u, "purchase", 1.0))
    out = _run({"events": _events_ts(rows)}, "q_kaplan_meier")

    mx = max(d if d is not None else b for _, b, d in users)  # max event day
    durs = [((d - b) if d is not None else (mx - b),
             1 if d is not None else 0) for _, b, d in users]
    day_tbl = {}
    for day, obs in durs:
        dd = day_tbl.setdefault(day, [0, 0])
        dd[0] += obs
        dd[1] += 1 - obs
    s, risk, expect = 1.0, len(users), []
    for day in sorted(day_tbl):
        deaths, cens = day_tbl[day]
        if deaths > 0:
            s = s * (risk - deaths) / risk
            expect.append((day, risk, deaths, round(s, 6)))
        risk -= deaths + cens
    got = [(r["day"], r["at_risk"], r["deaths"], r["survival"]) for r in out]
    assert got == [(d, r, de, pytest.approx(sv, abs=1e-6))
                   for d, r, de, sv in expect]


def test_weighted_median_matches_brute_force():
    """Smallest value whose cumulative weight reaches half the total."""
    vals = [(10.00, 1), (20.00, 2), (30.00, 4), (40.00, 1)]
    cols = ["l_extendedprice DOUBLE", "l_quantity DOUBLE"]
    rows = [(v, float(w)) for v, w in vals]
    out = _run({"lineitem": (cols, rows)}, "q_weighted_median")[0]

    tot = sum(w for _, w in vals)
    cum = 0
    med = None
    for v, w in sorted(vals):
        cum += w
        if 2 * cum >= tot:
            med = v
            break
    assert out["total_weight"] == tot
    assert abs(out["weighted_median"] - med) < 1e-9


def test_mutual_info_matches_brute_force():
    """I(type; hour) with the per-cell e6 micro-nat rounding replayed
    literally (round each cell log FIRST, integer-weight, floor-div)."""
    # Strong dependence: clicks at hour 1, views at hour 2, some mix.
    counts = {("click", 1): 8, ("click", 2): 2,
              ("view", 1): 3, ("view", 2): 7}
    rows = []
    for (t, h), m in counts.items():
        for i in range(m):
            rows.append((f"2024-01-0{(i % 5) + 1} 0{h}:00:00", 1, t, 1.0))
    out = _run({"events": _events_ts(rows)}, "q_mutual_info")[0]

    n = sum(counts.values())
    nx = {}
    ny = {}
    for (t, h), m in counts.items():
        nx[t] = nx.get(t, 0) + m
        ny[h] = ny.get(h, 0) + m
    def tdiv(a: int, b: int) -> int:
        """SQL integer division truncates toward zero (both engines);
        Python // floors — off by one on negative entropy sums."""
        q, r = divmod(a, b)
        return q + 1 if r != 0 and (a < 0) != (b < 0) else q

    mi = tdiv(sum(
        m * _rnd_half_away(math.log(m * n / (nx[t] * ny[h])) * 1e6)
        for (t, h), m in counts.items()
    ), n)
    hx = -tdiv(sum(c * _rnd_half_away(math.log(c / n) * 1e6)
                   for c in nx.values()), n)
    hy = -tdiv(sum(c * _rnd_half_away(math.log(c / n) * 1e6)
                   for c in ny.values()), n)
    nmi = tdiv(2000000 * mi, hx + hy)
    assert out["mi_e6"] == mi
    assert out["h_type_e6"] == hx
    assert out["h_hour_e6"] == hy
    assert out["nmi_e6"] == nmi


def test_pareto_share_matches_brute_force():
    """Top-1/5/10% revenue shares vs a literal sort-and-sum."""
    totals = [100.0, 50.0, 25.0, 12.0, 6.0, 3.0, 2.0, 1.5, 1.0, 0.5,
              0.25, 0.2, 0.15, 0.1, 0.05]  # 15 customers, heavy head
    cols = ["o_orderkey BIGINT", "o_custkey BIGINT", "o_totalprice DOUBLE"]
    rows = [(i, i, v) for i, v in enumerate(totals)]
    out = _run({"orders": (cols, rows)}, "q_pareto_share")[0]

    cents = sorted((round(v * 100) for v in totals), reverse=True)
    n, tot = len(cents), sum(cents)
    assert out["n_customers"] == n
    assert abs(out["total_revenue"] - tot / 100.0) < 1e-9
    for p in (1, 5, 10):
        k = (p * n + 99) // 100  # ceil(p*n/100)
        share = sum(cents[:k]) / tot
        assert abs(out[f"share_top{p}pct"] - share) < 1e-6, p


def test_trimmed_mean_matches_brute_force():
    """5%-per-tail trimmed + winsorized means vs the literal cut."""
    totals = [1000.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0,
              10.0, 11.0, 12.0, 13.0, 14.0, 15.0, 16.0, 17.0, 18.0,
              19.0, 20.0, 21.0, 22.0, 23.0, 24.0, 25.0, 26.0, 27.0,
              28.0, 29.0, 30.0, 31.0, 32.0, 33.0, 34.0, 35.0, 36.0,
              37.0, 38.0, 0.01]  # n=40 -> k=2 per tail
    cols = ["o_orderkey BIGINT", "o_custkey BIGINT", "o_totalprice DOUBLE"]
    rows = [(i, i, v) for i, v in enumerate(totals)]
    out = _run({"orders": (cols, rows)}, "q_trimmed_mean")[0]

    cents = sorted(round(v * 100) for v in totals)
    n = len(cents)
    k = 5 * n // 100
    mid = cents[k:n - k]
    v_lo, v_hi = cents[k], cents[n - k - 1]
    tmean = sum(mid) / len(mid) / 100.0
    wmean = (sum(mid) + k * v_lo + k * v_hi) / n / 100.0
    assert out["n"] == n and out["k_trim"] == k
    assert abs(out["trimmed_mean"] - tmean) < 1e-6
    assert abs(out["winsorized_mean"] - wmean) < 1e-6


def test_wilson_returns_matches_brute_force():
    """Wilson lower bound ranking vs the textbook formula."""
    # 3 suppliers past min support, 1 below it. (n, k) per supplier.
    sups = {1: (25, 20), 2: (300, 200), 3: (40, 3), 4: (4, 3)}
    cols = ["l_suppkey BIGINT", "l_returnflag VARCHAR"]
    rows = []
    for s, (n, k) in sups.items():
        rows += [(s, "R")] * k + [(s, "N")] * (n - k)
    out = _run({"lineitem": (cols, rows)}, "q_wilson_returns")

    z, z2 = 1.96, 1.96 * 1.96

    def lb(n, k):
        p = k / n
        return round((p + z2 / (2 * n)
                      - z * math.sqrt((p * (1 - p) + z2 / (4 * n)) / n))
                     / (1 + z2 / n), 6)

    expect = sorted(
        ((s, n, k, round(k / n, 6), lb(n, k))
         for s, (n, k) in sups.items() if n >= 20),
        key=lambda r: (-r[4], r[0]),
    )
    got = [(r["suppkey"], r["n"], r["k"], r["p_hat"], r["wilson_lb"])
           for r in out]
    assert [g[0] for g in got] == [e[0] for e in expect]
    for g, e in zip(got, expect):
        assert g[:3] == e[:3]
        assert abs(g[3] - e[3]) < 1e-6
        assert abs(g[4] - e[4]) < 1e-6


def test_psi_matches_brute_force():
    """PSI between eras with the log-bin + Laplace smoothing + nano
    per-bin rounding replayed literally."""
    pre = [1.0, 2.0, 3.0, 50.0, 51.0, 52.0, 400.0]
    post = [1.0, 2.5, 60.0, 61.0, 500.0, 510.0, 520.0, 530.0]
    cols = ["o_orderkey BIGINT", "o_custkey BIGINT",
            "o_totalprice DOUBLE", "o_orderdate DATE"]
    rows = [(i, i, v, "1994-01-01") for i, v in enumerate(pre)]
    rows += [(100 + i, i, v, "1996-01-01") for i, v in enumerate(post)]
    out = _run({"orders": (cols, rows)}, "q_psi")[0]

    def bin_id(cents):
        if cents < 8:
            return cents
        bl = cents.bit_length()
        return bl * 8 + ((cents >> (bl - 4)) & 7)

    bins = {}
    for v in pre:
        b = bins.setdefault(bin_id(round(v * 100)), [0, 0])
        b[0] += 1
    for v in post:
        b = bins.setdefault(bin_id(round(v * 100)), [0, 0])
        b[1] += 1
    nb = len(bins)
    ta, tb = len(pre), len(post)
    total = 0
    for na, nbn in bins.values():
        pa = (na + 1.0) / (ta + nb)
        pb = (nbn + 1.0) / (tb + nb)
        total += _rnd_half_away((pa - pb) * math.log(pa / pb) * 1e9)
    assert out["n_bins"] == nb
    assert out["t_a"] == ta and out["t_b"] == tb
    assert abs(out["psi"] - total / 1e9) < 1e-6


def test_hhi_matches_brute_force():
    """Per-nation HHI + effective supplier count from exact e4 money."""
    # nation 0: near-monopoly; nation 1: even duopoly.
    li = {  # suppkey -> (price, discount) lineitems
        1: [(100.00, 0.00), (200.00, 0.10)],
        2: [(10.00, 0.00)],
        3: [(50.00, 0.05)],
        4: [(50.00, 0.05)],
    }
    sup_nation = {1: 0, 2: 0, 3: 1, 4: 1}
    lcols = ["l_suppkey BIGINT", "l_extendedprice DOUBLE",
             "l_discount DOUBLE"]
    lrows = [(s, p, d) for s, items in li.items() for p, d in items]
    scols = ["s_suppkey BIGINT", "s_nationkey BIGINT"]
    srows = [(s, n) for s, n in sup_nation.items()]
    ncols = ["n_nationkey BIGINT", "n_name VARCHAR"]
    nrows = [(0, "ALPHA"), (1, "BETA")]
    out = _run(
        {"lineitem": (lcols, lrows), "supplier": (scols, srows),
         "nation": (ncols, nrows)},
        "q_hhi_concentration",
    )

    # exact e4 revenue: price_e2 * (100 - discount_e2)
    r_e4 = {
        s: sum(round(p * 100) * (100 - round(d * 100)) for p, d in items)
        for s, items in li.items()
    }
    by_nation = {}
    for s, nat in sup_nation.items():
        by_nation.setdefault(nat, []).append(r_e4[s])
    got = {r["n_name"]: r for r in out}
    names = {0: "ALPHA", 1: "BETA"}
    for nat, revs in by_nation.items():
        r, rr = sum(revs), sum(x * x for x in revs)
        g = got[names[nat]]
        assert g["n_suppliers"] == len(revs)
        assert abs(g["revenue"] - r / 1e4) < 0.01
        assert abs(g["hhi"] - rr / (r * r)) < 1e-6
        assert abs(g["effective_suppliers"] - (r * r) / rr) < 1e-6
    # duopoly sanity: BETA hhi = 0.5, effective = 2
    assert abs(got["BETA"]["hhi"] - 0.5) < 1e-6


def test_lorenz_deciles_matches_brute_force():
    """Decile binning by rank + cumulative shares vs a literal walk."""
    totals = [float(10 * (i + 1)) for i in range(23)]  # 23 customers
    cols = ["o_orderkey BIGINT", "o_custkey BIGINT", "o_totalprice DOUBLE"]
    rows = [(i, i, v) for i, v in enumerate(totals)]
    out = _run({"orders": (cols, rows)}, "q_lorenz_deciles")

    revs = sorted((round(v * 100), c) for c, v in enumerate(totals))
    n = len(revs)
    dec = {}
    for rn0, (cents, _) in enumerate(revs):
        d = 1 + (rn0 * 10) // n
        dd = dec.setdefault(d, [0, 0])
        dd[0] += 1
        dd[1] += cents
    tot = sum(v for v, _ in revs)
    cum = 0
    expect = {}
    for d in sorted(dec):
        nc, rev = dec[d]
        cum += rev
        expect[d] = (nc, rev, 100.0 * rev / tot, 100.0 * cum / tot)
    got = {r["decile"]: r for r in out}
    assert set(got) == set(expect)
    for d, (nc, rev, share, cshare) in expect.items():
        g = got[d]
        assert g["n_customers"] == nc
        assert abs(g["revenue"] - rev / 100.0) < 0.01
        assert abs(g["share_pct"] - share) < 1e-6
        assert abs(g["cum_share_pct"] - cshare) < 1e-6


def test_bh_discoveries_matches_brute_force():
    """BH step-up over per-supplier z-tests, with the A&S 26.2.17
    normal-tail polynomial replayed literally."""
    # suppliers: (n, k returns). Two clearly elevated, rest at base.
    sups = {1: (50, 30), 2: (40, 25), 3: (60, 6), 4: (55, 5),
            5: (45, 4), 6: (80, 8), 7: (10, 9)}  # 7 below min_n=20
    cols = ["l_suppkey BIGINT", "l_returnflag VARCHAR"]
    rows = []
    for s, (n, k) in sups.items():
        rows += [(s, "R")] * k + [(s, "N")] * (n - k)
    out = _run({"lineitem": (cols, rows)}, "q_bh_discoveries")[0]

    kept = {s: nk for s, nk in sups.items() if nk[0] >= 20}
    p0 = sum(k for _, k in kept.values()) / sum(n for n, _ in kept.values())
    m = len(kept)

    def q_tail(z):
        t = 1.0 / (1.0 + 0.2316419 * abs(z))
        q = (math.exp(-z * z / 2.0) * 0.3989422804014327
             * (((((1.330274429 * t - 1.821255978) * t + 1.781477937)
                  * t - 0.356563782) * t + 0.319381530) * t))
        return q if z >= 0 else 1.0 - q

    pvals = []
    for s, (n, k) in kept.items():
        z = (k / n - p0) / math.sqrt(p0 * (1 - p0) / n)
        pvals.append((q_tail(z), s))
    pvals.sort()
    thr = 0
    for rn, (p, _) in enumerate(pvals, 1):
        if p <= rn * 0.05 / m:
            thr = rn
    n_disc = thr
    n_raw = sum(1 for p, _ in pvals if p <= 0.05)
    max_p = max((p for p, _ in pvals[:thr]), default=0.0)
    assert out["m_tests"] == m
    assert abs(out["pooled_rate"] - p0) < 1e-6
    assert out["n_discoveries"] == n_disc
    assert out["n_raw_sig"] == n_raw
    assert abs(out["max_p_rejected"] - max_p) < 1e-6
    assert n_disc >= 2  # the two elevated suppliers must be found


def test_cohens_kappa_matches_brute_force():
    """Two heuristic raters (long-token vs repetitive) vs literal
    agreement counting."""
    texts = {
        1: "alpha beta gamma delta",            # long toks, all distinct
        2: "aa aa aa aa bb",                    # short, repetitive
        3: "elephantine magnificent wonderful", # long, distinct
        4: "to be or not to be",                # short, some repeats
        5: "xx yy zz xx yy zz",                 # short, repetitive
    }
    docs = (
        ["doc_id BIGINT", "text VARCHAR", "lang VARCHAR",
         "source VARCHAR", "n_chars BIGINT"],
        [(i, t, "en", "s", len(t)) for i, t in texts.items()],
    )
    out = _run({"documents": docs}, "q_cohens_kappa")[0]

    n11 = n10 = n01 = n00 = 0
    for t in texts.values():
        toks = [w for w in t.lower().split(" ") if w]
        a = 1 if 5 * len(toks) <= sum(len(w) for w in toks) else 0
        b = 1 if 2 * len(set(toks)) >= len(toks) else 0
        n11 += a * b
        n10 += a * (1 - b)
        n01 += (1 - a) * b
        n00 += (1 - a) * (1 - b)
    n = n11 + n10 + n01 + n00
    po = (n11 + n00) / n
    pe = ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) / (n * n)
    assert out["n11"] == n11 and out["n10"] == n10
    assert out["n01"] == n01 and out["n00"] == n00
    assert abs(out["po"] - po) < 1e-6
    assert abs(out["pe"] - pe) < 1e-6
    assert abs(out["kappa"] - (po - pe) / (1 - pe)) < 1e-4


def _nb_replay():
    """The shared NB train+score replay (same fixture as
    test_naive_bayes_matches_pure_python) -> (texts, preds, scores)."""
    texts = {
        1: ("web", "click buy cart buy"),
        2: ("web", "cart click deal"),
        4: ("web", "buy deal deal cart"),
        5: ("books", "read page chapter read"),
        6: ("books", "page read story"),
        8: ("books", "chapter story page page"),
        3: ("web", "buy cart unknowntok"),
        7: ("books", "read chapter story"),
        13: ("web", "deal deal read"),
    }
    train = {i: v for i, v in texts.items() if i in (1, 2, 4, 5, 6, 8)}
    test = {i: v for i, v in texts.items() if i in (3, 7, 13)}
    counts, totals, n_train = {}, {}, len(train)
    for _, (src, t) in train.items():
        for w in t.split():
            counts[(src, w)] = counts.get((src, w), 0) + 1
            totals[src] = totals.get(src, 0) + 1
    vocab = len({w for (_, w) in counts})
    classes = sorted(totals)
    prior = {
        s: round(math.log(
            sum(1 for v in train.values() if v[0] == s) / n_train) * 1e6)
        for s in classes
    }

    def lp(s, w):
        c = counts.get((s, w), 0)
        return round(math.log((c + 1.0) / (totals[s] + vocab)) * 1e6) if c \
            else round(math.log(1.0 / (totals[s] + vocab)) * 1e6)

    preds, scores = {}, {}
    for i, (actual, t) in test.items():
        sc = {s: sum(lp(s, w) for w in t.split()) + prior[s]
              for s in classes}
        best = max(sc.values())
        preds[i] = min(s for s in classes if sc[s] == best)
        scores[i] = sc
    maj_counts = {}
    for src, _ in train.values():
        maj_counts[src] = maj_counts.get(src, 0) + 1
    maj = sorted(maj_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
    return texts, test, preds, scores, maj, classes


def _nb_docs_table():
    texts = _nb_replay()[0]
    return (
        ["doc_id BIGINT", "text VARCHAR", "lang VARCHAR",
         "source VARCHAR", "n_chars BIGINT"],
        [(i, t, "en", s, len(t)) for i, (s, t) in texts.items()],
    )


def test_mcnemar_matches_pure_python():
    """McNemar discordant-pair test of NB vs the majority baseline,
    both predictions replayed in pure Python."""
    out = _run({"documents": _nb_docs_table()}, "q_mcnemar")[0]
    _, test, preds, _, maj, _ = _nb_replay()
    b = sum(1 for i, (a, _) in test.items()
            if preds[i] == a and maj != a)
    c = sum(1 for i, (a, _) in test.items()
            if preds[i] != a and maj == a)
    chi2 = ((abs(b - c) - 1.0) ** 2 / (b + c)) if (b + c) else 0.0
    assert out["baseline_class"] == maj
    assert out["n_test"] == len(test)
    assert out["nb_only_correct"] == b
    assert out["base_only_correct"] == c
    assert abs(out["mcnemar_chi2"] - chi2) < 1e-6
    assert b + c > 0  # fixture must exercise the discordant path


def test_nb_auc_matches_pure_python():
    """One-vs-rest tie-aware rank AUC for the alphabetically-first
    class, from the replayed integer NB scores."""
    out = _run({"documents": _nb_docs_table()}, "q_nb_auc")[0]
    _, test, _, scores, _, classes = _nb_replay()
    cls = min(classes)
    pairs = [(scores[i][cls], 1 if a == cls else 0)
             for i, (a, _) in test.items()]
    np_ = sum(p for _, p in pairs)
    nn = len(pairs) - np_
    ranks = _midranks([s for s, _ in pairs])
    auc = (sum(ranks[s] for s, p in pairs if p)
           - np_ * (np_ + 1) / 2) / (np_ * nn)
    assert out["target_class"] == cls
    assert out["n_pos"] == np_ and out["n_neg"] == nn
    assert abs(out["auc"] - auc) < 1e-6


def test_zipf_fit_matches_brute_force():
    """OLS of ln(freq) on ln(rank) over the e6 integer log cells."""
    words = (["alpha"] * 40 + ["beta"] * 20 + ["gamma"] * 10
             + ["delta"] * 5 + ["eps"] * 3 + ["zeta"] * 2 + ["eta"])
    docs = (
        ["doc_id BIGINT", "text VARCHAR", "lang VARCHAR",
         "source VARCHAR", "n_chars BIGINT"],
        [(1, " ".join(words), "en", "s", 1)],
    )
    out = _run({"documents": docs}, "q_zipf_fit")[0]

    freqs = {}
    for w in words:
        freqs[w] = freqs.get(w, 0) + 1
    ranked = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))
    cells = [(_rnd_half_away(math.log(rk) * 1e6),
              _rnd_half_away(math.log(f) * 1e6))
             for rk, (_, f) in enumerate(ranked, 1)]
    n = len(cells)
    sx = float(sum(x for x, _ in cells))
    sy = float(sum(y for _, y in cells))
    sxx = float(sum(x * x for x, _ in cells))
    syy = float(sum(y * y for _, y in cells))
    sxy = float(sum(x * y for x, y in cells))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n / 1e6
    r2 = ((n * sxy - sx * sy) ** 2
          / ((n * sxx - sx * sx) * (n * syy - sy * sy)))
    assert out["n_terms"] == n == 7
    assert abs(out["slope"] - slope) < 1e-6
    assert abs(out["intercept_ln"] - intercept) < 1e-6
    assert abs(out["r2"] - r2) < 1e-6
    assert out["slope"] < 0  # Zipf decays


def test_heaps_law_matches_brute_force():
    """Cumulative vocab-vs-words per doc_id decile + the beta fit."""
    texts = {
        1: "a b c d", 2: "a b e f", 3: "a g h c", 4: "i j a b",
        5: "k a b c", 6: "l m n a", 7: "a b o p", 8: "q r s t",
        9: "a u v b", 10: "w x y z",
    }
    docs = (
        ["doc_id BIGINT", "text VARCHAR", "lang VARCHAR",
         "source VARCHAR", "n_chars BIGINT"],
        [(i, t, "en", "s", len(t)) for i, t in texts.items()],
    )
    rows = _run({"documents": docs}, "q_heaps_law")

    ids = sorted(texts)
    nd = len(ids)
    dec_of = {d: (10 * rk0) // nd + 1 for rk0, d in enumerate(ids)}
    words, first_dec = {}, {}
    for d in ids:
        toks = texts[d].split()
        dec = dec_of[d]
        words[dec] = words.get(dec, 0) + len(toks)
        for t in toks:
            if t not in first_dec:
                first_dec[t] = dec
            else:
                first_dec[t] = min(first_dec[t], dec)
    # (doc order == dec order here, so first-seen == min-dec)
    cells = []
    wc = vc = 0
    for dec in sorted(words):
        wc += words[dec]
        vc += sum(1 for t, dd in first_dec.items() if dd == dec)
        cells.append((dec, wc, vc))
    n = len(cells)
    pts = [(_rnd_half_away(math.log(w) * 1e6),
            _rnd_half_away(math.log(v) * 1e6)) for _, w, v in cells]
    sx = float(sum(x for x, _ in pts))
    sy = float(sum(y for _, y in pts))
    sxx = float(sum(x * x for x, _ in pts))
    sxy = float(sum(x * y for x, y in pts))
    beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    got = [(r["decile"], r["words_cum"], r["vocab_cum"]) for r in rows]
    assert got == cells
    for r in rows:
        assert abs(r["heaps_beta"] - beta) < 1e-6
    assert 0 < beta < 1  # sublinear vocabulary growth


def test_readability_matches_brute_force():
    """Flesch reading ease from literal word/sentence/syllable counts
    (vowel-group heuristic, min 1 per word)."""
    texts = {
        1: ("s1", "the cat sat. the dog ran!"),
        2: ("s1", "incomprehensibility is extraordinary?"),
        3: ("s2", "go. go. go."),
    }
    docs = (
        ["doc_id BIGINT", "text VARCHAR", "lang VARCHAR",
         "source VARCHAR", "n_chars BIGINT"],
        [(i, t, "en", s, len(t)) for i, (s, t) in texts.items()],
    )
    rows = _run({"documents": docs}, "q_readability")

    def syll(word):
        cnt = 0
        prev = False
        for ch in word:
            v = ch in "aeiouy"
            if v and not prev:
                cnt += 1
            prev = v
        return max(1, cnt)

    per_src = {}
    for _, (src, t) in texts.items():
        toks = [w for w in t.lower().split(" ") if w]
        sents = max(1, sum(t.count(c) for c in ".!?"))
        agg = per_src.setdefault(src, [0, 0, 0, 0])
        agg[0] += 1
        agg[1] += len(toks)
        agg[2] += sents
        agg[3] += sum(syll(w) for w in toks)
    got = {r["source"]: r for r in rows}
    for src, (ndoc, nw, ns, nsy) in per_src.items():
        g = got[src]
        assert (g["n_docs"], g["n_words"], g["n_sents"], g["n_syll"]) \
            == (ndoc, nw, ns, nsy)
        flesch = 206.835 - 1.015 * nw / ns - 84.6 * nsy / nw
        assert abs(g["flesch"] - flesch) < 1e-4


def test_conversion_lag_matches_brute_force():
    """Signup->purchase lag p50/p90 via the shared linear-interpolated
    order statistics, replayed literally."""
    # users 1..7 convert with lag = u hours; 8 has purchase BEFORE
    # signup (excluded); 9 never converts.
    rows = []
    for u in range(1, 8):
        rows.append((f"2024-01-01 00:00:00", u, "signup", 1.0))
        rows.append((f"2024-01-01 {u:02d}:00:00", u, "purchase", 1.0))
    rows.append(("2024-01-02 00:00:00", 8, "signup", 1.0))
    rows.append(("2024-01-01 05:00:00", 8, "purchase", 1.0))
    rows.append(("2024-01-03 00:00:00", 9, "signup", 1.0))
    out = _run({"events": _events_ts(rows)}, "q_conversion_lag")[0]

    lags_h = sorted(float(u) for u in range(1, 8))
    n = len(lags_h)

    def pctl(q):
        pos = (n - 1) * q
        lo = lags_h[math.floor(pos)]
        hi = lags_h[min(math.floor(pos) + 1, n - 1)]
        return lo + (hi - lo) * (pos - math.floor(pos))

    assert out["n_converted"] == n == 7
    assert abs(out["p50_hours"] - pctl(0.5)) < 1e-4
    assert abs(out["p90_hours"] - pctl(0.9)) < 1e-4


# ---------------------------------------------------------------------------
# Round-7 curation queries: pure-python replays
# ---------------------------------------------------------------------------


def test_boilerplate_ngrams_matches_brute_force():
    """Per-source repeated-8-gram audit vs a literal df count."""
    tmpl = "one two three four five six seven eight"
    texts = {  # src A: 3 docs sharing the 8-gram template; B: none
        1: ("A", tmpl + " tail1 x1"),
        2: ("A", tmpl + " tail2 y2"),
        3: ("A", "totally different words with no repeats at all ok"),
        4: ("B", "alpha beta gamma delta epsilon zeta eta theta"),
        5: ("B", "iota kappa lambda mu nu xi omicron pi"),
    }
    docs = (
        ["doc_id BIGINT", "text VARCHAR", "lang VARCHAR",
         "source VARCHAR", "n_chars BIGINT"],
        [(i, t, "en", s, len(t)) for i, (s, t) in texts.items()],
    )
    rows = _run({"documents": docs}, "q_boilerplate_ngrams")

    per_src = {}
    sh = {}
    for i, (src, t) in texts.items():
        toks = [w for w in t.lower().split(" ") if w]
        grams = {" ".join(toks[j:j + 8])
                 for j in range(len(toks) - 7)} if len(toks) >= 8 else set()
        sh[i] = (src, grams)
        per_src.setdefault(src, []).append(i)
    got = {r["source"]: r for r in rows}
    for src, ids in per_src.items():
        nd = len(ids)
        df = {}
        for i in ids:
            for g in sh[i][1]:
                df[g] = df.get(g, 0) + 1
        thr = max(2, -(-nd // 20))  # ceil(5%)
        boiler = {g for g, d in df.items() if d >= thr}
        n_aff = sum(1 for i in ids if sh[i][1] & boiler)
        g = got[src]
        assert g["n_docs"] == nd
        assert g["n_grams"] == len(df)
        assert g["n_boilerplate_grams"] == len(boiler)
        assert g["max_df"] == (max(df.values()) if df else 0)
        assert g["n_docs_affected"] == n_aff
        assert abs(g["affected_pct"] - n_aff / nd) < 1e-4
    # the template family must actually register as boilerplate
    assert got["A"]["n_boilerplate_grams"] == 1
    assert got["A"]["n_docs_affected"] == 2
    assert got["B"]["n_boilerplate_grams"] == 0


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    if na * nb == 0:
        return None  # engines emit NULL (sinks to rank bottom)
    return round(d / (na * nb), 4)


def _rank_key(cos, vid):
    """DESC with NULLS LAST, vid tie-break — both engines' order."""
    return (1 if cos is None else 0, -(cos or 0.0), vid)


def test_knn_graph_matches_brute_force():
    """Cell-local k-NN graph stats vs a literal replay (assignment,
    ranking, symmetrization)."""
    vecs = {}
    # 16 centroid slots: four real directions, repeated
    dirs = [(4.0, 0.0, 0.0, 1.0), (0.0, 4.0, 1.0, 0.0),
            (0.0, 1.0, 4.0, 0.0), (1.0, 0.0, 0.0, 4.0)]
    for vid in range(1, 17):
        vecs[vid] = dirs[(vid - 1) % 4]
    # satellites near each direction (distinct, small perturbations)
    sat = [(4.0, 0.5, 0.0, 1.0), (4.0, 0.0, 0.5, 1.0),
           (0.5, 4.0, 1.0, 0.0), (0.0, 4.0, 1.5, 0.0),
           (0.0, 1.5, 4.0, 0.0), (1.0, 0.5, 0.0, 4.0),
           (1.0, 0.0, 0.5, 4.0), (1.5, 0.0, 0.0, 4.0)]
    for k, v in enumerate(sat):
        vecs[20 + k] = v
    cols = ["vec_id BIGINT", "embedding FLOAT[]", "label INTEGER"]
    rows = [(vid, list(v), 0) for vid, v in vecs.items()]
    out = _run({"embeddings": (cols, rows)}, "q_knn_graph")[0]

    k = math.ceil(math.sqrt(len(vecs)))  # dynamic sqrt-cell count
    cents = {cid: vecs[cid] for cid in vecs if cid <= k}
    assign = {}
    for vid, v in vecs.items():
        best = sorted(cents, key=lambda c: _rank_key(_cos(v, cents[c]), c))
        assign[vid] = best[0]
    knn = []
    for vid, v in vecs.items():
        cell = [b for b, c in assign.items() if c == assign[vid] and b != vid]
        ranked = sorted(cell, key=lambda b: _rank_key(_cos(v, vecs[b]), b))
        for b in ranked[:3]:
            knn.append((vid, b))
    und = {}
    for a, b in knn:
        und[(min(a, b), max(a, b))] = und.get((min(a, b), max(a, b)), 0) + 1
    n_nodes = len({a for a, _ in knn})
    n_mutual = sum(1 for v in und.values() if v == 2)
    assert out["n_nodes"] == n_nodes
    assert out["n_directed_edges"] == len(knn)
    assert out["n_undirected_edges"] == len(und)
    assert out["n_mutual_edges"] == n_mutual
    assert abs(out["mutual_pct"] - n_mutual / len(und)) < 1e-6
    assert abs(out["avg_out_degree"] - len(knn) / n_nodes) < 1e-6
    assert n_mutual > 0  # clustered fixture must produce mutual edges


def test_matryoshka_audit_matches_brute_force():
    """Truncation agreement/regret vs a literal replay; the first-8
    dims of one corpus vector are engineered to mislead so d=8 must
    disagree with the full ranking."""
    dim = 16
    vecs = {}
    # queries 1..4: unit-ish vectors
    vecs[1] = [1.0] * 8 + [0.0] * 8
    vecs[2] = [0.0] * 8 + [1.0] * 8
    vecs[3] = [1.0, 2.0] * 8
    vecs[4] = [2.0, 1.0] * 8
    # corpus: 33+ ids so they are not queries (qmax=32)
    vecs[40] = [1.0] * 8 + [0.25] * 8          # close to q1 overall
    vecs[41] = [1.0] * 8 + [4.0] * 8           # first-8 match q1, tail huge
    vecs[42] = [0.25] * 8 + [1.0] * 8          # close to q2
    vecs[43] = [1.0, 2.0] * 8
    vecs[44] = [2.0, 1.0] * 8
    cols = ["vec_id BIGINT", "embedding FLOAT[]", "label INTEGER"]
    rows = [(vid, v, 0) for vid, v in vecs.items()]
    out = _run({"embeddings": (cols, rows)}, "q_matryoshka_audit")

    queries = {v: vecs[v] for v in vecs if v <= 32}
    corpus = {v: vecs[v] for v in vecs}
    picks_full = {}
    for d in (64, 32, 16, 8):
        for qid, qv in queries.items():
            cand = sorted(
                (vid for vid in corpus if vid != qid),
                key=lambda vid: _rank_key(_cos(corpus[vid][:d], qv[:d]), vid),
            )
            if d == 64:
                picks_full[qid] = cand[0]
    got = {r["dim"]: r for r in out}
    for d in (64, 32, 16, 8):
        agree = 0
        pick_e4 = best_e4 = 0
        for qid, qv in queries.items():
            cand = sorted(
                (vid for vid in corpus if vid != qid),
                key=lambda vid: _rank_key(_cos(corpus[vid][:d], qv[:d]), vid),
            )
            pick = cand[0]
            best = picks_full[qid]
            agree += 1 if pick == best else 0
            pick_e4 += round(_cos(corpus[pick], qv) * 10000)
            best_e4 += round(_cos(corpus[best], qv) * 10000)
        g = got[d]
        nq = len(queries)
        assert g["n_queries"] == nq
        assert g["n_agree"] == agree, d
        assert abs(g["agree_pct"] - agree / nq) < 1e-6
        assert abs(g["avg_pick_cosine"] - pick_e4 / nq / 1e4) < 1e-6
        assert abs(g["avg_regret"] - (best_e4 - pick_e4) / nq / 1e4) < 1e-6
    assert got[8]["n_agree"] < got[8]["n_queries"]  # the misleading head
    assert got[64]["n_agree"] == got[64]["n_queries"]


def test_char_entropy_matches_brute_force():
    """H = log2(n) - (sum c*log2 c)/n with per-char e6 rounding."""
    texts = {1: "aaabbc", 2: "abcdef", 3: "zzzzzz"}
    docs = (
        ["doc_id BIGINT", "text VARCHAR", "lang VARCHAR",
         "source VARCHAR", "n_chars BIGINT"],
        [(i, t, "en", "s", len(t)) for i, t in texts.items()],
    )
    rows = _run({"documents": docs}, "q_char_entropy")
    got = {r["doc_id"]: r for r in rows}
    for i, t in texts.items():
        hist = {}
        for ch in t:
            hist[ch] = hist.get(ch, 0) + 1
        n = len(t)
        s_e6 = sum(_rnd_half_away(c * math.log2(c) * 1e6)
                   for c in hist.values())
        h = math.log2(n) - (s_e6 / 1e6) / n
        g = got[i]
        assert g["n_chars"] == n and g["n_distinct"] == len(hist)
        assert abs(g["entropy_bits"] - h) < 1e-4
    assert got[3]["entropy_bits"] == 0.0  # constant string
    assert abs(got[2]["entropy_bits"] - math.log2(6)) < 1e-4  # uniform


def test_cohort_ltv_matches_brute_force():
    """Weekly cohort LTV curves vs a literal cents walk. 2024-01-01
    is a Monday, so week boundaries are clean."""
    # (user, first_event_day, [(purchase_day, value), ...])
    users = [
        (1, 0, [(0, 10.0), (8, 20.0)]),    # cohort W0, weeks 0 and 1
        (2, 1, [(2, 5.0)]),                # cohort W0, week 0
        (3, 7, [(7, 7.5), (20, 2.5)]),     # cohort W1, weeks 0 and 1
        (4, 8, []),                        # cohort W1, no purchases
    ]
    rows = []
    for u, f, ps in users:
        rows.append((f"2024-01-{f+1:02d} 00:00:00", u, "view", 1.0))
        for d, v in ps:
            rows.append((f"2024-01-{d+1:02d} 01:00:00", u, "purchase", v))
    out = _run({"events": _events_ts(rows)}, "q_cohort_ltv")

    import datetime

    def week_of(day):
        dt = datetime.date(2024, 1, day + 1)
        monday = dt - datetime.timedelta(days=dt.weekday())
        return monday

    cohorts = {}
    sizes = {}
    for u, f, ps in users:
        cw = week_of(f)
        sizes[cw] = sizes.get(cw, 0) + 1
        for d, v in ps:
            wn = (datetime.date(2024, 1, d + 1) - cw).days // 7
            cohorts.setdefault(cw, {}).setdefault(wn, 0)
            cohorts[cw][wn] += round(v * 100)
    expect = []
    for cw in sorted(cohorts):
        cum = 0
        for wn in sorted(cohorts[cw]):
            rev = cohorts[cw][wn]
            cum += rev
            expect.append((f"{cw:%Y-%m-%d}", wn, sizes[cw],
                           rev / 100.0, cum / 100.0,
                           cum / sizes[cw] / 100.0))
    got = [(r["cohort_week"], r["week_n"], r["n_users"],
            r["week_revenue"], r["cum_revenue"], r["ltv_per_user"])
           for r in out]
    assert len(got) == len(expect)
    for g, e in zip(got, expect):
        assert g[:3] == e[:3]
        for x, y in zip(g[3:], e[3:]):
            assert abs(x - y) < 1e-6


def test_centroid_similarity_matches_brute_force():
    """Centroid cosine from exact e6 component sums."""
    vecs = [  # (label, vector)
        (0, [1.0, 0.0, 0.5, 0.25]),
        (0, [0.5, 0.25, 1.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.5]),
        (1, [0.25, 1.0, 0.25, 1.0]),
        (2, [1.0, 1.0, 1.0, 1.0]),
    ]
    cols = ["vec_id BIGINT", "embedding FLOAT[]", "label INTEGER"]
    rows = [(i, v, lab) for i, (lab, v) in enumerate(vecs)]
    out = _run({"embeddings": (cols, rows)}, "q_centroid_similarity")

    comp = {}
    for lab, v in vecs:
        s = comp.setdefault(lab, [0] * len(v))
        for d, x in enumerate(v):
            s[d] += _rnd_half_away(x * 1e6)
    labs = sorted(comp)
    expect = {}
    for i, a in enumerate(labs):
        for b in labs[i + 1:]:
            dot = sum(x * y for x, y in zip(comp[a], comp[b]))
            na2 = sum(x * x for x in comp[a])
            nb2 = sum(x * x for x in comp[b])
            expect[(a, b)] = dot / (math.sqrt(na2) * math.sqrt(nb2))
    got = {(r["label_a"], r["label_b"]): r["cosine"] for r in out}
    assert set(got) == set(expect)
    for k, v in expect.items():
        assert abs(got[k] - v) < 1e-6, k


def test_assortativity_matches_brute_force():
    """Degree-assortativity Pearson over symmetrized edge-end degree
    pairs, from a literal edge/degree walk."""
    baskets = {1: [1, 2, 3], 2: [2, 3], 3: [3, 4], 4: [4, 5]}
    cols = ["l_orderkey BIGINT", "l_partkey BIGINT"]
    rows = [(o, p) for o, ps in baskets.items() for p in ps]
    out = _run({"lineitem": (cols, rows)}, "q_assortativity")[0]

    edges = set()
    for ps in baskets.values():
        for i, a in enumerate(ps):
            for b in ps[i + 1:]:
                edges.add((min(a, b), max(a, b)))
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    ends = [(deg[a], deg[b]) for a, b in edges]
    ends += [(y, x) for x, y in ends]
    m = len(ends)
    sx = sum(x for x, _ in ends)
    sy = sum(y for _, y in ends)
    sxx = sum(x * x for x, _ in ends)
    syy = sum(y * y for _, y in ends)
    sxy = sum(x * y for x, y in ends)
    r = ((m * sxy - sx * sy)
         / (math.sqrt(m * sxx - sx * sx) * math.sqrt(m * syy - sy * sy)))
    assert out["n_edge_ends"] == m
    assert abs(out["assortativity"] - r) < 1e-6


def test_eccentricity_matches_brute_force():
    """Hop-bounded BFS eccentricity from md5-chosen seeds, replayed
    with hashlib + literal BFS."""
    import hashlib

    # support-2 graph: each edge must appear in >= 2 orders.
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)]  # a path
    rows = []
    o = 1
    for a, b in pairs:
        for _ in range(2):  # two orders per edge -> support 2
            rows.append((o, a))
            rows.append((o, b))
            o += 1
    cols = ["l_orderkey BIGINT", "l_partkey BIGINT"]
    out = _run({"lineitem": (cols, rows)}, "q_eccentricity")

    from mapreduce_server_development_spark.plans.graph_analytics import (
        _ECC_HOPS,
        _ECC_SEEDS,
    )

    nbrs = {}
    for a, b in pairs:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    nodes = sorted(nbrs)
    seeds = sorted(
        nodes, key=lambda v: (hashlib.md5(f"ecc:{v}".encode()).hexdigest(), v)
    )[:_ECC_SEEDS]
    expect = {}
    for s in seeds:
        dist = {s: 0}
        frontier = [s]
        for hop in range(1, _ECC_HOPS + 1):
            nxt = []
            for u in frontier:
                for v in nbrs[u]:
                    if v not in dist:
                        dist[v] = hop
                        nxt.append(v)
            frontier = nxt
        expect[s] = (max(dist.values()), len(dist), sum(dist))
    got = {r["seed"]: (r["ecc_capped"], r["n_reached"], r["checksum"])
           for r in out}
    assert got == expect


def test_leakage_safe_split_matches_brute_force():
    """Cluster-keyed split + leakage audit replayed literally: md5
    permille buckets (hashlib) + literal 5-gram Jaccard clustering."""
    import hashlib

    tmpl = ("the quick brown fox jumps over the lazy dog again and again "
            "with some extra words to make shingles")
    texts = {
        1: tmpl + " one",
        2: tmpl + " two",          # near-dup of 1
        3: "completely different text about spark plans and shuffles ok",
        4: tmpl + " three",        # near-dup of 1/2
        5: "another standalone document with its own unique vocabulary set",
    }
    docs = (
        ["doc_id BIGINT", "text VARCHAR", "lang VARCHAR",
         "source VARCHAR", "n_chars BIGINT"],
        [(i, t, "en", "s", len(t)) for i, t in texts.items()],
    )
    rows = _run({"documents": docs}, "q_leakage_safe_split")

    def bucket(key):
        h = hashlib.md5(f"split:{key}".encode()).hexdigest()
        nib = [int(c, 16) for c in h[:4]]
        return (nib[0] * 4096 + nib[1] * 256 + nib[2] * 16 + nib[3]) % 1000

    def split_of(key):
        b = bucket(key)
        return "train" if b < 800 else ("val" if b < 900 else "test")

    def shingles(t):
        toks = [w for w in t.lower().split(" ") if w]
        return {" ".join(toks[j:j + 5]) for j in range(len(toks) - 4)}

    sh = {i: shingles(t) for i, t in texts.items()}
    ids = sorted(texts)
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            x = parent[x]
        return x

    for i in ids:
        for j in ids:
            if i < j:
                inter = len(sh[i] & sh[j])
                if inter and round(
                    inter / (len(sh[i]) + len(sh[j]) - inter), 4
                ) >= 0.2:
                    a, b = sorted((find(i), find(j)))
                    parent[b] = a
    cluster = {i: find(i) for i in ids}
    naive = {i: split_of(i) for i in ids}
    safe = {i: split_of(cluster[i]) for i in ids}
    leaky_clusters = {
        c for c in set(cluster.values())
        if len({naive[i] for i in ids if cluster[i] == c}) > 1
    }
    got = {r["split"]: r for r in rows}
    for s in ("train", "val", "test"):
        g = got[s]
        n_naive = sum(1 for i in ids if naive[i] == s)
        n_safe = sum(1 for i in ids if safe[i] == s)
        n_leaky = sum(
            1 for i in ids if naive[i] == s and cluster[i] in leaky_clusters
        )
        assert g["n_docs_naive"] == n_naive, s
        assert g["n_docs_safe"] == n_safe, s
        assert g["n_leaky_docs"] == n_leaky, s
    # under the cluster-keyed split every cluster lands whole: replay
    # proves no cluster straddles the safe splits
    for c in set(cluster.values()):
        assert len({safe[i] for i in ids if cluster[i] == c}) == 1


def test_dp_release_matches_brute_force():
    """Laplace inverse-CDF from the md5-uniform stream, replayed with
    hashlib — the noise mechanism itself is the thing under test."""
    import hashlib

    rows = [(1, "click", 1.0)] * 7 + [(2, "view", 1.0)] * 3
    out = _run({"events": _events(rows)}, "q_dp_release")
    got = {r["event_type"]: r for r in out}
    for et, n in (("click", 7), ("view", 3)):
        h = int(hashlib.md5(f"dp:{et}".encode()).hexdigest()[:12], 16)
        u = (h + 0.5) / float(1 << 48)
        lap = -(1.0 if u >= 0.5 else -1.0) * math.log(
            1.0 - 2.0 * abs(u - 0.5)) / 0.5
        g = got[et]
        assert g["true_count"] == n
        assert abs(g["noisy_count"] - (n + lap)) < 1e-4
        assert abs(g["abs_noise"] - abs(lap)) < 1e-4


def test_k_anonymity_matches_brute_force():
    """Equivalence-class sizes over the QI tuple, log2-binned."""
    # 2024-01-01 is Monday (dow 0); value buckets are $50 cents//5000.
    rows = []
    # class (click, dow0, bucket0): 6 users  -> log2 bin 2
    for u in range(1, 7):
        rows.append(("2024-01-01 10:00:00", u, "click", 10.0))
    # class (view, dow1, bucket1): 2 users -> log2 bin 1
    for u in (1, 2):
        rows.append(("2024-01-02 10:00:00", u, "view", 60.0))
    # class (purchase, dow1, bucket0): 1 user -> log2 bin 0, k<5
    rows.append(("2024-01-02 11:00:00", 9, "purchase", 5.0))
    # duplicate row for user 1 (same QI) must not double-count
    rows.append(("2024-01-08 10:00:00", 1, "click", 10.0))
    out = _run({"events": _events_ts(rows)}, "q_k_anonymity")

    classes = {("click", 0, 0): 6, ("view", 1, 1): 2, ("purchase", 1, 0): 1}
    expect = {}
    for k in classes.values():
        b = k.bit_length() - 1
        e = expect.setdefault(b, [0, 0, 0])
        e[0] += 1
        e[1] += k
        e[2] += k if k < 5 else 0
    got = {r["log2_k"]: (r["n_classes"], r["n_users"],
                         r["users_in_k_lt_5"]) for r in out}
    assert got == {b: tuple(v) for b, v in expect.items()}


def test_shard_planner_matches_brute_force():
    """Consistent-hash ring vs hash-mod rebalance, replayed with
    hashlib successor-on-ring arithmetic."""
    import hashlib

    n_docs = 40
    docs = (
        ["doc_id BIGINT", "text VARCHAR", "lang VARCHAR",
         "source VARCHAR", "n_chars BIGINT"],
        [(i, f"doc {i}", "en", "s", 5) for i in range(n_docs)],
    )
    out = _run({"documents": docs}, "q_shard_planner")[0]

    DOM = 1 << 48

    def hx(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)

    ring = {(s, j): hx(f"ring:{s}:{j}")
            for s in range(9) for j in range(8)}

    def assign(h, n_shards):
        best = None
        for (s, j), vh in ring.items():
            if s >= n_shards:
                continue
            key = vh if vh >= h else vh + DOM
            if best is None or key < best[0] or (key == best[0] and s < best[1]):
                best = (key, s)
        return best[1]

    moved_mod = moved_ring = 0
    loads = {}
    for d in range(n_docs):
        h = hx(f"shard:{d}")
        if h % 8 != h % 9:
            moved_mod += 1
        r8, r9 = assign(h, 8), assign(h, 9)
        if r8 != r9:
            moved_ring += 1
        loads[r8] = loads.get(r8, 0) + 1
    assert out["n_docs"] == n_docs
    assert abs(out["moved_mod_pct"] - 100.0 * moved_mod / n_docs) < 1e-4
    assert abs(out["moved_ring_pct"] - 100.0 * moved_ring / n_docs) < 1e-4
    assert out["ring8_max_shard_load"] == max(loads.values())
    # mirrors the oracle: MIN over shards that received docs
    assert out["ring8_min_shard_load"] == min(loads.values())
    # the whole point: ring moves far fewer keys than mod
    assert moved_ring < moved_mod


def test_keyword_rake_matches_brute_force():
    """RAKE deg/freq word scores + phrase sums replayed literally."""
    from mapreduce_server_development_spark.plans.corpus_diversity import (
        _RAKE_STOPS,
    )

    texts = {
        1: "the quick brown fox and the lazy dog",
        2: "a quick brown fox is quick",
        3: "deep learning of deep neural networks",
    }
    docs = (
        ["doc_id BIGINT", "text VARCHAR", "lang VARCHAR",
         "source VARCHAR", "n_chars BIGINT"],
        [(i, t, "en", "s", len(t)) for i, t in texts.items()],
    )
    rows = _run({"documents": docs}, "q_keyword_rake")

    stops = set(_RAKE_STOPS)
    phrases = []  # (phrase tuple)
    for t in texts.values():
        run = []
        for tok in [w for w in t.lower().split(" ") if w]:
            if tok in stops:
                if run:
                    phrases.append(tuple(run))
                run = []
            else:
                run.append(tok)
        if run:
            phrases.append(tuple(run))
    freq, deg = {}, {}
    for ph in phrases:
        for w in ph:
            freq[w] = freq.get(w, 0) + 1
            deg[w] = deg.get(w, 0) + len(ph)
    wscore = {w: 1000000 * deg[w] // freq[w] for w in freq}
    pscores = {}
    counts = {}
    for ph in phrases:
        s = sum(wscore[w] for w in ph)
        key = " ".join(ph)
        counts[key] = counts.get(key, 0) + 1
        pscores[key] = max(pscores.get(key, 0), s)
    expect = sorted(
        ((p, counts[p], pscores[p]) for p in pscores),
        key=lambda r: (-r[2], r[0]),
    )[:20]
    got = [(r["phrase"], r["n_occurrences"], r["score_e6"]) for r in rows]
    assert got == expect
    # sanity: a multi-word technical phrase must outrank bare words
    assert got[0][0].count(" ") >= 1


def test_negative_sampling_matches_brute_force():
    """md5 candidate draw + exact collision rejection replayed."""
    import hashlib

    # customers 1,2 buy from a 7-part catalog
    pos_pairs = [(1, 1), (1, 2), (1, 3), (2, 2), (2, 5)]
    ocols = ["o_orderkey BIGINT", "o_custkey BIGINT"]
    lcols = ["l_orderkey BIGINT", "l_partkey BIGINT"]
    pcols = ["p_partkey BIGINT"]
    orows, lrows = [], []
    for i, (c, p) in enumerate(pos_pairs):
        orows.append((i, c))
        lrows.append((i, p))
    # duplicate purchase must not duplicate the positive pair
    orows.append((99, 1))
    lrows.append((99, 1))
    out = _run(
        {"orders": (ocols, orows), "lineitem": (lcols, lrows),
         "part": (pcols, [(p,) for p in range(1, 8)])},
        "q_negative_sampling",
    )

    np_ = 7
    pos = set(pos_pairs)
    expect = {}
    for j in range(4):
        n_cand = n_coll = s_part = 0
        parts = set()
        for c, p in pos:
            h = int(hashlib.md5(f"neg:{c}:{p}:{j}".encode())
                    .hexdigest()[:12], 16)
            cand = 1 + h % np_
            n_cand += 1
            if (c, cand) in pos:
                n_coll += 1
            else:
                s_part += cand
                parts.add(cand)
        expect[j] = (n_cand, n_coll, n_cand - n_coll, s_part, len(parts))
    got = {r["draw"]: (r["n_candidates"], r["n_collisions"],
                       r["n_negatives"], r["neg_part_sum"],
                       r["n_distinct_parts"]) for r in out}
    assert got == expect


def test_group_percentiles_matches_brute_force():
    """Per-group interpolated p50/p90 from e4 order statistics."""
    groups = {
        "click": [1.0, 2.0, 3.0, 4.0, 100.0],
        "view": [10.0, 20.0],
        "purchase": [5.0],
    }
    rows = []
    for t, vals in groups.items():
        for u, v in enumerate(vals):
            rows.append((u, t, v))
    out = _run({"events": _events(rows)}, "q_group_percentiles")
    got = {r["event_type"]: r for r in out}
    for t, vals in groups.items():
        e4 = sorted(round(v * 10000) for v in vals)
        n = len(e4)

        def pctl(q):
            pos = (n - 1) * q
            lo = e4[math.floor(pos)]
            hi = e4[min(math.floor(pos) + 1, n - 1)]
            return (lo + (hi - lo) * (pos - math.floor(pos))) / 10000.0

        g = got[t]
        assert g["n_events"] == n
        assert abs(g["p50"] - pctl(0.5)) < 1e-3
        assert abs(g["p90"] - pctl(0.9)) < 1e-3


def test_audience_overlap_matches_brute_force():
    """Exact segment Jaccard/lift from literal set intersections."""
    # segments: priority strings; (priority, customer) memberships
    mem = [("1-URGENT", 1), ("1-URGENT", 2), ("1-URGENT", 3),
           ("2-HIGH", 2), ("2-HIGH", 3), ("2-HIGH", 4),
           ("3-MEDIUM", 5)]
    cols = ["o_orderkey BIGINT", "o_custkey BIGINT",
            "o_orderpriority VARCHAR"]
    rows = [(i, c, t) for i, (t, c) in enumerate(mem)]
    rows.append((99, 2, "1-URGENT"))  # duplicate membership, no effect
    out = _run({"orders": (cols, rows)}, "q_audience_overlap")

    segs = {}
    for t, c in mem:
        segs.setdefault(t, set()).add(c)
    nu = len({c for _, c in mem})
    expect = {}
    names = sorted(segs)
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            novl = len(segs[a] & segs[b])
            if novl:
                ja = novl / len(segs[a] | segs[b])
                lift = novl * nu / (len(segs[a]) * len(segs[b]))
                expect[(a, b)] = (len(segs[a]), len(segs[b]), novl, ja, lift)
    got = {(r["ta"], r["tb"]): r for r in out}
    assert set(got) == set(expect)
    for k, (na, nb, novl, ja, lift) in expect.items():
        g = got[k]
        assert (g["n_a"], g["n_b"], g["n_overlap"]) == (na, nb, novl)
        assert abs(g["jaccard"] - ja) < 1e-6
        assert abs(g["lift"] - lift) < 1e-6


def test_clustering_coefficient_matches_brute_force():
    """Average local clustering coefficient on a known graph: a
    triangle with a pendant vertex."""
    # orders -> co-purchase edges with support 1: triangle {1,2,3}
    # plus pendant 4-1. C(1)=1/3 (nbrs 2,3,4; one closed pair of 3),
    # C(2)=C(3)=1, C(4)=0 (degree 1 excluded or zero?) — replay the
    # oracle's own convention below and just assert equality.
    baskets = {1: [1, 2], 2: [2, 3], 3: [1, 3], 4: [1, 4]}
    # support-2: duplicate each order
    rows = []
    o = 1
    for ps in baskets.values():
        for _ in range(2):
            for p in ps:
                rows.append((o, p))
            o += 1
    cols = ["l_orderkey BIGINT", "l_partkey BIGINT"]
    out = _run({"lineitem": (cols, rows)}, "q_clustering_coefficient")[0]

    edges = {(1, 2), (2, 3), (1, 3), (1, 4)}
    nbrs = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    cc_e6 = []
    for v, ns in nbrs.items():
        d = len(ns)
        if d < 2:
            continue
        links = sum(
            1 for x in ns for y in ns
            if x < y and (min(x, y), max(x, y)) in edges
        )
        cc_e6.append(1000000 * 2 * links // (d * (d - 1)))
    assert out["n_nodes"] == len(cc_e6)
    assert out["n_fully_clustered"] == sum(1 for c in cc_e6 if c == 1000000)
    assert out["n_triangle_free"] == sum(1 for c in cc_e6 if c == 0)
    avg = sum(cc_e6) / len(cc_e6) / 1e6
    assert abs(out["avg_clustering"] - avg) < 1e-6
    # triangle {1,2,3} with pendant 4-1: C(2)=C(3)=1, C(1)=1/3
    assert out["n_fully_clustered"] == 2


def test_embedding_drift_matches_brute_force():
    """Per-dim SMD from exact e6 fixed-point sums, replayed; dim 1 is
    engineered to drift strongly between even/odd labels."""
    vecs = []
    for i in range(10):
        grp = i % 2
        # dim1 drifts by group (with within-group noise so its pooled
        # sd is nonzero); dim2 constant (NULL-guard path); dim3/4 mild
        v = [(5.0 if grp else 1.0) + 0.125 * (i % 3), 2.0,
             0.25 * (i % 3), 1.0]
        vecs.append((i, v, i % 4))  # labels 0..3 -> grp = label % 2
    cols = ["vec_id BIGINT", "embedding FLOAT[]", "label INTEGER"]
    out = _run({"embeddings": (cols, vecs)}, "q_embedding_drift")

    by = {}
    for i, v, lab in vecs:
        for d, x in enumerate(v, 1):
            key = (lab % 2, d)
            e6 = _rnd_half_away(x * 1e6)
            st = by.setdefault(key, [0, 0, 0])
            st[0] += 1
            st[1] += e6
            st[2] += e6 * e6
    scored = []
    for d in range(1, 5):
        n0, sx0, sxx0 = by[(0, d)]
        n1, sx1, sxx1 = by[(1, d)]
        v0 = (sxx0 - sx0 * sx0 / n0) / (n0 - 1)
        v1 = (sxx1 - sx1 * sx1 / n1) / (n1 - 1)
        sd = math.sqrt((v0 + v1) / 2)
        smd = round(abs(sx1 / n1 - sx0 / n0) / sd, 6) if sd else None
        scored.append((d, n0, n1, sx0 / n0 / 1e6, sx1 / n1 / 1e6, smd))
    # DESC with NULLS LAST (both engines), dim tie-break
    scored.sort(key=lambda r: (1 if r[5] is None else 0, -(r[5] or 0), r[0]))
    got = [(r["dim"], r["n_a"], r["n_b"]) for r in out]
    assert got == [(d, n0, n1) for d, n0, n1, *_ in scored[:10]]
    for r, e in zip(out, scored):
        assert abs(r["mean_a"] - e[3]) < 1e-6
        assert abs(r["mean_b"] - e[4]) < 1e-6
        if e[5] is None:
            assert r["smd"] is None
        else:
            assert abs(r["smd"] - e[5]) < 1e-6
    assert out[0]["dim"] == 1  # the engineered drift dim ranks first


def test_embedding_quantization_matches_brute_force():
    """Int8 symmetric quantization cosine audit from exact integer
    sums, replayed with the e6/e9 fixed-point conventions."""
    vecs = [
        (1, [1.0, -0.5, 0.25, 0.0]),
        (2, [0.001, 0.002, -0.003, 0.0005]),   # small-magnitude stress
        (3, [100.0, 100.0, 100.0, 100.0]),      # exact under scaling
        (4, [0.7, -0.3, 0.9, -0.1]),
    ]
    cols = ["vec_id BIGINT", "embedding FLOAT[]", "label INTEGER"]
    out = _run(
        {"embeddings": (cols, [(i, v, 0) for i, v in vecs])},
        "q_embedding_quantization",
    )[0]

    import struct

    def f32(x):  # parquet stores FLOAT; replay the float32 rounding
        return struct.unpack("f", struct.pack("f", x))[0]

    coses = []
    for _, v in vecs:
        xs = [_rnd_half_away(f32(x) * 1e6) for x in v]
        m = max(abs(x) for x in xs)
        if m == 0:
            continue
        qs = [_rnd_half_away(x * 127.0 / m) for x in xs]
        dot = sum(x * q for x, q in zip(xs, qs))
        x2 = sum(x * x for x in xs)
        q2 = sum(q * q for q in qs)
        coses.append(_rnd_half_away(1e9 * dot
                                    / (math.sqrt(x2) * math.sqrt(q2))))
    n = len(coses)
    assert out["n_vectors"] == n
    assert abs(out["mean_cosine"] - sum(coses) / n / 1e9) < 1e-6
    assert abs(out["worst_cosine"] - min(coses) / 1e9) < 1e-6
    assert out["n_below_999"] == sum(1 for c in coses if c < 999000000)
    assert out["worst_cosine"] > 0.9  # int8 must not destroy geometry


def test_group_gini_matches_brute_force():
    """Per-nation Gini from rank-weighted integer sums."""
    li = {1: [100.0, 100.0], 2: [1.0], 3: [399.0],  # nation A skewed
          4: [50.0], 5: [50.0]}                      # nation B flat
    sup_nation = {1: 0, 2: 0, 3: 0, 4: 1, 5: 1}
    lcols = ["l_suppkey BIGINT", "l_extendedprice DOUBLE"]
    lrows = [(s, p) for s, ps in li.items() for p in ps]
    scols = ["s_suppkey BIGINT", "s_nationkey BIGINT"]
    srows = [(s, n) for s, n in sup_nation.items()]
    ncols = ["n_nationkey BIGINT", "n_name VARCHAR"]
    nrows = [(0, "ALPHA"), (1, "BETA")]
    out = _run(
        {"lineitem": (lcols, lrows), "supplier": (scols, srows),
         "nation": (ncols, nrows)},
        "q_group_gini",
    )

    got = {r["nation"]: r for r in out}
    names = {0: "ALPHA", 1: "BETA"}
    by_nation = {}
    for s, ps in li.items():
        by_nation.setdefault(sup_nation[s], []).append(
            sum(round(p * 100) for p in ps))
    for nat, cents in by_nation.items():
        cents.sort()
        n, tot = len(cents), sum(cents)
        wsum = sum(rk * c for rk, c in enumerate(cents, 1))
        gini = 2.0 * wsum / (n * tot) - (n + 1.0) / n
        g = got[names[nat]]
        assert g["n_suppliers"] == n
        assert abs(g["total_revenue"] - tot / 100.0) < 0.01
        assert abs(g["gini"] - gini) < 1e-6
    assert got["BETA"]["gini"] == 0.0  # perfectly flat market


def test_acctbal_profile_matches_brute_force():
    """Segment balance panel from exact integer cents."""
    cust = [("BUILDING", 100.50), ("BUILDING", -20.25),
            ("MACHINERY", 0.00), ("MACHINERY", 7.77),
            ("MACHINERY", -1.00)]
    cols = ["c_custkey BIGINT", "c_mktsegment VARCHAR", "c_acctbal DOUBLE"]
    rows = [(i, s, b) for i, (s, b) in enumerate(cust)]
    out = _run({"customer": (cols, rows)}, "q_acctbal_profile")

    per = {}
    for s, b in cust:
        per.setdefault(s, []).append(round(b * 100))
    got = {r["segment"]: r for r in out}
    for s, bs in per.items():
        g = got[s]
        assert g["n_customers"] == len(bs)
        assert g["n_negative"] == sum(1 for b in bs if b < 0)
        assert abs(g["negative_pct"]
                   - 100.0 * g["n_negative"] / len(bs)) < 1e-4
        assert abs(g["mean_balance"] - sum(bs) / len(bs) / 100.0) < 1e-4
        assert abs(g["min_balance"] - min(bs) / 100.0) < 1e-9
        assert abs(g["max_balance"] - max(bs) / 100.0) < 1e-9


def test_truncation_loss_matches_brute_force():
    """Truncate-at-L token loss across the context grid."""
    lens = [10, 20, 40, 100, 130]  # token counts per doc
    docs = (
        ["doc_id BIGINT", "text VARCHAR", "lang VARCHAR",
         "source VARCHAR", "n_chars BIGINT"],
        [(i, " ".join(["w"] * n), "en", "s", 2 * n)
         for i, n in enumerate(lens)],
    )
    rows = _run({"documents": docs}, "q_truncation_loss")
    got = {r["ctx_len"]: r for r in rows}
    tot = sum(lens)
    for L in (16, 32, 64, 128):
        over = [n for n in lens if n > L]
        lost = sum(n - L for n in over)
        g = got[L]
        assert g["n_docs"] == len(lens)
        assert g["n_docs_over"] == len(over)
        assert g["tokens_lost"] == lost
        assert abs(g["lost_pct"] - lost / tot) < 1e-6
        assert abs(g["docs_over_pct"] - len(over) / len(lens)) < 1e-6
    assert got[128]["tokens_lost"] == 2  # only the 130-token doc


def test_temperature_mix_matches_brute_force():
    """alpha=0.5 smoothed shares + upsample factors replayed."""
    src = {"big": 90, "mid": 9, "small": 1}  # tokens per source
    rows = []
    did = 0
    for s, toks in src.items():
        rows.append((did, " ".join(["w"] * toks), "en", s, toks * 2))
        did += 1
    docs = (
        ["doc_id BIGINT", "text VARCHAR", "lang VARCHAR",
         "source VARCHAR", "n_chars BIGINT"],
        rows,
    )
    out = _run({"documents": docs}, "q_temperature_mix")
    got = {r["source"]: r for r in out}
    tot = sum(src.values())
    psum = sum(t ** 0.5 for t in src.values())
    for s, toks in src.items():
        g = got[s]
        nat = toks / tot
        smo = toks ** 0.5 / psum
        assert g["n_tokens"] == toks
        assert abs(g["natural_share"] - nat) < 1e-6
        assert abs(g["smoothed_share"] - smo) < 1e-6
        assert abs(g["upsample_factor"] - smo / nat) < 1e-6
    # smoothing must lift the small source and damp the big one
    assert got["small"]["upsample_factor"] > 1.0
    assert got["big"]["upsample_factor"] < 1.0


def test_rag_chunking_matches_brute_force():
    """Sliding-window chunk counts + overlap storage blowup."""
    lens = [5, 32, 33, 64, 100]
    docs = (
        ["doc_id BIGINT", "text VARCHAR", "lang VARCHAR",
         "source VARCHAR", "n_chars BIGINT"],
        [(i, " ".join(["w"] * n), "en", "s", 2 * n)
         for i, n in enumerate(lens)],
    )
    out = _run({"documents": docs}, "q_rag_chunking")
    got = {(r["chunk_size"], r["overlap"]): r for r in out}
    tot = sum(lens)
    for C, O in ((32, 0), (32, 8), (64, 16)):
        n_chunks = stored = 0
        for n in lens:
            k = 1 if n <= C else 1 + math.ceil((n - C) / (C - O))
            n_chunks += k
            stored += n + (k - 1) * O
        g = got[(C, O)]
        assert g["n_docs"] == len(lens)
        assert g["n_chunks"] == n_chunks
        assert g["stored_tokens"] == stored
        assert abs(g["storage_blowup"] - stored / tot) < 1e-6
    assert got[(32, 0)]["storage_blowup"] == 1.0  # no overlap, no cost


def _pr_blocks_replay():
    """Score blocks (desc) for the alphabetically-first class from the
    replayed integer NB scores: [(score, n_block, n_pos_block,
    cum_pos, cum_all)]."""
    _, test, _, scores, _, classes = _nb_replay()
    cls = min(classes)
    pairs = [(scores[i][cls], 1 if a == cls else 0)
             for i, (a, _) in test.items()]
    blocks = {}
    for s, p in pairs:
        nb, npb = blocks.get(s, (0, 0))
        blocks[s] = (nb + 1, npb + p)
    out, cp, ca = [], 0, 0
    for s in sorted(blocks, reverse=True):
        nb, npb = blocks[s]
        cp += npb
        ca += nb
        out.append((s, nb, npb, cp, ca))
    return cls, pairs, out


def test_pr_curve_matches_pure_python():
    rows = _run({"documents": _nb_docs_table()}, "q_pr_curve")
    _, pairs, blocks = _pr_blocks_replay()
    np_ = sum(p for _, p in pairs)
    assert len(rows) == len(blocks)
    for r, (s, nb, npb, cp, ca) in zip(rows, blocks):
        assert r["score"] == s
        assert r["n_block"] == nb and r["n_pos_block"] == npb
        assert r["cum_pos"] == cp and r["cum_all"] == ca
        assert abs(r["precision_at"] - round(cp / ca, 6)) < 1e-9
        assert abs(r["recall_at"] - round(cp / np_, 6)) < 1e-9
    assert rows[-1]["recall_at"] == 1.0  # the curve ends at full recall


def test_avg_precision_matches_pure_python():
    out = _run({"documents": _nb_docs_table()}, "q_avg_precision")[0]
    cls, pairs, blocks = _pr_blocks_replay()
    np_ = sum(p for _, p in pairs)
    ap_e9 = sum(round(npb * cp * 1e9 / ca) for _, _, npb, cp, ca in blocks)
    assert out["target_class"] == cls
    assert out["n_pos"] == np_
    assert out["n_neg"] == len(pairs) - np_
    assert abs(out["avg_precision"] - round(ap_e9 / np_ / 1e9, 6)) < 1e-9


def test_fairness_audit_matches_pure_python():
    """Per-lang demographic-parity / equalized-odds panel replayed in
    pure Python; langs assigned so one group holds the positive and
    the other does not (exercising the NULL-fpr/tpr paths)."""
    texts, test, preds, _, _, classes = _nb_replay()
    cls = min(classes)
    lang_of = {i: ("de" if i % 2 else "fr") for i in texts}
    docs = (
        ["doc_id BIGINT", "text VARCHAR", "lang VARCHAR",
         "source VARCHAR", "n_chars BIGINT"],
        [(i, t, lang_of[i], s, len(t)) for i, (s, t) in texts.items()],
    )
    rows = {r["lang"]: r for r in _run({"documents": docs},
                                       "q_fairness_audit")}
    want: dict = {}
    for i, (actual, _) in test.items():
        g = want.setdefault(lang_of[i],
                            {"n": 0, "ap": 0, "pp": 0, "tp": 0, "fp": 0})
        a = 1 if actual == cls else 0
        p = 1 if preds[i] == cls else 0
        g["n"] += 1
        g["ap"] += a
        g["pp"] += p
        g["tp"] += a * p
        g["fp"] += (1 - a) * p
    assert set(rows) == set(want)
    for lang, g in want.items():
        r = rows[lang]
        assert r["n_docs"] == g["n"]
        assert abs(r["base_rate"] - round(g["ap"] / g["n"], 6)) < 1e-9
        assert abs(r["pred_pos_rate"] - round(g["pp"] / g["n"], 6)) < 1e-9
        if g["ap"]:
            assert abs(r["tpr"] - round(g["tp"] / g["ap"], 6)) < 1e-9
        else:
            assert r["tpr"] is None
        if g["n"] - g["ap"]:
            assert abs(r["fpr"] - round(g["fp"] / (g["n"] - g["ap"]), 6)) < 1e-9
        else:
            assert r["fpr"] is None


def test_bm25_tuning_matches_brute_force():
    """The (k1, b) grid scored by graded nDCG@10, replayed in Python
    with the same fixed-point discipline (e6 contributions AND e6
    per-position gains)."""
    texts = {
        1: "the filter keeps the window open",
        2: "stream stream stream filter",
        3: "no match here at all",
        4: "filter window stream filter window",
        5: "window",
    }
    docs = (
        ["doc_id BIGINT", "text VARCHAR", "lang VARCHAR",
         "source VARCHAR", "n_chars BIGINT"],
        [(i, t, "en", "web", len(t)) for i, t in texts.items()],
    )
    rows = _run({"documents": docs}, "q_bm25_tuning")
    toks = {i: t.split() for i, t in texts.items()}
    n_docs = len(texts)
    avgdl = sum(len(v) for v in toks.values()) / n_docs
    terms = ["filter", "window", "stream"]
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    rel = {i: sum(1 for t in terms if t in v) for i, v in toks.items()
           if any(t in v for t in terms)}

    def gain(r, rk):
        return round((2.0 ** r - 1.0) / math.log2(rk + 1.0) * 1e6)

    ideal = sorted(rel.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    idcg = sum(gain(r, rk + 1) for rk, (_, r) in enumerate(ideal))
    got = {(r["k1"], r["b"]): r for r in rows}
    for k1, b in [(0.9, 0.4), (0.9, 0.75), (1.2, 0.4), (1.2, 0.75),
                  (1.5, 0.4), (1.5, 0.75)]:
        s_e6 = {}
        for i in rel:
            s = 0
            for t in terms:
                tf = toks[i].count(t)
                if not tf:
                    continue
                idf = math.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
                s += round(idf * tf * (k1 + 1.0)
                           / (tf + k1 * (1.0 - b + b * len(toks[i]) / avgdl))
                           * 1e6)
            s_e6[i] = s
        order = sorted(s_e6.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        dcg = sum(gain(rel[i], rk + 1) for rk, (i, _) in enumerate(order))
        r = got[(k1, b)]
        assert r["n_ranked"] == len(order), (k1, b)
        assert r["top1_doc"] == order[0][0], (k1, b)
        assert abs(r["ndcg10"] - round(dcg / idcg, 6)) < 1e-9, (k1, b)

"""Robust-eval-wave semantic replays (the test_stat_semantics.py
discipline): each query's ORACLE SQL — the shared formula text both
engines evaluate — is run on tiny synthetic tables and checked against
an independent pure-Python third implementation, so a formula error
cannot hide behind a Spark==DuckDB agreement.
"""

from __future__ import annotations

import hashlib
import math

import duckdb

from mapreduce_server_development_spark.plans import ORACLE


def _run(tables, name):
    con = duckdb.connect()
    for tname, (cols, rows) in tables.items():
        con.execute(f"CREATE TABLE {tname} ({', '.join(cols)})")
        if rows:
            ph = ", ".join("?" for _ in rows[0])
            con.executemany(f"INSERT INTO {tname} VALUES ({ph})", rows)
    res = con.sql(ORACLE[name])
    out = [dict(zip([c.lower() for c in res.columns], r)) for r in res.fetchall()]
    con.close()
    return out


def _orders(rows):
    """rows: (o_orderkey, o_custkey, o_totalprice, o_orderdate, o_orderpriority)."""
    return (
        ["o_orderkey BIGINT", "o_custkey BIGINT", "o_orderstatus VARCHAR",
         "o_totalprice DOUBLE", "o_orderdate DATE", "o_orderpriority VARCHAR"],
        [(k, c, "O", p, d, pri) for (k, c, p, d, pri) in rows],
    )


def _lineitem(rows):
    """rows: (l_orderkey, l_partkey, l_linenumber, l_quantity,
    l_extendedprice, l_discount, l_returnflag)."""
    return (
        ["l_orderkey BIGINT", "l_partkey BIGINT", "l_suppkey BIGINT",
         "l_linenumber BIGINT", "l_quantity DOUBLE", "l_extendedprice DOUBLE",
         "l_discount DOUBLE", "l_tax DOUBLE", "l_returnflag VARCHAR",
         "l_linestatus VARCHAR", "l_shipdate DATE"],
        [(ok, pk, 1, ln, q, ep, di, 0.0, rf, "F", "1995-01-01")
         for (ok, pk, ln, q, ep, di, rf) in rows],
    )


def _docs(texts):
    return (
        ["doc_id BIGINT", "text VARCHAR", "lang VARCHAR",
         "source VARCHAR", "n_chars BIGINT"],
        [(i, t, "en", "web", len(t)) for i, t in enumerate(texts)],
    )


def _bucket(salt: str, key) -> int:
    """hash_bucket replay: 4 md5 nibbles mod 1000."""
    h = hashlib.md5(f"{salt}:{key}".encode()).hexdigest()
    nib = [int(c, 16) for c in h[:4]]
    return (nib[0] * 4096 + nib[1] * 256 + nib[2] * 16 + nib[3]) % 1000


# ---------------------------------------------------------------------------
# q_ransac_trend
# ---------------------------------------------------------------------------


def test_ransac_replay():
    # A clean slope-200 cents/month line with two wild outlier months:
    # RANSAC must recover the line; the outliers must not be inliers.
    months = list(range(20))
    cents = {m: 100000 + 200 * m for m in months}
    cents[3] = 900000
    cents[17] = 5000
    rows = []
    for m in months:
        y, mo = divmod(m, 12)
        rows.append((m, 1, cents[m] / 100.0, f"{1992 + y}-{mo + 1:02d}-15", "1-URGENT"))
    out = _run({"orders": _orders(rows)}, "q_ransac_trend")
    assert len(out) == 1
    r = out[0]

    # Independent replay.
    anchors = sorted(
        months, key=lambda m: hashlib.md5(f"rs:{m}".encode()).hexdigest()
    )[:16]
    anchors = sorted(anchors)
    tol = sum(cents.values()) // (len(months) * 10)
    best = None
    for i, mi in enumerate(anchors):
        for mj in anchors[i + 1:]:
            n_inl = sum(
                1
                for m in months
                if abs((cents[m] - cents[mi]) * (mj - mi)
                       - (cents[mj] - cents[mi]) * (m - mi)) <= tol * (mj - mi)
            )
            key = (-n_inl, mi, mj)
            if best is None or key < best[0]:
                best = (key, mi, mj)
    _, bmi, bmj = best
    inl = [
        m
        for m in months
        if abs((cents[m] - cents[bmi]) * (bmj - bmi)
               - (cents[bmj] - cents[bmi]) * (m - bmi)) <= tol * (bmj - bmi)
    ]
    n = len(inl)
    sm = sum(inl)
    sy = sum(cents[m] for m in inl)
    smy = sum(m * cents[m] for m in inl)
    smm = sum(m * m for m in inl)
    slope = (n * smy - sm * sy) / (n * smm - sm * sm) / 100.0
    intercept = (sy * smm - sm * smy) / (n * smm - sm * sm) / 100.0

    assert r["n_months"] == 20
    assert (r["best_mi"], r["best_mj"]) == (bmi, bmj)
    assert r["n_inliers"] == len(inl)
    assert 3 not in inl and 17 not in inl
    assert abs(r["slope_dollars"] - round(slope, 6)) < 1e-9
    assert abs(r["intercept_dollars"] - round(intercept, 6)) < 1e-9
    # The two outliers are the only non-inliers of the recovered line.
    assert r["n_inliers"] == 18
    assert abs(r["slope_dollars"] - 2.0) < 1e-6


# ---------------------------------------------------------------------------
# q_hbos_outliers
# ---------------------------------------------------------------------------


def test_hbos_replay():
    # 12 rows: a dense cluster plus one row extreme in every feature.
    rows = []
    for i in range(11):
        rows.append((i, 1, 1, 10 + (i % 3), 1000.0 + i, 0.02, "N"))
    rows.append((99, 1, 1, 50, 90000.0, 0.10, "N"))
    out = _run({"lineitem": _lineitem(rows)}, "q_hbos_outliers")

    feats = [
        (ok, ln, int(q), int(round(ep * 100)), int(round(di * 100)))
        for (ok, pk, ln, q, ep, di, rf) in rows
    ]
    n = len(feats)
    scores = {}
    for fi in (2, 3, 4):
        vals = [f[fi] for f in feats]
        mn, mx = min(vals), max(vals)
        bins = {}
        for f in feats:
            b = ((f[fi] - mn) * 10) // (mx - mn + 1)
            bins[b] = bins.get(b, 0) + 1
        for f in feats:
            b = ((f[fi] - mn) * 10) // (mx - mn + 1)
            s = int(math.copysign(math.floor(abs(math.log(n / bins[b]) * 1e6) + 0.5),
                                  math.log(n / bins[b])))
            scores[(f[0], f[1])] = scores.get((f[0], f[1]), 0) + s
    expect = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    got = [((r["l_orderkey"], r["l_linenumber"]), r["hbos_e6"]) for r in out]
    assert got == expect[:20]
    # The engineered outlier is the top row.
    assert got[0][0] == (99, 1)


# ---------------------------------------------------------------------------
# q_conformal_forecast
# ---------------------------------------------------------------------------


def test_conformal_replay():
    # One order per day for 100 days, revenue t^2 cents: residuals
    # |y_t - y_(t-14)| = 28t - 196 strictly increase, so every
    # conformal quantile and the (all-miss) holdout coverage are
    # hand-computable.
    import datetime

    base = datetime.date(1995, 1, 1)
    rows = []
    for t in range(1, 101):
        rows.append((t, 1, (t * t) / 100.0, (base + datetime.timedelta(days=t)).isoformat(), "1-URGENT"))
    out = _run({"orders": _orders(rows)}, "q_conformal_forecast")
    assert [r["alpha_pct"] for r in out] == [20, 10, 5]

    resid = {t: 28 * t - 196 for t in range(15, 87)}  # calibration days
    n_cal = len(resid)
    ordered = sorted(resid.values())
    hold = {t: 28 * t - 196 for t in range(87, 101)}
    for r in out:
        a = r["alpha_pct"]
        q_idx = ((100 - a) * (n_cal + 1) + 99) // 100
        q_hat = ordered[q_idx - 1]
        assert r["n_cal"] == n_cal
        assert abs(r["q_hat_dollars"] - round(q_hat / 100.0, 2)) < 1e-9
        covered = sum(1 for v in hold.values() if v <= q_hat)
        assert r["n_holdout"] == 14
        assert r["n_covered"] == covered == 0


# ---------------------------------------------------------------------------
# q_permutation_test
# ---------------------------------------------------------------------------


def test_permutation_replay():
    # 24 orders, URGENT systematically pricier; replicate the 99
    # hash replicates bit-for-bit in Python.
    rows = []
    for k in range(24):
        pri = "1-URGENT" if k % 2 == 0 else "5-LOW"
        price = (500000 + 1000 * k if k % 2 == 0 else 100000 + 1000 * k) / 100.0
        rows.append((k, 1, price, "1995-06-01", pri))
    out = _run({"orders": _orders(rows)}, "q_permutation_test")
    assert len(out) == 1
    r = out[0]

    cents = {k: int(round(p * 100)) for (k, c, p, d, pri) in rows}
    is_a = {k: (pri == "1-URGENT") for (k, c, p, d, pri) in rows}
    n = len(rows)
    n_a = sum(is_a.values())
    s_a = sum(cents[k] for k in cents if is_a[k])
    s_b = sum(cents[k] for k in cents if not is_a[k])
    diff_obs = s_a / n_a - s_b / (n - n_a)
    n_extreme = 0
    for rep in range(99):
        blk, slot = divmod(rep, 8)
        sa = na = sb = nb = 0
        for k in cents:
            h = hashlib.md5(f"pm:{blk}:{k}".encode()).hexdigest()
            u = int(h[slot * 4: slot * 4 + 4], 16)
            if u * n < n_a * 65536:
                sa += cents[k]
                na += 1
            else:
                sb += cents[k]
                nb += 1
        if na and nb and abs(sa / na - sb / nb) >= abs(diff_obs):
            n_extreme += 1
    assert r["n_a"] == n_a and r["n_b"] == n - n_a
    assert r["n_extreme"] == n_extreme
    assert abs(r["p_value"] - round((1 + n_extreme) / 100, 6)) < 1e-9
    # The engineered effect is as extreme as any binomial re-draw gets.
    assert r["p_value"] <= 0.05


# ---------------------------------------------------------------------------
# q_fisher_exact
# ---------------------------------------------------------------------------


def _fisher_exact_py(n, r1, c1, a):
    """Exact two-sided Fisher via lgamma (inclusion: P(k) <= P(a),
    with a hair of slack mirroring the query's 1e-6-nat slack)."""
    lf = math.lgamma

    def logp(k):
        return (
            lf(r1 + 1) + lf(n - r1 + 1) + lf(c1 + 1) + lf(n - c1 + 1)
            - lf(n + 1) - lf(k + 1) - lf(r1 - k + 1) - lf(c1 - k + 1)
            - lf(n - r1 - c1 + k + 1)
        )
    lo, hi = max(0, r1 + c1 - n), min(r1, c1)
    la = logp(a)
    return sum(math.exp(logp(k)) for k in range(lo, hi + 1)
               if logp(k) <= la + 1e-6)


def test_fisher_replay():
    # 2x2 with a strong association: R-flag rows are mostly bulk.
    rows = []
    kk = 0
    for (rf, bulk, cnt) in (("R", True, 12), ("R", False, 3),
                            ("N", True, 4), ("N", False, 21)):
        for _ in range(cnt):
            rows.append((kk, 1, 1, 30 if bulk else 10, 1000.0, 0.0, rf))
            kk += 1
    out = _run({"lineitem": _lineitem(rows)}, "q_fisher_exact")
    assert len(out) == 1
    r = out[0]
    assert (r["n"], r["r1"], r["c1"], r["a_obs"]) == (40, 15, 16, 12)
    p = _fisher_exact_py(40, 15, 16, 12)
    # Exact-table args dominate here (cells <= 40 uses Stirling only
    # for n-scale factorials where its error is < 1e-12).
    assert abs(r["p_two_sided"] - p) < 1e-5
    assert r["p_two_sided"] < 0.01  # the association is real


def test_stirling_lf_accuracy():
    # The query's Stirling branch vs exact lgamma, across the scales
    # the 2x2 margins actually hit.
    for k in (21, 37, 100, 5000, 600000, 10**9):
        d = float(k)
        stirl = (
            (d + 0.5) * math.log(d) - d + 0.91893853320467274178032973640562
            + 1 / (12 * d) - 1 / (360 * d**3) + 1 / (1260 * d**5)
        )
        assert abs(stirl - math.lgamma(k + 1)) < 1e-10 * max(1.0, abs(stirl))


# ---------------------------------------------------------------------------
# q_als_rank1
# ---------------------------------------------------------------------------


def test_als_rank1_replay():
    # 3 customers x 4 parts, distinctive counts; exact integer replay.
    buys = {(1, 10): 4, (1, 11): 1, (2, 10): 2, (2, 12): 5,
            (3, 11): 3, (3, 13): 1}
    orders, lineitem, ok = [], [], 0
    for (cust, part), cnt in sorted(buys.items()):
        for _ in range(cnt):
            orders.append((ok, cust, 100.0, "1995-01-01", "1-URGENT"))
            lineitem.append((ok, part, 1, 1, 100.0, 0.0, "N"))
            ok += 1
    out = _run(
        {"orders": _orders(orders), "lineitem": _lineitem(lineitem)},
        "q_als_rank1",
    )

    E6 = 1_000_000
    ratings = dict(buys)
    custs = sorted({c for c, _ in ratings})
    parts = sorted({p for _, p in ratings})
    u = {}
    for c in custs:
        obs = [(p, r) for (cc, p), r in ratings.items() if cc == c]
        u[c] = sum(r for _, r in obs) * E6 // len(obs)
    v = {}
    for p in parts:
        obs = [(c, r) for (c, pp), r in ratings.items() if pp == p]
        v[p] = (sum(r * u[c] for c, r in obs) * E6 * E6
                // sum(u[c] * u[c] for c, _ in obs))
    for c in custs:
        obs = [(p, r) for (cc, p), r in ratings.items() if cc == c]
        u[c] = (sum(r * v[p] for p, r in obs) * E6 * E6
                // sum(v[p] * v[p] for p, _ in obs))
    panel = sorted(
        custs, key=lambda c: hashlib.md5(f"als:{c}".encode()).hexdigest()
    )[:5]
    expect = []
    for c in sorted(panel):
        scored = sorted(
            ((u[c] * v[p] // E6, p) for p in parts if (c, p) not in ratings),
            key=lambda sp: (-sp[0], sp[1]),
        )
        for rank, (s, p) in enumerate(scored[:3], 1):
            expect.append((c, rank, p, s))
    got = [(r["cust_key"], r["rec_rank"], r["part_key"], r["score_e6"])
           for r in out]
    assert got == expect


# ---------------------------------------------------------------------------
# q_kneser_ney
# ---------------------------------------------------------------------------


def test_kneser_ney_replay():
    texts = [
        "the cat sat on the mat",
        "the dog sat on the rug",
        "a cat and a dog sat",
        "the mat and the rug",
    ]
    out = _run({"documents": _docs(texts)}, "q_kneser_ney")

    train = [i for i in range(len(texts)) if _bucket("inc", i) % 10 < 8]
    assert train, "hash split left no training docs"
    bi = {}
    for i in train:
        toks = texts[i].split()
        for a, b in zip(toks, toks[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    c1, n1f, n1b = {}, {}, {}
    for (a, b), c in bi.items():
        c1[a] = c1.get(a, 0) + c
        n1f[a] = n1f.get(a, 0) + 1
        n1b[b] = n1b.get(b, 0) + 1
    T = len(bi)

    def lp(a, b):
        if a in c1:
            num = max(max(4 * bi.get((a, b), 0) - 3, 0) * T
                      + 3 * n1f[a] * n1b.get(b, 0), 1)
            den = 4 * c1[a] * T
        else:
            num = 2 * max(n1b.get(b, 0), 1)
            den = 4 * T
        x = math.log(num / den) * 10000
        return int(math.copysign(math.floor(abs(x) + 0.5), x))

    for r in out:
        toks = texts[r["doc_id"]].split()
        pairs = list(zip(toks, toks[1:]))
        assert r["n_bigrams"] == len(pairs)
        assert r["score_tenk"] == sum(lp(a, b) for a, b in pairs)
        if pairs:
            assert r["avg_lp_e6"] == math.floor(
                r["score_tenk"] * 100 / len(pairs)
            )

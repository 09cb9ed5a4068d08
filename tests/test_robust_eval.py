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


# ---------------------------------------------------------------------------
# q_betweenness — pure-Python Brandes replay on a hand-built graph
# ---------------------------------------------------------------------------


def test_betweenness_replay():
    # Build a co-purchase graph (support >= 2): a path 1-2-3-4 plus a
    # spur 3-5. Vertex 3 should out-broker everyone.
    baskets = [(1, 2), (1, 2), (2, 3), (2, 3), (3, 4), (3, 4), (3, 5), (3, 5)]
    rows = []
    for ok, (p1, p2) in enumerate(baskets):
        rows.append((ok, p1, 1, 1, 100.0, 0.0, "N"))
        rows.append((ok, p2, 2, 1, 100.0, 0.0, "N"))
    out = _run({"lineitem": _lineitem(rows)}, "q_betweenness")

    edges = {(1, 2), (2, 3), (3, 4), (3, 5)}
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seeds = sorted(
        adj, key=lambda v: (hashlib.md5(f"btw:{v}".encode()).hexdigest(), v)
    )[:5]
    H = 3
    bc = {}
    for s in seeds:
        dist, sig = {s: 0}, {s: 1}
        levels = {0: [s]}
        for r in range(1, H + 1):
            levels[r] = []
            agg = {}
            for p in levels[r - 1]:
                for w in adj.get(p, ()):
                    if w not in dist:
                        agg[w] = agg.get(w, 0) + sig[p]
            for w, sg in agg.items():
                dist[w] = r
                sig[w] = sg
                levels[r].append(w)
        delta = {}
        for r in range(H, 1, -1):
            contrib = {}
            for v in levels[r]:
                for p in adj.get(v, ()):
                    if dist.get(p) == r - 1:
                        term = sig[p] * (10**9 + delta.get((r, v), 0)) // sig[v]
                        contrib[p] = contrib.get(p, 0) + term
            for p, d in contrib.items():
                delta[(r - 1, p)] = d
        for (r, v), d in delta.items():
            if r >= 1:
                bc[v] = bc.get(v, 0) + d
    expect = sorted(bc.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [(r["part_key"], r["bc_e9"]) for r in out]
    assert got == expect
    assert got[0][0] == 3  # the broker vertex


# ---------------------------------------------------------------------------
# q_nb_crossval — pure-Python complement-trick replay
# ---------------------------------------------------------------------------


def test_nb_crossval_replay():
    import duckdb as _d  # only for table loading symmetry; replay is pure

    texts = {
        0: ("news", "stocks fell sharply today"),
        1: ("news", "markets rallied on earnings today"),
        2: ("blog", "my cat loves sunny windows"),
        3: ("blog", "sunny days make the cat happy"),
        4: ("news", "earnings beat forecasts stocks rallied"),
        5: ("blog", "happy cat sunny mood"),
        6: ("news", "stocks slid on weak forecasts"),
        7: ("blog", "windows and cats and naps"),
    }
    tables = {
        "documents": (
            ["doc_id BIGINT", "text VARCHAR", "lang VARCHAR",
             "source VARCHAR", "n_chars BIGINT"],
            [(i, t, "en", src, len(t)) for i, (src, t) in texts.items()],
        )
    }
    out = _run(tables, "q_nb_crossval")

    folds = {i: _bucket("nbcv", i) % 5 if False else None for i in texts}
    # hash_bucket with buckets=5: nibble sum % 5.
    def b5(i):
        h = hashlib.md5(f"nbcv:{i}".encode()).hexdigest()
        nib = [int(c, 16) for c in h[:4]]
        return (nib[0] * 4096 + nib[1] * 256 + nib[2] * 16 + nib[3]) % 5

    folds = {i: b5(i) for i in texts}
    classes = sorted({src for src, _ in texts.values()})
    toks = {i: t.lower().split() for i, (_, t) in texts.items()}

    def rha(x):
        return int(math.copysign(math.floor(abs(x) + 0.5), x))

    acc = {}
    for f in sorted({*folds.values()}):
        train = [i for i in texts if folds[i] != f]
        test = [i for i in texts if folds[i] == f]
        cnt, tot = {}, {}
        vocab = set()
        for i in train:
            src = texts[i][0]
            for tk in toks[i]:
                cnt[(src, tk)] = cnt.get((src, tk), 0) + 1
                tot[src] = tot.get(src, 0) + 1
                vocab.add(tk)
        v = len(vocab)
        n_train = len(train)
        correct = 0
        for i in test:
            best = None
            for c in classes:
                nd = sum(1 for j in train if texts[j][0] == c)
                score = rha(
                    math.log((nd + 1) / (n_train + len(classes))) * 1e6
                )
                for tk in toks[i]:
                    score += rha(
                        math.log(
                            (cnt.get((c, tk), 0) + 1) / (tot.get(c, 0) + v)
                        )
                        * 1e6
                    )
                key = (-score, c)
                if best is None or key < best:
                    best = key
            if best[1] == texts[i][0]:
                correct += 1
        acc[f] = (len(test), correct)
    got = {r["fold"]: (r["n_docs"], r["n_correct"]) for r in out}
    assert got == acc


# ---------------------------------------------------------------------------
# q_adaboost_stumps — pure-Python boosted-stump replay
# ---------------------------------------------------------------------------


def test_adaboost_replay():
    # Returnflag correlates with bulk quantity, with noise rows that
    # force a non-trivial second round.
    rows = []
    k = 0
    for qty, price, disc, rf, cnt in (
        (40, 5000.0, 0.05, "R", 8),
        (10, 1000.0, 0.01, "N", 8),
        (40, 1000.0, 0.01, "N", 2),
        (10, 5000.0, 0.08, "R", 2),
    ):
        for _ in range(cnt):
            rows.append((k, 1, 1, qty, price, disc, rf))
            k += 1
    out = _run({"lineitem": _lineitem(rows)}, "q_adaboost_stumps")
    assert [r["round"] for r in out] == [1, 2, 3]

    feats = [
        (int(q), int(round(p * 100)), int(round(d * 100)),
         1 if rf == "R" else -1)
        for (_, _, _, q, p, d, rf) in rows
    ]
    mn = [min(f[i] for f in feats) for i in range(3)]
    mx = [max(f[i] for f in feats) for i in range(3)]
    bins = [
        tuple(((f[i] - mn[i]) * 10) // (mx[i] - mn[i] + 1) for i in range(3))
        for f in feats
    ]
    ys = [f[3] for f in feats]
    cands = [(fid, thr, pol) for fid in range(3) for thr in range(1, 10)
             for pol in (1, -1)]

    def rha(x):
        return int(math.copysign(math.floor(abs(x) + 0.5), x))

    E9 = 10**9
    w = [E9] * len(feats)
    chosen = []
    for t in range(3):
        best = None
        for (fid, thr, pol) in cands:
            err = sum(
                w[i]
                for i in range(len(feats))
                if (pol * (1 if bins[i][fid] >= thr else -1)) != ys[i]
            )
            key = (err, fid, thr, pol)
            if best is None or key < best:
                best = key
        err, fid, thr, pol = best
        W = sum(w)
        ec = min(max(err / E9, 1), W / E9 - 1)
        alpha = rha(0.5 * math.log((W / E9 - ec) / ec) * E9)
        chosen.append((fid, thr, pol, err, W, alpha))
        # Re-derive weights from the bit-pattern closed form (exactly
        # as the query does), not incrementally.
        sofar = chosen
        for i in range(len(feats)):
            signed = 0
            for (cfid, cthr, cpol, _, _, calpha) in sofar:
                bit = (cpol * (1 if bins[i][cfid] >= cthr else -1)) == ys[i]
                signed += -calpha if bit else calpha
            w[i] = rha(math.exp(signed / E9) * E9)
    for r, (fid, thr, pol, err, W, alpha) in zip(out, chosen):
        assert r["feature"] == ("qty", "price_c", "disc_h")[fid]
        assert (r["thr_bin"], r["polarity"]) == (thr, pol)
        assert abs(r["err_rate"] - round(err / W, 6)) < 1e-9
        assert r["alpha_e9"] == alpha
    n_corr = 0
    for i in range(len(feats)):
        margin = 0
        for (cfid, cthr, cpol, _, _, calpha) in chosen:
            bit = (cpol * (1 if bins[i][cfid] >= cthr else -1)) == ys[i]
            margin += calpha if bit else -calpha
        n_corr += margin > 0
    assert all(
        abs(r["train_accuracy"] - round(n_corr / len(feats), 6)) < 1e-9
        for r in out
    )
    assert n_corr / len(feats) >= 0.8  # boosting actually fits the pattern


# ---------------------------------------------------------------------------
# q_quantile_reg — pure-Python pinball replay
# ---------------------------------------------------------------------------


def test_quantile_reg_replay():
    import datetime

    # 24 months of linear revenue with asymmetric spikes: the median
    # fit must ignore the spikes that pull OLS up.
    cents = {}
    for m in range(24):
        cents[m] = 1_000_000 + 50_000 * m + (400_000 if m % 6 == 0 else 0)
    rows = []
    for m, c in cents.items():
        y, mo = divmod(m, 12)
        rows.append((m, 1, c / 100.0, f"{1992 + y}-{mo + 1:02d}-10", "1-URGENT"))
    out = _run({"orders": _orders(rows)}, "q_quantile_reg")
    assert [r["tau_pct"] for r in out] == [25, 50, 75]

    ms = sorted(cents)
    n = len(ms)
    sm = sum(ms)
    sy = sum(cents.values())
    smy = sum(m * cents[m] for m in ms)
    smm = sum(m * m for m in ms)
    s0 = math.floor((n * smy - sm * sy) / (n * smm - sm * sm))
    for r in out:
        tau = r["tau_pct"]
        best = None
        for j in range(80, 121, 2):
            s = math.floor(s0 * j / 100)
            resid = sorted((cents[m] - s * m, m) for m in ms)
            q_idx = (tau * n + 99) // 100
            b = resid[q_idx - 1][0]
            l100 = sum(
                tau * (rr - b) if rr > b else (tau - 100) * (rr - b)
                for rr, _ in resid
            )
            key = (l100, s)
            if best is None or key < best:
                best = (l100, s, b)
        l100, s, b = best
        assert abs(r["slope_dollars"] - round(s / 100, 6)) < 1e-9
        assert abs(r["intercept_dollars"] - round(b / 100, 2)) < 1e-9
        assert abs(r["avg_pinball_dollars"] - round((l100 // n) / 10000, 4)) < 1e-9


# ---------------------------------------------------------------------------
# q_cusum — pure-Python sequential-recurrence replay
# ---------------------------------------------------------------------------


def test_cusum_replay():
    import datetime

    # Baseline year in control around 2000.00; a +5-sigma-ish upward
    # shift mid-1993 and a dip late 1993.
    base = datetime.date(1992, 1, 1)
    days = {}
    for t in range(500):
        d = base + datetime.timedelta(days=t)
        x = 200000 + (t % 7) * 1000
        if 420 <= t < 450:
            x += 40000
        if 470 <= t < 480:
            x -= 40000
        days[d] = x
    rows = [
        (i, 1, x / 100.0, d.isoformat(), "1-URGENT")
        for i, (d, x) in enumerate(sorted(days.items()))
    ]
    out = _run({"orders": _orders(rows)}, "q_cusum")
    assert len(out) == 1
    r = out[0]

    min_day = min(days)
    basevals = [
        x for d, x in days.items()
        if d < min_day + datetime.timedelta(days=365)
    ]
    nb = len(basevals)
    mu0 = sum(basevals) // nb
    # exact variance via integer sums, like the query:
    sx = sum(basevals)
    sxx = sum(v * v for v in basevals)
    sigma = math.floor(math.sqrt((nb * sxx - float(sx) * sx) / (nb * (nb - 1))))
    k, h = sigma // 2, sigma * 5
    s_hi = s_lo = 0
    n_hi = n_lo = 0
    first_hi = first_lo = None
    max_hi = max_lo = 0
    for d in sorted(days):
        x = days[d]
        s_hi = max(0, s_hi + x - mu0 - k)
        s_lo = max(0, s_lo + mu0 - k - x)
        if s_hi > h:
            n_hi += 1
            first_hi = first_hi or d
        if s_lo > h:
            n_lo += 1
            first_lo = first_lo or d
        max_hi, max_lo = max(max_hi, s_hi), max(max_lo, s_lo)
    assert r["n_base"] == nb
    assert abs(r["mu0_dollars"] - round(mu0 / 100, 2)) < 1e-9
    assert abs(r["sigma_dollars"] - round(sigma / 100, 2)) < 1e-9
    assert (r["n_alarm_hi"], r["n_alarm_lo"]) == (n_hi, n_lo)
    assert (r["first_alarm_hi"], r["first_alarm_lo"]) == (first_hi, first_lo)
    assert abs(r["max_s_hi_dollars"] - round(max_hi / 100, 2)) < 1e-9
    assert abs(r["max_s_lo_dollars"] - round(max_lo / 100, 2)) < 1e-9
    assert n_hi > 0 and n_lo > 0  # both engineered shifts alarmed


# ---------------------------------------------------------------------------
# q_cluster_bootstrap — md5-weight replay
# ---------------------------------------------------------------------------


def test_cluster_bootstrap_replay():
    # 6 customers with very different order-value levels: the cluster
    # CI must reproduce the exact md5-derived weights.
    rows = []
    ok = 0
    for cust in range(1, 7):
        for _ in range(4):
            rows.append((ok, cust, cust * 1000.0, "1995-03-01", "1-URGENT"))
            ok += 1
    out = _run({"orders": _orders(rows)}, "q_cluster_bootstrap")
    assert len(out) == 1
    r = out[0]

    clusters = {}
    for (okey, cust, price, _, _) in rows:
        c = int(round(price * 100))
        s, n = clusters.get(cust, (0, 0))
        clusters[cust] = (s + c, n + 1)
    means = []
    for rep in range(50):
        blk, j = divmod(rep, 32)
        s = n = 0
        for cust, (sc, nc) in clusters.items():
            h = hashlib.md5(f"cb:{blk}:{cust}".encode()).hexdigest()
            d = int(h[j], 16)
            wt = 0 if d < 6 else 1 if d < 12 else 2 if d < 15 else 3
            s += wt * sc
            n += wt * nc
        means.append(s * 100 // n)
    means.sort()
    assert r["n_clusters"] == 6
    assert abs(r["ci_lo"] - round(means[1] / 10000, 2)) < 1e-9
    assert abs(r["ci_hi"] - round(means[48] / 10000, 2)) < 1e-9


# ---------------------------------------------------------------------------
# q_stream_conformal — batch-equivalent model replay
# ---------------------------------------------------------------------------


def test_stream_conformal_model():
    # Two event types with known medians/q_hats; flag counts replayed.
    rows = []
    eid = 0
    for et, vals in (
        ("purchase", [10, 10, 12, 14, 100]),
        ("view", [1, 2, 3]),
    ):
        for v in vals:
            rows.append((eid, "2024-01-01 00:00:00", 1, et, float(v), "{}"))
            eid += 1
    tables = {
        "events": (
            ["event_id BIGINT", "ts TIMESTAMP", "user_id BIGINT",
             "event_type VARCHAR", "value DOUBLE", "props VARCHAR"],
            rows,
        )
    }
    out = _run(tables, "q_stream_conformal")
    got = {r["event_type"]: r for r in out}

    for et, vals in (("purchase", [10, 10, 12, 14, 100]),
                     ("view", [1, 2, 3])):
        cs = sorted(int(v * 100) for v in vals)
        n = len(cs)
        med = cs[(n + 1) // 2 - 1]
        resid = sorted(abs(c - med) for c in cs)
        q_idx = min((9 * (n + 1) + 9) // 10, n)
        q_hat = resid[q_idx - 1]
        flagged = sum(1 for c in cs if abs(c - med) > q_hat)
        g = got[et]
        assert g["n_events"] == n
        assert abs(g["median_dollars"] - round(med / 100, 2)) < 1e-9
        assert abs(g["q_hat_dollars"] - round(q_hat / 100, 2)) < 1e-9
        assert g["n_flagged"] == flagged


# ---------------------------------------------------------------------------
# q_price_index — hand-computed index replay
# ---------------------------------------------------------------------------


def test_price_index_replay():
    # Two parts; part 1 doubles in price in month 13, part 2 is flat.
    # Base = first 365 days (months 0-11).
    rows = []
    ok = 0
    for m in range(15):
        y, mo = divmod(m, 12)
        d = f"{1995 + y}-{mo + 1:02d}-10"
        p1 = 200.0 if m < 13 else 400.0
        rows.append((ok, 1, 1, 2, 2 * p1, 0.0, "N", d)); ok += 1
        rows.append((ok, 2, 1, 5, 5 * 100.0, 0.0, "N", d)); ok += 1
    tables = {
        "lineitem": (
            ["l_orderkey BIGINT", "l_partkey BIGINT", "l_suppkey BIGINT",
             "l_linenumber BIGINT", "l_quantity DOUBLE",
             "l_extendedprice DOUBLE", "l_discount DOUBLE", "l_tax DOUBLE",
             "l_returnflag VARCHAR", "l_linestatus VARCHAR",
             "l_shipdate DATE"],
            [(okey, pk, 1, ln, q, ep, di, 0.0, rf, "F", d)
             for (okey, pk, ln, q, ep, di, rf, d) in rows],
        )
    }
    out = _run(tables, "q_price_index")
    by_m = {r["month_idx"]: r for r in out}
    # Base: qb1=2*12=24, ub1=20000c; qb2=5*12=60, ub2=10000c.
    # Month 14 (0-based idx (1996-03)): ut1=40000, ut2=10000.
    m14 = by_m[(1996 - 1992) * 12 + 3 - 1]
    lasp = (24 * 40000 + 60 * 10000) / (24 * 20000 + 60 * 10000)
    assert abs(m14["laspeyres"] - round(lasp, 6)) < 1e-9
    # Paasche with current-month quantities (2 and 5).
    paa = (2 * 40000 + 5 * 10000) / (2 * 20000 + 5 * 10000)
    assert abs(m14["paasche"] - round(paa, 6)) < 1e-9
    assert abs(m14["fisher"] - round(math.sqrt(lasp * paa), 6)) < 1e-9
    # A pre-shift month indexes at exactly 1.
    m5 = by_m[(1995 - 1992) * 12 + 6 - 1]
    assert m5["laspeyres"] == 1.0 and m5["paasche"] == 1.0


# ---------------------------------------------------------------------------
# q_importance_ess — ESS identities
# ---------------------------------------------------------------------------


def test_importance_ess_identities():
    # One source whose docs are all duplicates of the same text must
    # have identical weights -> ESS == n and max share == 1/n; the
    # mixed source sits strictly between 1 and n.
    uni = ["the cat sat on the mat"] * 4
    mix = ["alpha beta gamma delta", "the the the the the",
           "epsilon zeta eta theta", "one two three four"]
    rows = []
    for i, t in enumerate(uni):
        rows.append((i, t, "en", "uniform", len(t)))
    for i, t in enumerate(mix):
        rows.append((100 + i, t, "fr", "mixed", len(t)))
    tables = {
        "documents": (
            ["doc_id BIGINT", "text VARCHAR", "lang VARCHAR",
             "source VARCHAR", "n_chars BIGINT"],
            rows,
        )
    }
    out = _run(tables, "q_importance_ess")
    got = {r["source"]: r for r in out}
    u = got["uniform"]
    assert u["n_docs"] == 4
    assert abs(u["ess"] - 4.0) < 1e-6
    assert abs(u["max_weight_share"] - 0.25) < 1e-6
    m = got["mixed"]
    assert 1.0 <= m["ess"] <= 4.0
    assert m["max_weight_share"] >= 0.25


# ---------------------------------------------------------------------------
# q_lsa_topic — spectral sanity on a two-block corpus
# ---------------------------------------------------------------------------


def test_lsa_topic_replay():
    # Exact integer replay of the max-normalized power iteration.
    texts = [
        "market stocks bonds yields",
        "market stocks inflation rates",
        "bonds yields inflation market",
        "cat dog fish",
        "dog fish bird",
        "cat bird dog",
    ]
    out = _run({"documents": _docs(texts)}, "q_lsa_topic")
    assert len(out) == 10

    E6 = 10**6
    n = len(texts)
    tf = {}
    for d, t in enumerate(texts):
        for tok in t.split():
            tf[(d, tok)] = tf.get((d, tok), 0) + 1
    df = {}
    for (d, tok) in tf:
        df[tok] = df.get(tok, 0) + 1
    A = {
        (d, tok): round(c * math.log(n / df[tok]) * E6)
        for (d, tok), c in tf.items()
        if df[tok] < n
    }
    terms = sorted({tok for _, tok in A})
    v = {tok: E6 for tok in terms}
    for _ in range(3):
        u = {}
        for (d, tok), w in A.items():
            u[d] = u.get(d, 0) + w * v[tok]
        mu = max(u.values())
        u = {d: E6 * x // mu for d, x in u.items()}
        vr = {}
        for (d, tok), w in A.items():
            vr[tok] = vr.get(tok, 0) + w * u[d]
        mv = max(vr.values())
        v = {tok: E6 * x // mv for tok, x in vr.items()}
    expect = sorted(v.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [(r["term"], r["loading_e6"]) for r in out]
    assert got == sorted(got, key=lambda kv: (-kv[1], kv[0]))
    assert got == expect
    assert out[0]["loading"] == 1.0  # max-normalized top loading


# ---------------------------------------------------------------------------
# q_aqp_audit / q_neyman_allocation — estimator replays
# ---------------------------------------------------------------------------


def test_aqp_audit_replay():
    rows = [(k, 1, 100.0 + k, "1995-02-01", "1-URGENT") for k in range(200)]
    out = _run({"orders": _orders(rows)}, "q_aqp_audit")
    assert len(out) == 1
    r = out[0]

    cents = {k: int(round((100.0 + k) * 100)) for k in range(200)}
    in_s = {k: _bucket("aqp", k) < 100 for k in cents}
    n, m = len(cents), sum(in_s.values())
    true_sum = sum(cents.values())
    samp = [c for k, c in cents.items() if in_s[k]]
    ssum, ssq = sum(samp), sum(c * c for c in samp)
    est = n / m * ssum
    se = n / m * math.sqrt((ssq - ssum * ssum / m) / (m - 1) * m * (1 - m / n))
    assert (r["n_rows"], r["n_sampled"]) == (n, m)
    assert abs(r["true_sum"] - round(true_sum / 100, 2)) < 1e-9
    assert abs(r["est_sum"] - round(est / 100, 2)) < 1e-6
    assert abs(r["rel_err"] - round((est - true_sum) / true_sum, 6)) < 1e-9
    assert r["ci_covers"] == (abs(est - true_sum) <= 1.959964 * se)


def test_neyman_allocation_replay():
    # Two strata: same size, one 10x the spread -> Neyman gives it
    # ~10x the budget; proportional splits evenly.
    rows = []
    k = 0
    for i in range(40):
        rows.append((k, 1, 1000.0 + (i % 5), "1995-02-01", "1-URGENT")); k += 1
    for i in range(40):
        rows.append((k, 1, 1000.0 + (i % 5) * 10, "1995-02-01", "5-LOW")); k += 1
    out = _run({"orders": _orders(rows)}, "q_neyman_allocation")
    got = {r["stratum"]: r for r in out}
    hi, lo = got["5-LOW"], got["1-URGENT"]
    assert hi["proportional_n"] == lo["proportional_n"] == 500
    assert abs(hi["neyman_n"] + lo["neyman_n"] - 1000) <= 1
    assert hi["neyman_n"] > 800  # the high-variance stratum dominates
    assert abs(hi["sd_dollars"] - 10 * lo["sd_dollars"]) < 0.05


# ---------------------------------------------------------------------------
# q_rbo / q_cooks_distance / q_watermark_lateness — wave-5 replays
# ---------------------------------------------------------------------------


def test_rbo_weights_are_exact():
    # The e12 weight table must equal sum_{d=m..10} 0.9^(d-1)/d.
    from mapreduce_server_development_spark.plans.robust_eval import _RBO_W

    for m in range(1, 11):
        w = sum(0.9 ** (d - 1) / d for d in range(m, 11))
        assert _RBO_W[m - 1] == round(w * 1e12)


def test_rbo_identical_and_disjoint():
    # Identical rankings -> RBO = (1-p) * sum p^(d-1) (agreement 1 at
    # every depth); vectors engineered so cosine and dot orders match
    # (equal norms) for one query and diverge for none.
    import duckdb as _d

    rows = []
    # 12 vectors on a circle (unit norm): cosine order == dot order.
    for i in range(12):
        ang = i * 0.3
        rows.append((i, [math.cos(ang), math.sin(ang)], 0))
    con = _d.connect()
    con.execute("CREATE TABLE embeddings (vec_id BIGINT, embedding FLOAT[], label INT)")
    con.executemany("INSERT INTO embeddings VALUES (?, ?, ?)", rows)
    from mapreduce_server_development_spark.plans import ORACLE

    out = [dict(zip([c.lower() for c in r.columns], t))
           for r in [con.sql(ORACLE["q_rbo"])]
           for t in r.fetchall()]
    con.close()
    full = 0.1 * sum(0.9 ** (d - 1) for d in range(1, 11))
    for r in out:
        assert abs(r["rbo"] - round(full, 6)) < 1e-9


def test_cooks_distance_replay():
    # Linear revenue with one wild month: that month must top Cook's D.
    months = {m: 1_000_000 + 10_000 * m for m in range(20)}
    months[7] = 5_000_000
    rows = []
    for m, c in months.items():
        y, mo = divmod(m, 12)
        rows.append((m, 1, c / 100.0, f"{1992 + y}-{mo + 1:02d}-05", "1-URGENT"))
    out = _run({"orders": _orders(rows)}, "q_cooks_distance")
    assert len(out) == 5
    assert out[0]["month_idx"] == 7

    n = len(months)
    sm = sum(months)
    sy = sum(months.values())
    smy = sum(m * c for m, c in months.items())
    smm = sum(m * m for m in months)
    den = n * smm - sm * sm
    slope_num = n * smy - sm * sy
    icept_num = sy * smm - sm * smy
    e = {m: (c * den - (icept_num + slope_num * m)) / den
         for m, c in months.items()}
    h = {m: 1 / n + (n * m - sm) ** 2 / (n * den) for m in months}
    s2 = sum(round(e[m] * e[m] * 1e4) for m in months) / 1e4 / (n - 2)
    cd = {m: e[m] ** 2 * h[m] / (2 * s2 * (1 - h[m]) ** 2) for m in months}
    expect = sorted(months, key=lambda m: (-round(cd[m], 6), m))[:5]
    assert [r["month_idx"] for r in out] == expect
    for r in out:
        m = r["month_idx"]
        assert abs(r["cooks_d"] - round(cd[m], 6)) < 1e-9
        assert abs(r["leverage"] - round(h[m], 6)) < 1e-9


def test_watermark_lateness_replay():
    # Hash-jittered arrival replayed event by event.
    rows = []
    for i in range(60):
        rows.append((i, f"2024-01-01 00:{i:02d}:00", 1, "view", 1.0, "{}"))
    tables = {
        "events": (
            ["event_id BIGINT", "ts TIMESTAMP", "user_id BIGINT",
             "event_type VARCHAR", "value DOUBLE", "props VARCHAR"],
            rows,
        )
    }
    out = _run(tables, "q_watermark_lateness")

    base = 1704067200_000000  # 2024-01-01 00:00:00 UTC in micros
    ev = []
    for i in range(60):
        us = base + i * 60 * 1_000_000
        # hash_bucket(salt, key, 600): 4-nibble value % 600
        h = hashlib.md5(f"arr:{i}".encode()).hexdigest()
        nib = [int(c, 16) for c in h[:4]]
        jit = (nib[0] * 4096 + nib[1] * 256 + nib[2] * 16 + nib[3]) % 600
        ev.append((us + jit * 1_000_000, i, us))
    ev.sort()
    mx = -1
    lates = []
    for arr, i, us in ev:
        mx = max(mx, us)
        lates.append((mx - us) // 1_000_000)
    n = len(lates)
    drops = {d: sum(1 for x in lates if x > d) for d in (60, 300, 900)}
    buckets = {}
    for x in lates:
        b = 0 if x <= 0 else 60 if x <= 60 else 300 if x <= 300 else \
            900 if x <= 900 else 999999
        buckets[b] = buckets.get(b, 0) + 1
    got = {r["bucket_s"]: r for r in out}
    assert {b: r["n_events"] for b, r in got.items()} == buckets
    any_row = next(iter(got.values()))
    for d in (60, 300, 900):
        assert any_row[f"dropped_{d}s"] == drops[d]
        assert abs(any_row[f"drop_rate_{d}s"] - round(drops[d] / n, 6)) < 1e-9
    # The jitter model actually produces late data on an in-order feed.
    assert sum(v for b, v in buckets.items() if b > 0) > 0


# ---------------------------------------------------------------------------
# q_wasserstein_distance — exact 1-D earth-mover replay
# ---------------------------------------------------------------------------


def test_wasserstein_replay():
    """Independent W1: integrate |F_A - F_B| over the cent grid by
    brute force (unit steps), plus two hand-checkable cases."""
    import random

    rng = random.Random(31)
    a_vals = [round(rng.uniform(10, 100), 2) for _ in range(40)]
    b_vals = [round(rng.uniform(20, 120), 2) for _ in range(25)]
    rows = []
    for i, v in enumerate(a_vals):
        rows.append((i, i, 1, 1.0, v, 0.0, "R"))
    for i, v in enumerate(b_vals):
        rows.append((1000 + i, i, 1, 1.0, v, 0.0, "N"))
    # an 'A'-flag row must be ignored entirely
    rows.append((5000, 1, 1, 1.0, 999.99, 0.0, "A"))

    out = _run({"lineitem": _lineitem(rows)}, "q_wasserstein_distance")[0]
    assert out["n_a"] == 40 and out["n_b"] == 25

    # brute-force reference on the integer-cent grid
    a = sorted(int(round(v * 100)) for v in a_vals)
    b = sorted(int(round(v * 100)) for v in b_vals)

    def cdf(xs, t):
        import bisect

        return bisect.bisect_right(xs, t) / len(xs)

    lo, hi = min(a + b), max(a + b)
    w1_cents = sum(abs(cdf(a, t) - cdf(b, t)) for t in range(lo, hi))
    # the query rounds to 4 decimals -> half-ulp tolerance
    assert abs(out["w1_dollars"] - w1_cents / 100) <= 5.001e-05

    # identical distributions -> 0
    rows2 = [(i, i, 1, 1.0, 50.0, 0.0, "R") for i in range(5)]
    rows2 += [(100 + i, i, 1, 1.0, 50.0, 0.0, "N") for i in range(3)]
    out2 = _run({"lineitem": _lineitem(rows2)}, "q_wasserstein_distance")[0]
    assert out2["w1_dollars"] == 0.0

    # point masses at 10 and 25 dollars -> W1 = 15
    rows3 = [(1, 1, 1, 1.0, 10.0, 0.0, "R"), (2, 1, 1, 1.0, 25.0, 0.0, "N")]
    out3 = _run({"lineitem": _lineitem(rows3)}, "q_wasserstein_distance")[0]
    assert out3["w1_dollars"] == 15.0


# ---------------------------------------------------------------------------
# q_target_encoding — leakage-safe out-of-fold encoding replay
# ---------------------------------------------------------------------------


def test_target_encoding_replay():
    """Independent replay: per (brand, fold), the encoding must be the
    smoothed mean of all OTHER folds' rows — verified by brute force
    per fold, including the never-leaks property (a fold's own rows
    excluded) and the rare-category shrink toward the global mean."""
    from collections import defaultdict

    def fold_of(ok, ln):
        h = hashlib.md5(f"tenc:{ok * 10 + ln}".encode()).hexdigest()
        return int(h[:4], 16) % 5

    # brand A: popular (50 rows, mean ~20.00); brand B: rare (2 rows,
    # mean 1000.00 -> must shrink hard toward the global mean)
    li_rows, part_rows = [], []
    part_rows.append((1, "A"))
    part_rows.append((2, "B"))
    k = 0
    for i in range(50):
        k += 1
        li_rows.append((k, 1, 1, 1.0, 20.0 + (i % 3), 0.0, "N"))
    for i in range(2):
        k += 1
        li_rows.append((k, 2, 1, 1.0, 1000.0, 0.0, "N"))

    tables = {
        "lineitem": _lineitem(li_rows),
        "part": (
            ["p_partkey BIGINT", "p_brand VARCHAR"],
            part_rows,
        ),
    }
    out = _run(tables, "q_target_encoding")
    assert len(out) == 10  # 2 brands x 5 folds

    # brute-force expectation
    rows = []
    for (ok, pk, ln, q, ep, di, rf) in li_rows:
        brand = "A" if pk == 1 else "B"
        rows.append((brand, fold_of(ok, ln), int(round(ep * (1 - di) * 100))))
    g_sum = sum(r[2] for r in rows)
    g_n = len(rows)
    by_bf = defaultdict(lambda: [0, 0])
    by_b = defaultdict(lambda: [0, 0])
    for b, f, rev in rows:
        by_bf[(b, f)][0] += 1
        by_bf[(b, f)][1] += rev
        by_b[b][0] += 1
        by_b[b][1] += rev
    for r in out:
        b, f = r["brand"], r["fold"]
        nf, sf_ = by_bf.get((b, f), [0, 0])
        n_oof = by_b[b][0] - nf
        sum_oof = by_b[b][1] - sf_
        want = (sum_oof + 20 * (g_sum / g_n)) / (n_oof + 20) / 100
        assert r["n_fold_rows"] == nf, (b, f)
        assert r["n_oof_rows"] == n_oof, (b, f)
        assert abs(r["encoding_dollars"] - want) <= 5.1e-05, (b, f, r, want)
        if b == "B":
            # rare category: encoding must sit between the global mean
            # and the raw category mean (shrinkage), far below 1000
            assert r["encoding_dollars"] < 300
            assert r["encoding_dollars"] >= r["global_mean_dollars"] - 0.01

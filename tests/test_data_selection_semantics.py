"""Brute-force semantic replays for the data-selection family.

Same method as tests/test_stat_semantics.py: re-derive each operator
with an independent pure-Python implementation on tiny hand-built
tables, then run the QUERY'S OWN ORACLE SQL against those tables in a
fresh DuckDB. The oracle SQL is the shared formula text (the Spark
side evaluates the identical expressions), so a formula wrong in BOTH
engines at once disagrees with the replay here.
"""

from __future__ import annotations

import hashlib
import math
import random

import duckdb
import numpy as np

from mapreduce_server_development_spark.plans import ORACLE


def _run(tables, name):
    con = duckdb.connect()
    for tname, (cols, rows) in tables.items():
        con.execute(f"CREATE TABLE {tname} ({', '.join(cols)})")
        if rows:
            ph = ", ".join("?" for _ in rows[0])
            con.executemany(f"INSERT INTO {tname} VALUES ({ph})", rows)
    res = con.sql(ORACLE[name])
    out = [
        dict(zip([c.lower() for c in res.columns], r)) for r in res.fetchall()
    ]
    con.close()
    return out


def _bucket(salt: str, key, buckets: int) -> int:
    """Pure-Python replica of plans.sampling.hash_bucket."""
    h = hashlib.md5(f"{salt}:{key}".encode()).hexdigest()
    return (
        int(h[0], 16) * 4096
        + int(h[1], 16) * 256
        + int(h[2], 16) * 16
        + int(h[3], 16)
    ) % buckets


def _r(x: float) -> int:
    """round-half-away-from-zero (both engines' round(); Python's
    built-in round() is banker's and WOULD diverge on exact halves,
    e.g. integer-NLL means over 2 tokens)."""
    return int(math.copysign(math.floor(abs(x) + 0.5), x))


def _docs_table(rows):
    """rows: (doc_id, text, lang, source)."""
    return (
        ["doc_id BIGINT", "text VARCHAR", "lang VARCHAR",
         "source VARCHAR", "n_chars BIGINT"],
        [(d, t, la, s, len(t)) for d, t, la, s in rows],
    )


def _emb_table(vecs, labels):
    """vecs: list of float32-able lists; labels parallel list."""
    return (
        ["vec_id BIGINT", "embedding FLOAT[]", "label INTEGER"],
        [(i, list(map(float, v)), int(l))
         for i, (v, l) in enumerate(zip(vecs, labels))],
    )


def _f64(vec):
    """float32 storage then DOUBLE promotion — what both engines see."""
    return np.array(vec, dtype=np.float32).astype(np.float64)


def _dot(a, b):
    """Left-fold double dot product (list_dot_product / F.aggregate)."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


# ---------------------------------------------------------------------------
# q_dsir_weights
# ---------------------------------------------------------------------------


def test_dsir_weights_match_brute_force():
    rows = [
        (1, "the cat sat on the mat", "en", "s0"),
        (2, "the dog sat on the log", "en", "s0"),
        (3, "the cat and the dog", "en", "s1"),
        (4, "le chat est sur le tapis", "fr", "s1"),
        (5, "le chien est sur le lit", "fr", "s0"),
        (6, "der hund und die katze", "de", "s0"),
        (7, "the cat likes the dog", "en", "s1"),
        (8, "el gato y el perro", "es", "s0"),
        (9, "one", "en", "s0"),  # single token: no bigrams, excluded
    ]
    B = 256
    bi = []  # (doc_id, lang, bucket)
    for d, t, la, _s in rows:
        toks = [w for w in t.lower().split(" ") if w]
        if len(toks) < 2:
            continue
        for i in range(len(toks) - 1):
            g = " ".join(toks[i : i + 2])
            bi.append((d, la, _bucket("dsir", g, B)))
    cr, ct = {}, {}
    for _d, la, b in bi:
        cr[b] = cr.get(b, 0) + 1
        if la == "en":
            ct[b] = ct.get(b, 0) + 1
    tr = sum(cr.values())
    tt = sum(ct.values())
    cell = {
        b: _r(
            math.log(
                ((ct.get(b, 0) + 1.0) / (tt + B))
                / ((cr[b] + 1.0) / (tr + B))
            )
            * 1e6
        )
        for b in cr
    }
    per = {}
    for d, _la, b in bi:
        w, n = per.get(d, (0, 0))
        per[d] = (w + cell[b], n + 1)
    expect = sorted(
        ((d, w, n) for d, (w, n) in per.items()),
        key=lambda x: (-x[1], x[0]),
    )[:20]

    got = _run({"documents": _docs_table(rows)}, "q_dsir_weights")
    assert [(g["doc_id"], g["weight_micro_nats"], g["n_bigrams"])
            for g in got] == expect
    # en docs model the target: every en doc must outrank every non-en
    langs = {d: la for d, _t, la, _s in rows}
    ranked_langs = [langs[g["doc_id"]] for g in got]
    first_non_en = next(
        (i for i, la in enumerate(ranked_langs) if la != "en"), len(got)
    )
    assert all(la != "en" for la in ranked_langs[first_non_en:])


# ---------------------------------------------------------------------------
# q_perplexity_filter
# ---------------------------------------------------------------------------


def test_perplexity_filter_matches_brute_force():
    rng = random.Random(11)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    rows = []
    for d in range(14):
        lang = "en" if d % 2 == 0 else "fr"
        text = " ".join(rng.choice(words) for _ in range(rng.randint(2, 9)))
        rows.append((d, text, lang, "s0"))

    toks = []  # (doc_id, lang, is_train, tok)
    for d, t, la, _s in rows:
        tr = _bucket("ppl", d, 10) < 8
        for w in t.lower().split(" "):
            if w:
                toks.append((d, la, tr, w))
    counts = {}
    for _d, _la, tr, w in toks:
        if tr:
            counts[w] = counts.get(w, 0) + 1
    tot, v = sum(counts.values()), len(counts)
    lp = {w: _r(math.log((c + 1.0) / (tot + v)) * 1e6)
          for w, c in counts.items()}
    unk = _r(math.log(1.0 / (tot + v)) * 1e6)
    per = {}
    for d, la, _tr, w in toks:
        nll, n = per.get((d, la), (0, 0))
        per[(d, la)] = (nll - lp.get(w, unk), n + 1)
    keyed = [
        (la, _r(nll / n), d, n, nll) for (d, la), (nll, n) in per.items()
    ]
    agg = {}
    for la in {k[0] for k in keyed}:
        grp = sorted([k for k in keyed if k[0] == la],
                     key=lambda x: (x[1], x[2]))
        n_l = len(grp)
        for rk, (_la, _key, _d, n, nll) in enumerate(grp, start=1):
            b = ("head" if 3 * rk <= n_l
                 else "middle" if 3 * rk <= 2 * n_l else "tail")
            nd, ntk, snll = agg.get((la, b), (0, 0, 0))
            agg[(la, b)] = (nd + 1, ntk + n, snll + nll)
    expect = sorted(
        (la, b, nd, ntk, snll) for (la, b), (nd, ntk, snll) in agg.items()
    )

    got = _run({"documents": _docs_table(rows)}, "q_perplexity_filter")
    assert [
        (g["lang"], g["bucket"], g["n_docs"], g["n_tokens"],
         _r(g["mean_nll_per_token"] * 10000))
        for g in got
    ] == [
        (la, b, nd, ntk, _r(round(snll / ntk / 1e6, 4) * 10000))
        for la, b, nd, ntk, snll in expect
    ]


# ---------------------------------------------------------------------------
# shared cell-assignment replay (q_knn_graph convention)
# ---------------------------------------------------------------------------


def _assign(vecs, k_pop=None, cap_mult=4.0):
    """vid -> (cid, sub, vv, nrm). Seeds: the ceil(sqrt(|pop|)) LOWEST
    pop vids by RANK (the cell_common convention — robust to sparse id
    spaces); sub is the hot-cell shard vid % ceil(cnt / (cap_mult*k))."""
    vv = {i: _f64(v) for i, v in enumerate(vecs)}
    nrm = {i: math.sqrt(_dot(vv[i], vv[i])) for i in vv}
    pop = sorted(k_pop if k_pop is not None else list(vv))
    k = math.ceil(math.sqrt(len(pop)))
    cents = pop[:k]
    cid = {}
    for i in vv:
        cid[i] = max(
            cents,
            key=lambda c: (round(_dot(vv[i], vv[c]) / (nrm[i] * nrm[c]), 4),
                           -c),
        )
    cnt = {}
    for c in cid.values():
        cnt[c] = cnt.get(c, 0) + 1
    nsplit = {c: math.ceil(n / (cap_mult * k)) for c, n in cnt.items()}
    return {i: (cid[i], i % nsplit[cid[i]], vv[i], nrm[i]) for i in vv}


def _rand_vecs(n, rng):
    return [[round(rng.uniform(-1, 1), 3) for _ in range(64)]
            for _ in range(n)]


# ---------------------------------------------------------------------------
# q_hard_negatives
# ---------------------------------------------------------------------------


def test_hard_negatives_match_brute_force():
    rng = random.Random(5)
    vecs = _rand_vecs(30, rng)
    labels = [i % 3 for i in range(30)]
    a = _assign(vecs)
    best = {}
    for i, (ci, si, vi, ni) in a.items():
        pos = neg = None
        for j, (cj, sj, vj, nj) in a.items():
            if i == j or ci != cj or si != sj:
                continue
            c = _r(_dot(vi, vj) / (ni * nj) * 10000)
            if labels[i] == labels[j]:
                pos = c if pos is None else max(pos, c)
            else:
                neg = c if neg is None else max(neg, c)
        if pos is not None and neg is not None:
            best[i] = pos - neg
    agg = {}
    for i, m in best.items():
        n, s, mn, cf = agg.get(labels[i], (0, 0, None, 0))
        agg[labels[i]] = (
            n + 1,
            s + m,
            m if mn is None else min(mn, m),
            cf + (1 if m < 0 else 0),
        )
    got = _run({"embeddings": _emb_table(vecs, labels)}, "q_hard_negatives")
    assert [(g["label"], g["n_anchors"], g["min_margin_e4"]) for g in got] \
        == [(l, n, mn) for l, (n, s, mn, cf) in sorted(agg.items())]
    for g in got:
        n, s, _mn, cf = agg[g["label"]]
        assert g["mean_margin"] == round(s / n / 10000.0, 4) + 0.0
        assert g["confusable_pct"] == round(cf / n, 4) + 0.0


# ---------------------------------------------------------------------------
# q_semantic_decontaminate
# ---------------------------------------------------------------------------


def test_semantic_decontaminate_matches_brute_force():
    rng = random.Random(9)
    vecs = _rand_vecs(40, rng)
    labels = [0] * 40
    is_train = {i: _bucket("decon", i, 10) < 9 for i in range(40)}
    train_ids = [i for i in range(40) if is_train[i]]
    a = _assign(vecs, k_pop=train_ids)
    bins = {}
    for i, (ci, si, vi, ni) in a.items():
        if is_train[i]:
            continue
        top = None
        for j in train_ids:
            cj, sj, vj, nj = a[j]
            if cj != ci or sj != si:
                continue
            c = _r(_dot(vi, vj) / (ni * nj) * 10000)
            top = c if top is None else max(top, c)
        assert top is not None  # seed centroid guarantees a train row
        b = math.floor(top / 500.0) * 500
        bins[b] = bins.get(b, 0) + 1
    got = _run(
        {"embeddings": _emb_table(vecs, labels)}, "q_semantic_decontaminate"
    )
    assert [(g["bin_lo_e4"], g["n_test"], g["contaminated"]) for g in got] \
        == [(b, n, b >= 4500) for b, n in sorted(bins.items())]


# ---------------------------------------------------------------------------
# q_cluster_balanced_sample
# ---------------------------------------------------------------------------


def test_cluster_balanced_sample_matches_brute_force():
    rng = random.Random(3)
    vecs = _rand_vecs(26, rng)
    a = _assign(vecs)
    cells = {}
    for i, (c, _s, _v, _n) in a.items():
        cells.setdefault(c, []).append(i)
    n = len(vecs)
    ncells = len(cells)
    budget = math.ceil(0.4 * n)
    quota = math.ceil(budget / ncells)
    taken_total = sum(min(quota, len(v)) for v in cells.values())
    got = _run(
        {"embeddings": _emb_table(vecs, [0] * n)},
        "q_cluster_balanced_sample",
    )
    assert len(got) == ncells
    for g in got:
        members = cells[g["cid"]]
        assert g["n_in_cell"] == len(members)
        assert g["quota"] == quota
        assert g["n_taken"] == min(quota, len(members))
        assert g["share_before"] == round(len(members) / n, 4) + 0.0
        assert g["share_after"] == (
            round(min(quota, len(members)) / taken_total, 4) + 0.0
        )
    # the md5 rank itself: replay which members survive in one cell
    big = max(cells, key=lambda c: len(cells[c]))
    ordered = sorted(
        cells[big],
        key=lambda i: (hashlib.md5(f"cbs:{i}".encode()).hexdigest(), i),
    )
    assert set(ordered[:quota]) <= set(cells[big])


# ---------------------------------------------------------------------------
# q_pq_ann
# ---------------------------------------------------------------------------


def test_pq_ann_matches_brute_force():
    rng = random.Random(17)
    vecs = _rand_vecs(24, rng)
    vv = {i: _f64(v) for i, v in enumerate(vecs)}
    M, SD, KS = 8, 8, 16

    def sub(v, m):
        return v[m * SD : (m + 1) * SD]

    def d2e4(a, b):
        return _r((_dot(a, a) + _dot(b, b) - 2 * _dot(a, b)) * 10000)

    cents = {(c, m): sub(vv[c], m) for c in range(KS) for m in range(M)}
    enc = {}
    for i in vv:
        for m in range(M):
            enc[(i, m)] = min(
                range(KS),
                key=lambda c: (d2e4(sub(vv[i], m), cents[(c, m)]), c),
            )
    qids = [i for i in vv if i % 97 == 3 and i < 1000]
    rows = []
    for q in qids:
        lut = {
            (m, c): d2e4(sub(vv[q], m), cents[(c, m)])
            for m in range(M)
            for c in range(KS)
        }
        adc = {
            i: sum(lut[(m, enc[(i, m)])] for m in range(M))
            for i in vv
            if i != q
        }
        exact = {i: d2e4(vv[q], vv[i]) for i in vv if i != q}
        et = sorted(exact, key=lambda i: (exact[i], i))
        at = sorted(adc, key=lambda i: (adc[i], i))
        overlap = len(set(et[:3]) & set(at[:3]))
        rows.append(
            (q, overlap, exact[et[0]], exact[at[0]],
             round(exact[at[0]] / exact[et[0]], 4) + 0.0)
        )
    got = _run({"embeddings": _emb_table(vecs, [0] * 24)}, "q_pq_ann")
    assert [
        (g["qid"], g["overlap_at3"], g["exact_top1_d2_e4"],
         g["adc_top1_d2_e4"], g["top1_distortion"])
        for g in got
    ] == rows


# ---------------------------------------------------------------------------
# q_epoch_plan
# ---------------------------------------------------------------------------


def test_epoch_plan_matches_brute_force():
    rows = [
        (1, "a b c d e f g h", "en", "big"),     # 8 tokens
        (2, "a b c d e f g h i j", "en", "big"),  # 10
        (3, "a b", "en", "tiny"),                 # 2 -> must repeat hard
        (4, "a b c", "fr", "mid"),                # 3
        (5, "a b c d", "fr", "mid"),              # 4
    ]
    u = {}
    for _d, t, _la, s in rows:
        u[s] = u.get(s, 0) + len([w for w in t.split(" ") if w])
    corpus, n_src = sum(u.values()), len(u)
    rstar = 15.39
    expect = {}
    for s, uu in u.items():
        target = math.floor(3 * corpus / n_src)
        epochs = math.ceil(target / uu)
        eff = _r(uu * (1.0 + rstar * (1.0 - math.exp(-(epochs - 1) / rstar))))
        expect[s] = (uu, target, epochs, eff, epochs > 4)
    got = _run({"documents": _docs_table(rows)}, "q_epoch_plan")
    assert [(g["source"], g["unique_tokens"], g["target_tokens"],
             g["epochs"], g["effective_tokens"], g["repeat_risk"])
            for g in got] == [(s, *expect[s]) for s in sorted(expect)]
    for g in got:
        _uu, target, _e, eff, _risk = expect[g["source"]]
        assert g["utilization"] == round(eff / target, 4) + 0.0
    # the tiny source must carry the repeat-risk flag
    assert dict((g["source"], g["repeat_risk"]) for g in got)["tiny"]


# ---------------------------------------------------------------------------
# q_toxicity_lexicon
# ---------------------------------------------------------------------------


def test_toxicity_lexicon_matches_brute_force():
    rows = [
        (1, "slow join big scan", "en", "s0"),    # 2 hits
        (2, "fast clean data", "en", "s0"),       # 0 hits
        (3, "big big big", "en", "s1"),           # 3 hits
        (4, "tidy text", "fr", "s1"),             # 0 hits
    ]
    lex = {"slow", "big", "leak"}
    agg = {}
    for _d, t, _la, s in rows:
        toks = [w for w in t.lower().split(" ") if w]
        h = sum(1 for w in toks if w in lex)
        nd, nf, nh, nt = agg.get(s, (0, 0, 0, 0))
        agg[s] = (nd + 1, nf + (1 if h else 0), nh + h, nt + len(toks))
    got = _run({"documents": _docs_table(rows)}, "q_toxicity_lexicon")
    assert [(g["source"], g["n_docs"], g["n_flagged"], g["n_hits"],
             g["n_tokens"]) for g in got] \
        == [(s, *agg[s]) for s in sorted(agg)]
    for g in got:
        nd, nf, nh, nt = agg[g["source"]]
        assert g["hits_per_1k_tokens"] == round(nh * 1000.0 / nt, 4) + 0.0
        assert g["flagged_pct"] == round(nf / nd, 4) + 0.0


# ---------------------------------------------------------------------------
# q_vocab_coverage
# ---------------------------------------------------------------------------


def test_vocab_coverage_matches_brute_force():
    rng = random.Random(23)
    words = [f"w{i:02d}" for i in range(30)]
    # Zipf-ish: word i appears with weight ~ 1/(i+1)
    rows = []
    for d in range(12):
        toks = [
            words[min(int(rng.expovariate(0.25)), 29)]
            for _ in range(rng.randint(5, 40))
        ]
        rows.append((d, " ".join(toks), "en", "s0"))
    counts = {}
    for _d, t, _la, _s in rows:
        for w in t.split(" "):
            if w:
                counts[w] = counts.get(w, 0) + 1
    ranked = sorted(counts, key=lambda w: (-counts[w], w))
    total, n_types = sum(counts.values()), len(counts)
    got = _run({"documents": _docs_table(rows)}, "q_vocab_coverage")
    for g in got:
        n = g["vocab_size"]
        covered = sum(counts[w] for w in ranked[:n])
        assert g["corpus_types"] == n_types
        assert g["covered_occurrences"] == covered
        assert g["total_occurrences"] == total
        assert g["coverage"] == round(covered / total, 4) + 0.0
        assert g["oov_rate"] == round(1.0 - covered / total, 4) + 0.0
    assert [g["vocab_size"] for g in got] == [5, 10, 20]


# ---------------------------------------------------------------------------
# q_deletion_audit
# ---------------------------------------------------------------------------


def test_deletion_audit_matches_brute_force():
    custkeys = list(range(40))
    deleted = {k for k in custkeys if _bucket("gdpr", k, 100) < 5}
    assert deleted  # fixture must exercise the cascade
    orders = [(o, o % 40) for o in range(120)]  # (o_orderkey, o_custkey)
    lines = [(li, li % 120) for li in range(300)]  # (id, l_orderkey)
    events = [(e, e % 50) for e in range(200)]  # (event_id, user_id)
    del_orders = {o for o, c in orders if c in deleted}
    expect = {
        "customer": (len(custkeys), len(deleted)),
        "orders": (len(orders), len(del_orders)),
        "lineitem": (len(lines),
                     sum(1 for _i, ok in lines if ok in del_orders)),
        "events": (len(events),
                   sum(1 for _e, u in events if u in deleted)),
    }
    got = _run(
        {
            "customer": (["c_custkey BIGINT"], [(k,) for k in custkeys]),
            "orders": (["o_orderkey BIGINT", "o_custkey BIGINT"], orders),
            "lineitem": (["li_id BIGINT", "l_orderkey BIGINT"], lines),
            "events": (["event_id BIGINT", "user_id BIGINT"], events),
        },
        "q_deletion_audit",
    )
    assert [(g["tbl"], g["n_total"], g["n_affected"]) for g in got] \
        == [(t, *expect[t]) for t in sorted(expect)]
    for g in got:
        t, a = expect[g["tbl"]]
        assert g["affected_pct"] == round(a / t, 4) + 0.0


# ---------------------------------------------------------------------------
# q_ivfpq_ann
# ---------------------------------------------------------------------------


def test_ivfpq_ann_matches_brute_force():
    """Residual IVF-PQ (r10 semantics): PQ codes quantize
    v - seedvec(cell(v)); the codebook is sampled from the lowest
    NON-SEED vids then re-fit by one Lloyd pass (6-decimal per-dim
    member means, empties dropped); the query LUT is built from the
    query's residual. 120 vectors -> k=11 seeds, two query panels,
    cells big enough that the encoding actually discriminates."""
    rng = random.Random(29)
    N = 120
    vecs = _rand_vecs(N, rng)
    vv = {i: _f64(v) for i, v in enumerate(vecs)}
    M, SD, KS = 8, 8, 256
    a = _assign(vecs)
    k = math.ceil(math.sqrt(N))

    def sub(v, m):
        return list(v[m * SD : (m + 1) * SD])

    def d2e4(x, y):
        return _r((_dot(x, x) + _dot(y, y) - 2 * _dot(x, y)) * 10000)

    def r6(x: float) -> float:
        return math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6

    def _pqtrain(vid: int) -> bool:
        import hashlib

        h = hashlib.md5(f"pqtrain:{vid}".encode()).hexdigest()
        return int(h[:4], 16) % 1000 < 250

    resid = {i: [x - y for x, y in zip(vv[i], vv[a[i][0]])] for i in vv}
    train = sorted(vv)[k : k + KS]
    tset = [i for i in vv if _pqtrain(i)]  # ~25% Lloyd training sample
    cb0 = {(c, m): sub(resid[c], m) for c in train for m in range(M)}
    enc0 = {
        (i, m): min(train,
                    key=lambda c: (d2e4(sub(resid[i], m), cb0[(c, m)]), c))
        for i in tset for m in range(M)
    }
    cb1 = {}
    for c in train:
        for m in range(M):
            members = [sub(resid[i], m) for i in tset if enc0[(i, m)] == c]
            if members:
                cb1[(c, m)] = [
                    r6(sum(ms[d] for ms in members) / len(members))
                    for d in range(SD)
                ]
    codes = sorted({c for c, _ in cb1})
    enc = {
        (i, m): min((c for c in codes if (c, m) in cb1),
                    key=lambda c: (d2e4(sub(resid[i], m), cb1[(c, m)]), c))
        for i in vv for m in range(M)
    }
    rows = []
    for qid in sorted(i for i in vv if i % 97 == 3 and i < 1000):
        qcid = a[qid][0]
        mates = [i for i in vv if a[i][0] == qcid and i != qid]
        lut = {(m, c): d2e4(sub(resid[qid], m), cb1[(c, m)])
               for m in range(M) for c in codes if (c, m) in cb1}
        adc = {i: sum(lut[(m, enc[(i, m)])] for m in range(M))
               for i in mates}
        exact = {i: d2e4(vv[qid], vv[i]) for i in vv if i != qid}
        at = sorted(adc, key=lambda i: (adc[i], i))[:3]
        et = sorted(exact, key=lambda i: (exact[i], i))[:3]
        ect = sorted(mates, key=lambda i: (exact[i], i))[:3]
        rows.append((qid, len(mates),
                     len(set(at) & set(ect)), len(set(at) & set(et))))
    got = _run({"embeddings": _emb_table(vecs, [0] * N)}, "q_ivfpq_ann")
    assert [(g["qid"], g["cell_size"], g["overlap_at3_cell"],
             g["overlap_at3_global"]) for g in got] == rows


# ---------------------------------------------------------------------------
# q_cross_source_dups
# ---------------------------------------------------------------------------


def test_cross_source_dups_match_brute_force():
    rows = [
        (1, "b a c", "en", "s0"),     # vocab {a,b,c}
        (2, "a b c a", "en", "s1"),   # same set, reordered + repeat
        (3, "c b a", "en", "s2"),     # same set again: cluster spans 3
        (4, "x y", "en", "s0"),       # vocab {x,y}
        (5, "y x", "en", "s1"),       # same set: second cluster
        (6, "x y", "en", "s0"),       # same set SAME source: multiplicity
        (7, "unique words here", "en", "s2"),
    ]
    fp = {}
    for d, t, _la, s in rows:
        key = " ".join(sorted(set(w for w in t.lower().split(" ") if w)))
        fp.setdefault(key, []).append((d, s))
    agg = {}
    for _k, members in fp.items():
        if len({s for _d, s in members}) < 2:
            continue
        srcs = sorted({s for _d, s in members})
        for i, sa in enumerate(srcs):
            for sb in srcs[i + 1:]:
                na = len({d for d, s in members if s == sa})
                nb = len({d for d, s in members if s == sb})
                c, xa, xb = agg.get((sa, sb), (0, 0, 0))
                agg[(sa, sb)] = (c + 1, xa + na, xb + nb)
    got = _run({"documents": _docs_table(rows)}, "q_cross_source_dups")
    assert [(g["source_a"], g["source_b"], g["n_shared_clusters"],
             g["n_docs_a"], g["n_docs_b"]) for g in got] \
        == [(sa, sb, *agg[(sa, sb)]) for sa, sb in sorted(agg)]


# ---------------------------------------------------------------------------
# q_length_buckets
# ---------------------------------------------------------------------------


def test_length_buckets_match_brute_force():
    rng = random.Random(31)
    rows = []
    for d in range(20):
        n = rng.randint(1, 300)
        rows.append((d, " ".join(["w"] * n), "en", "s0"))
    edges = (16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192)

    def bucket(n):
        for e in edges:
            if n <= e:
                return e
        return 16384

    per = {}
    lens = []
    for _d, t, _la, _s in rows:
        n = len([w for w in t.split(" ") if w])
        if n == 0:
            continue
        lens.append(n)
        nd, nt = per.get(bucket(n), (0, 0))
        per[bucket(n)] = (nd + 1, nt + n)
    expect = sorted(
        [(b, nd, nt) for b, (nd, nt) in per.items()]
        + [(max(lens), len(lens), sum(lens))]
    )
    got = _run({"documents": _docs_table(rows)}, "q_length_buckets")
    assert [(g["bucket_max"], g["n_docs"], g["n_tokens"]) for g in got] \
        == expect
    for g in got:
        cap = g["bucket_max"] * g["n_docs"]
        assert g["padded_tokens"] == cap
        assert g["waste_pct"] == round(1.0 - g["n_tokens"] / cap, 4) + 0.0


# ---------------------------------------------------------------------------
# q_incremental_ivf
# ---------------------------------------------------------------------------


def test_incremental_ivf_matches_brute_force():
    rng = random.Random(37)
    vecs = _rand_vecs(36, rng)
    is_old = {i: _bucket("ivfinc", i, 10) < 9 for i in range(36)}
    old_ids = [i for i in range(36) if is_old[i]]
    assert len(old_ids) < 36  # the batch path must be exercised
    vv = {i: _f64(v) for i, v in enumerate(vecs)}
    nrm = {i: math.sqrt(_dot(vv[i], vv[i])) for i in vv}
    k = math.ceil(math.sqrt(len(old_ids)))
    cents = sorted(old_ids)[:k]  # rank seeds (cell_common convention)
    per = {}
    for i in vv:
        best = max(
            cents,
            key=lambda c: (round(_dot(vv[i], vv[c]) / (nrm[i] * nrm[c]), 4),
                           -c),
        )
        ccos = round(_dot(vv[i], vv[best]) / (nrm[i] * nrm[best]), 4)
        e4 = _r(ccos * 10000)
        no, nn, so, sn = per.get(best, (0, 0, 0, 0))
        if is_old[i]:
            per[best] = (no + 1, nn, so + e4, sn)
        else:
            per[best] = (no, nn + 1, so, sn + e4)
    got = _run({"embeddings": _emb_table(vecs, [0] * 36)},
               "q_incremental_ivf")
    assert [(g["cid"], g["n_old"], g["n_new"]) for g in got] \
        == [(c, *per[c][:2]) for c in sorted(per)]
    # Full-precision ratios (no round()): the numerators/denominators
    # are exact integers, so the IEEE division is bit-identical across
    # engines AND this replay — round() itself was the divergence
    # hazard on exact decimal halves (see _IINC_FINAL).
    for g in got:
        no, nn, so, sn = per[g["cid"]]
        assert g["growth"] == nn / no
        assert g["mean_cos_old"] == so / no / 10000.0
        if nn == 0:
            assert g["mean_cos_new"] is None
        else:
            assert g["mean_cos_new"] == sn / nn / 10000.0


# ---------------------------------------------------------------------------
# q_forecast_backtest
# ---------------------------------------------------------------------------


def test_forecast_backtest_matches_brute_force():
    import datetime as dt

    rng = random.Random(41)
    base = dt.date(2024, 3, 1)
    days = [base + dt.timedelta(days=i) for i in range(42)]
    rev = {d: rng.randint(500, 5000) * 100 for d in days}  # cents
    rows = [(d, c / 100.0) for d, c in rev.items()]

    max_day = max(days)
    expect = []
    for i in range(1, 5):
        cutoff = max_day - dt.timedelta(days=7 * i)
        n = sape = serr = sact = 0
        for d in days:
            f = d - dt.timedelta(days=7)
            if not (cutoff < d <= cutoff + dt.timedelta(days=7)):
                continue
            if f not in rev:
                continue
            n += 1
            sape += _r(abs(rev[d] - rev[f]) / rev[d] * 1e6)
            serr += rev[f] - rev[d]
            sact += rev[d]
        expect.append((cutoff, n, sape, serr, sact))
    expect.sort()

    got = _run(
        {"orders": (["o_orderdate DATE", "o_totalprice DOUBLE"], rows)},
        "q_forecast_backtest",
    )
    assert [(g["cutoff"], g["n_days"]) for g in got] \
        == [(c, n) for c, n, *_ in expect]
    for g, (_c, n, sape, serr, sact) in zip(got, expect):
        assert g["mape_pct"] == round(sape / n / 10000.0, 6)
        assert g["bias_pct"] == round(serr / sact * 100.0, 6) + 0.0


# ---------------------------------------------------------------------------
# q_quality_token_curve
# ---------------------------------------------------------------------------


def test_quality_token_curve_matches_brute_force():
    rng = random.Random(43)
    words = [f"t{i}" for i in range(12)]
    rows = []
    for d in range(25):
        n = rng.randint(3, 30)
        rows.append((d, " ".join(rng.choice(words) for _ in range(n)),
                     "en", "s0"))
    scored = []
    for d, t, _la, _s in rows:
        toks = [w for w in t.split(" ") if w]
        if not toks:
            continue
        scored.append((d, len(toks),
                       _r(len(set(toks)) / len(toks) * 10000)))
    ranked = sorted(scored, key=lambda x: (-x[2], x[0]))
    n = len(ranked)
    per = {}
    for rk, (_d, ntk, _sc) in enumerate(ranked, start=1):
        dec = math.floor((10.0 * (rk - 1)) / n) + 1
        nd, tk = per.get(dec, (0, 0))
        per[dec] = (nd + 1, tk + ntk)
    total = sum(tk for _nd, tk in per.values())
    got = _run({"documents": _docs_table(rows)}, "q_quality_token_curve")
    for g in got:
        d = g["decile"]
        nd_cum = sum(nd for dd, (nd, _tk) in per.items() if dd <= d)
        tk_cum = sum(tk for dd, (_nd, tk) in per.items() if dd <= d)
        assert g["n_docs_cum"] == nd_cum
        assert g["tokens_cum"] == tk_cum
        assert g["pct_tokens_kept"] == round(tk_cum / total, 4) + 0.0
    assert [g["decile"] for g in got] == sorted(per)
    assert got[-1]["pct_tokens_kept"] == 1.0


# ---------------------------------------------------------------------------
# q_sample_bias_audit
# ---------------------------------------------------------------------------


def test_sample_bias_audit_matches_brute_force():
    rng = random.Random(47)
    rows = [(d, "w " * rng.randint(1, 5),
             rng.choice(["en", "fr", "de"]), "s0") for d in range(60)]
    per = {}
    for d, _t, la, _s in rows:
        nf, ns = per.get(la, (0, 0))
        per[la] = (nf + 1, ns + (1 if _bucket("sample", d, 1000) < 100
                                 else 0))
    t_full = sum(nf for nf, _ns in per.values())
    t_samp = sum(ns for _nf, ns in per.values())
    assert t_samp > 0  # the fixture must exercise the sample path
    got = _run({"documents": _docs_table(rows)}, "q_sample_bias_audit")
    assert [(g["lang"], g["n_full"], g["n_sample"]) for g in got] \
        == [(la, *per[la]) for la in sorted(per)]
    for g in got:
        nf, ns = per[g["lang"]]
        assert g["full_share"] == _r(nf / t_full * 10000) / 10000.0
        assert g["sample_share"] == _r(ns / t_samp * 10000) / 10000.0
        assert g["abs_diff_e4"] == _r(abs(ns / t_samp - nf / t_full) * 10000)

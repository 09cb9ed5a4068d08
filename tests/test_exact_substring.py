"""q_exact_substring_spans (Lee et al. 2022 ExactSubstr dedup) —
brute-force third-implementation replay on engineered fixtures, the
hot-fingerprint-cap recall contract, and live-fixture invariants.

The pure-Python reference finds cross-doc verbatim runs by DIAGONAL
SCAN over raw token lists — no grams, no hashes, no SQL — so agreement
checks the shared oracle formula independently of both engines."""

from __future__ import annotations

from collections import Counter, defaultdict

import duckdb

from mapreduce_server_development_spark.plans import ORACLE

K, L, CAP = 8, 32, 64


def _docs_table(rows):
    """rows: list of (doc_id, tokens, source)."""
    return (
        ["doc_id BIGINT", "text VARCHAR", "lang VARCHAR",
         "source VARCHAR", "n_chars BIGINT"],
        [(d, " ".join(toks), "en", src, len(" ".join(toks)))
         for d, toks, src in rows],
    )


def _run_oracle(rows):
    cols, data = _docs_table(rows)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE documents ({', '.join(cols)})")
    ph = ", ".join("?" for _ in cols)
    con.executemany(f"INSERT INTO documents VALUES ({ph})", data)
    res = con.sql(ORACLE["q_exact_substring_spans"])
    out = [dict(zip([c.lower() for c in res.columns], r))
           for r in res.fetchall()]
    con.close()
    return out


def _reference_panel(rows):
    """Independent implementation: per doc pair, scan every diagonal of
    the token grid for runs of matching ALLOWED 8-grams; spans >= L
    project intervals onto both docs; per-doc interval union; per-source
    rollup. Mirrors the operator's documented semantics (incl. the
    hot-gram cap and the cross-doc-only contract)."""
    toks = {d: t for d, t, _ in rows}
    src = {d: s for d, _, s in rows}
    occ: Counter = Counter()
    docs_of: defaultdict = defaultdict(set)
    grams = {}
    for d, ts in toks.items():
        gs = [" ".join(ts[i:i + K]) for i in range(len(ts) - K + 1)]
        grams[d] = gs
        for g in gs:
            occ[g] += 1
            docs_of[g].add(d)

    def allowed(g):
        return occ[g] <= CAP and len(docs_of[g]) >= 2

    intervals: defaultdict = defaultdict(list)
    ids = sorted(toks)
    for ia, da in enumerate(ids):
        for db in ids[ia + 1:]:
            ga, gb = grams[da], grams[db]
            for diag in range(-(len(gb) - 1), len(ga)):
                # matched (allowed) gram positions on this diagonal,
                # grouped with the BRIDGE: steps <= K stay one run
                matched = [
                    pa
                    for pa in range(max(0, diag),
                                    min(len(ga), len(gb) + diag))
                    if ga[pa] == gb[pa - diag] and allowed(ga[pa])
                ]
                groups: list[list[int]] = []
                for pa in matched:
                    if groups and pa - groups[-1][-1] <= K:
                        groups[-1].append(pa)
                    else:
                        groups.append([pa])
                for g in groups:
                    cov = g[-1] - g[0] + K
                    if cov >= L:
                        intervals[da].append((g[0], g[0] + cov))
                        intervals[db].append((g[0] - diag, g[0] - diag + cov))

    per_doc = {}
    for d, iv in intervals.items():
        iv.sort()
        merged = []
        for s, e in iv:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        per_doc[d] = (sum(e - s for s, e in merged), len(merged))

    panel = {}
    for d in ids:
        s = src[d]
        p = panel.setdefault(
            s, {"n_docs": 0, "n_docs_hit": 0, "total_tokens": 0,
                "dup_tokens": 0, "n_spans": 0})
        p["n_docs"] += 1
        p["total_tokens"] += len(toks[d])
        if d in per_doc:
            p["n_docs_hit"] += 1
            p["dup_tokens"] += per_doc[d][0]
            p["n_spans"] += per_doc[d][1]
    return panel


def _u(prefix, n):
    return [f"{prefix}_{i}" for i in range(n)]


def test_replay_engineered_spans():
    S = _u("s", 40)        # 40-token shared block (>= L)
    T = _u("t", 20)        # 20-token shared block (< L)
    W = _u("w", 58)        # doc4 carries all; doc5 its head, doc6 its tail
    R = _u("r", 40)        # within-doc repeat only
    rows = [
        (0, _u("a", 10) + S + _u("b", 10), "alpha"),
        (1, _u("c", 7) + S + _u("d", 12), "alpha"),
        (2, _u("e", 10) + T + _u("f", 10), "alpha"),
        (3, _u("g", 10) + T + _u("h", 10), "beta"),
        (4, _u("i", 5) + W + _u("j", 6), "beta"),
        (5, _u("k", 9) + W[:35] + _u("l", 9), "beta"),
        (6, _u("m", 4) + W[25:] + _u("n", 11), "beta"),
        (7, _u("o", 5) + R + _u("p", 3) + R + _u("q", 4), "gamma"),
        (8, _u("z", 45), "gamma"),
    ]
    got = {r["source"]: r for r in _run_oracle(rows)}
    want = _reference_panel(rows)
    assert set(got) == set(want)
    for s, w in want.items():
        g = got[s]
        for k2, v in w.items():
            assert g[k2] == v, (s, k2, g, w)
    # the engineered expectations themselves (belt and braces):
    # alpha: docs 0,1 share the 40-token block; the 20-token block is
    # below L; beta: doc4's two overlapping spans merge to one 58-token
    # island; gamma: within-doc repeats never count.
    assert got["alpha"]["n_docs_hit"] == 2
    assert got["alpha"]["dup_tokens"] == 80
    assert got["alpha"]["n_spans"] == 2
    assert got["beta"]["n_docs_hit"] == 3
    assert got["beta"]["dup_tokens"] == 58 + 35 + 33
    assert got["beta"]["n_spans"] == 3
    assert got["gamma"]["dup_tokens"] == 0


def test_hot_gram_cap_recall_contract():
    """The gap BRIDGE recovers spans interrupted by a short hot
    region: one corpus-hot 8-gram inside an otherwise-unique shared
    40-token span drops one gram position from the diagonal (a step
    of 2 <= K between the surviving matches), so the bridged run
    still reports the full span. A hot insert LONGER than 2K-2
    tokens leaves a gap > K and still splits — the residual recall
    contract."""
    A, G, B = _u("a", 20), _u("g", 8), _u("b", 12)
    span = A + G + B  # 40 tokens, G at offset 20
    pair = [
        (0, _u("x", 6) + span + _u("y", 6), "s0"),
        (1, _u("v", 9) + span + _u("u", 3), "s0"),
    ]
    fillers = [(10 + i, _u(f"f{i}", 12) + G + _u(f"e{i}", 12), "noise")
               for i in range(70)]

    # control: cap inactive (G occurs twice) -> full 40-token span
    control = {r["source"]: r for r in _run_oracle(pair)}
    assert control["s0"]["dup_tokens"] == 80
    assert control["s0"]["n_spans"] == 2

    # with 70 hot fillers G occurs 72 > 64 times -> excluded; the
    # BRIDGE spans the 1-gram gap and the full 40-token span survives
    capped = {r["source"]: r for r in _run_oracle(pair + fillers)}
    assert capped["s0"]["dup_tokens"] == 80
    assert capped["s0"]["n_spans"] == 2
    assert capped["noise"]["dup_tokens"] == 0
    # the reference agrees on the capped corpus too
    want = _reference_panel(pair + fillers)
    for s, w in want.items():
        for k2, v in w.items():
            assert capped[s][k2] == v, (s, k2)

    # residual contract: a 16-token hot block excludes 9 consecutive
    # gram positions (16 - K + 1) — a gap > K the bridge must NOT
    # cross; the 20/12-token flanks both fall below L.
    H = _u("h", 16)
    span2 = A + H + B  # 48 tokens, H at offset 20
    pair2 = [
        (0, _u("x", 6) + span2 + _u("y", 6), "s0"),
        (1, _u("v", 9) + span2 + _u("u", 3), "s0"),
    ]
    fillers2 = [(10 + i, _u(f"f{i}", 12) + H + _u(f"e{i}", 12), "noise")
                for i in range(70)]
    capped2 = {r["source"]: r for r in _run_oracle(pair2 + fillers2)}
    assert capped2["s0"]["dup_tokens"] == 0
    want2 = _reference_panel(pair2 + fillers2)
    for s, w in want2.items():
        for k2, v in w.items():
            assert capped2[s][k2] == v, (s, k2)


def test_fixture_invariants(spark):
    from mapreduce_server_development_spark.plans import QUERIES

    from .conftest import SF_SMOKE

    rows = QUERIES["q_exact_substring_spans"](spark, SF_SMOKE).collect()
    assert rows
    assert any(r.dup_tokens > 0 for r in rows)
    for r in rows:
        assert 0 <= r.dup_tokens <= r.total_tokens, r
        # every merged island covers at least one full L-token span
        assert r.dup_tokens >= L * r.n_spans, r
        assert r.n_docs_hit <= r.n_docs, r
        if r.n_spans == 0:
            assert r.dup_tokens == 0 and r.n_docs_hit == 0, r


# ---------------------------------------------------------------------------
# q_dedup_span_removal — first-wins removal policy
# ---------------------------------------------------------------------------


def _run_removal_oracle(rows):
    cols, data = _docs_table(rows)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE documents ({', '.join(cols)})")
    ph = ", ".join("?" for _ in cols)
    con.executemany(f"INSERT INTO documents VALUES ({ph})", data)
    res = con.sql(ORACLE["q_dedup_span_removal"])
    out = [dict(zip([c.lower() for c in res.columns], r))
           for r in res.fetchall()]
    con.close()
    return out


def test_removal_keeps_first_copy():
    """Two docs sharing a 40-token span: the EARLIER doc keeps it, the
    later doc loses exactly those 40 tokens. Three docs chained on the
    same span: exactly one copy (the earliest) survives corpus-wide."""
    S = _u("s", 40)
    S2 = _u("s2", 40)  # the chain's own block, distinct from the pair's
    rows = [
        (0, _u("a", 10) + S + _u("b", 10), "pairsrc"),
        (1, _u("c", 7) + S + _u("d", 12), "pairsrc"),
        (10, _u("e", 5) + S2 + _u("f", 5), "chainsrc"),
        (11, _u("g", 8) + S2 + _u("h", 4), "chainsrc"),
        (12, _u("i", 3) + S2 + _u("j", 9), "chainsrc"),
    ]
    got = {r["source"]: r for r in _run_removal_oracle(rows)}
    p = got["pairsrc"]
    assert p["n_docs_cleaned"] == 1          # doc 0 keeps its copy
    assert p["tokens_removed"] == 40
    assert p["tokens_after"] == p["tokens_before"] - 40
    c = got["chainsrc"]
    assert c["n_docs_cleaned"] == 2          # docs 11, 12 cleaned
    assert c["tokens_removed"] == 80         # one surviving copy (doc 10)
    assert c["pct_removed"] > 0


def test_removal_never_exceeds_audit_mass(spark):
    """Per source: tokens_removed (later-side only) <= the audit's
    dup_tokens (both sides), and the ledger is internally consistent."""
    from mapreduce_server_development_spark.plans import QUERIES

    from .conftest import SF_SMOKE

    audit = {r.source: r for r in
             QUERIES["q_exact_substring_spans"](spark, SF_SMOKE).collect()}
    removal = {r.source: r for r in
               QUERIES["q_dedup_span_removal"](spark, SF_SMOKE).collect()}
    assert set(audit) == set(removal)
    assert any(r.tokens_removed > 0 for r in removal.values())
    for s, r in removal.items():
        a = audit[s]
        assert r.tokens_before == a.total_tokens, s
        assert r.tokens_removed <= a.dup_tokens, s
        assert r.tokens_after == r.tokens_before - r.tokens_removed, s
        assert r.n_docs_cleaned <= a.n_docs_hit, s


# ---------------------------------------------------------------------------
# q_dedup_apply — the cleaned-corpus transform
# ---------------------------------------------------------------------------


def _apply_reference(rows):
    """Pure-Python reconstruction: bridged diagonal scan, removal
    intervals onto the LATER doc only, interval union, token excision,
    md5 per doc, per-source doc-id-ordered digest-of-digests."""
    import hashlib

    toks = {d: t for d, t, _ in rows}
    src = {d: s for d, _, s in rows}
    occ: Counter = Counter()
    docs_of: defaultdict = defaultdict(set)
    grams = {}
    for d, ts in toks.items():
        gs = [" ".join(ts[i:i + K]) for i in range(len(ts) - K + 1)]
        grams[d] = gs
        for g in gs:
            occ[g] += 1
            docs_of[g].add(d)

    def allowed(g):
        return occ[g] <= CAP and len(docs_of[g]) >= 2

    intervals: defaultdict = defaultdict(list)
    ids = sorted(toks)
    for ia, da in enumerate(ids):
        for db in ids[ia + 1:]:
            ga, gb = grams[da], grams[db]
            for diag in range(-(len(gb) - 1), len(ga)):
                matched = [
                    pa
                    for pa in range(max(0, diag),
                                    min(len(ga), len(gb) + diag))
                    if ga[pa] == gb[pa - diag] and allowed(ga[pa])
                ]
                groups: list[list[int]] = []
                for pa in matched:
                    if groups and pa - groups[-1][-1] <= K:
                        groups[-1].append(pa)
                    else:
                        groups.append([pa])
                for g in groups:
                    cov = g[-1] - g[0] + K
                    if cov >= L:
                        # later doc (db) only: first-wins
                        intervals[db].append((g[0] - diag, g[0] - diag + cov))

    panel: dict = {}
    per_source_digests: defaultdict = defaultdict(list)
    for d in ids:
        iv = sorted(set(intervals.get(d, [])))
        merged: list[list[int]] = []
        for s, e in iv:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        kept = [
            t for i, t in enumerate(toks[d])
            if not any(s <= i < e for s, e in merged)
        ]
        txt = " ".join(kept)
        sname = src[d]
        p = panel.setdefault(
            sname, {"n_docs": 0, "n_docs_changed": 0, "tokens_after": 0})
        p["n_docs"] += 1
        p["n_docs_changed"] += 1 if merged else 0
        p["tokens_after"] += len(kept)
        per_source_digests[sname].append(
            (d, hashlib.md5(txt.encode()).hexdigest()))
    for sname, pairs in per_source_digests.items():
        # order-free commutative digest: four 32-bit md5 words summed
        # per source (order of iteration deliberately NOT sorted here
        # — the digest must not depend on it)
        sums = [0, 0, 0, 0]
        for _, md in pairs:
            for i in range(4):
                sums[i] += int(md[8 * i:8 * i + 8], 16)
        panel[sname]["corpus_digest"] = "-".join(str(s) for s in sums)
    return panel


def _run_apply_oracle(rows):
    cols, data = _docs_table(rows)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE documents ({', '.join(cols)})")
    ph = ", ".join("?" for _ in cols)
    con.executemany(f"INSERT INTO documents VALUES ({ph})", data)
    res = con.sql(ORACLE["q_dedup_apply"])
    out = [dict(zip([c.lower() for c in res.columns], r))
           for r in res.fetchall()]
    con.close()
    return out


def test_apply_reconstruction_replay():
    """Engineered corpus: the cleaned-text checksums from the oracle
    pipeline equal an independent pure-Python reconstruction —
    first-wins excision, chained spans, an untouched doc, and a
    bridge-recovered span all exercised."""
    S, S2, G = _u("s", 40), _u("s2", 40), _u("g", 8)
    bspan = _u("ba", 16) + G + _u("bb", 16)  # 40 tokens, hot gram inside
    rows = [
        (0, _u("a", 10) + S + _u("b", 10), "pairsrc"),
        (1, _u("c", 7) + S + _u("d", 12), "pairsrc"),
        (10, _u("e", 5) + S2 + _u("f", 5), "chainsrc"),
        (11, _u("g2", 8) + S2 + _u("h", 4), "chainsrc"),
        (12, _u("i", 3) + S2 + _u("j", 9), "chainsrc"),
        (20, _u("z", 45), "quietsrc"),
        (30, _u("x", 6) + bspan + _u("y", 6), "bridgesrc"),
        (31, _u("v", 9) + bspan + _u("u", 3), "bridgesrc"),
    ] + [(100 + i, _u(f"f{i}", 12) + G + _u(f"e{i}", 12), "noise")
         for i in range(70)]
    got = {r["source"]: r for r in _run_apply_oracle(rows)}
    want = _apply_reference(rows)
    assert set(got) == set(want)
    for s, w in want.items():
        for k2, v in w.items():
            assert got[s][k2] == v, (s, k2, got[s], w)
    # belt and braces on the engineered expectations
    assert got["pairsrc"]["n_docs_changed"] == 1
    assert got["chainsrc"]["n_docs_changed"] == 2
    assert got["quietsrc"]["n_docs_changed"] == 0
    assert got["bridgesrc"]["n_docs_changed"] == 1  # bridge-recovered


def test_apply_agrees_with_ledger(spark):
    """On the live fixture: tokens_after from the transform equals
    tokens_before - tokens_removed from the ledger, per source."""
    from mapreduce_server_development_spark.plans import QUERIES

    from .conftest import SF_SMOKE

    ledger = {r.source: r for r in
              QUERIES["q_dedup_span_removal"](spark, SF_SMOKE).collect()}
    applied = {r.source: r for r in
               QUERIES["q_dedup_apply"](spark, SF_SMOKE).collect()}
    assert set(ledger) == set(applied)
    for s, a in applied.items():
        led = ledger[s]
        assert a.n_docs == led.n_docs, s
        assert a.n_docs_changed == led.n_docs_cleaned, s
        assert a.tokens_after == led.tokens_after, s
        # four dash-joined non-negative word sums, each < n_docs * 2^32
        words = a.corpus_digest.split("-")
        assert len(words) == 4, s
        assert all(w.isdigit() and int(w) < a.n_docs * 2**32 for w in words), s


# ---------------------------------------------------------------------------
# q_decontaminate_spans — span-level train-vs-eval contamination
# ---------------------------------------------------------------------------


def _split_of(doc_id: int) -> str:
    import hashlib

    h = hashlib.md5(f"split:{doc_id}".encode()).hexdigest()
    b = int(h[:4], 16) % 1000
    return "train" if b < 800 else ("test" if b >= 900 else "val")


def _run_decontam_oracle(rows):
    cols, data = _docs_table(rows)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE documents ({', '.join(cols)})")
    ph = ", ".join("?" for _ in cols)
    con.executemany(f"INSERT INTO documents VALUES ({ph})", data)
    res = con.sql(ORACLE["q_decontaminate_spans"])
    out = [dict(zip([c.lower() for c in res.columns], r))
           for r in res.fetchall()]
    con.close()
    return out


def _decontam_reference(rows):
    """Independent diagonal-scan reference with the split restriction:
    pairs are test x train only; grams must be corpus-cold (<= CAP)
    and occur in BOTH splits; coverage projects onto the train doc."""
    toks = {d: t for d, t, _ in rows}
    src = {d: s for d, _, s in rows}
    occ: Counter = Counter()
    split_of_gram: defaultdict = defaultdict(set)
    grams = {}
    for d, ts in toks.items():
        gs = [" ".join(ts[i:i + K]) for i in range(len(ts) - K + 1)]
        grams[d] = gs
        for g in gs:
            occ[g] += 1
            split_of_gram[g].add(_split_of(d))

    def allowed(g):
        return (occ[g] <= CAP and "test" in split_of_gram[g]
                and "train" in split_of_gram[g])

    intervals: defaultdict = defaultdict(list)
    eval_hits: defaultdict = defaultdict(set)
    tests = [d for d in toks if _split_of(d) == "test"]
    trains = [d for d in toks if _split_of(d) == "train"]
    for ta in tests:
        for tb in trains:
            ga, gb = grams[ta], grams[tb]
            for diag in range(-(len(gb) - 1), len(ga)):
                # bridged: train-side steps <= K stay one run
                matched = [
                    pa - diag
                    for pa in range(max(0, diag),
                                    min(len(ga), len(gb) + diag))
                    if ga[pa] == gb[pa - diag] and allowed(ga[pa])
                ]
                groups: list[list[int]] = []
                for pb in matched:
                    if groups and pb - groups[-1][-1] <= K:
                        groups[-1].append(pb)
                    else:
                        groups.append([pb])
                for g in groups:
                    cov = g[-1] - g[0] + K
                    if cov >= L:
                        intervals[tb].append((g[0], g[0] + cov))
                        eval_hits[src[tb]].add(ta)

    per_doc = {}
    for d, iv in intervals.items():
        merged = []
        for s, e in sorted(set(iv)):
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        per_doc[d] = sum(e - s for s, e in merged)

    panel = {}
    for d in trains:
        s = src[d]
        p = panel.setdefault(
            s, {"n_train_docs": 0, "n_contaminated": 0, "train_tokens": 0,
                "contam_tokens": 0, "n_eval_docs_hit": 0})
        p["n_train_docs"] += 1
        p["train_tokens"] += len(toks[d])
        if d in per_doc:
            p["n_contaminated"] += 1
            p["contam_tokens"] += per_doc[d]
    for s, p in panel.items():
        p["n_eval_docs_hit"] = len(eval_hits.get(s, set()))
    return panel


def test_decontam_replay_engineered():
    """A test-split doc shares a 40-token span with a train-split doc
    -> the TRAIN doc is flagged with exactly the span's coverage;
    train-train sharing is NOT contamination."""
    # find concrete ids in each split (the hash is fixed, ids are data)
    tests = [i for i in range(200) if _split_of(i) == "test"][:2]
    trains = [i for i in range(200) if _split_of(i) == "train"][:4]
    S, S3 = _u("s", 40), _u("u", 40)
    rows = [
        (tests[0], _u("a", 6) + S + _u("b", 5), "evalsrc"),
        (trains[0], _u("c", 9) + S + _u("d", 7), "hitsrc"),
        # train-train sharing: not contamination
        (trains[1], _u("e", 4) + S3 + _u("f", 8), "cleansrc"),
        (trains[2], _u("g", 6) + S3 + _u("h", 3), "cleansrc"),
        (trains[3], _u("z", 50), "cleansrc"),
    ]
    got = {r["source"]: r for r in _run_decontam_oracle(rows)}
    want = _decontam_reference(rows)
    assert set(got) == set(want)
    for s, w in want.items():
        for k2, v in w.items():
            assert got[s][k2] == v, (s, k2, got[s], w)
    assert got["hitsrc"]["n_contaminated"] == 1
    assert got["hitsrc"]["contam_tokens"] == 40
    assert got["hitsrc"]["n_eval_docs_hit"] == 1
    assert got["cleansrc"]["n_contaminated"] == 0


def test_decontam_fixture_agrees_with_reference(spark):
    """Full pure-Python replay on the live sf0.001 fixture."""
    import duckdb as _dd

    from mapreduce_server_development_spark.plans import QUERIES

    from .conftest import SF_SMOKE

    con = _dd.connect()
    docs = con.sql(
        f"SELECT doc_id, text, source FROM "
        f"read_parquet('{SF_SMOKE}/documents.parquet')"
    ).fetchall()
    con.close()
    rows = [(d, [t for t in txt.lower().split(" ") if t], s)
            for d, txt, s in docs]
    want = _decontam_reference(rows)
    got = {r.source: r for r in
           QUERIES["q_decontaminate_spans"](spark, SF_SMOKE).collect()}
    # sources with no train docs do not appear
    assert set(got) == {s for s in want if want[s]["n_train_docs"] > 0}
    for s, w in want.items():
        if w["n_train_docs"] == 0:
            continue
        g = got[s]
        for k2, v in w.items():
            assert g[k2] == v, (s, k2, g, w)


# ---------------------------------------------------------------------------
# round-10 span-family: incremental, copy matrix, length histogram
# ---------------------------------------------------------------------------


def _incr_new(doc_id: int) -> bool:
    import hashlib

    h = hashlib.md5(f"incr:{doc_id}".encode()).hexdigest()
    return int(h[:4], 16) % 1000 >= 800


def _run_named(rows, name):
    cols, data = _docs_table(rows)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE documents ({', '.join(cols)})")
    ph = ", ".join("?" for _ in cols)
    con.executemany(f"INSERT INTO documents VALUES ({ph})", data)
    res = con.sql(ORACLE[name])
    out = [dict(zip([c.lower() for c in res.columns], r))
           for r in res.fetchall()]
    con.close()
    return out


def test_incremental_pairs_only_arrivals():
    """Old->new removal happens regardless of id order; old x old
    sharing is invisible; new x new is first-wins."""
    olds = [i for i in range(300) if not _incr_new(i)]
    news = [i for i in range(300) if _incr_new(i)]
    S1, S2, S3 = _u("s1", 40), _u("s2", 40), _u("s3", 40)
    hi_old = [o for o in olds if o > news[0]][0]
    rows = [
        # old doc with HIGHER id than the new doc: still wins (the
        # settled corpus keeps its copy; the arrival is deduped)
        (news[0], _u("a", 5) + S1 + _u("b", 6), "arrsrc"),
        (hi_old, _u("c", 8) + S1 + _u("d", 4), "oldsrc"),
        # old x old sharing: no arrival involved -> ledger silent
        (olds[0], _u("e", 6) + S2 + _u("f", 5), "oldsrc"),
        (olds[1], _u("g", 4) + S2 + _u("h", 7), "oldsrc"),
        # new x new: first-wins by id among arrivals
        (news[1], _u("i", 5) + S3 + _u("j", 5), "arrsrc"),
        (news[2], _u("k", 7) + S3 + _u("l", 3), "arrsrc"),
    ]
    got = {r["source"]: r for r in
           _run_named(rows, "q_exact_substring_incremental")}
    assert set(got) == {"arrsrc"}  # panel covers arrivals only
    a = got["arrsrc"]
    assert a["n_new"] == 3
    # news[0] deduped against hi_old; the later of news[1]/news[2]
    # deduped against the earlier; the earlier arrival keeps its copy
    assert a["n_new_hit"] == 2
    assert a["dup_tokens"] == 80


def test_incremental_index_twin_invariance(spark):
    """The index-consuming twin reproduces the recompute twin's
    output row-for-row on the live fixture, with the settled gram
    index materialized (and reused) via build_xs_gram_index."""
    import os

    from mapreduce_server_development_spark.plans import QUERIES
    from mapreduce_server_development_spark.plans.text_ngram import (
        build_xs_gram_index,
        xs_gram_index_path,
    )

    from .conftest import SF_SMOKE

    recompute = sorted(
        tuple(r) for r in
        QUERIES["q_exact_substring_incremental"](spark, SF_SMOKE).collect()
    )
    indexed = sorted(
        tuple(r) for r in
        QUERIES["q_exact_substring_incremental_indexed"](
            spark, SF_SMOKE
        ).collect()
    )
    assert indexed == recompute
    # the build is idempotent: a second call reuses the _DONE index
    idx = build_xs_gram_index(spark, SF_SMOKE)
    assert idx == xs_gram_index_path(SF_SMOKE)
    assert os.path.exists(os.path.join(idx, "_DONE"))
    mtime = os.path.getmtime(os.path.join(idx, "_DONE"))
    assert build_xs_gram_index(spark, SF_SMOKE) == idx
    assert os.path.getmtime(os.path.join(idx, "_DONE")) == mtime


def test_copy_matrix_direction_and_diagonal():
    S, T = _u("s", 40), _u("t", 40)
    rows = [
        (0, _u("a", 5) + S + _u("b", 6), "srcA"),   # earlier
        (10, _u("c", 8) + S + _u("d", 4), "srcB"),  # later: A -> B
        (20, _u("e", 6) + T + _u("f", 5), "srcC"),
        (21, _u("g", 4) + T + _u("h", 7), "srcC"),  # diagonal C -> C
    ]
    got = {(r["src_from"], r["src_to"]): r
           for r in _run_named(rows, "q_span_copy_matrix")}
    assert set(got) == {("srcA", "srcB"), ("srcC", "srcC")}
    assert got[("srcA", "srcB")]["n_doc_pairs"] == 1
    assert got[("srcA", "srcB")]["copied_tokens"] == 40
    assert got[("srcC", "srcC")]["copied_tokens"] == 40


def test_length_hist_bins_and_mass_tie_to_audit(spark):
    S40, S70 = _u("s", 40), _u("w", 70)
    rows = [
        (0, _u("a", 5) + S40 + _u("b", 6), "sA"),
        (1, _u("c", 8) + S40 + _u("d", 4), "sA"),
        (2, _u("e", 6) + S70 + _u("f", 5), "sB"),
        (3, _u("g", 4) + S70 + _u("h", 7), "sB"),
    ]
    got = {(r["source"], r["len_bin"]): r
           for r in _run_named(rows, "q_dup_span_length_hist")}
    # 40 tokens -> bin 5 (32..63); 70 tokens -> bin 6 (64..127)
    assert got[("sA", 5)]["n_islands"] == 2
    assert got[("sA", 5)]["dup_tokens"] == 80
    assert got[("sB", 6)]["dup_tokens"] == 140
    assert set(got) == {("sA", 5), ("sB", 6)}

    # live fixture: histogram mass per source == audit dup_tokens
    from mapreduce_server_development_spark.plans import QUERIES

    from .conftest import SF_SMOKE

    audit = {r.source: r.dup_tokens for r in
             QUERIES["q_exact_substring_spans"](spark, SF_SMOKE).collect()}
    hist = QUERIES["q_dup_span_length_hist"](spark, SF_SMOKE).collect()
    per_src: dict = {}
    for r in hist:
        per_src[r.source] = per_src.get(r.source, 0) + r.dup_tokens
    for s, tot in per_src.items():
        assert tot == audit[s], s

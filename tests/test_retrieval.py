"""Retrieval-wave tests: plan shapes for the round-8 queries
(q_rag_chunks, q_hybrid_rrf, q_curriculum_order, q_sq8_ann,
q_personalized_pagerank) and brute-force pure-Python semantic replays
of the shared formula texts (the test_stat_semantics.py discipline:
the oracle SQL *is* the formula both engines evaluate, so checking it
against an independent implementation checks both engines at once).
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest

from mapreduce_server_development_spark.plans import ORACLE

from .conftest import SF_SMOKE


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


def _docs(texts, langs=None, sources=None):
    return (
        ["doc_id BIGINT", "text VARCHAR", "lang VARCHAR",
         "source VARCHAR", "n_chars BIGINT"],
        [
            (i, t, (langs or {}).get(i, "en"), (sources or {}).get(i, "web"),
             len(t))
            for i, t in enumerate(texts)
        ],
    )


def _rha(x: float) -> int:
    """Round half away from zero (Spark/DuckDB ROUND semantics)."""
    return int(math.copysign(math.floor(abs(x) + 0.5), x))


# ---------------------------------------------------------------------------
# q_rag_chunks — chunk geometry + hash replay
# ---------------------------------------------------------------------------


def test_rag_chunks_geometry_and_hashes():
    # 150 tokens -> chunks at 0/48/96 with lengths 64/64/54;
    # 10 tokens -> one short chunk; empty doc -> no chunks.
    toks150 = [f"t{i}" for i in range(150)]
    texts = [" ".join(toks150), "a b c d e f g h i j", "   "]
    out = _run({"documents": _docs(texts)}, "q_rag_chunks")

    assert [r["doc_id"] for r in out] == [0, 0, 0, 1]
    assert [r["start_tok"] for r in out] == [0, 48, 96, 0]
    assert [r["n_tokens"] for r in out] == [64, 64, 54, 10]
    for r in out:
        toks = toks150 if r["doc_id"] == 0 else ["a", "b", "c", "d", "e",
                                                 "f", "g", "h", "i", "j"]
        s = r["start_tok"]
        want = hashlib.md5(" ".join(toks[s:s + 64]).encode()).hexdigest()
        assert r["chunk_hash"] == want


def test_rag_chunks_exact_window_boundary():
    # n = 64 -> exactly one chunk; n = 65 -> two (second holds 17 toks).
    texts = [" ".join(f"x{i}" for i in range(64)),
             " ".join(f"y{i}" for i in range(65))]
    out = _run({"documents": _docs(texts)}, "q_rag_chunks")
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[0]) == 1 and by_doc[0][0]["n_tokens"] == 64
    assert len(by_doc[1]) == 2 and by_doc[1][1]["n_tokens"] == 17


# ---------------------------------------------------------------------------
# q_hybrid_rrf — full third-implementation replay on a hand corpus
# ---------------------------------------------------------------------------


def _bm25_rrf_reference(texts, embs, panel_max_id=5, q_terms=8,
                        depth=20, rrf_k=60):
    toks = {i: [t for t in txt.lower().split(" ") if t]
            for i, txt in enumerate(texts)}
    toks = {i: ts for i, ts in toks.items() if True}
    dl = {i: len(ts) for i, ts in toks.items()}
    n = len(texts)
    avgdl = sum(dl.values()) / n
    tf = {}
    for i, ts in toks.items():
        for t in ts:
            tf[(i, t)] = tf.get((i, t), 0) + 1
    df = {}
    for (_, t) in tf:
        df[t] = df.get(t, 0) + 1

    # top-8 TF-IDF query terms per panel doc
    qterms = {}
    for q in range(min(panel_max_id + 1, n)):
        scored = sorted(
            ((round(tf[(q, t)] * math.log(n / df[t]), 6), t)
             for t in set(toks[q])),
            key=lambda s: (-s[0], s[1]),
        )
        qterms[q] = [t for _, t in scored[:q_terms]]

    lex_rank = {}
    for q, terms in qterms.items():
        scores = {}
        for t in terms:
            for d in range(n):
                if d == q or (d, t) not in tf:
                    continue
                idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
                c = _rha(idf * tf[(d, t)] * 2.2
                         / (tf[(d, t)] + 1.2 * (0.25 + 0.75 * dl[d] / avgdl))
                         * 1e6)
                scores[d] = scores.get(d, 0) + c
        ranked = sorted(scores.items(),
                        key=lambda kv: (-round(kv[1] / 1e6, 4), kv[0]))
        for r, (d, _) in enumerate(ranked[:depth], 1):
            lex_rank[(q, d)] = r

    vec_rank = {}
    for q in range(min(panel_max_id + 1, n)):
        qs = embs[q]
        qn = math.sqrt(sum(x * x for x in qs))
        cos = {}
        for d in range(n):
            if d == q:
                continue
            dn = math.sqrt(sum(x * x for x in embs[d]))
            cos[d] = round(sum(a * b for a, b in zip(embs[d], qs)) / (dn * qn), 4)
        ranked = sorted(cos.items(), key=lambda kv: (-kv[1], kv[0]))
        for r, (d, _) in enumerate(ranked[:depth], 1):
            vec_rank[(q, d)] = r

    fused = {}
    for key in set(lex_rank) | set(vec_rank):
        nano = 0
        if key in lex_rank:
            nano += _rha(1e9 / (rrf_k + lex_rank[key]))
        if key in vec_rank:
            nano += _rha(1e9 / (rrf_k + vec_rank[key]))
        fused[key] = nano
    out = {}
    for q in range(min(panel_max_id + 1, n)):
        rows = sorted(((d, v) for (qq, d), v in fused.items() if qq == q),
                      key=lambda kv: (-kv[1], kv[0]))[:5]
        out[q] = [
            (d, round(v / 1e9, 6), lex_rank.get((q, d)), vec_rank.get((q, d)))
            for d, v in rows
        ]
    return out


def test_hybrid_rrf_matches_python_reference():
    texts = [
        "spark filter window stream shuffle join",
        "filter stream window spark broadcast",
        "window join shuffle partition skew salt",
        "stream filter watermark state session",
        "broadcast join small dimension table",
        "partition skew salt explode hot key",
        "unrelated words entirely about cooking pasta sauce",
        "cooking pasta sauce tomato basil garlic",
        "spark stream filter window join broadcast partition",
    ]
    embs = [
        [1.0, 0.1, 0.0, 0.2], [0.9, 0.2, 0.1, 0.1], [0.1, 1.0, 0.1, 0.0],
        [0.8, 0.1, 0.3, 0.1], [0.1, 0.9, 0.2, 0.1], [0.0, 0.2, 1.0, 0.1],
        [0.1, 0.0, 0.1, 1.0], [0.0, 0.1, 0.2, 0.9], [0.7, 0.3, 0.1, 0.2],
    ]
    emb_table = (
        ["vec_id BIGINT", "embedding FLOAT[]", "label INTEGER"],
        [(i, v, 0) for i, v in enumerate(embs)],
    )
    out = _run({"documents": _docs(texts), "embeddings": emb_table},
               "q_hybrid_rrf")
    # float32 storage: the reference must see the same float32-rounded
    # components DuckDB reads back from the FLOAT[] column.
    import struct

    f32 = lambda x: struct.unpack("f", struct.pack("f", x))[0]  # noqa: E731
    ref = _bm25_rrf_reference(texts, [[f32(x) for x in v] for v in embs])

    got = {}
    for r in out:
        got.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["rrf"], r["lex_rank"], r["vec_rank"]))
    assert set(got) == set(q for q in ref if ref[q])
    for q, rows in got.items():
        assert [x[0] for x in rows] == [x[0] for x in ref[q]], f"query {q}"
        for (d, rrf, lr, vr), (rd, rrrf, rlr, rvr) in zip(rows, ref[q]):
            assert rrf == pytest.approx(rrrf, abs=1e-9)
            assert lr == rlr and vr == rvr


# ---------------------------------------------------------------------------
# q_curriculum_order — surprisal difficulty replay
# ---------------------------------------------------------------------------


def test_curriculum_order_difficulty_replay():
    # 20 docs: doc i repeats a common token and carries i rare tokens —
    # difficulty strictly increases with i.
    texts = []
    for i in range(20):
        toks = ["common"] * 10 + [f"rare{i}_{j}" for j in range(i)]
        texts.append(" ".join(toks))
    out = _run({"documents": _docs(texts)}, "q_curriculum_order")

    counts = {}
    total = 0
    alltoks = []
    for i, t in enumerate(texts):
        ts = [x for x in t.lower().split(" ") if x]
        alltoks.append(ts)
        for x in ts:
            counts[x] = counts.get(x, 0) + 1
            total += 1
    smicro = {t: _rha(-math.log(c / total) * 1e6) for t, c in counts.items()}
    diff = {
        i: _rha(sum(smicro[t] for t in ts) / len(ts))
        for i, ts in enumerate(alltoks)
    }
    order = sorted(range(20), key=lambda i: (diff[i], i))
    # decile d holds ranks [2d+1, 2d+2] (20 docs / 10 steps)
    for r in out:
        step = int(r["step"])
        members = [order[2 * step], order[2 * step + 1]]
        assert r["n_docs"] == 2
        lo = min(diff[m] for m in members)
        hi = max(diff[m] for m in members)
        assert r["min_difficulty"] == pytest.approx(lo / 1e6, abs=1e-9)
        assert r["max_difficulty"] == pytest.approx(hi / 1e6, abs=1e-9)
        # (a+b)/2 can land on an exact .5 of a micro-unit — replicate
        # engine ROUND (half away from zero), not Python's banker's.
        assert r["avg_difficulty"] == pytest.approx(
            _rha((diff[members[0]] + diff[members[1]]) / 2) / 1e6, abs=1e-9)
    # pacing: decile difficulty ranges are non-decreasing
    mins = [r["min_difficulty"] for r in out]
    maxs = [r["max_difficulty"] for r in out]
    assert all(mins[i + 1] >= maxs[i] - 1e-12 for i in range(len(out) - 1))


# ---------------------------------------------------------------------------
# q_sq8_ann — scalar-quantization replay
# ---------------------------------------------------------------------------


def test_sq8_quantization_replay():
    import struct

    f32 = lambda x: struct.unpack("f", struct.pack("f", x))[0]  # noqa: E731
    import random

    rng = random.Random(7)
    dim = 64
    embs = [[f32(rng.uniform(-1, 1)) for _ in range(dim)] for _ in range(30)]
    emb_table = (
        ["vec_id BIGINT", "embedding FLOAT[]", "label INTEGER"],
        [(i, v, 0) for i, v in enumerate(embs)],
    )
    out = _run({"embeddings": emb_table}, "q_sq8_ann")

    lo = [min(v[d] for v in embs) for d in range(dim)]
    hi = [max(v[d] for v in embs) for d in range(dim)]

    def dq(v):
        o = []
        for d in range(dim):
            if hi[d] == lo[d]:
                o.append(round(lo[d], 6))
            else:
                code = _rha((v[d] - lo[d]) / (hi[d] - lo[d]) * 255)
                o.append(round(lo[d] + code * (hi[d] - lo[d]) / 255.0, 6))
        return o

    dqs = [dq(v) for v in embs]

    def cos_fixed(a, b):
        dot = sum(_rha(x * y * 1e6) for x, y in zip(a, b)) / 1e6
        na = math.sqrt(sum(_rha(x * x * 1e6) for x in a) / 1e6)
        nb = math.sqrt(sum(_rha(x * x * 1e6) for x in b) / 1e6)
        return round(dot / (na * nb), 4)

    def cos_exact(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(dot / (na * nb), 4)

    for r in out:
        q = int(r["query_id"])
        sq = sorted(
            ((cos_fixed(dqs[d], dqs[q]), d) for d in range(30) if d != q),
            key=lambda s: (-s[0], s[1]))[:5]
        ex = sorted(
            ((cos_exact(embs[d], embs[q]), d) for d in range(30) if d != q),
            key=lambda s: (-s[0], s[1]))[:5]
        sq_ids = {d for _, d in sq}
        ex_ids = {d for _, d in ex}
        assert r["recall_5"] == pytest.approx(
            round(len(sq_ids & ex_ids) / 5.0, 2), abs=1e-9)
        err = sum(
            abs(_rha(cos_fixed(dqs[d], dqs[q]) * 1e4) - _rha(c * 1e4))
            for c, d in ex)
        assert r["mean_abs_cos_err"] == pytest.approx(
            round(err / (5 * 1e4), 6), abs=1e-9)
        # SQ8 on well-spread vectors should be a high-recall code
        assert r["recall_5"] >= 0.6


# ---------------------------------------------------------------------------
# q_personalized_pagerank — sparsity + seed-mass semantics
# ---------------------------------------------------------------------------


def test_ppr_sparsity_and_proximity():
    # Two template families; family A contains the seeds (doc 0-2),
    # family B (docs 5-7) is disconnected from A and must score 0 and
    # be absent from the output. Doc 8 is a singleton.
    fam_a = "alpha beta gamma delta epsilon zeta eta theta"
    fam_b = "one two three four five six seven eight nine ten"
    texts = [
        fam_a, fam_a + " iota", fam_a + " kappa",   # seeds 0,1,2
        fam_a + " lambda", fam_a + " mu",           # near A: 3,4
        fam_b, fam_b + " once", fam_b + " twice",   # family B: 5,6,7
        "totally different singleton words here now then",  # 8
    ]
    out = _run({"documents": _docs(texts)}, "q_personalized_pagerank")
    ids = {r["doc_id"] for r in out}
    assert ids == {0, 1, 2, 3, 4}  # B-family and singleton absent
    ranks = {r["doc_id"]: r["ppr_micro"] for r in out}
    assert all(v > 0 for v in ranks.values())
    # Seeds keep the teleport base mass; non-seeds hold strictly less
    # than the best-connected seed.
    assert max(ranks[3], ranks[4]) < max(ranks[0], ranks[1], ranks[2])


# ---------------------------------------------------------------------------
# Plan shapes
# ---------------------------------------------------------------------------


def _plan(spark, name):
    import __spark_entry__ as entry

    df = entry.queries()[name](spark, SF_SMOKE)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_rag_chunks_plan_is_scan_stage_explode(spark):
    """Chunking must stay a 1->N explode in the scan stage: no
    aggregate, no join — the only exchange is the output sort."""
    plan = _plan(spark, "q_rag_chunks")
    assert "Generate" in plan  # the explode
    assert "HashAggregate" not in plan
    assert "Join" not in plan


def test_hybrid_rrf_broadcasts_bounded_panel_sides(spark):
    """With size-based auto-broadcast off, the explicitly-hinted
    bounded sides (query terms, scalars, cosine panel) still
    broadcast, and the inverted-index probe never becomes a cartesian
    of corpus x corpus."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(spark, "q_hybrid_rrf")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(32 * 1024 * 1024))
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # the one sanctioned nested-loop shape is broadcast (bounded side)
    assert "CartesianProduct" not in plan


def test_curriculum_order_uses_two_phase_rank(spark):
    """The global curriculum rank must be the two-phase range-partition
    scan (global_row_number), never a single-task ORDER BY window."""
    plan = _plan(spark, "q_curriculum_order")
    assert "rangepartitioning" in plan.lower()


def test_sq8_ann_plan_shape(spark):
    plan = _plan(spark, "q_sq8_ann")
    assert "Generate" in plan  # posexplode for the dim stats/codes
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# q_chunk_dedup — cross-document chunk-sharing replay
# ---------------------------------------------------------------------------


def test_chunk_dedup_cross_doc_only():
    # docs 0 and 1 share their first 64-token window exactly; doc 2
    # repeats ITS OWN window twice (within-doc repeat must NOT count);
    # doc 3 is unique.
    shared = " ".join(f"s{i}" for i in range(64))
    texts = [
        shared + " tail0 " + " ".join(f"a{i}" for i in range(40)),
        shared + " tail1 " + " ".join(f"b{i}" for i in range(40)),
        # 64-tok window W, then pad so the window at start 96 is not W
        " ".join(f"c{i % 48}" for i in range(160)),
        " ".join(f"u{i}" for i in range(80)),
    ]
    out = _run({"documents": _docs(texts)}, "q_chunk_dedup")
    by_doc = {r["doc_id"]: r for r in out}
    assert set(by_doc) == {0, 1}  # only the cross-doc sharers appear
    for d in (0, 1):
        assert by_doc[d]["n_shared_chunks"] == 1  # the identical first window
        assert by_doc[d]["shared_ratio"] == pytest.approx(
            round(1 / by_doc[d]["n_chunks"], 4), abs=1e-9)


# ---------------------------------------------------------------------------
# q_fim_transform — split-point and PSM-serialization replay
# ---------------------------------------------------------------------------


def _bucket(salt: str, key, buckets: int = 1000) -> int:
    """Python replica of sampling.hash_bucket (first 4 md5 nibbles)."""
    h = hashlib.md5(f"{salt}:{key}".encode()).hexdigest()
    nib = "0123456789abcdef"
    v = (nib.index(h[0]) * 4096 + nib.index(h[1]) * 256
         + nib.index(h[2]) * 16 + nib.index(h[3]))
    return v % buckets


def test_fim_transform_replay():
    texts = [" ".join(f"w{i}_{j}" for j in range(5 + 7 * i)) for i in range(12)]
    out = _run({"documents": _docs(texts)}, "q_fim_transform")
    assert len(out) == 12
    n_applied = 0
    for r in out:
        d = r["doc_id"]
        toks = [t for t in texts[d].lower().split(" ") if t]
        n = len(toks)
        applied = 1 if _bucket("fim", d) < 500 else 0
        assert r["applied"] == applied
        if applied:
            n_applied += 1
            p1 = 1 + (_bucket("fima", d) * (n - 1)) // 1000
            p2 = p1 + (_bucket("fimb", d) * (n - p1)) // 1000
            assert (r["n_prefix"], r["n_middle"], r["n_suffix"]) == (
                p1, p2 - p1, n - p2)
            psm = " ".join(["<PRE>"] + toks[:p1] + ["<SUF>"] + toks[p2:]
                           + ["<MID>"] + toks[p1:p2])
            assert r["psm_hash"] == hashlib.md5(psm.encode()).hexdigest()
        else:
            assert (r["n_prefix"], r["n_middle"], r["n_suffix"]) == (n, 0, 0)
            assert r["psm_hash"] == hashlib.md5(
                " ".join(toks).encode()).hexdigest()
        # piece sizes always partition the doc
        assert r["n_prefix"] + r["n_middle"] + r["n_suffix"] == n
    assert 0 < n_applied < 12  # the 50% gate actually splits the corpus


# ---------------------------------------------------------------------------
# q_retrieval_ndcg — nDCG arithmetic replay
# ---------------------------------------------------------------------------


def test_ndcg_weights_are_log2_discounts():
    from mapreduce_server_development_spark.plans.retrieval import _NDCG_W

    for i, w in enumerate(_NDCG_W, 1):
        assert w == _rha(1e6 / math.log2(i + 1))


def test_ndcg_replay_on_hand_corpus():
    # Embeddings arranged so query 0's exact ranking is deterministic;
    # text made so the lexical leg is uninformative noise for doc 0's
    # terms (every doc shares them) — nDCG still must come out exactly
    # as the formula says given the fused ranking the oracle computes.
    import random
    import struct

    f32 = lambda x: struct.unpack("f", struct.pack("f", x))[0]  # noqa: E731
    rng = random.Random(11)
    embs = [[f32(rng.uniform(-1, 1)) for _ in range(8)] for _ in range(30)]
    texts = [f"tok{i} " + " ".join(f"w{j}" for j in range(10)) for i in range(30)]
    emb_table = (
        ["vec_id BIGINT", "embedding FLOAT[]", "label INTEGER"],
        [(i, v, 0) for i, v in enumerate(embs)],
    )
    tables = {"documents": _docs(texts), "embeddings": emb_table}
    ndcg_out = {r["query_id"]: r for r in _run(tables, "q_retrieval_ndcg")}
    rrf_out = _run(tables, "q_hybrid_rrf")

    # truth: exact cosine top-20 per query, rel = 21 - rank
    def cos(a, b):
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(sum(x * y for x, y in zip(a, b)) / (na * nb), 4)

    W = [1000000, 630930, 500000, 430677, 386853]
    for q in ndcg_out:
        ranked = sorted(
            ((cos(embs[d], embs[q]), d) for d in range(30) if d != q),
            key=lambda s: (-s[0], s[1]))[:20]
        rel = {d: 20 - i for i, (_, d) in enumerate(ranked)}
        fused = [r["doc_id"] for r in rrf_out if r["query_id"] == q]
        dcg = sum(rel.get(d, 0) * W[i] for i, d in enumerate(fused))
        idcg = sum(r * w for r, w in zip(sorted(rel.values(), reverse=True), W))
        assert ndcg_out[q]["dcg_micro"] == dcg
        assert ndcg_out[q]["idcg_micro"] == idcg
        assert ndcg_out[q]["ndcg"] == pytest.approx(
            round(dcg / idcg, 6), abs=1e-9)


# ---------------------------------------------------------------------------
# q_ivf_nprobe_curve — monotonicity invariants
# ---------------------------------------------------------------------------


def test_nprobe_curve_monotone_on_fixture(spark, duck):
    """On the real sf0.001 fixture: recall and candidate volume are
    non-decreasing in nprobe for every query, and nprobe=4 recall
    dominates nprobe=1 in aggregate."""
    import __spark_entry__ as entry

    rows = entry.queries()["q_ivf_nprobe_curve"](spark, SF_SMOKE).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, {})[r.nprobe] = r
    for q, lv in by_q.items():
        assert lv[1].n_cand <= lv[2].n_cand <= lv[4].n_cand
        assert lv[1].recall_at_3 <= lv[2].recall_at_3 <= lv[4].recall_at_3
        assert lv[1].cand_frac < 1.0  # probing 1 cell never scans everything


# ---------------------------------------------------------------------------
# q_pca_top_component — power-iteration estimate vs numpy eigendecomposition
# ---------------------------------------------------------------------------


def test_pca_top_component_matches_numpy():
    import struct

    import numpy as np

    f32 = lambda x: struct.unpack("f", struct.pack("f", x))[0]  # noqa: E731
    rng = np.random.RandomState(3)
    # Strong rank-1 structure + small isotropic noise: the 6-round
    # power iteration must land on the dominant direction.
    direction = rng.randn(64)
    direction /= np.linalg.norm(direction)
    coeffs = rng.randn(200) * 3.0
    X = np.outer(coeffs, direction) + rng.randn(200, 64) * 0.1
    embs = [[f32(v) for v in row] for row in X]
    emb_table = (
        ["vec_id BIGINT", "embedding FLOAT[]", "label INTEGER"],
        [(i, v, 0) for i, v in enumerate(embs)],
    )
    out = _run({"embeddings": emb_table}, "q_pca_top_component")
    assert len(out) == 5

    Xf = np.array(embs)
    Xc = Xf - Xf.mean(axis=0)
    cov = Xc.T @ Xc / (len(embs) - 1)
    evals, evecs = np.linalg.eigh(cov)
    lam, top = evals[-1], evecs[:, -1]

    r = out[0]
    assert r["top_eigenvalue"] == pytest.approx(lam, rel=0.02)
    assert r["total_variance"] == pytest.approx(np.trace(cov), rel=0.01)
    assert r["top_pc_share"] == pytest.approx(lam / np.trace(cov), rel=0.02)
    # the reported top-|loading| dims are the eigenvector's top dims
    # (up to global sign), with matching normalized magnitudes
    top_dims = set(np.argsort(-np.abs(top))[:5])
    assert {r["dim"] for r in out} == top_dims
    scale = np.abs(top).max()
    for r in out:
        assert abs(r["loading"]) == pytest.approx(
            abs(top[r["dim"]]) / scale, abs=0.01)


def test_pca_share_is_low_on_isotropic_noise():
    import struct

    import numpy as np

    f32 = lambda x: struct.unpack("f", struct.pack("f", x))[0]  # noqa: E731
    rng = np.random.RandomState(9)
    X = rng.randn(200, 64)
    emb_table = (
        ["vec_id BIGINT", "embedding FLOAT[]", "label INTEGER"],
        [(i, [f32(v) for v in row], 0) for i, row in enumerate(X)],
    )
    out = _run({"embeddings": emb_table}, "q_pca_top_component")
    # isotropic data: no dominant component (share near 1/64, far from 1)
    assert out[0]["top_pc_share"] < 0.1


# ---------------------------------------------------------------------------
# q_mmr_diversify — greedy MMR replay
# ---------------------------------------------------------------------------


def test_mmr_greedy_replay():
    import struct

    import numpy as np

    f32 = lambda x: struct.unpack("f", struct.pack("f", x))[0]  # noqa: E731
    rng = np.random.RandomState(5)
    X = rng.randn(40, 16)
    # two tight clusters near query 0 so diversity actually bites
    X[10:15] = X[10] + rng.randn(5, 16) * 0.01
    X[20:25] = X[20] + rng.randn(5, 16) * 0.01
    embs = [[f32(v) for v in row] for row in X]
    emb_table = (
        ["vec_id BIGINT", "embedding FLOAT[]", "label INTEGER"],
        [(i, v, 0) for i, v in enumerate(embs)],
    )
    out = _run({"embeddings": emb_table}, "q_mmr_diversify")

    def cos4(a, b):
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return _rha(sum(x * y for x, y in zip(a, b)) / (na * nb) * 1e4)

    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rows in by_q.items():
        # reference: exact top-10 candidates, then greedy MMR
        cand = sorted(
            ((cos4(embs[d], embs[q]), d) for d in range(40) if d != q),
            key=lambda s: (-round(s[0] / 1e4, 4), s[1]))[:10]
        rel = {d: r for r, d in cand}
        sel = []
        for _ in range(5):
            best = None
            for d in rel:
                if d in sel:
                    continue
                ms = max((cos4(embs[d], embs[s]) for s in sel), default=0)
                score = (700 * rel[d] - 300 * ms, -d)
                if best is None or score > best[0]:
                    best = (score, d)
            sel.append(best[1])
        got = [r["doc_id"] for r in sorted(rows, key=lambda r: r["mmr_rank"])]
        assert got == sel, f"query {q}: {got} != {sel}"
        # rank 1 is the pure-relevance argmax
        assert got[0] == cand[0][1]


def test_pca_degenerate_corpora_null_not_divergent():
    # n = 1 (the (n-1) divisor is 0) and a zero-variance corpus (every
    # round inflow is 0, so max|w| = 0): both must yield NULLs in the
    # oracle — the same value Spark's null-on-div-by-zero produces —
    # never IEEE inf (a cross-engine hash divergence).
    one = (["vec_id BIGINT", "embedding FLOAT[]", "label INTEGER"],
           [(0, [0.5] * 64, 0)])
    out = _run({"embeddings": one}, "q_pca_top_component")
    assert len(out) == 5
    assert all(r["top_eigenvalue"] is None for r in out)
    assert all(r["total_variance"] is None for r in out)

    const = (["vec_id BIGINT", "embedding FLOAT[]", "label INTEGER"],
             [(i, [0.5] * 64, 0) for i in range(10)])
    out2 = _run({"embeddings": const}, "q_pca_top_component")
    assert all(r["loading"] is None for r in out2)
    assert all(r["top_pc_share"] is None for r in out2)


# ---------------------------------------------------------------------------
# q_rec_coverage — coverage/novelty arithmetic replay on a hand graph
# ---------------------------------------------------------------------------


def test_rec_coverage_hand_fixture():
    # baskets: c1{1,2} c2{1,2} c3{1,3} c4{2,3} — only pair (1,2) has
    # support >= 2, so recs are c3<-2 and c4<-1; c1/c2 own everything
    # recommendable.
    orders = (["o_orderkey BIGINT", "o_custkey BIGINT"],
              [(10, 1), (20, 2), (30, 3), (40, 4)])
    li_rows = [(10, 1), (10, 2), (20, 1), (20, 2),
               (30, 1), (30, 3), (40, 2), (40, 3)]
    lineitem = (["l_orderkey BIGINT", "l_partkey BIGINT"], li_rows)
    out = _run({"orders": orders, "lineitem": lineitem}, "q_rec_coverage")
    assert len(out) == 1
    r = out[0]
    assert r["n_users_served"] == 2 and r["n_recs"] == 2
    # pop: p1=3 p2=3 p3=2; catalog 3 items, sum 8; recs hit items {1,2}
    assert r["catalog_coverage"] == pytest.approx(round(2 / 3, 4))
    assert r["popularity_lift"] == pytest.approx(round((6 * 3) / (2 * 8), 4))
    nov = _rha(-math.log(3 / 4) * 1e6)
    assert r["mean_novelty_nats"] == pytest.approx(
        round(2 * nov / (2 * 1e6), 4), abs=1e-9)

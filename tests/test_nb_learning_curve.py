"""q_nb_learning_curve — pure-Python third-implementation replay
(the q_nb_crossval discipline: replicate the whole Laplace-smoothed,
e6-ln-quantized NB pipeline independently of both engines)."""

from __future__ import annotations

import hashlib
import math
import random
from collections import Counter, defaultdict

import duckdb

from mapreduce_server_development_spark.plans import ORACLE
from mapreduce_server_development_spark.plans.corpus_stats import _NBLC_FRACS


def _decile(doc_id: int) -> int:
    h = hashlib.md5(f"nblc:{doc_id}".encode()).hexdigest()
    return int(h[:4], 16) % 10


def _q6ln(x: float) -> int:
    # round-half-away e6 quantization of ln (Spark/DuckDB ROUND)
    v = math.log(x) * 1000000
    return int(math.copysign(math.floor(abs(v) + 0.5), v))


def _reference_curve(rows):
    """rows: (doc_id, tokens, source). Returns {f: (n_train, n_test,
    n_correct)}."""
    dec = {d: _decile(d) for d, _, _ in rows}
    classes = sorted({s for _, _, s in rows})
    out = {}
    for f in _NBLC_FRACS:
        train = [(d, t, s) for d, t, s in rows if dec[d] < f]
        test = [(d, t, s) for d, t, s in rows if dec[d] == 9 and t]
        cnt: dict = defaultdict(Counter)
        nd: Counter = Counter()
        vocab = set()
        for _, toks, s in train:
            nd[s] += 1
            for t in toks:
                cnt[s][t] += 1
                vocab.add(t)
        # candidates: classes with >= 1 training doc at this fraction
        cands = sorted(nd)
        tot = {s: sum(cnt[s].values()) for s in cands}
        v = len(vocab)
        n = len(train)
        k = len(cands)
        correct = 0
        for _, toks, truth in test:
            best = None
            for c in cands:
                score = _q6ln((nd.get(c, 0) + 1.0) / (n + k))
                for t in toks:
                    score += _q6ln(
                        (cnt[c].get(t, 0) + 1.0) / (tot.get(c, 0) + v))
                # ROW_NUMBER orders score DESC, cand ASC
                key = (-score, c)
                if best is None or key < best[0]:
                    best = (key, c)
            if best[1] == truth:
                correct += 1
        out[f] = (len(train), len(test), correct)
    return out


def test_learning_curve_replay_synthetic():
    rng = random.Random(5)
    langs = {
        "news": ["politics", "election", "senate", "policy", "vote"],
        "sport": ["match", "goal", "league", "coach", "score"],
        "tech": ["compiler", "kernel", "tensor", "cache", "shader"],
    }
    rows = []
    for d in range(120):
        src = ["news", "sport", "tech"][d % 3]
        toks = [rng.choice(langs[src]) for _ in range(12)]
        toks += [f"noise{rng.randrange(40)}" for _ in range(4)]
        rows.append((d, toks, src))

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
        "source VARCHAR, n_chars BIGINT)"
    )
    con.executemany(
        "INSERT INTO documents VALUES (?, ?, 'en', ?, ?)",
        [(d, " ".join(t), s, len(" ".join(t))) for d, t, s in rows],
    )
    res = con.sql(ORACLE["q_nb_learning_curve"])
    got = {r[0]: r for r in res.fetchall()}
    con.close()

    want = _reference_curve(rows)
    assert set(got) == set(want)
    for f, (n_train, n_test, n_correct) in want.items():
        g = got[f]
        assert g[2] == n_train, (f, g)
        assert g[3] == n_test, (f, g)
        assert g[4] == n_correct, (f, "oracle", g, "ref", want[f])
    # on separable synthetic data more data must help overall
    assert got[9][5] >= got[1][5]


def test_learning_curve_fixture_shape(spark):
    from mapreduce_server_development_spark.plans import QUERIES

    from .conftest import SF_SMOKE

    rows = QUERIES["q_nb_learning_curve"](spark, SF_SMOKE).collect()
    assert [r.n_deciles for r in rows] == list(_NBLC_FRACS)
    for r in rows:
        assert 0 <= r.n_correct <= r.n_test_docs
        assert r.n_test_docs > 0
    # train size strictly grows with the fraction
    sizes = [r.n_train_docs for r in rows]
    assert sizes == sorted(sizes) and sizes[0] < sizes[-1]

"""Micro-fixture unit tests for the corpus-statistics queries
(q_repetition_stats, q_inverted_index) — the oracle sweep covers them
end-to-end at sf*; these pin the integer-arithmetic flag boundaries and
the tokenless-document row."""

from __future__ import annotations

from mapreduce_server_development_spark.plans import QUERIES

DOCS = [
    (1, "a a a a b"),      # top token 4/5 -> repetitive (5*4 > 5)
    (2, "a b c d e f"),    # all distinct: 5*1 > 6 false, 5*1 > 5 false
    (3, ""),               # tokenless: zero counts, null fracs, flag 0
]


def _docs_dir(spark, tmp_path):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_repetition_stats_flags_and_tokenless_row(spark, tmp_path):
    sf_dir = _docs_dir(spark, tmp_path)
    rows = {r["doc_id"]: r for r in QUERIES["q_repetition_stats"](spark, sf_dir).collect()}
    assert set(rows) == {1, 2, 3}

    r1 = rows[1]
    assert (r1["n_tokens"], r1["n_distinct"], r1["top_tok_n"]) == (5, 2, 4)
    # bigrams: "a a" x3 + "a b" -> 4 total, top 3
    assert (r1["n_bigrams"], r1["top_bigram_n"]) == (4, 3)
    assert r1["top_tok_frac"] == 0.8
    assert r1["flag_repetitive"] == 1

    r2 = rows[2]
    assert (r2["n_tokens"], r2["n_distinct"], r2["top_tok_n"]) == (6, 6, 1)
    assert (r2["n_bigrams"], r2["top_bigram_n"]) == (5, 1)
    # Integer-arithmetic boundary: 5*1 > 6 and 5*1 > 5 are both false —
    # exactly-20% is NOT repetitive (a float path could flip this).
    assert r2["flag_repetitive"] == 0

    r3 = rows[3]
    assert (r3["n_tokens"], r3["n_bigrams"]) == (0, 0)
    assert r3["top_tok_frac"] is None and r3["type_token_ratio"] is None
    assert r3["flag_repetitive"] == 0


def test_inverted_index_head_ordering(spark, tmp_path):
    sf_dir = _docs_dir(spark, tmp_path)
    rows = QUERIES["q_inverted_index"](spark, sf_dir).collect()
    # doc_freq DESC, token ASC: a(df2) then b(df2) then c,d,e,f (df1)
    assert [r["token"] for r in rows] == ["a", "b", "c", "d", "e", "f"]
    a = rows[0]
    assert (a["doc_freq"], a["total_tf"], a["first_doc"]) == (2, 5, 1)
    b = rows[1]
    assert (b["doc_freq"], b["total_tf"], b["first_doc"]) == (2, 2, 1)


def test_dup_ngram_spans_invariants(spark):
    """Merged spans can never cover more tokens than the document has,
    every span is at least one 8-gram long, and the synthetic corpus
    (tiny shared vocabulary) must surface at least one duplicated span."""
    from mapreduce_server_development_spark.plans import QUERIES
    from .conftest import SF_SMOKE

    rows = QUERIES["q_dup_ngram_spans"](spark, SF_SMOKE).collect()
    assert rows
    assert any(r.dup_tokens > 0 for r in rows)
    for r in rows:
        assert 0 <= r.dup_tokens <= r.n_tokens, r
        # maximal spans are disjoint and each covers a full 8-gram
        assert r.dup_tokens >= 8 * r.n_spans, r
        if r.n_spans == 0:
            assert r.dup_tokens == 0, r


def test_pmi_bigrams_support_and_order(spark):
    from mapreduce_server_development_spark.plans import QUERIES
    from .conftest import SF_SMOKE

    rows = QUERIES["q_pmi_bigrams"](spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 30
    assert all(r.c_xy >= 5 for r in rows)
    scores = [r.pmi for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        # a bigram cannot occur more often than either unigram
        assert r.c_xy <= min(r.c_x, r.c_y), r


def test_source_drift_kl_nonnegative(spark):
    """KL divergence is >= 0 (up to per-term picounit rounding) and a
    source's vocab can never exceed its token count."""
    from mapreduce_server_development_spark.plans import QUERIES
    from .conftest import SF_SMOKE

    rows = QUERIES["q_source_drift"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.kl_e12 >= -len(rows), r  # rounding slack: 1 picounit/term
        assert 0 < r.n_vocab <= r.n_tokens, r


def test_bpe_train_learns_textbook_merges(spark, tmp_path):
    """On the classic Sennrich corpus (low x5, lower x2, newest x6,
    widest x3) the first merges must be es, est, est</w>, lo, low —
    including the deterministic tie-breaks (es/st/t</w> all count 9;
    the lexicographically smallest pair wins)."""
    from mapreduce_server_development_spark.plans import QUERIES

    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    df = spark.createDataFrame(
        [(1, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = QUERIES["q_bpe_train"](spark, str(tmp_path)).collect()
    got = [(r.round, r.merged, r.pair_count) for r in rows]
    assert got[:5] == [
        (1, "es", 9),
        (2, "est", 9),
        (3, "est</w>", 9),
        (4, "lo", 7),
        (5, "low", 7),
    ], got
    for r in rows:
        assert r.merged == r.pair.replace(" ", "")

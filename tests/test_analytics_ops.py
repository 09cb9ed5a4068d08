"""Edge-case unit tests for the gap-fill / keep-best / histogram /
distribution-rank operators on hand-built micro-fixtures (the oracle
smoke tests cover them end-to-end; these pin the tricky boundaries).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Window
from pyspark.sql import functions as F


def _gapfill(ev):
    """The q_events_gapfill core, lifted to run on any events frame."""
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type").agg(
        F.count("*").alias("n")
    )
    spine_h = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    ).select(F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("h"))
    spine = ev.select("event_type").distinct().crossJoin(F.broadcast(spine_h))
    filled = spine.join(hourly, ["h", "event_type"], "left").select(
        "h",
        "event_type",
        F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
        F.when(F.col("n").isNull(), 1).otherwise(0).alias("gap"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    locf = F.last(F.when(F.col("gap") == 0, F.col("n_events")), ignorenulls=True).over(w)
    return filled.withColumn("locf_events", F.coalesce(locf, F.lit(0)).cast("long"))


def test_gapfill_dense_spine_and_locf(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 30)

    def at(h):
        return t0 + dt.timedelta(hours=h)

    # Type "a" fires at hours 0, 3 (twice); type "b" only at hour 2 —
    # so "b" has a LEADING gap (LOCF must be 0, not null) and "a" has
    # interior gaps carrying 1 forward.
    rows = [(at(0), "a"), (at(3), "a"), (at(3), "a"), (at(2), "b")]
    ev = spark.createDataFrame(rows, "ts timestamp, event_type string")
    out = {
        (r["event_type"], r["h"].hour): (r["n_events"], r["gap"], r["locf_events"])
        for r in _gapfill(ev).collect()
    }
    # Dense: 2 types x 4 hours, no holes.
    assert len(out) == 8
    assert out[("a", 0)] == (1, 0, 1)
    assert out[("a", 1)] == (0, 1, 1)  # interior gap carries 1 forward
    assert out[("a", 2)] == (0, 1, 1)
    assert out[("a", 3)] == (2, 0, 2)
    assert out[("b", 0)] == (0, 1, 0)  # leading gap: LOCF defaults to 0
    assert out[("b", 1)] == (0, 1, 0)
    assert out[("b", 2)] == (1, 0, 1)
    assert out[("b", 3)] == (0, 1, 1)


def test_keep_best_argmax_and_tiebreak(spark):
    from mapreduce_server_development_spark.functions.dedup import (
        connected_components,
    )

    # Cluster {1,2,3} (chain 1-2, 2-3) and singleton {9}; doc 2 and 3
    # tie on n_chars -> lower doc_id wins.
    docs = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 9), (9, 4)], "doc_id long, n_chars long"
    )
    edges = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    nodes = docs.select(F.col("doc_id").alias("node"))
    clusters = connected_components(nodes, edges).select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    kept = (
        clusters.join(docs, "doc_id")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
    )
    got = {r["cluster_id"]: r["doc_id"] for r in kept.collect()}
    assert got == {1: 2, 9: 9}


def test_histogram_bucket_edges_are_decimal_exact(spark):
    # 24.99 -> bucket 0; 25.00 lands exactly on the edge -> bucket 1.
    ev = spark.createDataFrame(
        [("x", 24.99), ("x", 25.00), ("x", 0.01), ("x", 49.99), ("x", 50.0)],
        "event_type string, value double",
    )
    vdec = F.col("value").cast("decimal(16,4)")
    got = sorted(
        (r["bucket"], r["n"])
        for r in ev.select(F.floor(vdec / 25).cast("int").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert got == [(0, 2), (1, 2), (2, 1)]


def test_ntile_and_percent_rank_determinism(spark):
    # 5 users, one type; ties on total broken by user_id so every
    # positional output is pinned.
    per = spark.createDataFrame(
        [("t", 1, 10.0), ("t", 2, 10.0), ("t", 3, 8.0), ("t", 4, 6.0), ("t", 5, 4.0)],
        "event_type string, user_id long, tv double",
    )
    w = Window.partitionBy("event_type").orderBy(F.col("tv").desc(), F.col("user_id"))
    rows = per.select(
        "user_id",
        F.rank().over(w).alias("rnk"),
        F.ntile(4).over(w).alias("q"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
    ).collect()
    got = {r["user_id"]: (r["rnk"], r["q"], r["pr"]) for r in rows}
    # The user_id tiebreak makes every ORDER BY key distinct, so the
    # 10.0-total "tie" still yields unique ranks 1..5 — exactly why the
    # query's outputs can never flip between engines.
    # NTILE(4) over 5 rows: the extra row lands in the FIRST bucket
    # (sizes 2,1,1,1) — the SQL-standard allocation both engines share.
    assert got[1] == (1, 1, 0.0)
    assert got[2] == (2, 1, 0.25)
    assert got[3] == (3, 2, 0.5)
    assert got[4] == (4, 3, 0.75)
    assert got[5] == (5, 4, 1.0)


import pytest as _pytest


@_pytest.mark.parametrize("opname", ["deletion", "prefix_suffix"])
def test_typo_blocking_every_edit_type(spark, opname):
    """Both exact-recall ed<=1 blocking schemes (SymSpell deletion
    neighborhood; PassJoin tau=1 prefix/suffix pigeonhole) must catch
    each single-edit class — exact dup (dist 0), substitution at the
    start / middle / end, insertion, deletion — and reject a 2-edit
    pair; the fixture corpus has no ed<=1 pairs, so this micro-fixture
    is the positive-path evidence for q_typo_pairs."""
    from mapreduce_server_development_spark.functions import dedup as dd

    op = (
        dd.deletion_neighborhood_pairs
        if opname == "deletion"
        else dd.prefix_suffix_typo_pairs
    )
    docs = [
        (1, "hello world"),       # base (len 11, odd)
        (2, "hello world"),       # exact dup          -> dist 0
        (3, "hellp world"),       # substitution       -> dist 1
        (4, "helloo world"),      # insertion (len 12) -> dist 1
        (5, "hell world"),        # deletion (len 10)  -> dist 1
        (6, "hxllp world"),       # two edits          -> excluded
        (7, ""),                  # empty string edge
        (8, "x"),                 # one char; ed("", "x") = 1
        (9, "xello world"),       # substitution at position 0
        (10, "hello worlx"),      # substitution at the last char
    ]
    df = spark.createDataFrame(
        [(i, t, len(t)) for i, t in docs], "doc_id long, text string, n_chars long"
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["dist"] for r in op(df).collect()
    }
    assert got[(1, 2)] == 0
    assert got[(1, 3)] == 1
    assert got[(1, 4)] == 1
    assert got[(1, 5)] == 1
    assert (1, 6) not in got
    assert got[(7, 8)] == 1      # insertion into empty string
    assert got[(3, 6)] == 1      # hellp -> hxllp is one substitution
    assert got[(1, 9)] == 1      # edit at the very first char
    assert got[(1, 10)] == 1     # edit at the very last char


def test_passjoin_exact_recall_tau2(spark):
    """PassJoin tau=2 must reproduce brute-force levenshtein <= 2
    EXACTLY (the recall claim is exact, not approximate) on an
    adversarial synthetic set: tiny strings, edits at random positions,
    length differences 0..2, segment-boundary edits."""
    import itertools
    import random

    from mapreduce_server_development_spark.functions.dedup import passjoin_pairs

    def lev(a, b):
        m, n = len(a), len(b)
        dp = list(range(n + 1))
        for i in range(1, m + 1):
            prev, dp[0] = dp[0], i
            for j in range(1, n + 1):
                cur = dp[j]
                dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
                prev = cur
        return dp[n]

    rng = random.Random(7)
    alpha = "abcdef"
    docs = []
    for base_len in [1, 2, 3, 5, 7, 9, 12, 20]:
        s = "".join(rng.choice(alpha) for _ in range(base_len))
        docs.append(s)
        for n_edits in range(4):
            t = list(s)
            for _ in range(n_edits):
                op = rng.choice(["ins", "del", "sub"]) if t else "ins"
                p = rng.randrange(len(t) + 1 if op == "ins" else len(t))
                if op == "ins":
                    t.insert(p, rng.choice(alpha))
                elif op == "del":
                    t.pop(p)
                else:
                    t[p] = rng.choice(alpha)
            docs.append("".join(t))
    docs = list(dict.fromkeys(docs))
    rows = [(i, s, len(s)) for i, s in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")

    got = {(r.doc_a, r.doc_b, r.dist) for r in passjoin_pairs(df, tau=2).collect()}
    want = {
        (i, j, lev(a, b))
        for (i, a, _), (j, b, _) in itertools.combinations(rows, 2)
        if lev(a, b) <= 2
    }
    assert got == want
    assert want, "fixture must exercise the positive path"


def test_semantic_dedup_flags_min_id_survivor(spark):
    """Within every cluster the lowest id can never be a dup (there is
    no lower-id neighbor), flags are 0/1, and every vector is assigned
    to exactly one of the 16 seed clusters."""
    from mapreduce_server_development_spark.plans import QUERIES
    from .conftest import SF_SMOKE

    rows = QUERIES["q_semantic_dedup"](spark, SF_SMOKE).collect()
    assert rows
    assert all(r.is_dup in (0, 1) for r in rows)
    assert all(0 <= r.cid <= 16 for r in rows)
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cid, []).append(r)
    for members in by_cluster.values():
        lowest = min(members, key=lambda r: r.vec_id)
        assert lowest.is_dup == 0, lowest


def test_incremental_dedup_positive_and_novel(spark):
    """A new doc identical to an old doc flags is_dup with jaccard 1.0
    and points at that old doc; an unrelated new doc stays novel."""
    from mapreduce_server_development_spark.functions.dedup import (
        incremental_jaccard_dedup,
    )

    old = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "one two three four five six seven eight nine"),
        ],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon zeta eta theta"),
            (11, "completely different words with no overlap at all here"),
        ],
        ["doc_id", "text"],
    )
    rows = {
        r.doc_id: r
        for r in incremental_jaccard_dedup(new, old, n=5, threshold=0.5).collect()
    }
    assert rows[10].is_dup == 1
    assert rows[10].best_match == 1
    assert rows[10].best_jaccard == 1.0
    assert rows[11].is_dup == 0
    assert rows[11].best_match is None


def test_attribution_last_touch_and_direct(spark, monkeypatch):
    import mapreduce_server_development_spark.plans.relational_ext as m

    t = dt.datetime(2024, 1, 1)

    def at(minutes):
        return t + dt.timedelta(minutes=minutes)

    rows = [
        # user 1: click, purchase(10), purchase(5), view, purchase(2)
        (1, at(0), 1, "click", 0.0),
        (2, at(1), 1, "purchase", 10.0),
        (3, at(2), 1, "purchase", 5.0),
        (4, at(3), 1, "view", 0.0),
        (5, at(4), 1, "purchase", 2.0),
        # user 2: purchase with no prior touch -> direct
        (6, at(0), 2, "purchase", 7.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    monkeypatch.setattr(m, "load_table", lambda s, sf, name: ev)
    got = {
        r.touch_type: (r.n_purchases, r.revenue)
        for r in m.q_attribution(spark, "unused").collect()
    }
    # both purchases after the click (even the one after another
    # purchase) credit the click; the last one credits the view
    assert got == {"click": (2, 15.0), "view": (1, 2.0), "direct": (1, 7.0)}


def test_copurchase_bfs_hop_frontiers(spark, monkeypatch):
    import mapreduce_server_development_spark.plans.graph_common as gc
    import mapreduce_server_development_spark.plans.relational_ext as m

    # chain 1-2-3-4-5 via overlapping orders + disconnected {10,11}:
    # hop bound 3 must stop before part 5, never reach 10/11.
    orders = [(1, [1, 2]), (2, [2, 3]), (3, [3, 4]), (4, [4, 5]), (5, [10, 11])]
    rows = [(ok, pk) for ok, parts in orders for pk in parts]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    monkeypatch.setattr(m, "load_table", lambda s, sf, name: li)
    # the edge builder now loads through graph_common's capped_po
    monkeypatch.setattr(gc, "load_table", lambda s, sf, name: li)
    got = [
        (r.hop, r.n_parts, r.checksum)
        for r in m.q_copurchase_bfs(spark, "unused").collect()
    ]
    assert got == [(0, 1, 1), (1, 1, 2), (2, 1, 3), (3, 1, 4)]


def test_bpe_merge_is_greedy_not_replace(spark, monkeypatch):
    """'banana' under merge (a,n) must become [b, an, an, a, </w>]:
    string replace misses every second consecutive occurrence (its
    match consumes the shared separator), which is how a non-BPE merge
    survived both engines agreeing. The greedy fold must also match
    Sennrich greedy-left on runs: 'aaaa' + (a,a) -> [aa, aa]."""
    import mapreduce_server_development_spark.plans.tokenizer as tok
    from pyspark.sql import functions as F

    docs = spark.createDataFrame([(1, "anan anan")], "doc_id long, text string")
    monkeypatch.setattr(tok, "load_table", lambda s, sf, name: docs)
    rows = {r.round: r for r in tok.q_bpe_train(spark, "unused").collect()}
    # 'anan' -> [a,n,a,n,</w>]: top pair (a,n), weight 2 occurrences
    # x2 word count.
    assert rows[1].pair == "a n" and rows[1].pair_count == 4
    # Greedy merges BOTH occurrences -> [an, an, </w>], so round 2's
    # candidates are {an an, an </w>} and the tie-break picks
    # 'an </w>'. Replace-based merging leaves [an, a, n, </w>] (its
    # match consumed the separator) and would pick 'a n' again.
    assert rows[2].pair == "an </w>"

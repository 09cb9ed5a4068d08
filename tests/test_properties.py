"""Property-based tests (hypothesis) — beyond the reference's test
strategy (SURVEY.md §5: golden files + message traces only).

Pure-function properties run hundreds of examples; Spark-backed
equivalence properties draw a BATCH of rows per example and keep
max_examples small so each example is one tiny local job.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st


# ---------------------------------------------------------------------------
# Pure functions
# ---------------------------------------------------------------------------


@given(
    files=st.lists(st.text(st.sampled_from("abc0123"), min_size=1, max_size=8), unique=True),
    n=st.integers(min_value=1, max_value=9),
)
def test_round_robin_partition_properties(files, n):
    """F2 invariants: every file appears exactly once, sorted file i
    lands in task i % n, and no task list exceeds ceil(len/n)."""
    from mapreduce_server_development_spark.operators.mapreduce import (
        round_robin_partition,
    )

    tasks = round_robin_partition(files, n)
    flat = [f for t in tasks for f in t]
    assert sorted(flat) == sorted(files)
    for i, f in enumerate(sorted(files)):
        assert f in tasks[i % n]
    assert all(len(t) <= (len(files) + n - 1) // max(1, n) for t in tasks)


@given(p=st.integers(0, 31), d=st.integers(1, 128))
def test_lsh_plane_weights_deterministic_pm1(p, d):
    """Hyperplane weights are ±1 and identical across calls (the oracle
    re-derives them independently, so determinism is load-bearing)."""
    from mapreduce_server_development_spark.functions.similarity import (
        lsh_plane_weights,
    )

    a = lsh_plane_weights(p + 1, d)
    b = lsh_plane_weights(p + 1, d)
    assert a == b
    assert all(w in (1.0, -1.0) for plane in a for w in plane)


# ---------------------------------------------------------------------------
# Spark expression vs python reference semantics
# ---------------------------------------------------------------------------

_TEXTS = st.lists(
    st.text(st.sampled_from(" abzé9\t"), max_size=24), min_size=1, max_size=30
)


def _py_tokens(s: str) -> list[str]:
    return [t for t in s.split(" ") if t != ""]


@settings(max_examples=8, deadline=None)
@given(texts=_TEXTS)
def test_tokens_and_shingles_match_python_reference(spark, texts):
    """tokens_col / word_shingles agree with a literal python model on
    arbitrary text (empties dropped, shingles are consecutive joins)."""
    from pyspark.sql import functions as F

    from mapreduce_server_development_spark.functions.text import (
        tokens_col,
        word_shingles,
    )

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    toks_df = df.select("id", tokens_col(F.col("text")).alias("toks"))
    out = {
        r.id: (list(r.toks), list(r.sh))
        for r in toks_df.select(
            "id", "toks", word_shingles(F.col("toks"), 2).alias("sh")
        ).collect()
    }
    for i, t in enumerate(texts):
        ptoks = _py_tokens(t)
        psh = [" ".join(ptoks[j : j + 2]) for j in range(len(ptoks) - 1)]
        assert out[i][0] == ptoks, (t, out[i][0])
        assert out[i][1] == psh, (t, out[i][1])


@settings(max_examples=6, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 14), st.integers(0, 14)), max_size=20
    )
)
def test_connected_components_match_union_find(spark, edges):
    """The iterative min-label propagation must agree with a pure-Python
    union-find on arbitrary small graphs (self-loops, parallel edges,
    long chains, isolated nodes)."""
    from mapreduce_server_development_spark.functions.dedup import (
        connected_components,
    )

    nodes = list(range(15))
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    # canonical label = min node id in the set
    expected = {}
    for n in nodes:
        r = find(n)
        expected.setdefault(r, []).append(n)
    want = {n: min(mem) for mem in expected.values() for n in mem}

    ndf = spark.createDataFrame([(n,) for n in nodes], "node long")
    edf = spark.createDataFrame(
        [(a, b) for a, b in edges] or [(0, 0)], "a long, b long"
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(ndf, edf).collect()
    }
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 14), st.integers(0, 14)), max_size=20
    )
)
def test_connected_components_star_match_union_find(spark, edges):
    """Large-star/small-star contraction must compute the same
    components as union-find on arbitrary small graphs — including the
    shapes that stress it specifically (self-loops, parallel edges,
    stars that must not collapse to empty edge sets)."""
    from mapreduce_server_development_spark.functions.dedup import (
        connected_components_star,
    )

    nodes = list(range(15))
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    expected = {}
    for n in nodes:
        r = find(n)
        expected.setdefault(r, []).append(n)
    want = {n: min(mem) for mem in expected.values() for n in mem}

    ndf = spark.createDataFrame([(n,) for n in nodes], "node long")
    edf = spark.createDataFrame(
        [(a, b) for a, b in edges] or [(0, 0)], "a long, b long"
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components_star(ndf, edf).collect()
    }
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    vals=st.lists(st.integers(0, 1000), min_size=1, max_size=60),
    nparts=st.integers(1, 9),
)
def test_global_running_sum_matches_cumsum(spark, vals, nparts):
    """Two-phase prefix sum == sequential cumsum for any values and any
    partition count (offsets must chain correctly across partitions)."""
    from mapreduce_server_development_spark.functions.prefix import (
        global_running_sum,
    )

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        r["k"]: r["running_sum"]
        for r in global_running_sum(df, "k", "v", num_partitions=nparts).collect()
    }
    acc = 0
    for k, v in rows:
        acc += v
        assert got[k] == acc


@given(
    args=st.lists(
        st.text(st.sampled_from("ab c/.'\"-_$"), min_size=1, max_size=8),
        min_size=1,
        max_size=4,
    )
)
def test_cmd_quotes_argv_lists_safely(args):
    """_cmd must quote every argv token so shell metacharacters in
    arguments (quotes, spaces, $) survive the pipe round-trip."""
    import shlex

    from mapreduce_server_development_spark.operators.mapreduce import _cmd

    rendered = _cmd(args)
    assert shlex.split(rendered) == args

"""Engine-wide anti-pattern sweep: every registered query's physical
plan is checked for the three scale-killers the 100 TB brief bans —
cartesian products (except the documented bounded-broadcast one in
cosine_topk), row-at-a-time Python UDFs (BatchEvalPython; the
sanctioned slow paths are Arrow: ArrowEvalPython / FlatMapGroupsInPandas
/ PythonUDTF), and single-partition window sorts (a WindowExec fed by
Exchange SinglePartition moves the whole relation through ONE task —
the q_rfm_segments defect class from round 5).
"""

from __future__ import annotations

import re

import pytest

from .conftest import SF_SMOKE

#: cosine_topk: query side is bounded (<=5 vids) and broadcast — the
#: crossJoin is the documented exact-tier fan-out, not an accident.
CARTESIAN_OK = {"q_cosine_topk"}

#: Queries whose single-partition window runs over a DOCUMENTED bounded
#: relation (never data-scale), so one task is the right plan:
#:   q_mix_planner  — |sources| rows (~tens) after a full pre-aggregation
#:   q_skyline      — dimension-bounded candidate set (docstring-proved)
#: (q_bootstrap_ci's 50-replicate window needs no entry: its rank filter
#: compiles to TakeOrderedAndProject, which is already single-partition
#: and limit-bounded, so no SinglePartition exchange exists to flag.)
SINGLE_WINDOW_OK = {"q_mix_planner", "q_skyline"}

#: Streaming queries execute on construction (availableNow -> sink);
#: their returned DataFrame is a sink read-back, so plan inspection
#: would only see the scan. Covered by their own oracle rows instead.
SKIP = {
    "q_stream_hourly_tumbling",
    "q_stream_sliding_counts",
    "q_session_window",
    "q_stream_dedup",
    "q_stream_user_state",
    "q_stream_enrich",
    "q_stream_stream_join",
}


def single_partition_windows(plan: str) -> list[str]:
    """Return the ids of Window/WindowInPandas nodes in a *formatted*
    explain string whose enforcing exchange is ``SinglePartition``.

    The formatted output is one numbered operator tree per plan section
    (main plan plus every subquery under "===== Subqueries ====="),
    followed by per-node details. For each Window node we walk its
    subtree in pre-order and take the FIRST exchange encountered — that
    is the exchange satisfying the window's required child distribution
    (an unpartitioned window requires AllTuples = SinglePartition; a
    partitioned one hashpartitioning). An already-suitably-partitioned
    child contributes its own (non-SinglePartition) exchange first, so
    the walk is exact for the defect class it guards. ReusedExchange
    nodes are resolved to their reuse target, and subquery trees are
    scanned like the main tree — a single-partition window cannot hide
    in either.
    """
    node_re = re.compile(r"^([-+*: ]*)(\S[^(]*)\((\d+)\)\s*$")
    trees: list[list[tuple[int, str, str]]] = []
    run: list[tuple[int, str, str]] = []
    for ln in plan.splitlines():
        m = node_re.match(ln)
        if m:
            run.append((len(m.group(1)), m.group(2).strip(), m.group(3)))
        elif run:
            trees.append(run)
            run = []
    if run:
        trees.append(run)
    single_exchanges = {
        m.group(1)
        for m in re.finditer(
            r"\((\d+)\) Exchange[^\n]*\nInput[^\n]*\nArguments: SinglePartition",
            plan,
        )
    }
    reuse_target = {
        m.group(1): m.group(2)
        for m in re.finditer(
            r"\((\d+)\) ReusedExchange[^\n]*\[Reuses operator id: (\d+)\]", plan
        )
    }
    bad = []
    for tree in trees:
        for i, (depth, name, nid) in enumerate(tree):
            if not name.startswith(("Window", "WindowInPandas")):
                continue
            for d2, n2, id2 in tree[i + 1 :]:
                if d2 <= depth:
                    break
                if n2.startswith("ReusedExchange"):
                    if reuse_target.get(id2) in single_exchanges:
                        bad.append(nid)
                    break
                if n2.startswith("Exchange"):
                    if id2 in single_exchanges:
                        bad.append(nid)
                    break
    return bad


def _names():
    import __spark_entry__ as entry

    return sorted(n for n in entry.queries() if n not in SKIP)


@pytest.mark.parametrize("name", _names())
def test_no_cartesian_no_rowwise_python(spark, name):
    import __spark_entry__ as entry

    df = entry.queries()[name](spark, SF_SMOKE)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    if name not in CARTESIAN_OK:
        assert "CartesianProduct" not in plan, name
    assert "BatchEvalPython" not in plan, name
    if name not in SINGLE_WINDOW_OK:
        assert not single_partition_windows(plan), name


def test_detector_flags_global_window(spark):
    """Red path: a deliberately unpartitioned window over a data-scale
    relation must trip the detector (this is the plan shape that let
    q_rfm_segments' three global ntile sorts through a green suite)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = (
        spark.range(1000)
        .withColumn("rn", F.row_number().over(Window.orderBy("id")))
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert single_partition_windows(plan)

    ok = spark.range(1000).withColumn(
        "rn",
        F.row_number().over(Window.partitionBy(F.col("id") % 8).orderBy("id")),
    )
    plan_ok = ok._sc._jvm.PythonSQLUtils.explainString(
        ok._jdf.queryExecution(), "formatted"
    )
    assert not single_partition_windows(plan_ok)

    # A global window hiding inside a scalar SUBQUERY must also trip —
    # subquery plans print as separate trees in the formatted output.
    sub = spark.sql(
        "SELECT id FROM range(1000) WHERE id > ("
        "  SELECT max(rn) - 50 FROM ("
        "    SELECT row_number() OVER (ORDER BY id) AS rn FROM range(1000)))"
    )
    plan_sub = sub._sc._jvm.PythonSQLUtils.explainString(
        sub._jdf.queryExecution(), "formatted"
    )
    assert single_partition_windows(plan_sub)

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
#: their returned DataFrame is a sink read-back, so plan inspection of
#: the RETURNED frame would only see the scan. The executed micro-batch
#: plans are swept instead by test_streaming_microbatch_plans below,
#: which captures every SQL execution the run produced (micro-batches,
#: foreachBatch inner jobs, readout) from the SQL status store and runs
#: the same three detectors over each.
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
            # Exact names only: "WindowGroupLimit ... Partial" is the
            # MAP-SIDE top-k prune Spark inserts BELOW the shuffle —
            # its subtree legitimately holds no enforcing exchange, so
            # the walk would misattribute whatever exchange the child
            # join contains (e.g. a broadcast side's 1-row global
            # aggregate = Exchange SinglePartition — the false positive
            # the cell-assignment family exposed). Every
            # WindowGroupLimit is paired with a Window parent, which IS
            # checked, so no coverage is lost.
            if name not in ("Window", "WindowInPandas"):
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


# ---------------------------------------------------------------------------
# Streaming micro-batch sweep — closes the sink-read-back blind spot.
#
# A streaming query's returned DataFrame is a memory/file-sink scan, so
# the batch sweep above never sees the plans that actually executed.
# But every micro-batch (and every inner foreachBatch action) is a SQL
# execution recorded in the live UI status store with its FORMATTED
# physical plan (spark.sql.ui.explainMode defaults to formatted), so we
# can diff the store across the run and apply the identical detectors
# to every plan the run produced.
# ---------------------------------------------------------------------------


def _latest_execution_id(spark) -> int:
    """Highest executionId in the SQL status store (-1 when empty)."""
    seq = spark._jsparkSession.sharedState().statusStore().executionsList()
    n = seq.size()
    return seq.apply(n - 1).executionId() if n else -1


def _plans_since(spark, floor: int) -> dict[int, str]:
    """executionId -> formatted physical plan for every execution with
    id > floor. Walks the store from the END and stops at the floor:
    the store holds the whole session's history (thousands of entries
    late in a suite run) and each physicalPlanDescription() is a large
    string crossing py4j, so the previous fetch-everything form cost
    ~20 s PER TEST by the time the streaming sweep ran (measured,
    r12) — the plans are the same either way."""
    seq = spark._jsparkSession.sharedState().statusStore().executionsList()
    out: dict[int, str] = {}
    for i in range(seq.size() - 1, -1, -1):
        e = seq.apply(i)
        eid = e.executionId()
        if eid <= floor:
            break
        out[eid] = e.physicalPlanDescription() or ""
    return out


def _drain_listener_bus(spark) -> None:
    """The status store is fed by the async listener bus; drain it so
    the final micro-batch's plan is visible before we diff."""
    import time

    try:
        spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()
    except Exception:
        time.sleep(3)  # best-effort fallback on bus API drift


def _plans_during(spark, run) -> dict[int, str]:
    """Run ``run()`` and return the plans of every SQL execution it
    caused (ids are monotonically increasing, so eviction of old
    entries cannot hide a new one)."""
    _drain_listener_bus(spark)
    floor = _latest_execution_id(spark)
    run()
    _drain_listener_bus(spark)
    return _plans_since(spark, floor)


def _streaming_names():
    import __spark_entry__ as entry

    return sorted(
        n
        for n, fn in entry.queries().items()
        if getattr(fn, "__module__", "").endswith("plans.streaming_queries")
    )


@pytest.mark.parametrize("name", _streaming_names())
def test_streaming_microbatch_plans(spark, name):
    """Every SQL execution a streaming query performs — micro-batches,
    foreachBatch inner actions, sink readout — must be free of the same
    three scale-killers the batch sweep bans."""
    import __spark_entry__ as entry

    plans = _plans_during(
        spark, lambda: entry.queries()[name](spark, SF_SMOKE).collect()
    )
    assert plans, f"{name}: no SQL executions captured"
    for eid, plan in sorted(plans.items()):
        assert "CartesianProduct" not in plan, (name, eid)
        assert "BatchEvalPython" not in plan, (name, eid)
        assert not single_partition_windows(plan), (name, eid)


def test_streaming_detector_flags_bad_foreachbatch(spark):
    """Red path: a deliberately unpartitioned window INSIDE a streaming
    run (a foreachBatch global row_number) must be caught by the
    micro-batch sweep — this is exactly the plan shape the returned
    sink read-back can never show."""
    import tempfile

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from mapreduce_server_development_spark.plans.streaming_queries import (
        read_events_stream,
    )

    def bad_batch(batch_df, _epoch):
        # Aggregate OVER the window column — a bare count() would let
        # column pruning delete the window node before it ever runs.
        batch_df.withColumn(
            "rn", F.row_number().over(Window.orderBy("event_id"))
        ).agg(F.sum("rn")).collect()

    def run():
        ckpt = tempfile.mkdtemp(prefix="bad_stream_ckpt_")
        q = (
            read_events_stream(spark, SF_SMOKE)
            .writeStream.foreachBatch(bad_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    plans = _plans_during(spark, run)
    assert any(single_partition_windows(p) for p in plans.values())


@pytest.fixture(scope="module")
def _split_events_dir(tmp_path_factory):
    """sf0.001 events split into 4 ts-ordered events-0N.parquet files
    (same shape as tests/test_streaming_extra.py's fixture) so the
    sweep can capture a genuinely MULTI-micro-batch run."""
    import os as _os
    import time as _time

    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("ap_split_events")
    t = pq.read_table("/root/testdata/sf0.001/events.parquet").sort_by("ts")
    n = t.num_rows
    cut = [0, n // 4, n // 2, 3 * n // 4, n]
    now = _time.time()
    for i in range(4):
        path = str(d / f"events-0{i}.parquet")
        pq.write_table(t.slice(cut[i], cut[i + 1] - cut[i]), path)
        _os.utime(path, (now - 40 + 10 * i,) * 2)
    return str(d)


@pytest.mark.parametrize(
    "name",
    ["q_stream_user_state", "q_stream_anomaly", "q_stream_timed_funnel"],
)
def test_multibatch_microbatch_plans(spark, _split_events_dir, monkeypatch, name):
    """The three custom stateful operators under REAL multi-batch
    arrival (maxFilesPerTrigger=1 over the split fixture): every one of
    the 4+ micro-batch executions must pass the same three detectors —
    the single-batch sweep above cannot see a state-store reload plan
    that only exists from batch 2 on."""
    import __spark_entry__ as entry

    monkeypatch.setenv("SPARK_GRAFT_STREAM_MAX_FILES_PER_TRIGGER", "1")
    plans = _plans_during(
        spark,
        lambda: entry.queries()[name](spark, _split_events_dir).collect(),
    )
    # 4 source files -> at least 4 micro-batch executions (plus the
    # sink readout); a single captured plan means the split never took.
    assert len(plans) >= 4, (name, len(plans))
    for eid, plan in sorted(plans.items()):
        assert "CartesianProduct" not in plan, (name, eid)
        assert "BatchEvalPython" not in plan, (name, eid)
        assert not single_partition_windows(plan), (name, eid)

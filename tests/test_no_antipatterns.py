"""Engine-wide anti-pattern sweep: every registered query's physical
plan is checked for the two scale-killers the 100 TB brief bans —
cartesian products (except the documented bounded-broadcast one in
cosine_topk) and row-at-a-time Python UDFs (BatchEvalPython; the
sanctioned slow paths are Arrow: ArrowEvalPython / FlatMapGroupsInPandas
/ PythonUDTF).
"""

from __future__ import annotations

import pytest

from .conftest import SF_SMOKE

#: cosine_topk: query side is bounded (<=5 vids) and broadcast — the
#: crossJoin is the documented exact-tier fan-out, not an accident.
CARTESIAN_OK = {"q_cosine_topk"}

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

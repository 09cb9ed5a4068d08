"""A/B the bench's timed action: RDD foreach vs the noop sink.

`df.foreach(lambda _: None)` converts the result to RDD[Row], pickles
every output row into Python workers, and runs outside the SQL
execution path. The optimization guide (§1.4) prescribes
`df.write.format("noop").mode("overwrite").save()` — it computes every
column of every row JVM-side and discards them, so the measurement is
the query, not the Python row boundary.

This tool times BOTH actions for the given queries (or a default
sample) on one warm session and prints per-query foreach/noop seconds,
so the bench.py methodology switch is justified by data, not taste.

Usage: python tools/action_ab.py [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

DEFAULT_SAMPLE = [
    # small-output aggregates
    "q1_pricing_summary",
    "q6_forecast_revenue",
    # large-output rows
    "q_outer_join_agg",
    "q_window_running_sum",
    # heavy compute
    "q_item_cf",
    "q_nb_crossval",
    # text / array payloads
    "q_doc_fingerprint",
    "q_bm25_topk",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]

    import __spark_entry__ as entrymod
    from mapreduce_server_development_spark.session import get_spark

    queries = entrymod.queries()
    if not names:
        names = [n for n in DEFAULT_SAMPLE if n in queries]
    spark = get_spark(app_name="action-ab")

    from mapreduce_server_development_spark.session import release_checkpoints

    # The query is CONSTRUCTED inside the timer (r11 ADVICE
    # action_ab.py:78): construction runs any eager localCheckpoint
    # jobs, so building the frame outside excluded that cost from both
    # arms and understated checkpoint-heavy queries — bench.py times
    # construction too, and this tool must measure what the bench does.
    def t_foreach(fn) -> float:
        t0 = time.time()
        fn(spark, sf_dir).foreach(lambda _: None)
        return round(time.time() - t0, 3)

    def t_noop(fn) -> float:
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    out: dict[str, dict] = {}
    for name in names:
        fn = queries[name]
        # warm once (uncounted) so JIT/codegen parity holds for both arms
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:  # noqa: BLE001
            out[name] = {"err": f"{type(e).__name__}: {e}"}
            continue
        spark.catalog.clearCache()
        release_checkpoints(spark)
        rec: dict[str, list[float]] = {"foreach": [], "noop": []}
        for _ in range(3):
            rec["foreach"].append(t_foreach(fn))
            spark.catalog.clearCache()
            release_checkpoints(spark)
            rec["noop"].append(t_noop(fn))
            spark.catalog.clearCache()
            release_checkpoints(spark)
        out[name] = {
            "foreach_med": sorted(rec["foreach"])[1],
            "noop_med": sorted(rec["noop"])[1],
            "runs": rec,
        }
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())

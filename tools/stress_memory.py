"""Constrained-memory stress for the top-5 heaviest bench queries.

SCALE.md claims every heavy shuffle is spill-safe, but all round-6
measurements ran in a 128 GiB sandbox where nothing ever spilled. This
tool re-runs the five most expensive sf0.1 queries in a JVM whose heap
is capped (SPARK_GRAFT_DRIVER_MEM, e.g. 4g — driver and executors share
the one local-mode JVM) and records completion, wall-clock, and the
aggregate spill counters from the Spark status API.

Usage: SPARK_GRAFT_DRIVER_MEM=4g python tools/stress_memory.py [sf_dir]
Appends to BENCH_AB.json under `memory_stress`.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

QUERIES = [
    "q_hits",
    "q_edit_distance_pairs",
    "q_triangle_count",
    "q_embedding_near_dups",
    "q_simhash_pairs",
]


def _spill_totals(spark) -> tuple[int, int]:
    """Sum memory/disk spill bytes across all stages via the UI REST
    API (the stable public surface for stage metrics)."""
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    if not ui:
        return 0, 0
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages") as r:
        stages = json.load(r)
    mem = sum(s.get("memoryBytesSpilled", 0) for s in stages)
    disk = sum(s.get("diskBytesSpilled", 0) for s in stages)
    return mem, disk


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    heap = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "(default 8g)")

    import __spark_entry__ as entrymod

    from mapreduce_server_development_spark.session import get_spark

    spark = get_spark(app_name="stress_memory")
    queries = entrymod.queries()

    rows = []
    for name in QUERIES:
        m0, d0 = _spill_totals(spark)
        t0 = time.time()
        err = None
        try:
            queries[name](spark, sf_dir).foreach(lambda _: None)
        except Exception as e:  # record the OOM honestly, keep going
            err = f"{type(e).__name__}: {e}"[:300]
        dt = round(time.time() - t0, 2)
        m1, d1 = _spill_totals(spark)
        row = {
            "query": name,
            "sec": dt,
            "ok": err is None,
            "err": err,
            "memory_spill_mb": round((m1 - m0) / 1e6, 1),
            "disk_spill_mb": round((d1 - d0) / 1e6, 1),
        }
        rows.append(row)
        print(row, flush=True)
        spark.catalog.clearCache()

    book_path = REPO / "BENCH_AB.json"
    book = json.loads(book_path.read_text()) if book_path.exists() else {}
    book.setdefault("memory_stress", []).append(
        {
            "heap": heap,
            "sf_dir": sf_dir,
            "results": rows,
            "label": "r7 constrained-memory completion check",
        }
    )
    book_path.write_text(json.dumps(book, indent=1) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())

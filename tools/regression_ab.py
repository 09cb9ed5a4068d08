"""Solo A/B harness for bench-regression triage.

The per-round bench sweep runs all queries in ONE session, so a
regression in its numbers can be either a real plan/code change or
session-wide contention (GC, storage memory, scheduler queueing) from
neighbouring queries. This tool re-times named queries SOLO — fresh
session per query, one untimed warmup, n timed runs, min + all runs
recorded — and appends the result to BENCH_AB.json, which bench.py
embeds into BENCH_DETAIL.json as "regression_ab".

Usage: python tools/regression_ab.py [--label note] query [query ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_CHILD = """
import sys, time
sys.path.insert(0, {repo!r})
import __spark_entry__ as entrymod
from mapreduce_server_development_spark.session import get_spark

spark = get_spark(app_name="regression_ab")
fn = entrymod.queries()[{name!r}]
fn(spark, {sf_dir!r}).foreach(lambda _: None)  # warmup (codegen + JIT)
runs = []
for _ in range({n}):
    spark.catalog.clearCache()
    t0 = time.time()
    fn(spark, {sf_dir!r}).foreach(lambda _: None)
    runs.append(round(time.time() - t0, 2))
print("RUNS_JSON:" + __import__("json").dumps(runs))
"""


def time_solo(name: str, sf_dir: str, n: int = 3) -> list[float]:
    code = _CHILD.format(repo=str(REPO), name=name, sf_dir=sf_dir, n=n)
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(REPO),
    )
    for line in out.stdout.splitlines():
        if line.startswith("RUNS_JSON:"):
            return json.loads(line[len("RUNS_JSON:") :])
    raise RuntimeError(f"{name}: no timing line\n{out.stderr[-2000:]}")


def main() -> int:
    args = sys.argv[1:]
    label = ""
    if args and args[0] == "--label":
        if len(args) < 2:
            print("usage: regression_ab.py [--label note] query [query ...]")
            return 2
        label = args[1]
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    path = REPO / "BENCH_AB.json"
    book = json.loads(path.read_text()) if path.exists() else {}
    for name in args:
        runs = time_solo(name, sf_dir)
        entry = {
            "solo_runs_sec": runs,
            "solo_min_sec": min(runs),
            "sf_dir": sf_dir,
            "label": label,
            "at": time.strftime("%Y-%m-%d %H:%M:%S"),
        }
        book.setdefault(name, []).append(entry)
        print(f"{name}: min {min(runs)}s runs {runs}")
    path.write_text(json.dumps(book, indent=1) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())

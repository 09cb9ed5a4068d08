"""A/B the session warm-up hook (round-9 verdict ask #5).

Runs, in two FRESH subprocesses (fresh JVM each, the only honest way
to measure first-query cost), the text-dedup family's heaviest cold
chain — q_doc_fingerprint then q_stream_minhash_dedup at sf0.1 —
once without and once with ``session.warmup_expressions``. Records
cold first-query latency, the hook's own cost, and the warm steady
state to BENCH_AB.json under "warmup_hook_ab".

Usage: python tools/warmup_ab.py
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
import __spark_entry__ as entrymod
from mapreduce_server_development_spark.session import (
    get_spark, warmup_expressions,
)

spark = get_spark(app_name="warmup_ab")
queries = entrymod.queries()
out = {{"warmup_sec": None, "runs": {{}}}}
if {warm!r} == "yes":
    t0 = time.time()
    warmup_expressions(spark)
    out["warmup_sec"] = round(time.time() - t0, 2)
for name in ("q_doc_fingerprint", "q_stream_minhash_dedup"):
    ts = []
    for _ in range(2):
        t0 = time.time()
        queries[name](spark, "/root/testdata/sf0.1").foreach(lambda _: None)
        ts.append(round(time.time() - t0, 2))
        spark.catalog.clearCache()
    out["runs"][name] = ts
print("RESULT " + json.dumps(out))
"""


def run_child(warm: str) -> dict:
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD.format(repo=str(REPO), warm=warm)],
        capture_output=True,
        text=True,
        timeout=900,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"child produced no RESULT (rc={proc.returncode}):\n"
        f"{proc.stderr[-2000:]}"
    )


def main() -> int:
    cold = run_child("no")
    print(f"without hook: {json.dumps(cold)}", flush=True)
    warm = run_child("yes")
    print(f"with hook:    {json.dumps(warm)}", flush=True)

    book_path = REPO / "BENCH_AB.json"
    book = json.loads(book_path.read_text()) if book_path.exists() else {}
    book["warmup_hook_ab"] = {
        "what": ("r9 verdict ask #5: session.warmup_expressions as a "
                 "product startup hook (daemon --warmup / "
                 "SPARK_GRAFT_WARMUP=1) vs a bare fresh session; two "
                 "fresh subprocesses, first+second run of the text-dedup "
                 "family's cold chain at sf0.1"),
        "without_hook": cold,
        "with_hook": warm,
        "sf": 0.1,
    }
    book_path.write_text(json.dumps(book, indent=1, sort_keys=True) + "\n")
    print("written to BENCH_AB.json warmup_hook_ab")
    return 0


if __name__ == "__main__":
    sys.exit(main())

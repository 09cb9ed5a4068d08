"""Fixed-overhead A/B: time queries under candidate Spark configs and
count the jobs/stages/tasks each query schedules.

Motivation (r11 verdict "Next round" #2): the 390-query sf0.1 sweep ran
24% FASTER on 8 cores than on 32 (493.23s vs 646.12s) — at fixture
scale every query is fixed-overhead-bound (AQE job scheduling,
per-exchange setup, checkpoint job boundaries), and 32-way local
scheduling costs more than it buys. This tool measures exactly that
surface: for each named config variant it spawns a FRESH session
(configs are immutable per JVM), runs each query once untimed (codegen
warmup) then N timed noop-sink runs, and records per query the median
seconds plus the number of Spark jobs, stages and tasks the run
scheduled (StatusTracker over a per-run job group).

The point is to find SCALE-ADAPTIVE settings (AQE coalescing targets,
scan split sizes) that cut tiny-stage task counts at sf0.1 without
hard-coding the local core count — a config that only makes sense on
local[32] does not count (the driver also benches at 8 cores).

Usage:
    python tools/overhead_ab.py [--runs N] [--cpus C] \
        [--variant NAME] query [query ...]

Variants live in VARIANTS below; default runs all of them. Results are
appended to BENCH_AB.json under "overhead_ab".
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

#: Candidate config sets. "base" is the shipped session.py config.
VARIANTS: dict[str, dict[str, str]] = {
    "base": {},
    # Guide §2.2: let AQE size post-shuffle partitions by bytes, not by
    # core count — at sf0.1 tiny stages coalesce to 1-2 tasks; at 100 TB
    # the same setting yields many advisory-sized tasks. Scale-adaptive
    # by construction.
    "advisory64m": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
    },
    "advisory16m": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m",
    },
    # §6: bigger scan splits -> fewer map tasks feeding every shuffle.
    "advisory64m_split512m": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
        "spark.sql.files.maxPartitionBytes": "512m",
    },
    # Opposite direction: tiny compressed shuffles coalesce to ONE task
    # under the default 1m minPartitionSize, serializing compute-dense
    # aggregates (q_simhash_pairs: 27 stages / 27 tasks at 32 cores).
    # A smaller floor keeps such stages parallel at fixture scale while
    # being a no-op at cluster scale (partitions are far above it).
    "minpart256k": {
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "256k",
    },
    "minpart64k": {
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k",
    },
    "minpart1m": {
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1m",
    },
    "minpart512k": {
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "512k",
    },
}

_CHILD = """
import json, sys, time
sys.path.insert(0, {repo!r})
import __spark_entry__ as entrymod
from mapreduce_server_development_spark.session import (
    get_spark, release_checkpoints,
)

confs = json.loads({confs_json!r})
names = json.loads({names_json!r})
sf_dir = {sf_dir!r}

from pyspark.sql import SparkSession
builder = None
spark = get_spark(app_name="overhead_ab")
for k, v in confs.items():
    # configs must be set before session build: rebuild via stop+new
    pass
if confs:
    spark.stop()
    b = SparkSession.builder.appName("overhead_ab")
    # replicate session.py defaults then apply the variant on top
    import mapreduce_server_development_spark.session as sess
    cores = sess._default_parallelism()
    b = (b.master(f"local[{{cores}}]")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.shuffle.partitions", str(max(cores, 8)))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
         .config("spark.sql.adaptive.skewJoin.enabled", "true")
         .config("spark.sql.legacy.parquet.nanosAsLong", "true")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.sql.autoBroadcastJoinThreshold", str(32*1024*1024))
         .config("spark.driver.maxResultSize", "2g")
         .config("spark.driver.memory", "8g")
         .config("spark.ui.enabled", "false"))
    for k, v in confs.items():
        b = b.config(k, v)
    spark = b.getOrCreate()

qs = entrymod.queries()
sc = spark.sparkContext
st = sc.statusTracker()
out = {{}}
for name in names:
    fn = qs[name]
    try:
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    except Exception as e:
        out[name] = {{"error": f"{{type(e).__name__}}: {{e}}"}}
        continue
    spark.catalog.clearCache(); release_checkpoints(spark)
    times, jobs, stages, tasks = [], [], [], []
    for r in range({runs}):
        group = f"{{name}}#{{r}}"
        sc.setJobGroup(group, group)
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times.append(round(time.time() - t0, 2))
        sc.setJobGroup(None, None)
        jids = st.getJobIdsForGroup(group)
        jobs.append(len(jids))
        ns, nt = 0, 0
        for j in jids:
            ji = st.getJobInfo(j)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = st.getStageInfo(sid)
                if si is not None:
                    ns += 1
                    nt += si.numTasks
        stages.append(ns)
        tasks.append(nt)
        spark.catalog.clearCache(); release_checkpoints(spark)
    times_sorted = sorted(times)
    med = times_sorted[len(times_sorted) // 2]
    out[name] = {{"median": med, "runs": times, "jobs": jobs[-1],
                  "stages": stages[-1], "tasks": tasks[-1]}}
print("AB_JSON:" + json.dumps(out))
"""


def run_variant(
    variant: str, names: list[str], sf_dir: str, runs: int, cpus: int
) -> dict:
    code = _CHILD.format(
        repo=str(REPO),
        confs_json=json.dumps(VARIANTS[variant]),
        names_json=json.dumps(names),
        sf_dir=sf_dir,
        runs=runs,
    )
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=3600,
        cwd=str(REPO),
        env=env,
    )
    for line in out.stdout.splitlines():
        if line.startswith("AB_JSON:"):
            return json.loads(line[len("AB_JSON:"):])
    raise RuntimeError(f"{variant}: no AB line\n{out.stderr[-3000:]}")


def main() -> int:
    args = sys.argv[1:]
    runs, cpus = 3, int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    variants = list(VARIANTS)
    while args and args[0].startswith("--"):
        flag = args.pop(0)
        if flag == "--runs":
            runs = int(args.pop(0))
        elif flag == "--cpus":
            cpus = int(args.pop(0))
        elif flag == "--variant":
            variants = [args.pop(0)]
        else:
            print(f"unknown flag {flag}")
            return 2
    if not args:
        print("usage: overhead_ab.py [--runs N] [--cpus C] "
              "[--variant NAME] query ...")
        return 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    results: dict[str, dict] = {}
    for v in variants:
        results[v] = run_variant(v, args, sf_dir, runs, cpus)
        print(f"--- {v} (cpus={cpus})")
        for n, rec in results[v].items():
            if "error" in rec:
                print(f"  {n}: ERROR {rec['error']}")
            else:
                print(f"  {n}: median {rec['median']}s runs {rec['runs']} "
                      f"jobs {rec['jobs']} stages {rec['stages']} "
                      f"tasks {rec['tasks']}")
    path = REPO / "BENCH_AB.json"
    book = json.loads(path.read_text()) if path.exists() else {}
    book.setdefault("overhead_ab", []).append(
        {
            "queries": args,
            "cpus": cpus,
            "runs": runs,
            "results": results,
            "at": time.strftime("%Y-%m-%d %H:%M:%S"),
        }
    )
    path.write_text(json.dumps(book, indent=1) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())

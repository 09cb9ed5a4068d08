"""RocksDB state-store A/B for the streaming ingest family (r10
verdict ask #6).

The 100 TB posture docs claim "RocksDB-backed at scale"; this tool
actually runs the ingest queries under BOTH providers at x10 state
volume and records wall-clock, state rows, and state memory/disk from
the StreamingQueryListener progress events:

- q_stream_minhash_dedup — applyInPandasWithState (Python state, the
  family's heaviest stateful op; 2048-shard LSH index state);
- q_stream_sliding_counts — JVM windowed-agg state (the built-in
  stateStore path RocksDB actually swaps);
- q_stream_ivf_assign — STATELESS foreachBatch (included per the ask;
  its row documents that the provider is a no-op for it).

Each arm runs in a fresh subprocess because the provider class is a
session-builder conf (SPARK_GRAFT_STATE_STORE env gate in
session.state_store_confs). The parent asserts OUTPUT EQUALITY
(row-set md5) across arms — the provider must never change results —
and writes the table to BENCH_AB.json under "rocksdb_state_store_ab".

Usage: python tools/rocksdb_ab.py            # parent: builds x10, runs both arms
       python tools/rocksdb_ab.py --child <sf_dir> <query ...>
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

QUERIES_AB = [
    "q_stream_minhash_dedup",
    "q_stream_sliding_counts",
    "q_stream_ivf_assign",
]
FIXTURE = "/tmp/rocksdb_ab_x10"
REPLICAS = 10


def _child(sf_dir: str, names: list[str]) -> int:
    import __spark_entry__ as entrymod
    from pyspark.sql.streaming import StreamingQueryListener

    from mapreduce_server_development_spark.session import get_spark

    spark = get_spark(app_name="rocksdb_ab_child")

    progresses: list = []

    class _L(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            progresses.append(json.loads(event.progress.json))

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    spark.streams.addListener(_L())
    queries = entrymod.queries()
    out = {}
    for name in names:
        walls = []
        h = ""
        n_rows = 0
        state_rows = 0
        state_mem = 0
        custom: dict = {}
        # two runs per query: the first carries session/JIT cold cost,
        # the second is the steady-state figure
        for _ in range(2):
            mark = len(progresses)
            t0 = time.time()
            rows_ = queries[name](spark, sf_dir).collect()
            walls.append(round(time.time() - t0, 2))
            n_rows = len(rows_)
            canon = sorted(
                "|".join(f"{k}={r[k]!r}" for k in sorted(r.asDict()))
                for r in rows_
            )
            h = hashlib.md5("\n".join(canon).encode()).hexdigest()
            for p in progresses[mark:]:
                ops = p.get("stateOperators") or []
                state_rows = max(state_rows, sum(
                    o.get("numRowsTotal", 0) for o in ops))
                state_mem = max(state_mem, sum(
                    o.get("memoryUsedBytes", 0) for o in ops))
                for o in ops:
                    for k, v in (o.get("customMetrics") or {}).items():
                        if "SstFilesSize" in k or "TotalMemory" in k:
                            custom[k] = max(custom.get(k, 0), v)
        out[name] = {
            "wall_sec": walls,
            "n_rows": n_rows,
            "hash": h,
            "state_rows": state_rows,
            "state_mem_bytes": state_mem,
            **({"rocksdb": custom} if custom else {}),
        }
        print(f"child {name}: {out[name]}", file=sys.stderr, flush=True)
    print("CHILD_JSON:" + json.dumps(out), flush=True)
    return 0


def _build_fixture() -> None:
    from pyspark.sql import functions as F

    from mapreduce_server_development_spark.session import get_spark
    from mapreduce_server_development_spark.sources.tables import load_table

    spark = get_spark(app_name="rocksdb_ab_fixture")
    base = "/root/testdata/sf0.1"
    docs = load_table(spark, base, "documents")
    emb = load_table(spark, base, "embeddings")
    n_docs, n_emb = docs.count(), emb.count()
    rep = F.broadcast(
        spark.range(REPLICAS).select(F.col("id").cast("long").alias("rep"))
    )
    prefixed = F.array_join(
        F.transform(
            F.split(F.col("text"), " "),
            lambda t: F.concat(
                F.lit("r"), F.col("rep").cast("string"), F.lit("_"), t
            ),
        ),
        " ",
    )
    docs.crossJoin(rep).select(
        (F.col("doc_id") + F.col("rep") * n_docs).alias("doc_id"),
        prefixed.alias("text"),
        "lang",
        "source",
        "n_chars",
    ).write.mode("overwrite").parquet(f"{FIXTURE}/documents.parquet")
    ddir = f"{FIXTURE}/documents.parquet"
    parts = sorted(f for f in os.listdir(ddir) if f.endswith(".parquet"))
    for i, f in enumerate(parts):
        os.rename(f"{ddir}/{f}", f"{ddir}/documents-{i:03d}.parquet")
    emb.crossJoin(rep).select(
        (F.col("vec_id") + F.col("rep") * n_emb).alias("vec_id"),
        "embedding",
        "label",
    ).write.mode("overwrite").parquet(f"{FIXTURE}/embeddings.parquet")
    edir = f"{FIXTURE}/embeddings.parquet"
    parts = sorted(f for f in os.listdir(edir) if f.endswith(".parquet"))
    for i, f in enumerate(parts):
        os.rename(f"{edir}/{f}", f"{edir}/embeddings-{i:03d}.parquet")
    # events: replicate at the pyarrow level so the INT64
    # TIMESTAMP(NANOS) ts column survives byte-identical (a Spark
    # round-trip would rewrite it as MICROS and break the stream
    # schema); offset event/user ids so per-key state grows with R
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(f"{base}/events.parquet")
    n_ev = t.num_rows
    reps = []
    for r in range(REPLICAS):
        t2 = t.set_column(
            t.schema.get_field_index("event_id"), "event_id",
            pc.add(t["event_id"], r * n_ev))
        t2 = t2.set_column(
            t2.schema.get_field_index("user_id"), "user_id",
            pc.add(t2["user_id"], r * 1_000_000))
        reps.append(t2)
    vdir = f"{FIXTURE}/events.parquet"
    os.makedirs(vdir, exist_ok=True)
    pq.write_table(pa.concat_tables(reps), f"{vdir}/events-000.parquet")
    spark.stop()


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        return _child(sys.argv[2], sys.argv[3:])

    _build_fixture()
    results: dict = {}
    for arm, env_val in [("default_hdfs", ""), ("rocksdb", "rocksdb")]:
        env = dict(os.environ)
        if env_val:
            env["SPARK_GRAFT_STATE_STORE"] = env_val
        else:
            env.pop("SPARK_GRAFT_STATE_STORE", None)
        proc = subprocess.run(
            [sys.executable, __file__, "--child", FIXTURE] + QUERIES_AB,
            env=env, capture_output=True, text=True, timeout=3600,
        )
        line = [ln for ln in proc.stdout.splitlines()
                if ln.startswith("CHILD_JSON:")]
        if not line:
            print(proc.stdout[-2000:], file=sys.stderr)
            print(proc.stderr[-4000:], file=sys.stderr)
            raise SystemExit(f"arm {arm}: no child output")
        results[arm] = json.loads(line[0][len("CHILD_JSON:"):])
        print(f"arm {arm}: " + json.dumps(results[arm]), flush=True)

    # provider must never change results
    mismatches = [
        q for q in QUERIES_AB
        if results["default_hdfs"][q]["hash"] != results["rocksdb"][q]["hash"]
    ]
    book_path = REPO / "BENCH_AB.json"
    book = json.loads(book_path.read_text()) if book_path.exists() else {}
    book["rocksdb_state_store_ab"] = {
        "fixture": f"sf0.1 x {REPLICAS} (replica-prefixed doc vocab, "
                   "offset vec ids)",
        "what": "r10 verdict ask #6: both state-store providers at x10 "
                "state volume; output-hash equality asserted per query "
                "(q_stream_ivf_assign is stateless foreachBatch — "
                "provider is a no-op for it by design)",
        "output_hash_mismatches": mismatches,
        "results": results,
    }
    book_path.write_text(json.dumps(book, indent=1, sort_keys=True))
    print("written BENCH_AB.json rocksdb_state_store_ab")
    if mismatches:
        raise SystemExit(f"OUTPUT MISMATCH across providers: {mismatches}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

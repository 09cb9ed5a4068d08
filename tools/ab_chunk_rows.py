"""Chunk-size A/B for chunked_trailing_window (q_value_anomaly).

Replicates the sf0.1 events table R times (same replication scheme as
stress_rank_queries.py) and times q_value_anomaly at each candidate
SPARK_GRAFT_ANOMALY_CHUNK_ROWS, n runs each. Appends the result to
BENCH_AB.json under `value_anomaly_chunk_ab`.

Usage: python tools/ab_chunk_rows.py [R] [chunk ...]   # default 10, 1000 4000 16000
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    chunks = [int(a) for a in sys.argv[2:]] or [1000, 4000, 16000]

    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    from mapreduce_server_development_spark.session import get_spark
    from mapreduce_server_development_spark.sources.tables import load_table

    spark = get_spark(app_name="ab_chunk")
    out_dir = f"/tmp/stress_events_x{r}"
    if not Path(f"{out_dir}/events.parquet").exists():
        ev = load_table(spark, "/root/testdata/sf0.1", "events")
        rep = ev.crossJoin(
            F.broadcast(
                spark.range(r).select(F.col("id").cast("int").alias("rep"))
            )
        ).select(
            (F.col("event_id") + F.col("rep").cast("long") * 1000000000).alias(
                "event_id"
            ),
            (
                F.col("ts")
                + F.make_interval(secs=F.col("rep").cast("double") * 0.123)
            ).alias("ts"),
            (F.col("user_id") + F.col("rep").cast("long") * 10000000).alias(
                "user_id"
            ),
            "event_type",
            "value",
            "props",
        )
        rep.write.mode("overwrite").parquet(f"{out_dir}/events.parquet")
    n = spark.read.parquet(f"{out_dir}/events.parquet").count()
    print(f"x{r}: {n} rows", flush=True)

    q = entrymod.queries()["q_value_anomaly"]
    results = []
    for c in chunks:
        os.environ["SPARK_GRAFT_ANOMALY_CHUNK_ROWS"] = str(c)
        runs = []
        for _ in range(3):
            t0 = time.time()
            q(spark, out_dir).foreach(lambda _: None)
            runs.append(round(time.time() - t0, 2))
            spark.catalog.clearCache()
        print(f"chunk_rows={c}: {runs}", flush=True)
        results.append({"chunk_rows": c, "runs_sec": runs, "min_sec": min(runs)})
    os.environ.pop("SPARK_GRAFT_ANOMALY_CHUNK_ROWS", None)

    book_path = REPO / "BENCH_AB.json"
    book = json.loads(book_path.read_text()) if book_path.exists() else {}
    book.setdefault("value_anomaly_chunk_ab", []).append(
        {
            "scale_x": r,
            "rows": n,
            "results": results,
            "label": "r7 chunk-size A/B for chunked_trailing_window",
        }
    )
    book_path.write_text(json.dumps(book, indent=1) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())

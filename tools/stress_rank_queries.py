"""10x/100x scale stress for the distributed rank/ECDF query family.

Builds a synthetic events corpus by replicating the sf0.1 events table
R times (ids/users offset per replica, timestamps jittered by replica
index so the global (type, ts, event_id) order interleaves), then
times the queries whose engine is functions/prefix.py — the claim
under test is that the two-phase distributed row_number keeps these
LINEAR in rows, unlike the single-task global windows they replaced.

Usage: python tools/stress_rank_queries.py [R ...]   # default 10
Writes one line per (R, query) and appends a summary to BENCH_AB.json.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

QUERIES = [
    "q_rfm_segments",
    "q_value_anomaly",
    "q_group_percentiles",
    "q_mad_outliers",
    "q_conversion_lag",
    # session-3 window re-plan (two-phase global scans + struct-MAX)
    "q_changepoint",
]


def main() -> int:
    reps = [int(a) for a in sys.argv[1:]] or [10]

    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    from mapreduce_server_development_spark.session import get_spark
    from mapreduce_server_development_spark.sources.tables import load_table

    spark = get_spark(app_name="stress_rank")
    queries = entrymod.queries()
    book_path = REPO / "BENCH_AB.json"
    book = json.loads(book_path.read_text()) if book_path.exists() else {}

    for r in reps:
        out_dir = f"/tmp/stress_events_x{r}"
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
        for name in QUERIES:
            t0 = time.time()
            queries[name](spark, out_dir).foreach(lambda _: None)
            dt = round(time.time() - t0, 2)
            print(f"x{r} {name}: {dt}s", flush=True)
            book.setdefault("stress_rank_family", []).append(
                {"scale_x": r, "rows": n, "query": name, "sec": dt}
            )
            spark.catalog.clearCache()

    book_path.write_text(json.dumps(book, indent=1) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Scale stress for the round-9 wave: span dedup/decontamination,
the NB learning curve, Wasserstein drift, and l-diversity.

Replication follows the established disjoint-key discipline:
- documents: per-replica token-prefixed vocabulary (replicas share no
  grams — no manufactured cross-replica spans), offset doc ids;
- orders/lineitem/customer: offset key spaces per replica.

Claims under test (expected ~linear):
- q_exact_substring_spans / q_dedup_span_removal /
  q_decontaminate_spans / q_stream_decontaminate_spans — gram relation
  token-linear, pair relation cap^2-bounded per duplicated gram;
- q_nb_learning_curve — one (decile, class, token) aggregate + the
  5-fraction cumulative join (vocab-scale);
- q_wasserstein_distance — support-relation aggregate + two-phase
  prefix scans;
- q_l_diversity — one equi-join + class-keyed distinct count.

Usage: python tools/stress_r9.py [R ...]   # default 3 10
Appends results to BENCH_AB.json under "stress_r9_wave".
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

QUERIES = [
    "q_exact_substring_spans",
    "q_dedup_span_removal",
    "q_decontaminate_spans",
    "q_stream_decontaminate_spans",
    "q_nb_learning_curve",
    "q_wasserstein_distance",
    "q_l_diversity",
]


def main() -> int:
    reps = [int(a) for a in sys.argv[1:]] or [3, 10]

    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    from mapreduce_server_development_spark.session import get_spark
    from mapreduce_server_development_spark.sources.tables import load_table

    spark = get_spark(app_name="stress_r9")
    queries = entrymod.queries()
    book_path = REPO / "BENCH_AB.json"
    book = json.loads(book_path.read_text()) if book_path.exists() else {}
    results: dict[str, dict[str, float]] = {}

    base = "/root/testdata/sf0.1"
    orders = load_table(spark, base, "orders")
    li = load_table(spark, base, "lineitem")
    cust = load_table(spark, base, "customer")
    docs = load_table(spark, base, "documents")
    ok_off = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    ck_off = cust.agg(F.max("c_custkey")).collect()[0][0] + 1
    pk_off = li.agg(F.max("l_partkey")).collect()[0][0] + 1
    n_docs = docs.count()

    # x1 warm reference (after one throwaway warm-up run per query)
    results["x1"] = {}
    for name in QUERIES:
        queries[name](spark, base).count()
        t0 = time.time()
        queries[name](spark, base).count()
        results["x1"][name] = round(time.time() - t0, 2)
        print(f"x1 {name}: {results['x1'][name]}s", flush=True)

    for r in reps:
        out_dir = f"/tmp/stress_r9_x{r}"
        rep = F.broadcast(
            spark.range(r).select(F.col("id").cast("long").alias("rep"))
        )
        orders.crossJoin(rep).select(
            (F.col("o_orderkey") + F.col("rep") * ok_off).alias("o_orderkey"),
            (F.col("o_custkey") + F.col("rep") * ck_off).alias("o_custkey"),
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        ).write.mode("overwrite").parquet(f"{out_dir}/orders.parquet")
        li.crossJoin(rep).select(
            (F.col("l_orderkey") + F.col("rep") * ok_off).alias("l_orderkey"),
            (F.col("l_partkey") + F.col("rep") * pk_off).alias("l_partkey"),
            "l_suppkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_returnflag",
            "l_linestatus",
            "l_shipdate",
        ).write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet")
        cust.crossJoin(rep).select(
            (F.col("c_custkey") + F.col("rep") * ck_off).alias("c_custkey"),
            "c_name",
            "c_nationkey",
            "c_mktsegment",
            "c_acctbal",
        ).write.mode("overwrite").parquet(f"{out_dir}/customer.parquet")
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
        ).write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
        # the docs STREAM reader lists leaf files matching
        # documents*.parquet — rename Spark's part-files to match
        import os as _os

        ddir = f"{out_dir}/documents.parquet"
        parts = sorted(
            f for f in _os.listdir(ddir) if f.endswith(".parquet")
        )
        for i, f in enumerate(parts):
            _os.rename(f"{ddir}/{f}", f"{ddir}/documents-{i:03d}.parquet")

        key = f"x{r}"
        results[key] = {}
        for name in QUERIES:
            t0 = time.time()
            n = queries[name](spark, out_dir).count()
            dt = round(time.time() - t0, 2)
            results[key][name] = dt
            print(f"x{r} {name}: {dt}s ({n} rows)", flush=True)

    book["stress_r9_wave"] = {
        "base": "sf0.1 x R, disjoint key spaces per replica "
                "(order/part/customer offsets; replica-prefixed doc vocab); "
                "x1 is a warm same-session reference",
        "results": results,
    }
    book_path.write_text(json.dumps(book, indent=1, sort_keys=True))
    print("written BENCH_AB.json stress_r9_wave")
    return 0


if __name__ == "__main__":
    sys.exit(main())

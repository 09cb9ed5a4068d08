"""Round-10 scale stress for the round-10 wave: the cleaned-corpus
transform, incremental span dedup, the copy matrix, the span-length
histogram, and the residual IVF-PQ audit.

Replication follows the established disjoint-key discipline:
- documents: per-replica token-prefixed vocabulary (replicas share no
  grams — no manufactured cross-replica spans), offset doc ids;
- orders/lineitem/customer: offset key spaces per replica (unused by
  this wave but kept so the fixture directory is complete).

Claims under test (expected ~linear):
- q_dedup_apply — audit-shaped span pipeline + per-doc HOF excision
  (token-linear) + per-source digest rollup;
- q_exact_substring_incremental — pair volume |new grams| x cap,
  never corpus^2;
- q_span_copy_matrix / q_dup_span_length_hist — the audit's span
  relation + bounded rollups;
- q_ivfpq_ann — n x M x 256 codeword assignment (map-side min_by),
  broadcast codebooks/LUTs, cell-bounded candidates. The embeddings
  table replicates with offset vids (vectors repeat — the cells and
  codebooks stay the same shape, candidates replicate linearly).

Usage: python tools/stress_r10.py [R ...]   # default 3 10
Appends results to BENCH_AB.json under "stress_r10_wave".
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

QUERIES = [
    "q_dedup_apply",
    "q_exact_substring_incremental",
    "q_span_copy_matrix",
    "q_dup_span_length_hist",
    "q_ivfpq_ann",
]


def main() -> int:
    reps = [int(a) for a in sys.argv[1:]] or [3, 10]

    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    from mapreduce_server_development_spark.session import get_spark
    from mapreduce_server_development_spark.sources.tables import load_table

    spark = get_spark(app_name="stress_r10")
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
        out_dir = f"/tmp/stress_r10_x{r}"
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

        emb = load_table(spark, base, "embeddings")
        n_emb = emb.count()
        emb.crossJoin(rep).select(
            (F.col("vec_id") + F.col("rep") * n_emb).alias("vec_id"),
            "embedding",
            "label",
        ).write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")

        key = f"x{r}"
        results[key] = {}
        for name in QUERIES:
            t0 = time.time()
            n = queries[name](spark, out_dir).count()
            dt = round(time.time() - t0, 2)
            results[key][name] = dt
            print(f"x{r} {name}: {dt}s ({n} rows)", flush=True)

    book["stress_r10_wave"] = {
        "base": "sf0.1 x R, disjoint key spaces per replica "
                "(order/part/customer offsets; replica-prefixed doc vocab); "
                "x1 is a warm same-session reference",
        "results": results,
    }
    book_path.write_text(json.dumps(book, indent=1, sort_keys=True))
    print("written BENCH_AB.json stress_r10_wave")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Scale stress for the round-8 session-5 robust-eval wave.

Replicates the sf0.1 tables R times with DISJOINT key spaces per
replica: order/part/customer keys get per-replica offsets (so baskets,
ratings, and the co-purchase graph replicate as disjoint components —
linear growth, no manufactured cross-replica structure), and document
tokens are replica-prefixed (the stress_retrieval convention: replicas
share no vocabulary, so LM count tables and CV models grow linearly).

Claims under test:
- q_kneser_ney / q_nb_crossval — token-linear count tables + token-key
  scoring joins;
- q_als_rank1 / q_betweenness — rating/edge relations linear in rows
  under disjoint key spaces (the factor/frontier joins are key-
  partitioned);
- q_adaboost_stumps — fan-out x 54 candidates is row-linear, partial-
  aggregated to <= 54*2^t cells;
- q_fisher_exact — the support enumeration grows with the smaller
  margin (row-linear), as a distributed strided range;
- q_hbos_outliers / q_permutation_test / q_ransac_trend — one-pass
  scans (+ calendar-bounded tails).

Usage: python tools/stress_robust_eval.py [R ...]   # default 3 10
Appends a summary to BENCH_AB.json under "stress_robust_eval".
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

QUERIES = [
    "q_hbos_outliers",
    "q_permutation_test",
    "q_fisher_exact",
    "q_ransac_trend",
    "q_adaboost_stumps",
    "q_kneser_ney",
    "q_nb_crossval",
    "q_als_rank1",
    "q_betweenness",
]


def main() -> int:
    reps = [int(a) for a in sys.argv[1:]] or [3, 10]

    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    from mapreduce_server_development_spark.session import get_spark
    from mapreduce_server_development_spark.sources.tables import load_table

    spark = get_spark(app_name="stress_robust_eval")
    queries = entrymod.queries()
    book_path = REPO / "BENCH_AB.json"
    book = json.loads(book_path.read_text()) if book_path.exists() else {}
    results: dict[str, dict[str, float]] = {}

    base = "/root/testdata/sf0.1"
    orders = load_table(spark, base, "orders")
    li = load_table(spark, base, "lineitem")
    docs = load_table(spark, base, "documents")
    ok_off = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    ck_off = orders.agg(F.max("o_custkey")).collect()[0][0] + 1
    pk_off = li.agg(F.max("l_partkey")).collect()[0][0] + 1
    n_docs = docs.count()

    for r in reps:
        out_dir = f"/tmp/stress_robust_eval_x{r}"
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

        key = f"x{r}"
        results[key] = {}
        for name in QUERIES:
            t0 = time.time()
            n = queries[name](spark, out_dir).count()
            dt = round(time.time() - t0, 2)
            results[key][name] = dt
            print(f"x{r} {name}: {dt}s ({n} rows)", flush=True)

    book["stress_robust_eval"] = {
        "base": "sf0.1 x R, disjoint key spaces per replica (order/part/"
                "customer offsets; replica-prefixed doc vocab)",
        "results": results,
    }
    book_path.write_text(json.dumps(book, indent=2, sort_keys=True))
    print("written BENCH_AB.json stress_robust_eval")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Round-11 scale stress: the commutative-digest cleaned-corpus
transform, the multi-probe IVF-PQ curve, and the MATERIALIZED-INDEX
incremental ExactSubstr twin.

Two fixtures per replication factor R:

- FULL replication (the stress_r10 discipline: disjoint key spaces,
  replica-prefixed doc vocabulary) — q_dedup_apply and
  q_ivfpq_nprobe_curve are expected ~linear;
- FIXED-ARRIVAL replication: replica 0 is copied verbatim; replicas
  1..R-1 keep ONLY their settled docs (the md5 'incr' bucket < 800),
  so the settled corpus grows ~R x while the arrival batch stays
  constant. Claim under test (r10 verdict ask #5): with the settled
  gram index materialized, the arrival-batch query cost is
  independent of settled-corpus size beyond the index scan — the
  recompute twin must instead re-tokenize the whole corpus and grow
  with R.

Usage: python tools/stress_r11.py [R ...]   # default 3 10
Appends results to BENCH_AB.json under "stress_r11_wave".
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

FULL_QUERIES = ["q_dedup_apply", "q_ivfpq_nprobe_curve"]
ARR_QUERIES = [
    "q_exact_substring_incremental",
    "q_exact_substring_incremental_indexed",
]


def main() -> int:
    reps = [int(a) for a in sys.argv[1:]] or [3, 10]

    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    from mapreduce_server_development_spark.plans.sampling import hash_bucket
    from mapreduce_server_development_spark.plans.text_ngram import (
        build_xs_gram_index,
        xs_gram_index_path,
    )
    from mapreduce_server_development_spark.session import get_spark
    from mapreduce_server_development_spark.sources.tables import load_table

    spark = get_spark(app_name="stress_r11")
    queries = entrymod.queries()
    book_path = REPO / "BENCH_AB.json"
    book = json.loads(book_path.read_text()) if book_path.exists() else {}
    results: dict[str, dict] = {}

    base = "/root/testdata/sf0.1"
    docs = load_table(spark, base, "documents")
    emb = load_table(spark, base, "embeddings")
    n_docs = docs.count()
    n_emb = emb.count()

    def write_docs(df, out_dir: str) -> None:
        df.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")

    def timed(name: str, sf_dir: str) -> float:
        t0 = time.time()
        queries[name](spark, sf_dir).count()
        return round(time.time() - t0, 2)

    # x1 warm reference (one throwaway warm-up run per query)
    results["x1"] = {}
    for name in FULL_QUERIES + ARR_QUERIES:
        if name.endswith("_indexed"):
            shutil.rmtree(xs_gram_index_path(base), ignore_errors=True)
            t0 = time.time()
            build_xs_gram_index(spark, base)
            results["x1"]["index_build"] = round(time.time() - t0, 2)
        queries[name](spark, base).count()
        results["x1"][name] = timed(name, base)
        print(f"x1 {name}: {results['x1'][name]}s", flush=True)

    for r in reps:
        rep = F.broadcast(
            spark.range(r).select(F.col("id").cast("long").alias("rep"))
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
        rep_docs = docs.crossJoin(rep).select(
            (F.col("doc_id") + F.col("rep") * n_docs).alias("doc_id"),
            prefixed.alias("text"),
            "lang",
            "source",
            "n_chars",
        )

        # --- FULL fixture: everything replicates ---
        full_dir = f"/tmp/stress_r11_full_x{r}"
        write_docs(rep_docs, full_dir)
        emb.crossJoin(rep).select(
            (F.col("vec_id") + F.col("rep") * n_emb).alias("vec_id"),
            "embedding",
            "label",
        ).write.mode("overwrite").parquet(f"{full_dir}/embeddings.parquet")
        key = f"x{r}"
        results[key] = {}
        for name in FULL_QUERIES:
            results[key][name] = timed(name, full_dir)
            print(f"x{r} {name}: {results[key][name]}s", flush=True)

        # --- FIXED-ARRIVAL fixture: replicas >= 1 keep settled only ---
        arr_dir = f"/tmp/stress_r11_arr_x{r}"
        settled_only = rep_docs.filter(
            (F.col("doc_id") < n_docs)
            | (hash_bucket("incr", F.col("doc_id")) < 800)
        )
        write_docs(settled_only, arr_dir)
        shutil.rmtree(xs_gram_index_path(arr_dir), ignore_errors=True)
        t0 = time.time()
        build_xs_gram_index(spark, arr_dir)
        results[key]["index_build"] = round(time.time() - t0, 2)
        for name in ARR_QUERIES:
            results[key][name] = timed(name, arr_dir)
            print(
                f"x{r} {name} (fixed arrival): {results[key][name]}s",
                flush=True,
            )
        print(f"x{r} index_build: {results[key]['index_build']}s", flush=True)

    book["stress_r11_wave"] = {
        "base": "sf0.1 x R; FULL fixture replicates everything "
                "(disjoint keys, replica-prefixed vocab); FIXED-ARRIVAL "
                "fixture keeps only settled docs in replicas >= 1, so "
                "the arrival batch is constant while the settled corpus "
                "grows ~R x. index_build is the one-time nightly "
                "artifact; the *_indexed query consumes it.",
        "results": results,
    }
    book_path.write_text(json.dumps(book, indent=1, sort_keys=True))
    print("written BENCH_AB.json stress_r11_wave")
    return 0


if __name__ == "__main__":
    sys.exit(main())

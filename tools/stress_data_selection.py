"""10x scale stress for the data-selection family (round-7 wave 3).

Replicates the sf0.1 documents (5k -> 50k docs) and embeddings
(2k -> 20k vectors) R times — doc/vec ids offset per replica so the
id space stays DENSE (the sqrt(n)-cell seed convention), embedding
components jittered by replica index so replicas are near- but not
exact duplicates — then times every query in the family. Claims under
test: the docs-side queries are token-linear; the cell family
(hard negatives / decontaminate / balanced sample) is O(n^1.5); PQ
encode/ADC is linear.

Usage: python tools/stress_data_selection.py [R ...]   # default 10
Appends a summary to BENCH_AB.json under "stress_data_selection".
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

DOC_QUERIES = [
    "q_dsir_weights",
    "q_perplexity_filter",
    "q_vocab_coverage",
    "q_toxicity_lexicon",
    "q_epoch_plan",
]
EMB_QUERIES = [
    "q_pq_ann",
    "q_hard_negatives",
    "q_semantic_decontaminate",
    "q_cluster_balanced_sample",
]


def main() -> int:
    reps = [int(a) for a in sys.argv[1:]] or [10]

    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    from mapreduce_server_development_spark.session import get_spark
    from mapreduce_server_development_spark.sources.tables import load_table

    spark = get_spark(app_name="stress_data_selection")
    queries = entrymod.queries()
    book_path = REPO / "BENCH_AB.json"
    book = json.loads(book_path.read_text()) if book_path.exists() else {}
    results: dict[str, dict[str, float]] = {}

    for r in reps:
        out_dir = f"/tmp/stress_ds_x{r}"
        docs = load_table(spark, "/root/testdata/sf0.1", "documents")
        n_docs = docs.count()
        rep = F.broadcast(
            spark.range(r).select(F.col("id").cast("long").alias("rep"))
        )
        docs.crossJoin(rep).select(
            (F.col("doc_id") + F.col("rep") * n_docs).alias("doc_id"),
            "text",
            "lang",
            "source",
            "n_chars",
        ).write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")

        emb = load_table(spark, "/root/testdata/sf0.1", "embeddings")
        n_emb = emb.count()
        emb.crossJoin(rep).select(
            (F.col("vec_id") + F.col("rep") * n_emb).alias("vec_id"),
            F.transform(
                F.col("embedding"),
                lambda x: (
                    x + F.col("rep").cast("float") * F.lit(0.003)
                ).cast("float"),
            ).alias("embedding"),
            "label",
        ).write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")

        key = f"x{r}"
        results[key] = {}
        for name in DOC_QUERIES + EMB_QUERIES:
            t0 = time.time()
            n = queries[name](spark, out_dir).count()
            dt = round(time.time() - t0, 2)
            results[key][name] = dt
            print(f"x{r} {name}: {dt}s ({n} rows)", flush=True)

    book["stress_data_selection"] = {
        "base": "sf0.1 x R (50k docs / 20k vectors at R=10)",
        "results": results,
    }
    book_path.write_text(json.dumps(book, indent=2, sort_keys=True))
    print("written BENCH_AB.json stress_data_selection")
    return 0


if __name__ == "__main__":
    sys.exit(main())

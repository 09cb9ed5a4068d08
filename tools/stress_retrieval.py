"""Scale stress for the round-8 retrieval/serving wave.

Replicates the sf0.1 documents and embeddings R times. Unlike the
data-selection stress, every TOKEN is prefixed with its replica index
(``r3_word``) so replicas share no vocabulary: replication must not
manufacture cross-replica near-dup families (q_personalized_pagerank's
edge relation would otherwise grow ~R^2 on the fixture's template
clusters — a fixture artifact, not an operator property). Embedding
components are jittered per replica (the stress_data_selection
convention); doc/vec ids stay dense via per-replica offsets.

Claims under test:
- q_rag_chunks / q_chunk_dedup — chunk-linear (explode + hash agg);
- q_hybrid_rrf — the corpus passes (tf/dl/df) are token-linear; the
  postings probe is bounded by the panel's term postings;
- q_curriculum_order — token-linear passes + the two-phase global rank;
- q_sq8_ann — linear (dim-stats pass + corpus x bounded-panel search);
- q_personalized_pagerank — linear in the near-dup edge relation.

Usage: python tools/stress_retrieval.py [R ...]   # default 3 10
Appends a summary to BENCH_AB.json under "stress_retrieval".
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

QUERIES = [
    "q_rag_chunks",
    "q_chunk_dedup",
    "q_hybrid_rrf",
    "q_curriculum_order",
    "q_sq8_ann",
    "q_personalized_pagerank",
]


def main() -> int:
    reps = [int(a) for a in sys.argv[1:]] or [3, 10]

    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    from mapreduce_server_development_spark.session import get_spark
    from mapreduce_server_development_spark.sources.tables import load_table

    spark = get_spark(app_name="stress_retrieval")
    queries = entrymod.queries()
    book_path = REPO / "BENCH_AB.json"
    book = json.loads(book_path.read_text()) if book_path.exists() else {}
    results: dict[str, dict[str, float]] = {}

    for r in reps:
        out_dir = f"/tmp/stress_retrieval_x{r}"
        docs = load_table(spark, "/root/testdata/sf0.1", "documents")
        n_docs = docs.count()
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
        docs.crossJoin(rep).select(
            (F.col("doc_id") + F.col("rep") * n_docs).alias("doc_id"),
            prefixed.alias("text"),
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
        for name in QUERIES:
            t0 = time.time()
            n = queries[name](spark, out_dir).count()
            dt = round(time.time() - t0, 2)
            results[key][name] = dt
            print(f"x{r} {name}: {dt}s ({n} rows)", flush=True)

    book["stress_retrieval"] = {
        "base": "sf0.1 x R, per-replica token-prefixed vocab "
                "(replicas share no tokens), jittered embeddings",
        "results": results,
    }
    book_path.write_text(json.dumps(book, indent=2, sort_keys=True))
    print("written BENCH_AB.json stress_retrieval")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Scale stress for q_exact_substring_spans (round-9).

Replicates the sf0.1 documents R times with per-replica token-prefixed
vocabulary (the stress_retrieval convention: replicas share no tokens,
so replication cannot manufacture cross-replica gram matches and
linear growth is the honest null hypothesis — the within-replica pair
structure replicates R times).

Claim under test: the gram relation is token-linear; the pair relation
is bounded by cap^2 x |duplicated grams|, which replicates linearly;
the run/island windows partition by (da, db, diag) and doc. Expected
wall-clock: ~linear in R.

Usage: python tools/stress_exact_substring.py [R ...]   # default 3 10
Appends a summary to BENCH_AB.json under "stress_exact_substring".
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    reps = [int(a) for a in sys.argv[1:]] or [3, 10]

    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    from mapreduce_server_development_spark.session import get_spark
    from mapreduce_server_development_spark.sources.tables import load_table

    spark = get_spark(app_name="stress_exact_substring")
    queries = entrymod.queries()
    book_path = REPO / "BENCH_AB.json"
    book = json.loads(book_path.read_text()) if book_path.exists() else {}
    results: dict[str, dict] = {}

    # x1 reference point on the plain fixture
    t0 = time.time()
    n1 = queries["q_exact_substring_spans"](
        spark, "/root/testdata/sf0.1"
    ).count()
    results["x1"] = {"sec": round(time.time() - t0, 2), "rows": n1}
    print(f"x1: {results['x1']}", flush=True)

    for r in reps:
        out_dir = f"/tmp/stress_xsubstr_x{r}"
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

        t0 = time.time()
        n = queries["q_exact_substring_spans"](spark, out_dir).count()
        dt = round(time.time() - t0, 2)
        results[f"x{r}"] = {"sec": dt, "rows": n}
        print(f"x{r}: {results[f'x{r}']}", flush=True)

    book["stress_exact_substring"] = {
        "base": "sf0.1 x R, per-replica token-prefixed vocab "
                "(replicas share no grams)",
        "results": results,
    }
    book_path.write_text(json.dumps(book, indent=2, sort_keys=True))
    print("written BENCH_AB.json stress_exact_substring")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Recall-vs-touch curves for the ANN tiers on a CLUSTERED fixture
(round-8 verdict ask #5).

The tier-selection numbers in SCALE.md (multiprobe LSH 50%@30% touch;
IVF 94%@12.5%) were measured on the uniform-random driver fixture —
the adversarially HARD case for LSH and unrepresentative of real
embedding corpora, which cluster. This tool builds a clustered fixture
(25 Gaussian clusters on unit-norm centers, sigma controlling
intra-cluster spread, same 64-dim/array<float> schema as the driver
fixtures) and measures, for each tier:

- recall@3 against the exact cosine top-3 (the q_ann_recall panel:
  queries vid <= 5, spread across clusters), and
- the fraction of the corpus TOUCHED by the candidate generation
  (bucket-postings for LSH, probed-cell mass for IVF).

Registered queries that self-report their curve (q_ivf_nprobe_curve,
q_sq8_ann, q_ivfpq_ann) run against the same fixture directory.

Usage: python tools/ann_clustered_recall.py
Appends results to BENCH_AB.json under "ann_clustered_recall".
"""

from __future__ import annotations

import json
import math
import random
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N, DIM, N_CLUSTERS, SIGMA = 5000, 64, 25, 0.12
OUT_DIR = "/tmp/ann_clustered"


def build_fixture(spark) -> None:
    rng = random.Random(91)
    centers = []
    for _ in range(N_CLUSTERS):
        v = [rng.gauss(0, 1) for _ in range(DIM)]
        nrm = math.sqrt(sum(x * x for x in v))
        centers.append([x / nrm for x in v])
    rows = []
    for i in range(N):
        c = centers[i % N_CLUSTERS]
        rows.append(
            (
                i,
                [float(round(x + rng.gauss(0, SIGMA), 6)) for x in c],
                i % N_CLUSTERS,
            )
        )
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).repartition(8).write.mode("overwrite").parquet(
        f"{OUT_DIR}/embeddings.parquet"
    )


def main() -> int:
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from mapreduce_server_development_spark.functions.similarity import (
        cosine_topk,
        ivf_topk,
        lsh_bucket_topk,
        lsh_signature,
    )
    from mapreduce_server_development_spark.session import get_spark

    spark = get_spark(app_name="ann_clustered_recall")
    build_fixture(spark)
    emb = spark.read.parquet(f"{OUT_DIR}/embeddings.parquet")
    queries = entrymod.queries()
    res: dict = {
        "fixture": f"{N} vecs, {DIM}d, {N_CLUSTERS} Gaussian clusters "
                   f"sigma={SIGMA} on unit centers, queries vid<=5",
    }

    exact = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(emb, query_max_id=5, k=3).collect()
    }
    n_q = len({q for q, _ in exact})

    def recall(df) -> float:
        got = {(r["query_id"], r["vec_id"]) for r in df.collect()}
        return round(len(got & exact) / len(exact), 4)

    # --- LSH single + multiprobe: recall and bucket-postings touch ---
    sig = emb.select(
        "vec_id", lsh_signature(F.col("embedding"), 8, DIM).alias("bucket")
    )
    counts = {r["bucket"]: r["c"] for r in
              sig.groupBy("bucket").agg(F.count("*").alias("c")).collect()}
    qsigs = {r["vec_id"]: r["bucket"] for r in
             sig.filter(F.col("vec_id") <= 5).collect()}

    def touch(probe_hamming: int) -> float:
        tot = 0
        for _, b in qsigs.items():
            probes = {b}
            if probe_hamming:
                for i in range(len(b)):
                    probes.add(b[:i] + ("1" if b[i] == "0" else "0") + b[i + 1:])
            tot += sum(counts.get(p, 0) for p in probes)
        return round(tot / (len(qsigs) * N), 4)

    for name, ph in [("lsh_single", 0), ("lsh_multiprobe", 1)]:
        df = lsh_bucket_topk(emb, query_max_id=5, k=3, num_planes=8,
                             dim=DIM, probe_hamming=ph)
        res[name] = {"recall_at_3": recall(df), "touch_frac": touch(ph)}
        print(name, res[name], flush=True)

    # --- IVF untrained + trained (nlist=16, nprobe=2) ---
    for name, ti in [("ivf_seeded", 0), ("ivf_trained2", 2)]:
        df = ivf_topk(emb, query_max_id=5, k=3, nlist=16, nprobe=2,
                      train_iters=ti).select("query_id", "vec_id")
        res[name] = {"recall_at_3": recall(df), "touch_frac": "see nprobe curve"}
        print(name, res[name], flush=True)

    # --- registered self-reporting curves on the same fixture ---
    npc = queries["q_ivf_nprobe_curve"](spark, OUT_DIR).collect()
    cols = npc[0].asDict().keys() if npc else []
    by_np: dict = {}
    for r in npc:
        d = r.asDict()
        key = f"nprobe={d.get('nprobe')}"
        by_np.setdefault(key, []).append(d)
    res["ivf_nprobe_curve"] = {
        k: {c: round(sum(float(d[c]) for d in v) / len(v), 4)
            for c in cols if c not in ("nprobe", "query_id")
            and isinstance(v[0][c], (int, float))}
        for k, v in by_np.items()
    }
    print("ivf_nprobe_curve", json.dumps(res["ivf_nprobe_curve"]), flush=True)

    sq8 = [r.asDict() for r in queries["q_sq8_ann"](spark, OUT_DIR).collect()]
    res["sq8"] = {
        c: round(sum(float(d[c]) for d in sq8) / len(sq8), 4)
        for c in sq8[0] if isinstance(sq8[0][c], (int, float)) and c != "query_id"
    } if sq8 else {}
    print("sq8", res["sq8"], flush=True)

    pq = [r.asDict() for r in queries["q_ivfpq_ann"](spark, OUT_DIR).collect()]
    res["ivfpq"] = {
        c: round(sum(float(d[c]) for d in pq) / len(pq), 4)
        for c in pq[0] if isinstance(pq[0][c], (int, float)) and c != "qid"
    } if pq else {}
    res["ivfpq"]["note"] = "overlap_at3_* are counts out of 3"
    print("ivfpq", res["ivfpq"], flush=True)

    # --- multi-probe IVF-PQ ADC: overlap-vs-touch curve (r10 ask #4) ---
    pnc = [r.asDict() for r in
           queries["q_ivfpq_nprobe_curve"](spark, OUT_DIR).collect()]
    by_np = {}
    for d in pnc:
        by_np.setdefault(f"nprobe={d['nprobe']}", []).append(d)
    res["ivfpq_nprobe_curve"] = {
        k: {
            "overlap_at3_adc": round(
                sum(d["overlap_at3_adc"] for d in v) / len(v), 4),
            "overlap_at3_rerank": round(
                sum(d["overlap_at3_rerank"] for d in v) / len(v), 4),
            "n_cand": round(sum(d["n_candidates"] for d in v) / len(v), 4),
            "cand_frac": round(
                sum(d["n_candidates"] for d in v) / len(v) / N, 4),
        }
        for k, v in sorted(by_np.items())
    }
    print("ivfpq_nprobe_curve", json.dumps(res["ivfpq_nprobe_curve"]),
          flush=True)

    res["n_queries"] = n_q
    book_path = REPO / "BENCH_AB.json"
    book = json.loads(book_path.read_text())
    book["ann_clustered_recall"] = res
    book_path.write_text(json.dumps(book, indent=1, sort_keys=True))
    print("written BENCH_AB.json ann_clustered_recall")
    return 0


if __name__ == "__main__":
    sys.exit(main())

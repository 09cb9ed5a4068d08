"""ML feature-engineering queries: Johnson–Lindenstrauss random
projection and hashing-trick featurization.

Both are standard large-scale training-prep primitives (build-brief
mandate; the reference engine's data model is text lines, SURVEY.md
§1.2, so there is no counterpart to cite):

- **Random projection** compresses the 64-dim embedding column to 8
  dims with a fixed ±1 sign matrix (Achlioptas 2001: database-friendly
  random projections) — the cheap preprocessing step before coarse
  ANN clustering or dedup at 100 TB, where a 8× narrower vector is 8×
  less shuffle traffic for every downstream join.
- **Feature hashing** (Weinberger et al. 2009) maps an unbounded token
  vocabulary onto a fixed bucket space with a salted hash — no
  vocabulary broadcast, no dictionary fit pass, which is exactly what
  makes it the scale answer vs a fitted CountVectorizer.

Determinism: the sign matrix is derived from ``hashlib.md5`` at plan
build time and inlined as a literal in BOTH the Spark plan and the
oracle SQL, so the two engines multiply identical constants; the
bucket hash reuses :func:`sampling.hash_bucket` (same md5-nibble
arithmetic in both engines).

Scale posture: the projection is a zero-shuffle map-only pass over
vectors (JVM higher-order functions, no Python); feature hashing is
one partial-aggregated shuffle on (doc_id, bucket). The sign matrix
is a plan literal — nothing to broadcast, nothing to fit.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query
from .sampling import _bucket_sql, hash_bucket

D_IN = 64
D_OUT = 8
_N_BUCKETS = 64


def _sign_matrix() -> list[list[int]]:
    """D_OUT x D_IN ±1 matrix from md5('rp:j:k') — deterministic,
    engine-independent (computed once at import, inlined as literals)."""
    return [
        [
            1 if int(hashlib.md5(f"rp:{j}:{k}".encode()).hexdigest()[0], 16) % 2 == 0
            else -1
            for j in range(D_IN)
        ]
        for k in range(D_OUT)
    ]


_SIGNS = _sign_matrix()


def _projection_oracle() -> str:
    rows = ", ".join(f"({k}, {_SIGNS[k]})" for k in range(D_OUT))
    return f"""
    WITH m(k, signs) AS (VALUES {rows}),
    v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vv
        FROM embeddings
    )
    SELECT vec_id, CAST(k AS INTEGER) AS dim,
           round(list_sum(list_transform(range(1, {D_IN + 1}),
                     j -> vv[CAST(j AS INT)] * signs[CAST(j AS INT)]))
                 / sqrt({D_OUT}.0), 4) + 0.0 AS proj
    FROM v, m
    ORDER BY vec_id, dim
    """


@query("q_random_projection", oracle=_projection_oracle())
def q_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL ±1 random projection 64→8 over the embedding column.

    All JVM higher-order functions (``zip_with`` product +
    ``aggregate`` sum per output dim, ``posexplode`` to long format) —
    no Python, no shuffle, vector-linear output. The ±1 matrix makes
    each output dim an add/subtract tree, the Achlioptas trick that
    removes multiplies entirely on real hardware.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    vv = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    dims = F.array(
        *[
            F.round(
                F.aggregate(
                    F.zip_with(
                        vv,
                        F.array(*[F.lit(s) for s in _SIGNS[k]]),
                        lambda x, s: x * s,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                / F.sqrt(F.lit(float(D_OUT))),
                4,
            )
            for k in range(D_OUT)
        ]
    )
    return (
        emb.select("vec_id", F.posexplode(dims).alias("dim", "proj"))
        .select("vec_id", F.col("dim").cast("int").alias("dim"), "proj")
    )  # no trailing sort: vector-linear output, zero shuffles


@query(
    "q_feature_hashing",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               unnest(list_filter(string_split(lower(text), ' '),
                                  x -> x <> '')) AS tok
        FROM documents
    )
    SELECT doc_id,
           CAST({_bucket_sql("fh", "tok", _N_BUCKETS)} AS INTEGER) AS bucket,
           COUNT(*) AS tf
    FROM t
    GROUP BY doc_id, bucket
    ORDER BY doc_id, bucket
    """,
)
def q_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick term frequencies: tokens → 64 fixed buckets via
    the shared md5-nibble bucket hash; (doc_id, bucket, tf) long-form
    sparse features.

    One shuffle with map-side partial aggregation; no vocabulary pass,
    no dictionary broadcast — the property that lets this run on an
    unbounded vocabulary at 100 TB where a fitted vectorizer needs a
    second full scan and a driver-sized vocab.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = F.explode(
        F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != "")
    ).alias("tok")
    return (
        docs.select("doc_id", tok)
        .select(
            "doc_id",
            hash_bucket("fh", F.col("tok"), _N_BUCKETS).cast("int").alias("bucket"),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("tf"))
    )  # no trailing sort: the oracle compare is order-insensitive

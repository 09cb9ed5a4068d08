"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Design notes for 100 TB:
- Exact dedup is a hash-groupBy on md5(text) — one shuffle keyed by the
  hash, which is uniformly distributed (no skew).
- MinHash banding turns near-dup detection into an equi-join on band
  buckets: candidate generation never compares all pairs. The signature
  computation is a single explode + groupBy (map-side partial min).
- SimHash blocks on the two 8-bit halves of a 16-bit signature
  (pigeonhole: hamming distance <= 1 implies one half matches exactly),
  again an equi-join instead of a cross join.
- All hashing is md5-based string arithmetic so the DuckDB oracle can
  reproduce values bit-for-bit; integer vote counts avoid any float.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens_col, word_shingles


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group identical texts by content hash; keep the minimum id as
    canonical. Returns (text_hash, canonical_doc, n_copies)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("canonical_doc"), F.count("*").alias("n_copies"))
    )


def _doc_shingles(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """Distinct word-n-gram shingles per document: (id, shingle)."""
    toks = tokens_col(F.lower(F.col(text_col)))
    return (
        df.select(F.col(id_col).alias("doc"), F.explode(word_shingles(toks, n)).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    threshold: float = 0.2,
) -> DataFrame:
    """Near-duplicate pairs by word-n-gram Jaccard similarity.

    Candidate pairs are documents sharing at least one shingle (an
    equi-join on the shingle — with n=5 the shingle space is selective
    enough that unrelated documents almost never collide). Jaccard is
    exact integer arithmetic: |A∩B| / (|A| + |B| - |A∩B|).
    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b.
    """
    sh = _doc_shingles(df, text_col, id_col, n).cache()
    sizes = sh.groupBy("doc").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_inter").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash signatures: for each seed, min over md5(seed '#' shingle).

    The lexicographic minimum of md5 hex strings is a valid min-hash
    family and is identical across engines. Returns (doc, seed, h).
    """
    sh = _doc_shingles(df, text_col, id_col, shingle_n)
    seeds = F.explode(F.array(*[F.lit(i) for i in range(num_hashes)])).alias("seed")
    return (
        sh.select("doc", "shingle", seeds)
        .select(
            "doc",
            "seed",
            F.md5(F.concat(F.col("seed").cast("string"), F.lit("#"), F.col("shingle"))).alias("h"),
        )
        .groupBy("doc", "seed")
        .agg(F.min("h").alias("h"))
    )


def minhash_band_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    rows_per_band: int = 2,
    shingle_n: int = 3,
) -> DataFrame:
    """LSH banding over MinHash signatures -> candidate pairs.

    Bands hash the ordered concatenation of their signature rows; docs
    sharing any band bucket become a candidate pair. Returns
    (doc_a, doc_b, n_bands) with doc_a < doc_b.
    """
    sig = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
    band = F.floor(F.col("seed") / rows_per_band).alias("band")
    # Order rows inside a band by seed before hashing the concatenation:
    # array_sort on (seed, h) structs is deterministic.
    bands = (
        sig.select("doc", band, F.struct("seed", "h").alias("sh"))
        .groupBy("doc", "band")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(F.array_sort(F.collect_list("sh")), lambda s: s.h), ""
                )
            ).alias("bh")
        )
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count("*").alias("n_bands"))
    )


def simhash16(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """16-bit SimHash over distinct tokens, pure integer arithmetic.

    Bit b of token t = (hex digit b of md5(t)) & 1; the document bit is
    the sign of the sum of (2*bit - 1) votes. Returns (doc, simhash,
    hi8, lo8) where hi8/lo8 are the blocking halves.
    """
    toks = (
        df.select(
            F.col(id_col).alias("doc"),
            F.explode(tokens_col(F.lower(F.col(text_col)))).alias("tok"),
        )
        .distinct()
        .withColumn("h", F.md5("tok"))
    )
    votes = [
        F.sum(
            F.conv(F.substring("h", b + 1, 1), 16, 10).cast("int") % 2 * 2 - 1
        ).alias(f"v{b}")
        for b in range(16)
    ]
    agg = toks.groupBy("doc").agg(*votes)
    sim = sum(
        (F.when(F.col(f"v{b}") > 0, 1).otherwise(0) * (1 << b) for b in range(16)),
        F.lit(0),
    )
    return agg.select("doc", sim.alias("simhash")).select(
        "doc",
        "simhash",
        (F.col("simhash") / 256).cast("int").alias("hi8"),
        (F.col("simhash") % 256).alias("lo8"),
    )


def simhash_near_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 2
) -> DataFrame:
    """Near-dup candidate pairs via SimHash half-blocking.

    Joins on either half matching (covers all pairs at hamming <= 1 by
    pigeonhole; at hamming 2 it is an approximation — documented), then
    filters by exact hamming distance via bit_count(xor).
    Returns (doc_a, doc_b, hamming) with doc_a < doc_b, distinct.
    """
    s = simhash16(df, text_col, id_col).cache()
    ham = F.bit_count(
        F.col("a.simhash").cast("long").bitwiseXOR(F.col("b.simhash").cast("long"))
    )

    def block(col: str) -> DataFrame:
        # Equi-join per half (an OR-join would degrade to a nested-loop
        # cross join — two hash joins + distinct keeps it shuffle-only).
        a, b = s.alias("a"), s.alias("b")
        return (
            a.join(b, (F.col(f"a.{col}") == F.col(f"b.{col}")) & (F.col("a.doc") < F.col("b.doc")))
            .select(
                F.col("a.doc").alias("doc_a"),
                F.col("b.doc").alias("doc_b"),
                ham.alias("hamming"),
            )
        )

    return (
        block("hi8")
        .unionAll(block("lo8"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )

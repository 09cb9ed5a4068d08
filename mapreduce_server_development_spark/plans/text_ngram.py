"""N-gram statistics and TF-IDF — corpus-level text analytics for a
training-data pipeline (bigram language-model counts, per-document
salient terms).

Same tokenization as the rest of the LLM plane (``tokens_col``:
lowercase, whitespace split, empties removed; mirrored in the oracles
with ``list_filter(string_split(...))``).

Cross-engine parity: TF-IDF scores involve ``ln`` (libm may differ by
an ulp between engines), so scores are rounded to 6 decimals BEFORE
ranking — a 1-ulp difference can otherwise flip the order of two
mathematically-equal scores (e.g. ``2*ln(10)`` vs ``ln(100)``) and
change the top-k selection itself, not just the printed value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import tokens_col, word_shingles
from ..sources.tables import load_table
from .registry import query

#: Tokens per document in DuckDB (mirrors tokens_col).
_TOKS_CTE = """
toks AS (
    SELECT doc_id AS doc,
           list_filter(string_split(lower(text), ' '), t -> t <> '') AS toks
    FROM documents
)"""


@query(
    "q_bigram_topk",
    oracle=f"""
    WITH {_TOKS_CTE},
    bg AS (
        SELECT unnest(list_transform(range(1, len(toks)),
                                     i -> toks[i] || ' ' || toks[i + 1])) AS bigram
        FROM toks
    )
    SELECT bigram, COUNT(*) AS n
    FROM bg
    GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT 50
    """,
)
def q_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 corpus bigrams (language-model count table).

    All-occurrence word bigrams via higher-order array functions (no
    Python), explode, one hash-agg shuffle, then
    ``TakeOrderedAndProject`` for the limit — per-partition heaps, no
    global sort. Tiebreak on the bigram string keeps the cut
    deterministic.
    """
    docs = load_table(spark, sf_dir, "documents")
    # Tokens materialized first — shingling straight over tokens_col()
    # would re-tokenize per token inside the transform lambda.
    toks = docs.select(tokens_col(F.lower(F.col("text"))).alias("toks"))
    return (
        toks.select(F.explode(word_shingles(F.col("toks"), 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("bigram"))
        .limit(50)
    )


@query(
    "q_tfidf_topk",
    oracle=f"""
    WITH {_TOKS_CTE},
    tf AS (
        SELECT doc, unnest(toks) AS term FROM toks
    ),
    tfc AS (
        SELECT doc, term, COUNT(*) AS tf FROM tf GROUP BY doc, term
    ),
    dfc AS (
        SELECT term, COUNT(*) AS df FROM tfc GROUP BY term
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT doc, tfc.term,
               ROUND(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS score
        FROM tfc JOIN dfc ON tfc.term = dfc.term CROSS JOIN n
    ),
    ranked AS (
        SELECT doc AS doc_id, term, score,
               row_number() OVER (PARTITION BY doc ORDER BY score DESC, term) AS rn
        FROM scored
    )
    SELECT doc_id, term, score FROM ranked WHERE rn <= 3
    """,
)
def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (salient-term extraction).

    Plan: explode -> (doc,term) hash agg -> term-level doc-frequency
    agg -> join back on term -> per-doc ranking window. The doc-count
    scalar is a 1-row broadcast. The vocabulary relation is orders of
    magnitude smaller than the corpus, so the tf<->df join shuffles on
    term and AQE broadcast-izes it when it fits.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.agg(F.count("*").cast("double").alias("n_docs"))
    tf = (
        docs.select("doc_id", F.explode(tokens_col(F.lower(F.col("text")))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "score")
    )

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


@query(
    "q_dup_ngram_spans",
    oracle=f"""
    WITH {_TOKS_CTE},
    grams AS (
        SELECT doc, u.pos AS pos, substr(md5(u.gram), 1, 16) AS gh
        FROM (
            SELECT doc,
                   unnest(list_transform(
                       range(1, len(toks) - 8 + 2),
                       i -> {{'pos': i - 1,
                             'gram': array_to_string(toks[i:i+7], ' ')}})) AS u
            FROM toks)
    ),
    dup AS (
        SELECT gh FROM grams GROUP BY gh HAVING MIN(doc) <> MAX(doc)
    ),
    hits AS (
        SELECT g.doc, g.pos FROM grams g JOIN dup USING (gh)
    ),
    isl AS (
        SELECT doc, pos,
               CASE WHEN MAX(pos + 8) OVER w IS NULL
                      OR pos > MAX(pos + 8) OVER w THEN 1 ELSE 0 END AS ni
        FROM hits
        WINDOW w AS (PARTITION BY doc ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    isl2 AS (
        SELECT doc, pos,
               SUM(ni) OVER (PARTITION BY doc ORDER BY pos
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS island
        FROM isl
    ),
    spans AS (
        SELECT doc, island, MAX(pos + 8) - MIN(pos) AS span_len
        FROM isl2 GROUP BY doc, island
    ),
    agg AS (
        SELECT doc, SUM(span_len) AS dup_tokens, COUNT(*) AS n_spans
        FROM spans GROUP BY doc
    ),
    base AS (SELECT doc, len(toks) AS n_tokens FROM toks)
    SELECT b.doc AS doc_id,
           CAST(b.n_tokens AS BIGINT) AS n_tokens,
           CAST(COALESCE(a.dup_tokens, 0) AS BIGINT) AS dup_tokens,
           CAST(COALESCE(a.n_spans, 0) AS BIGINT) AS n_spans,
           round(CAST(COALESCE(a.dup_tokens, 0) AS DOUBLE)
                 / greatest(b.n_tokens, 1), 6) AS dup_frac
    FROM base b LEFT JOIN agg a ON b.doc = a.doc
    ORDER BY doc_id
    """,
)
def q_dup_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication profile (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): for
    every document, the fraction of tokens covered by any word 8-gram
    that also occurs in >= 2 distinct documents, with covered
    positions merged into maximal spans.

    Plan: positional shingles (posexplode over the higher-order-array
    shingling — no Python), grams keyed by a 64-bit md5 prefix so the
    duplicate-gram shuffle carries 16 bytes per gram instead of the
    ~60-char text; the duplicated-gram relation (vocabulary-scale,
    orders of magnitude smaller than the corpus) joins back on the
    same hash. Span merge is the classic interval-union: one window
    per document (running max of span end -> island ids -> per-island
    extent). At 100 TB the per-doc window partitions by doc_id, so
    state per partition is one document's hit list — never global.
    Production would swap md5 for xxhash64; the md5 keeps the DuckDB
    oracle bit-identical.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", tokens_col(F.lower(F.col("text"))).alias("toks")
    )
    grams = toks.select(
        "doc_id",
        F.posexplode(word_shingles(F.col("toks"), 8)).alias("pos", "gram"),
    ).select("doc_id", "pos", F.substring(F.md5("gram"), 1, 16).alias("gh"))
    # "occurs in >= 2 distinct docs" as min(doc) != max(doc): one cheap
    # min/max partial-agg instead of a two-phase distinct count.
    dup = (
        grams.groupBy("gh")
        .agg(F.min("doc_id").alias("d0"), F.max("doc_id").alias("d1"))
        .filter(F.col("d0") != F.col("d1"))
        .select("gh")
    )
    hits = grams.join(dup, "gh").select("doc_id", "pos")
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_end = F.max(F.col("pos") + 8).over(w_prev)
    isl = hits.withColumn(
        "ni",
        F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1).otherwise(0),
    ).withColumn("island", F.sum("ni").over(w_run))
    agg = (
        isl.groupBy("doc_id", "island")
        .agg((F.max(F.col("pos") + 8) - F.min("pos")).alias("span_len"))
        .groupBy("doc_id")
        .agg(
            F.sum("span_len").alias("dup_tokens"),
            F.count("*").alias("n_spans"),
        )
    )
    base = toks.select("doc_id", F.size("toks").cast("long").alias("n_tokens"))
    return (
        base.join(agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("long").alias("dup_tokens"),
            F.coalesce(F.col("n_spans"), F.lit(0)).cast("long").alias("n_spans"),
            F.round(
                F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("double")
                / F.greatest(F.col("n_tokens"), F.lit(1)),
                6,
            ).alias("dup_frac"),
        )
        .orderBy("doc_id")
    )


@query(
    "q_pmi_bigrams",
    oracle=f"""
    WITH {_TOKS_CTE},
    uni AS (
        SELECT unnest(toks) AS tok FROM toks
    ),
    uc AS (SELECT tok, COUNT(*) AS c FROM uni GROUP BY tok),
    n AS (SELECT SUM(c) AS n_tok FROM uc),
    bg AS (
        SELECT unnest(list_transform(range(1, len(toks)),
                                     i -> toks[i] || ' ' || toks[i + 1])) AS bigram
        FROM toks
    ),
    bc AS (SELECT bigram, COUNT(*) AS c_xy FROM bg GROUP BY bigram),
    nb AS (SELECT SUM(c_xy) AS n_big FROM bc),
    scored AS (
        SELECT bc.bigram,
               CAST(bc.c_xy AS BIGINT) AS c_xy,
               CAST(u1.c AS BIGINT) AS c_x,
               CAST(u2.c AS BIGINT) AS c_y,
               round(ln(CAST(bc.c_xy AS DOUBLE) * n.n_tok * n.n_tok
                        / nb.n_big / u1.c / u2.c), 6) AS pmi
        FROM bc
        JOIN uc u1 ON u1.tok = string_split(bc.bigram, ' ')[1]
        JOIN uc u2 ON u2.tok = string_split(bc.bigram, ' ')[2]
        CROSS JOIN n CROSS JOIN nb
        WHERE bc.c_xy >= 5
    )
    SELECT bigram, c_xy, c_x, c_y, pmi
    FROM scored
    ORDER BY pmi DESC, bigram
    LIMIT 30
    """,
)
def q_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-30 collocations by pointwise mutual information
    (pmi = ln(p(xy) / (p(x) p(y))), support >= 5).

    Plan: one unigram agg, one bigram agg, two vocabulary-scale joins
    (bigram -> its two word counts) that AQE broadcast-izes, and two
    1-row scalar totals broadcast in. The PMI double is rounded to 6
    decimals BEFORE ranking (same ulp rationale as q_tfidf_topk) and
    the float expression is written with identical association on both
    engines so the doubles are bit-equal.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(tokens_col(F.lower(F.col("text"))).alias("toks"))
    uc = (
        toks.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    n = uc.agg(F.sum("c").alias("n_tok"))
    bc = (
        toks.select(F.explode(word_shingles(F.col("toks"), 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("c_xy"))
        .filter(F.col("c_xy") >= 5)
    )
    nb_total = (
        toks.select(F.explode(word_shingles(F.col("toks"), 2)).alias("bigram"))
        .agg(F.count("*").alias("n_big"))
    )
    u1 = uc.select(F.col("tok").alias("w1"), F.col("c").alias("c_x"))
    u2 = uc.select(F.col("tok").alias("w2"), F.col("c").alias("c_y"))
    scored = (
        bc.withColumn("w1", F.split("bigram", " ")[0])
        .withColumn("w2", F.split("bigram", " ")[1])
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(nb_total))
        .select(
            "bigram",
            F.col("c_xy").cast("long").alias("c_xy"),
            F.col("c_x").cast("long").alias("c_x"),
            F.col("c_y").cast("long").alias("c_y"),
            F.round(
                F.log(
                    F.col("c_xy").cast("double")
                    * F.col("n_tok")
                    * F.col("n_tok")
                    / F.col("n_big")
                    / F.col("c_x")
                    / F.col("c_y")
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.col("pmi").desc(), "bigram").limit(30)

"""Distributed BPE tokenizer training (Sennrich et al. 2016).

BPE learns a merge table by repeatedly fusing the most frequent
adjacent symbol pair. The classical trick that makes this distributable
is that training runs on the WORD-FREQUENCY table, not the raw corpus:
a 100 TB corpus collapses to a vocabulary-scale (Zipf-bounded) relation
of (word, count) after one explode + hash-agg shuffle, and every merge
round after that touches only that compact relation. Each round is:

  adjacent-pair explode -> weighted count (map-side combinable)
  -> arg-max pair (TakeOrderedAndProject, deterministic tie-break)
  -> 1-row broadcast -> literal string replace on the symbol sequence.

No driver collect anywhere: the winning pair stays a lazily-joined
1-row broadcast, so the whole k-round training is ONE Spark plan (the
same unrolled-iteration shape as functions/graph.py's PageRank).

Cross-engine parity: symbol sequences are space-joined with sentinel
padding, pair counts are exact integers, ties break on the pair string,
and `replace` is greedy-left non-overlapping in both Spark (F.replace,
literal) and DuckDB — verified equivalent (' a a a ' -> ' aa a ').

Reference parity: the reference has no tokenizer surface; this is
additive LLM-pipeline depth per the build brief.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens_col, word_shingles
from ..sources.tables import load_table
from .registry import query

_ROUNDS = 6


def _bpe_oracle(rounds: int = _ROUNDS) -> str:
    ctes = [
        """wfreq AS (
        SELECT tok AS word, COUNT(*) AS cnt FROM (
            SELECT unnest(list_filter(string_split(lower(text), ' '),
                                      t -> t <> '')) AS tok
            FROM documents
        ) GROUP BY tok
    )""",
        """w0 AS (
        SELECT word, cnt,
               ' ' || array_to_string(
                   list_transform(range(1, length(word) + 1),
                                  i -> substr(word, i, 1)), ' ')
                   || ' </w> ' AS seq
        FROM wfreq
    )""",
    ]
    for r in range(1, rounds + 1):
        ctes.append(f"""s{r} AS (
        SELECT cnt, list_filter(string_split(seq, ' '), x -> x <> '') AS ss
        FROM w{r - 1}
    )""")
        ctes.append(f"""p{r} AS (
        SELECT unnest(list_transform(range(1, len(ss)),
                                     i -> ss[i] || ' ' || ss[i + 1])) AS pair,
               cnt
        FROM s{r}
    )""")
        ctes.append(f"""c{r} AS (
        SELECT pair, CAST(SUM(cnt) AS BIGINT) AS total FROM p{r} GROUP BY pair
    )""")
        ctes.append(f"""b{r} AS (
        SELECT {r} AS round, pair, total FROM c{r}
        ORDER BY total DESC, pair LIMIT 1
    )""")
        ctes.append(f"""w{r} AS (
        SELECT word, cnt,
               replace(seq, ' ' || (SELECT pair FROM b{r}) || ' ',
                       ' ' || (SELECT replace(pair, ' ', '') FROM b{r}) || ' ')
                   AS seq
        FROM w{r - 1}
    )""")
    union = "\n        UNION ALL ".join(
        f"SELECT * FROM b{r}" for r in range(1, rounds + 1)
    )
    cte_block = ",\n    ".join(ctes)
    return f"""
    WITH {cte_block}
    SELECT CAST(round AS BIGINT) AS round, pair,
           replace(pair, ' ', '') AS merged, total AS pair_count
    FROM ({union})
    ORDER BY round
    """


@query("q_bpe_train", oracle=_bpe_oracle())
def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first 6 BPE merges of the corpus — the tokenizer-
    training operator of the pipeline. See the module docstring for
    the scale argument (training runs on the Zipf-bounded word table,
    each round a pair-count aggregate + 1-row broadcast replace, all
    in one lazy plan)."""
    docs = load_table(spark, sf_dir, "documents")
    wfreq = (
        docs.select(F.explode(tokens_col(F.lower(F.col("text")))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    chars = F.expr("transform(sequence(1, length(word)), i -> substr(word, i, 1))")
    w = wfreq.select(
        "word",
        "cnt",
        F.concat(
            F.lit(" "), F.concat_ws(" ", chars), F.lit(" </w> ")
        ).alias("seq"),
    )
    merges = []
    for r in range(1, _ROUNDS + 1):
        syms = F.filter(F.split(F.col("seq"), " "), lambda s: s != "")
        pairs = w.select(
            "cnt", F.explode(word_shingles(syms, 2)).alias("pair")
        )
        top = (
            pairs.groupBy("pair")
            .agg(F.sum("cnt").cast("long").alias("total"))
            .orderBy(F.col("total").desc(), F.col("pair"))
            .limit(1)
            .select(F.lit(r).cast("long").alias("round"), "pair", "total")
        )
        merges.append(top)
        best = top.select(
            F.col("pair").alias("_pat"),
            F.replace(F.col("pair"), F.lit(" "), F.lit("")).alias("_rep"),
        )
        w = w.crossJoin(F.broadcast(best)).select(
            "word",
            "cnt",
            F.replace(
                F.col("seq"),
                F.concat(F.lit(" "), F.col("_pat"), F.lit(" ")),
                F.concat(F.lit(" "), F.col("_rep"), F.lit(" ")),
            ).alias("seq"),
        )
        # Each round's state is consumed twice (next round's pair agg +
        # next replace) and the replace chain is a narrow projection
        # ReuseExchange cannot share, so the recompute compounds per
        # round. Persisting the vocab-scale state is a measured 3.6x
        # win (7.7s -> 2.2s at sf0.1, round 5 A/B).
        w = w.persist(StorageLevel.MEMORY_AND_DISK)
    out = merges[0]
    for m in merges[1:]:
        out = out.unionAll(m)
    return out.select(
        "round",
        "pair",
        F.replace(F.col("pair"), F.lit(" "), F.lit("")).alias("merged"),
        F.col("total").alias("pair_count"),
    ).orderBy("round")


def _bpe_encode_oracle(rounds: int = _ROUNDS) -> str:
    # Reuse the training CTE chain; the tail tokenizes every document
    # with the final merge state w{rounds} instead of dumping merges.
    train = _bpe_oracle(rounds)
    cte_block = train[train.index("WITH ") + 5 : train.index("\n    SELECT CAST(round")]
    return f"""
    WITH {cte_block},
    wlen AS (
        SELECT word,
               len(list_filter(string_split(seq, ' '), x -> x <> '')) - 1
                   AS n_sub
        FROM w{rounds}
    ),
    doctoks AS (
        SELECT doc_id AS doc,
               unnest(list_filter(string_split(lower(text), ' '), t -> t <> ''))
                   AS word
        FROM documents
    ),
    per_doc AS (
        SELECT d.doc, CAST(COUNT(*) AS BIGINT) AS n_words,
               CAST(SUM(w.n_sub) AS BIGINT) AS n_subwords
        FROM doctoks d JOIN wlen w ON w.word = d.word
        GROUP BY d.doc
    )
    SELECT doc.doc_id,
           COALESCE(p.n_words, 0) AS n_words,
           COALESCE(p.n_subwords, 0) AS n_subwords
    FROM documents doc LEFT JOIN per_doc p ON p.doc = doc.doc_id
    ORDER BY doc.doc_id
    """


@query("q_bpe_encode", oracle=_bpe_encode_oracle())
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the learned BPE merges: per-document subword count under
    the 6-merge tokenizer — the fertility / training-cost metric
    (n_subwords is what a token budget actually pays for). Encoding
    runs on the word table (each word segmented once, however often it
    occurs) and documents join the result by word — the same
    vocabulary-scale trick as training.
    """
    docs = load_table(spark, sf_dir, "documents")
    wfreq = (
        docs.select(F.explode(tokens_col(F.lower(F.col("text")))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    chars = F.expr("transform(sequence(1, length(word)), i -> substr(word, i, 1))")
    w = wfreq.select(
        "word",
        "cnt",
        F.concat(F.lit(" "), F.concat_ws(" ", chars), F.lit(" </w> ")).alias("seq"),
    )
    for r in range(1, _ROUNDS + 1):
        syms = F.filter(F.split(F.col("seq"), " "), lambda s: s != "")
        pairs = w.select("cnt", F.explode(word_shingles(syms, 2)).alias("pair"))
        top = (
            pairs.groupBy("pair")
            .agg(F.sum("cnt").cast("long").alias("total"))
            .orderBy(F.col("total").desc(), F.col("pair"))
            .limit(1)
        )
        best = top.select(
            F.col("pair").alias("_pat"),
            F.replace(F.col("pair"), F.lit(" "), F.lit("")).alias("_rep"),
        )
        w = w.crossJoin(F.broadcast(best)).select(
            "word",
            "cnt",
            F.replace(
                F.col("seq"),
                F.concat(F.lit(" "), F.col("_pat"), F.lit(" ")),
                F.concat(F.lit(" "), F.col("_rep"), F.lit(" ")),
            ).alias("seq"),
        )
        # Each round's state is consumed twice (next round's pair agg +
        # next replace) and the replace chain is a narrow projection
        # ReuseExchange cannot share, so the recompute compounds per
        # round. Persisting the vocab-scale state is a measured 3.6x
        # win (7.7s -> 2.2s at sf0.1, round 5 A/B).
        w = w.persist(StorageLevel.MEMORY_AND_DISK)
    wlen = w.select(
        "word",
        (
            F.size(F.filter(F.split(F.col("seq"), " "), lambda s: s != "")) - 1
        ).alias("n_sub"),
    )
    doctoks = docs.select(
        F.col("doc_id").alias("doc"),
        F.explode(tokens_col(F.lower(F.col("text")))).alias("word"),
    )
    per_doc = (
        doctoks.join(wlen, "word")
        .groupBy("doc")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("n_sub").cast("long").alias("n_subwords"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, docs.doc_id == per_doc.doc, "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_words"), F.lit(0).cast("long")).alias("n_words"),
            F.coalesce(F.col("n_subwords"), F.lit(0).cast("long")).alias(
                "n_subwords"
            ),
        )
        .orderBy("doc_id")
    )

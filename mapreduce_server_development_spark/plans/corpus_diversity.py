"""Corpus diversity analytics: lexical richness and source JS drift.

Round-6 continuation of the corpus_stats family (same cross-engine
discipline — see ``corpus_stats.py``): whitespace tokenization via one
shared convention (``functions/text.tokens_col`` ↔ DuckDB
``string_split`` + ``list_filter``), per-term float contributions
rounded to fixed-point integers BEFORE any cross-row sum
(round-before-sum), closed-form readouts as single shared SQL texts.

No reference counterpart (the reference's text plane is wc/grep
executables); public-knowledge measures (Shannon entropy, Simpson
diversity, type-token ratio / hapax rate, Jensen–Shannon divergence —
Lin 1991).

Scale notes per query docstring; nothing here shuffles wider than the
(source × vocabulary) histogram.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens_col
from ..sources.tables import load_table
from .registry import query

# ---------------------------------------------------------------------------
# q_token_diversity — lexical-richness panel per source
# ---------------------------------------------------------------------------

#: Per-(source, token) entropy term c·log2(c), rounded to e6 integer
#: units before the per-source sum (the q_char_entropy discipline).
_TD_TERM = "CAST(round(c * log2(c) * 1000000) AS BIGINT)"

_TD_FINAL = (
    "source",
    "CAST(n AS BIGINT) AS n_tokens",
    "CAST(v AS BIGINT) AS vocab",
    "CAST(hapax AS BIGINT) AS hapax",
    "round(CAST(v AS DOUBLE) / CAST(n AS DOUBLE), 6) + 0.0 AS ttr",
    "round(CAST(hapax AS DOUBLE) / CAST(v AS DOUBLE), 6) + 0.0"
    " AS hapax_rate",
    "round(log2(CAST(n AS DOUBLE))"
    " - (CAST(s_e6 AS DOUBLE) / 1000000.0) / CAST(n AS DOUBLE), 4) + 0.0"
    " AS entropy_bits",
    "round(CAST(simp AS DOUBLE)"
    " / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)), 6) + 0.0"
    " AS simpson_index",
)


@query(
    "q_token_diversity",
    oracle=f"""
    WITH toks AS (
        SELECT source,
               unnest(list_filter(string_split(lower(text), ' '),
                                  t -> t <> '')) AS tok
        FROM documents
    ),
    tc AS (
        SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
        FROM toks GROUP BY source, tok
    ),
    s AS (
        SELECT source,
               SUM(c) AS n,
               COUNT(*) AS v,
               SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS hapax,
               SUM({_TD_TERM}) AS s_e6,
               SUM(CAST(c AS HUGEINT) * (c - 1)) AS simp
        FROM tc GROUP BY source
    )
    SELECT {", ".join(_TD_FINAL)} FROM s
    """,
)
def q_token_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-richness panel per source: token count, vocabulary
    size, type-token ratio, hapax-legomenon rate, Shannon token
    entropy, and Simpson repeat-probability — the per-source quality
    fingerprint a corpus curator reads before mixing (low entropy /
    high Simpson ⇒ templated or boilerplate-heavy source; high hapax
    rate ⇒ noisy OCR-like vocabulary).

    Determinism: all counts exact; the only float per-term
    contribution (c·log2 c) is rounded to e6 integers before its sum
    (round-before-sum); Simpson's Σc(c−1)/(N(N−1)) is exact-integer
    until the final division; readouts are one shared text.

    Scale: explode → (source, token) hash aggregate with map-side
    combine (shuffle is the source×vocab histogram, not the token
    stream), then a |sources|-row rollup.
    """
    docs = load_table(spark, sf_dir, "documents")
    tc = (
        docs.select(
            "source",
            F.explode(tokens_col(F.lower(F.col("text")))).alias("tok"),
        )
        .groupBy("source", "tok")
        .agg(F.count("*").cast("long").alias("c"))
    )
    s = tc.groupBy("source").agg(
        F.sum("c").cast("long").alias("n"),
        F.count("*").cast("long").alias("v"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("long").alias(
            "hapax"
        ),
        F.sum(F.expr(_TD_TERM)).cast("long").alias("s_e6"),
        F.sum(F.col("c").cast("decimal(38,0)") * (F.col("c") - 1)).alias(
            "simp"
        ),
    )
    return s.selectExpr(*_TD_FINAL)


# ---------------------------------------------------------------------------
# q_js_divergence — pairwise Jensen–Shannon drift between sources
# ---------------------------------------------------------------------------

#: Per-(pair, token) JS contribution p·log2(2p/(p+q)) + q·log2(2q/(p+q))
#: with the one-sided limits (log2(2)=1) made explicit, rounded to e12
#: integer units before the per-pair sum. p and q are divisions of
#: exact integers evaluated from the same text in both engines.
_JS_P = "(CAST(ca AS DOUBLE) / CAST(na AS DOUBLE))"
_JS_Q = "(CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))"
_JS_TERM = (
    "CAST(round(CASE"
    f" WHEN ca > 0 AND cb > 0 THEN"
    f" {_JS_P} * log2(2.0 * {_JS_P} / ({_JS_P} + {_JS_Q}))"
    f" + {_JS_Q} * log2(2.0 * {_JS_Q} / ({_JS_P} + {_JS_Q}))"
    f" WHEN ca > 0 THEN {_JS_P}"
    f" ELSE {_JS_Q} END * 1000000000000) AS BIGINT)"
)

_JS_FINAL = (
    "sa AS source_a",
    "sb AS source_b",
    "CAST(common AS BIGINT) AS n_common_tokens",
    "round(0.5 * CAST(t_e12 AS DOUBLE) / 1000000000000.0, 6) + 0.0"
    " AS js_divergence_bits",
)


@query(
    "q_js_divergence",
    oracle=f"""
    WITH toks AS (
        SELECT source,
               unnest(list_filter(string_split(lower(text), ' '),
                                  t -> t <> '')) AS tok
        FROM documents
    ),
    tc AS (
        SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
        FROM toks GROUP BY source, tok
    ),
    ns AS (SELECT source, SUM(c) AS n FROM tc GROUP BY source),
    pairs AS (
        SELECT a.source AS sa, b.source AS sb
        FROM ns a JOIN ns b ON a.source < b.source
    ),
    cell AS (
        SELECT p.sa, p.sb, t.tok,
               SUM(CASE WHEN t.source = p.sa THEN t.c ELSE 0 END) AS ca,
               SUM(CASE WHEN t.source = p.sb THEN t.c ELSE 0 END) AS cb
        FROM pairs p
        JOIN tc t ON t.source = p.sa OR t.source = p.sb
        GROUP BY p.sa, p.sb, t.tok
    ),
    terms AS (
        SELECT c.sa, c.sb,
               SUM(CASE WHEN ca > 0 AND cb > 0 THEN 1 ELSE 0 END) AS common,
               SUM({_JS_TERM}) AS t_e12
        FROM cell c
        JOIN ns a ON a.source = c.sa
        JOIN ns b ON b.source = c.sb
        CROSS JOIN (SELECT a.n AS na, b.n AS nb) AS _
        GROUP BY c.sa, c.sb
    )
    SELECT {", ".join(_JS_FINAL)} FROM terms
    """,
)
def q_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen–Shannon divergence (bits) between every two
    sources' unigram distributions — the symmetric, bounded [0,1]
    companion to q_source_drift's KL: the standard "which sources are
    interchangeable / which add diversity" matrix for planning a
    training mix. Also reports the shared-vocabulary size per pair.

    Determinism: per-(pair, token) JS contributions are evaluated from
    ONE shared text over exact integer counts and rounded to e12 units
    before the per-pair integer sum (round-before-sum; terms are ≤ p,
    so the e12 grid loses nothing at 6-decimal output).

    Scale: the pair fan-out rides the (source × vocab) HISTOGRAM, not
    the token stream — each histogram row joins the broadcast
    |sources|²/2 pair list (nested-loop on an OR predicate, linear
    scan with a bounded multiplier), then one hash aggregate keyed by
    (pair, token) and a |pairs|-row rollup. Per-source totals join by
    broadcast.
    """
    docs = load_table(spark, sf_dir, "documents")
    tc = (
        docs.select(
            "source",
            F.explode(tokens_col(F.lower(F.col("text")))).alias("tok"),
        )
        .groupBy("source", "tok")
        .agg(F.count("*").cast("long").alias("c"))
    )
    ns = tc.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    a = ns.selectExpr("source AS sa", "n AS na")
    b = ns.selectExpr("source AS sb", "n AS nb")
    pairs = a.join(b, F.col("sa") < F.col("sb"))
    cell = (
        tc.join(
            F.broadcast(pairs),
            (tc.source == F.col("sa")) | (tc.source == F.col("sb")),
        )
        .groupBy("sa", "sb", "na", "nb", "tok")
        .agg(
            F.sum(
                F.when(F.col("source") == F.col("sa"), F.col("c")).otherwise(0)
            )
            .cast("long")
            .alias("ca"),
            F.sum(
                F.when(F.col("source") == F.col("sb"), F.col("c")).otherwise(0)
            )
            .cast("long")
            .alias("cb"),
        )
    )
    terms = cell.groupBy("sa", "sb").agg(
        F.sum(F.when((F.col("ca") > 0) & (F.col("cb") > 0), 1).otherwise(0))
        .cast("long")
        .alias("common"),
        F.sum(F.expr(_JS_TERM)).cast("long").alias("t_e12"),
    )
    return terms.selectExpr(*_JS_FINAL)


# ---------------------------------------------------------------------------
# q_doclen_hist — log2-binned token-length histogram per language
# ---------------------------------------------------------------------------

_DLH_FINAL = (
    "lang",
    "CAST(bucket AS BIGINT) AS log2_tokens",
    "CAST(n_docs AS BIGINT) AS n_docs",
    "CAST(min_tokens AS BIGINT) AS min_tokens",
    "CAST(max_tokens AS BIGINT) AS max_tokens",
    "CAST(sum_tokens AS BIGINT) AS sum_tokens",
)


@query(
    "q_doclen_hist",
    oracle=f"""
    WITH lens AS (
        SELECT lang,
               CAST(len(list_filter(string_split(lower(text), ' '),
                                    t -> t <> '')) AS BIGINT) AS n_tok
        FROM documents
    ),
    binned AS (
        SELECT lang, length(bin(n_tok)) - 1 AS bucket, n_tok
        FROM lens WHERE n_tok > 0
    ),
    s AS (
        SELECT lang, bucket, COUNT(*) AS n_docs,
               MIN(n_tok) AS min_tokens, MAX(n_tok) AS max_tokens,
               SUM(n_tok) AS sum_tokens
        FROM binned GROUP BY lang, bucket
    )
    SELECT {", ".join(_DLH_FINAL)} FROM s ORDER BY lang, log2_tokens
    """,
)
def q_doclen_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-binned document-length (token-count) histogram per
    language — the corpus-shape panel behind sequence-packing and
    truncation decisions (which length buckets dominate each
    language, where the outlier mass sits). Zero-token documents are
    excluded in both engines (log2 undefined; they're q_quality_floor
    territory).

    Determinism: token counts, bucket ids (shared ``length(bin(n))−1``
    floor-log2 text), and all cell statistics are exact integers.

    Scale: one zero-shuffle map to (lang, n_tok), one hash aggregate
    over |lang| × ~32 buckets — map-side combine collapses everything
    before the (tiny) shuffle.
    """
    docs = load_table(spark, sf_dir, "documents")
    lens = docs.select(
        "lang",
        F.size(tokens_col(F.lower(F.col("text")))).cast("long").alias(
            "n_tok"
        ),
    )
    s = (
        lens.filter(F.col("n_tok") > 0)
        .selectExpr("lang", "length(bin(n_tok)) - 1 AS bucket", "n_tok")
        .groupBy("lang", "bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_tok").alias("min_tokens"),
            F.max("n_tok").alias("max_tokens"),
            F.sum("n_tok").alias("sum_tokens"),
        )
    )
    return s.selectExpr(*_DLH_FINAL).orderBy("lang", "log2_tokens")


# ---------------------------------------------------------------------------
# q_keyword_rake — RAKE keyword extraction (degree/frequency scoring)
# ---------------------------------------------------------------------------

#: Minimal stopword inventory (public-knowledge RAKE uses a stoplist;
#: this one is a fixed literal so both engines share it exactly).
_RAKE_STOPS = (
    "the a an and or of to in is are was were be for on with as at by "
    "it this that from").split()
_RAKE_TOP = 20

_RAKE_FINAL = (
    "phrase",
    "CAST(n_occurrences AS BIGINT) AS n_occurrences",
    "CAST(score_e6 AS BIGINT) AS score_e6",
)


def _rake_stop_sql(col: str) -> str:
    inlist = ", ".join(f"'{w}'" for w in _RAKE_STOPS)
    return f"{col} IN ({inlist})"


@query(
    "q_keyword_rake",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, ts[t.i] AS tok, t.i AS pos,
               CASE WHEN {_rake_stop_sql('ts[t.i]')} THEN 1 ELSE 0 END
                   AS stop
        FROM (
            SELECT doc_id,
                   list_filter(string_split(lower(text), ' '), x -> x <> '')
                       AS ts
            FROM documents
        ), UNNEST(range(1, len(ts) + 1)) AS t(i)
    ),
    marked AS (
        SELECT doc_id, tok, pos, stop,
               SUM(stop) OVER (PARTITION BY doc_id ORDER BY pos) AS pid
        FROM toks
    ),
    members AS (
        SELECT doc_id, pid, pos, tok FROM marked WHERE stop = 0
    ),
    plen AS (
        SELECT doc_id, pid, CAST(COUNT(*) AS BIGINT) AS len
        FROM members GROUP BY doc_id, pid
    ),
    wordstats AS (
        SELECT m.tok,
               CAST(COUNT(*) AS BIGINT) AS freq,
               CAST(SUM(p.len) AS BIGINT) AS deg
        FROM members m JOIN plen p
          ON p.doc_id = m.doc_id AND p.pid = m.pid
        GROUP BY m.tok
    ),
    wscore AS (
        SELECT tok, 1000000 * deg // freq AS w_e6 FROM wordstats
    ),
    phrases AS (
        SELECT m.doc_id, m.pid,
               string_agg(m.tok, ' ' ORDER BY m.pos) AS phrase,
               SUM(w.w_e6) AS score_e6
        FROM members m JOIN wscore w ON w.tok = m.tok
        GROUP BY m.doc_id, m.pid
    )
    SELECT phrase,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(MAX(score_e6) AS BIGINT) AS score_e6
    FROM phrases
    GROUP BY phrase
    ORDER BY score_e6 DESC, phrase
    LIMIT {_RAKE_TOP}
    """,
)
def q_keyword_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases
    are maximal stopword-free token runs; each word scores
    degree/frequency (degree = total length of phrases containing it,
    so words that live in long multi-word terms outrank bare frequent
    words), a phrase scores the sum of its word scores, and the
    corpus-level top-{_RAKE_TOP} phrases come back with occurrence
    counts — the lightweight keyword/terminology miner that needs no
    model.

    Determinism: word scores are e6 integer floor-divs of exact
    counts; phrase scores are integer sums; the top-k order ties on
    the phrase string.

    Scale: phrase segmentation is ONE per-document window (running
    stopword count over positions — partitioned by doc_id, so
    parallelism is document-count wide, the opposite of the
    low-cardinality window trap); word stats and phrase scores are
    token-keyed hash joins/aggregates; the final top-k is
    TakeOrderedAndProject.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(tokens_col(F.lower(F.col("text")))).alias("pos", "tok"),
    ).withColumn(
        "stop",
        F.when(F.col("tok").isin(*_RAKE_STOPS), 1).otherwise(0),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = toks.withColumn("pid", F.sum("stop").over(w))
    members = marked.filter(F.col("stop") == 0).select(
        "doc_id", "pid", "pos", "tok"
    )
    plen = members.groupBy("doc_id", "pid").agg(
        F.count("*").cast("long").alias("len")
    )
    wordstats = (
        members.join(plen, ["doc_id", "pid"])
        .groupBy("tok")
        .agg(
            F.count("*").cast("long").alias("freq"),
            F.sum("len").cast("long").alias("deg"),
        )
    )
    wscore = wordstats.selectExpr("tok", "1000000 * deg DIV freq AS w_e6")
    phrases = (
        members.join(wscore, "tok")
        .groupBy("doc_id", "pid")
        .agg(
            F.concat_ws(
                " ", F.array_sort(F.collect_list(F.struct("pos", "tok")))
                .getField("tok")
            ).alias("phrase"),
            F.sum("w_e6").cast("long").alias("score_e6"),
        )
    )
    return (
        phrases.groupBy("phrase")
        .agg(
            F.count("*").cast("long").alias("n_occurrences"),
            F.max("score_e6").cast("long").alias("score_e6"),
        )
        .selectExpr(*_RAKE_FINAL)
        .orderBy(F.col("score_e6").desc(), "phrase")
        .limit(_RAKE_TOP)
    )

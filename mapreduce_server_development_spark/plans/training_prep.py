"""Training-data preparation queries: sequence packing.

Packing documents into fixed-capacity training sequences is the last
step of every LLM data pipeline (after dedup/filter/mix): assign each
document to a sequence bin so each bin holds ~capacity tokens. The
deterministic distributed formulation is a global prefix sum over the
document order — bin = tokens-before-this-doc div capacity — which the
naive window (``SUM OVER (ORDER BY doc_id)`` with no partition) would
execute on ONE task; ``functions/prefix.py global_running_sum`` runs
it as the two-phase parallel scan instead.

Reference parity: no counterpart (the reference has no ordered
aggregate surface); additive LLM-pipeline plane per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.prefix import global_running_sum
from ..functions.text import tokens_col
from ..sources.tables import load_table
from .registry import query

#: Tokens per training sequence (GPT-2-style context length).
SEQ_CAPACITY = 2048


@query(
    "q_seq_packing",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                    AS BIGINT) AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT doc_id, n_tokens,
               SUM(n_tokens) OVER (ORDER BY doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS cum
        FROM t
    )
    SELECT doc_id, n_tokens,
           CAST((cum - n_tokens) // {SEQ_CAPACITY} AS BIGINT) AS seq_bin,
           CAST(cum - n_tokens - ((cum - n_tokens) // {SEQ_CAPACITY})
                * {SEQ_CAPACITY} AS BIGINT) AS bin_offset
    FROM c
    ORDER BY doc_id
    """,
)
def q_seq_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sequence packing: doc → bin floor(prefix/capacity).

    Documents are laid out in doc_id order; a document starts at global
    token offset ``prefix = running_sum - n_tokens`` and is assigned to
    bin ``prefix div capacity`` with in-bin offset ``prefix mod
    capacity`` (greedy contiguous fill — a document straddling a
    boundary belongs to the bin where it starts, the standard
    pack-then-truncate layout). The prefix sum is the two-phase
    parallel scan, never a single-task window — the plan a 100 TB
    corpus needs.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.size(tokens_col(F.col("text"))).cast("long").alias("n_tokens"),
    )
    c = global_running_sum(t, "doc_id", "n_tokens", out_col="cum")
    # Integer `div`, not float `/`: global token counts pass 2^53 long
    # before 100 TB does, and a double quotient would corrupt bins.
    return c.select(
        "doc_id",
        "n_tokens",
        F.expr(f"(cum - n_tokens) div {SEQ_CAPACITY}").alias("seq_bin"),
        F.expr(f"(cum - n_tokens) % {SEQ_CAPACITY}").alias("bin_offset"),
    )  # no trailing sort: document-linear output


def _pipeline_oracle() -> str:
    from .sampling import _bucket_sql

    b = _bucket_sql("split", "doc_id")
    return f"""
    WITH keep AS (
        SELECT md5(text) AS h, MIN(doc_id) AS k FROM documents GROUP BY 1
    ),
    clean AS (
        SELECT d.doc_id, d.text
        FROM documents d JOIN keep ON md5(d.text) = keep.h AND d.doc_id = keep.k
    ),
    tagged AS (
        SELECT doc_id,
               CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                    AS BIGINT) AS n_tokens,
               CASE WHEN {b} < 800 THEN 'train'
                    WHEN {b} < 900 THEN 'val'
                    ELSE 'test' END AS split
        FROM clean
    ),
    packed AS (
        SELECT doc_id,
               (SUM(n_tokens) OVER (ORDER BY doc_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) - n_tokens)
                   // {SEQ_CAPACITY} AS seq_bin
        FROM tagged WHERE split = 'train'
    )
    SELECT t.doc_id, t.split, t.n_tokens, CAST(p.seq_bin AS BIGINT) AS seq_bin
    FROM tagged t LEFT JOIN packed p USING (doc_id)
    ORDER BY t.doc_id
    """


@query("q_pipeline_e2e", oracle=_pipeline_oracle())
def q_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data pipeline in ONE composed plan:
    exact-dedup (keep the min-id copy) → reproducible 80/10/10 split →
    token counting → sequence packing of the train split. Each stage
    is the already-audited operator; the query exists to prove they
    COMPOSE — the canonical corpus-assembly flow a pipeline user runs
    end to end, with one full-recompute oracle over the whole chain.

    Plan: dedup is one md5-keyed agg + join; the split is a zero-
    shuffle hash filter; packing is the two-phase prefix scan on the
    train subset only. Non-train docs carry a NULL seq_bin.
    """

    from ..functions.dedup import exact_dedup

    docs = load_table(spark, sf_dir, "documents")
    # Reuse the audited operator (one canonical-copy rule in the repo).
    keep = exact_dedup(docs).select(F.col("canonical_doc").alias("doc_id"))
    clean = docs.join(keep, "doc_id", "left_semi").select("doc_id", "text")

    from .sampling import hash_bucket

    b = hash_bucket("split", F.col("doc_id"))
    tagged = clean.select(
        "doc_id",
        F.size(tokens_col(F.col("text"))).cast("long").alias("n_tokens"),
        F.when(b < 800, "train").when(b < 900, "val").otherwise("test").alias(
            "split"
        ),
    )
    train = tagged.filter(F.col("split") == "train").select("doc_id", "n_tokens")
    packed = global_running_sum(train, "doc_id", "n_tokens", out_col="cum").select(
        "doc_id", F.expr(f"(cum - n_tokens) div {SEQ_CAPACITY}").alias("seq_bin")
    )
    return (
        tagged.join(packed, "doc_id", "left")
        .select("doc_id", "split", "n_tokens", "seq_bin")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q_mlm_masking — deterministic BERT-style token masking
# ---------------------------------------------------------------------------

#: Permille of token positions masked (BERT's classic 15%).
MLM_RATE_PERMILLE = 150


def _mlm_oracle() -> str:
    from .sampling import _bucket_sql

    b = _bucket_sql(
        "mlm", "CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)"
    )
    return f"""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_filter(range(1, len(toks) + 1),
                                i -> {b} < {MLM_RATE_PERMILLE})) AS BIGINT)
               AS n_masked,
           array_to_string(
               list_transform(range(1, len(toks) + 1),
                              i -> CASE WHEN {b} < {MLM_RATE_PERMILLE}
                                        THEN '[MASK]' ELSE toks[i] END),
               ' ') AS masked_text
    FROM t ORDER BY doc_id
    """


@query("q_mlm_masking", oracle=_mlm_oracle())
def q_mlm_masking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MLM-style corpus masking (Devlin et al. 2018,
    BERT §3.1): mask 15% of token POSITIONS, where a position's fate
    is ``md5('mlm:' || doc_id || ':' || pos) mod 1000 < 150`` — the
    same hash-Bernoulli discipline as the sampling family
    (``plans/sampling.py``), so every engine, rerun, and incremental
    batch masks the identical positions (``df.sample``-style RNG
    masking is irreproducible across engines/partitionings and can't
    be oracle-checked).

    Tokenization matches q_seq_packing (literal-space split, empties
    removed, case preserved — this produces training text, so no
    lowering).

    Scale: a pure scan → project plan — ZERO shuffles, all
    JVM-side higher-order array functions (transform/filter/
    aggregate), no Python anywhere. Masking 100 TB costs one pass
    with column pruning at the parquet scan; per-row work is linear
    in the token count.
    """
    from .sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col("text")

    def flag(pos):  # pos is the 1-based position (hash keys are 1-based)
        key = F.concat(
            F.col("doc_id").cast("string"),
            F.lit(":"),
            pos.cast("string"),
        )
        return hash_bucket("mlm", key) < MLM_RATE_PERMILLE

    # The per-position hash-Bernoulli flag is the dominant cost (one
    # md5 per token position, interpreted inside the HOF lambda).
    # Compute the flags array ONCE and derive both n_masked and the
    # masked text from it — the n_masked filter and the masking
    # transform each re-evaluated the md5 chain per position before
    # (r11: 6.96s -> see OPTIMIZATION_r11.md; results bit-identical).
    flags = F.transform("toks", lambda t, i: flag(i + 1))
    return (
        docs.select(
            "doc_id",
            toks.alias("toks"),
        )
        .select("doc_id", "toks", flags.alias("flags"))
        .select(
            "doc_id",
            F.size("toks").cast("long").alias("n_tokens"),
            F.size(F.filter("flags", lambda f: f)).cast("long").alias(
                "n_masked"
            ),
            F.array_join(
                F.zip_with(
                    "toks",
                    "flags",
                    lambda t, f: F.when(f, F.lit("[MASK]")).otherwise(t),
                ),
                " ",
            ).alias("masked_text"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q_negative_sampling — deterministic negatives for contrastive pairs
# ---------------------------------------------------------------------------

_NEG_K = 4  # negative candidates drawn per positive pair

_NEG_FINAL = (
    "CAST(j AS BIGINT) AS draw",
    "CAST(n_cand AS BIGINT) AS n_candidates",
    "CAST(n_coll AS BIGINT) AS n_collisions",
    "CAST(n_cand - n_coll AS BIGINT) AS n_negatives",
    "CAST(s_part AS BIGINT) AS neg_part_sum",
    "CAST(n_parts AS BIGINT) AS n_distinct_parts",
)


def _neg_oracle() -> str:
    from .sketches import _hexval_sql

    h = _hexval_sql(
        "md5('neg:' || CAST(c AS VARCHAR) || ':' || CAST(p AS VARCHAR)"
        " || ':' || CAST(j AS VARCHAR))",
        12,
    )
    return f"""
    WITH pos AS (
        SELECT DISTINCT o_custkey AS c, l_partkey AS p
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    np AS (SELECT COUNT(*) AS np FROM part),
    cand AS (
        SELECT c, p, j, 1 + {h} % np.np AS cand_part
        FROM pos CROSS JOIN np
        CROSS JOIN (SELECT unnest(range({_NEG_K})) AS j)
    ),
    marked AS (
        SELECT cand.j, cand.cand_part,
               CASE WHEN pos2.p IS NULL THEN 0 ELSE 1 END AS coll
        FROM cand LEFT JOIN pos pos2
          ON pos2.c = cand.c AND pos2.p = cand.cand_part
    ),
    s AS (
        SELECT j, COUNT(*) AS n_cand, SUM(coll) AS n_coll,
               SUM(CASE WHEN coll = 0 THEN cand_part ELSE 0 END) AS s_part,
               COUNT(DISTINCT CASE WHEN coll = 0 THEN cand_part END)
                   AS n_parts
        FROM marked GROUP BY j
    )
    SELECT {", ".join(_NEG_FINAL)} FROM s ORDER BY draw
    """


@query("q_negative_sampling", oracle=_neg_oracle())
def q_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training pairs:
    for every observed (customer, part) purchase pair, draw _NEG_K=4
    candidate negative parts from the uniform md5 stream
    keyed by (customer, part, draw), and reject candidates the
    customer actually bought (a true anti-membership pass, not a
    hope-it-misses heuristic). The audit readout reports, per draw
    lane: candidates, collisions rejected, surviving negatives, their
    exact part-id sum (a replayable checksum), and distinct parts
    touched — the corpus-builder's verification that the negative
    distribution is uniform and collision handling is exact.

    Determinism: candidates are md5-derived (engine-replayable by the
    shared-seed-text convention); all outputs are exact integer
    counts/sums.

    Scale: positives are one distinct on the order-line join; the ×K
    explode rides it; collision marking is ONE hash equi-join on
    (customer, candidate_part) against the positives relation — both
    sides data-scale, co-partitioned by the join key, no broadcast of
    anything unbounded. |part| arrives as a broadcast scalar.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    pos = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p")
        )
        .distinct()
    )
    np_ = part.agg(F.count("*").alias("np"))
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("neg:"),
                    F.col("c").cast("string"),
                    F.lit(":"),
                    F.col("p").cast("string"),
                    F.lit(":"),
                    F.col("j").cast("string"),
                )
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    cand = (
        pos.crossJoin(F.broadcast(np_))
        .select(
            "c",
            "p",
            F.explode(F.sequence(F.lit(0), F.lit(_NEG_K - 1))).alias("j"),
            "np",
        )
        .withColumn("cand_part", 1 + h % F.col("np"))
    )
    pos2 = pos.select(F.col("c"), F.col("p").alias("pp"))
    marked = cand.join(
        pos2,
        (cand.c == pos2.c) & (cand.cand_part == pos2.pp),
        "left",
    ).select(
        "j",
        "cand_part",
        F.when(F.col("pp").isNull(), 0).otherwise(1).alias("coll"),
    )
    s = marked.groupBy("j").agg(
        F.count("*").alias("n_cand"),
        F.sum("coll").alias("n_coll"),
        F.sum(
            F.when(F.col("coll") == 0, F.col("cand_part")).otherwise(0)
        ).alias("s_part"),
        F.countDistinct(
            F.when(F.col("coll") == 0, F.col("cand_part"))
        ).alias("n_parts"),
    )
    return s.selectExpr(*_NEG_FINAL).orderBy("draw")


# ---------------------------------------------------------------------------
# q_curriculum_order — competence-based curriculum pacing by token rarity
# ---------------------------------------------------------------------------

@query(
    "q_curriculum_order",
    oracle="""
    WITH toks AS (
        SELECT doc_id AS doc,
               unnest(list_filter(string_split(lower(text), ' '), t -> t <> ''))
                   AS term
        FROM documents
    ),
    vocab AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY term
    ),
    total AS (SELECT CAST(SUM(cnt) AS BIGINT) AS t FROM vocab),
    surprisal AS (
        SELECT term,
               CAST(round(-ln(CAST(cnt AS DOUBLE) / t) * 1000000) AS BIGINT)
                   AS s_micro
        FROM vocab CROSS JOIN total
    ),
    per_doc AS (
        SELECT toks.doc,
               CAST(COUNT(*) AS BIGINT) AS n_toks,
               CAST(round(CAST(SUM(s_micro) AS DOUBLE) / COUNT(*)) AS BIGINT)
                   AS diff_micro
        FROM toks JOIN surprisal USING (term)
        GROUP BY toks.doc
    ),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM per_doc),
    ranked AS (
        SELECT doc, n_toks, diff_micro,
               row_number() OVER (ORDER BY diff_micro, doc) AS rn
        FROM per_doc
    ),
    stepped AS (
        SELECT *, CAST(least(9, ((rn - 1) * 10) // n_docs) AS BIGINT) AS step
        FROM ranked CROSS JOIN nd
    )
    SELECT step,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           round(MIN(diff_micro) / 1000000.0, 6) AS min_difficulty,
           round(MAX(diff_micro) / 1000000.0, 6) AS max_difficulty,
           round(CAST(SUM(diff_micro) AS BIGINT)
                 / (COUNT(*) * 1000000.0), 6) AS avg_difficulty,
           round(CAST(SUM(n_toks) AS BIGINT) / (COUNT(*) * 1.0), 2)
               AS avg_tokens
    FROM stepped
    GROUP BY step
    ORDER BY step
    """,
)
def q_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Competence-based curriculum pacing (Platanios et al., NAACL
    2019): difficulty = a document's mean token SURPRISAL under the
    corpus unigram LM (``-ln(count/total)`` — rare-word documents are
    hard), documents globally ordered easy -> hard, and the schedule
    summarized as ten pacing deciles (the "competence" steps a trainer
    would unlock in order).

    Cross-engine discipline: per-token surprisal is rounded to integer
    MICRO-units, per-doc difficulty is the rounded integer mean of
    those BIGINTs, and the global order is (diff_micro, doc_id) — all
    integers, so the curriculum order is bit-identical across engines.
    Decile stats are derived from integer sums only.

    Plan: one explode -> vocab hash-agg (the unigram LM), a token ->
    vocab equi-join (shuffle on term — vocab is Zipf-bounded but not
    broadcastable at 100 TB), a per-doc agg, then the two-phase
    ``global_row_number`` scan for the global curriculum rank (never a
    single-task ORDER BY window), and a 10-row decile agg.
    """
    from ..functions.prefix import global_row_number

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.col("doc_id").alias("doc"),
        F.explode(tokens_col(F.lower(F.col("text")))).alias("term"),
    )
    vocab = toks.groupBy("term").agg(F.count("*").cast("long").alias("cnt"))
    total = vocab.agg(F.sum("cnt").cast("long").alias("t"))
    surprisal = vocab.crossJoin(F.broadcast(total)).select(
        "term",
        F.round(-F.log(F.col("cnt").cast("double") / F.col("t")) * 1000000)
        .cast("long")
        .alias("s_micro"),
    )
    per_doc = (
        toks.join(surprisal, "term")
        .groupBy("doc")
        .agg(
            F.count("*").cast("long").alias("n_toks"),
            F.round(F.sum("s_micro").cast("double") / F.count("*"))
            .cast("long")
            .alias("diff_micro"),
        )
    )
    nd = per_doc.agg(F.count("*").cast("long").alias("n_docs"))
    ranked = global_row_number(per_doc, ["diff_micro", "doc"], out_col="rn")
    stepped = ranked.crossJoin(F.broadcast(nd)).select(
        "diff_micro",
        "n_toks",
        F.least(
            F.lit(9).cast("long"),
            F.floor((F.col("rn") - 1) * 10 / F.col("n_docs")),
        ).alias("step"),
    )
    return (
        stepped.groupBy("step")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.round(F.min("diff_micro") / F.lit(1000000.0), 6).alias("min_difficulty"),
            F.round(F.max("diff_micro") / F.lit(1000000.0), 6).alias("max_difficulty"),
            F.round(
                F.sum("diff_micro").cast("long") / (F.count("*") * F.lit(1000000.0)), 6
            ).alias("avg_difficulty"),
            F.round(F.sum("n_toks").cast("long") / (F.count("*") * F.lit(1.0)), 2).alias(
                "avg_tokens"
            ),
        )
        .orderBy("step")
    )


# ---------------------------------------------------------------------------
# q_fim_transform — deterministic fill-in-the-middle training transform
# ---------------------------------------------------------------------------

#: Permille of documents FIM-transformed (the common 50% FIM rate).
FIM_RATE_PERMILLE = 500


def _fim_oracle() -> str:
    from .sampling import _bucket_sql

    gate = _bucket_sql("fim", "doc_id")
    b1 = _bucket_sql("fima", "doc_id")
    b2 = _bucket_sql("fimb", "doc_id")
    return f"""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
        FROM documents
    ),
    sized AS (
        SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n,
               CASE WHEN {gate} < {FIM_RATE_PERMILLE} THEN 1 ELSE 0 END
                   AS applied
        FROM t WHERE len(toks) > 0
    ),
    cut AS (
        SELECT doc_id, toks, n, applied,
               CAST(1 + ({b1} * (n - 1)) // 1000 AS BIGINT) AS p1
        FROM sized
    ),
    cut2 AS (
        SELECT doc_id, toks, n, applied, p1,
               CAST(p1 + ({b2} * (n - p1)) // 1000 AS BIGINT) AS p2
        FROM cut
    ),
    pieces AS (
        SELECT doc_id, n, applied,
               CASE WHEN applied = 1 THEN p1 ELSE n END AS n_prefix,
               CASE WHEN applied = 1 THEN p2 - p1 ELSE 0 END AS n_middle,
               CASE WHEN applied = 1 THEN n - p2 ELSE 0 END AS n_suffix,
               CASE WHEN applied = 1 THEN
                   md5(array_to_string(
                       ['<PRE>'] || toks[1:p1]
                       || ['<SUF>'] || toks[p2 + 1:n]
                       || ['<MID>'] || toks[p1 + 1:p2], ' '))
               ELSE md5(array_to_string(toks, ' '))
               END AS psm_hash
        FROM cut2
    )
    SELECT doc_id, CAST(applied AS BIGINT) AS applied,
           CAST(n_prefix AS BIGINT) AS n_prefix,
           CAST(n_middle AS BIGINT) AS n_middle,
           CAST(n_suffix AS BIGINT) AS n_suffix,
           psm_hash
    FROM pieces
    ORDER BY doc_id
    """


@query("q_fim_transform", oracle=_fim_oracle())
def q_fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fill-in-the-middle (FIM) training transform
    (Bavarian et al. 2022, "Efficient Training of Language Models to
    Fill in the Middle"): 50% of documents are split at two
    hash-derived points and re-serialized in PSM order
    (``<PRE> prefix <SUF> suffix <MID> middle``) so the model learns
    infilling; the other 50% stay in causal order. Split points are
    pure functions of ``doc_id`` (the q_mlm_masking hash-Bernoulli
    discipline): ``p1 = 1 + (b1 * (n-1)) div 1000``,
    ``p2 = p1 + (b2 * (n - p1)) div 1000`` with b1/b2 the md5 buckets
    — every engine, rerun, and incremental batch transforms the
    identical documents identically (an ``rand()``-based FIM would be
    irreproducible and break dedup-by-hash downstream).

    Output is the per-doc transform ledger (piece sizes + md5 of the
    serialized PSM text). Plan: zero-shuffle per-row JVM array ops —
    the ideal ingest-transform class (q_rag_chunks' posture) — one
    pass, no Python, no state.
    """
    from .sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    toks_c = tokens_col(F.lower(F.col("text")))
    sized = docs.select(
        "doc_id", toks_c.alias("toks"), F.size(toks_c).cast("long").alias("n")
    ).filter(F.col("n") > 0)
    gate = hash_bucket("fim", F.col("doc_id"))
    b1 = hash_bucket("fima", F.col("doc_id"))
    b2 = hash_bucket("fimb", F.col("doc_id"))
    cut = sized.select(
        "doc_id",
        "toks",
        "n",
        F.when(gate < FIM_RATE_PERMILLE, 1).otherwise(0).alias("applied"),
    ).withColumn(
        "p1",
        (F.lit(1).cast("long") + F.floor((b1 * (F.col("n") - 1)) / 1000)).cast("long"),
    )
    cut2 = cut.withColumn(
        "p2",
        (F.col("p1") + F.floor((b2 * (F.col("n") - F.col("p1"))) / 1000)).cast("long"),
    )
    pre = F.slice(F.col("toks"), 1, F.col("p1").cast("int"))
    mid = F.expr("slice(toks, CAST(p1 + 1 AS INT), CAST(p2 - p1 AS INT))")
    suf = F.expr("slice(toks, CAST(p2 + 1 AS INT), CAST(n - p2 AS INT))")
    psm = F.concat_ws(
        " ",
        F.concat(
            F.array(F.lit("<PRE>")), pre,
            F.array(F.lit("<SUF>")), suf,
            F.array(F.lit("<MID>")), mid,
        ),
    )
    return (
        cut2.select(
            "doc_id",
            F.col("applied").cast("long").alias("applied"),
            F.when(F.col("applied") == 1, F.col("p1")).otherwise(F.col("n")).alias(
                "n_prefix"
            ),
            F.when(F.col("applied") == 1, F.col("p2") - F.col("p1"))
            .otherwise(F.lit(0).cast("long"))
            .alias("n_middle"),
            F.when(F.col("applied") == 1, F.col("n") - F.col("p2"))
            .otherwise(F.lit(0).cast("long"))
            .alias("n_suffix"),
            F.when(F.col("applied") == 1, F.md5(psm))
            .otherwise(F.md5(F.concat_ws(" ", F.col("toks"))))
            .alias("psm_hash"),
        )
        .orderBy("doc_id")
    )

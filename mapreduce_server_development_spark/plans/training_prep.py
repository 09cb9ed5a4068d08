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

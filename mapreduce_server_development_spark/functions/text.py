"""Text-analysis primitives: tokenization, shingling, language stopwords.

All column expressions here are built-in Spark SQL functions (JVM-side,
whole-stage-codegen) — no Python UDFs in any hot path. Shingling uses
higher-order array functions (transform/sequence/slice) so a 100 TB
documents table never leaves Tungsten until the explode.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the heuristic language-id
# operator. Deterministic and mirrored verbatim in the DuckDB oracle.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "los", "las", "y", "es"),
    "zh": ("de5", "le5", "shi4", "zai4", "he2"),
}


def tokens_col(text: Column | str, delimiter: str = " ") -> Column:
    """Tokens split on the LITERAL ``delimiter`` with empties removed
    (array<string>). The delimiter is regex-escaped before reaching
    ``split`` — a raw ``.`` or ``|`` would otherwise be interpreted as
    a Java regex and split on everything/nothing."""
    import re

    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, re.escape(delimiter)), lambda t: t != "")


def word_shingles(tokens: Column, n: int) -> Column:
    """Word n-gram shingles of a token array, as array<string>.

    ``transform(sequence(1, size-n+1), i -> concat_ws(' ', slice(tokens, i, n)))``
    — empty array when the document has fewer than ``n`` tokens (guarded:
    Spark's ``sequence(1, 0)`` would count *down*, so the empty case is
    explicit).
    """
    cnt = F.size(tokens) - (n - 1)
    idx = F.when(cnt >= 1, F.sequence(F.lit(1), cnt)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tokens, i, n)))

"""Text-analysis, dedup, and similarity building blocks (DataFrame-first)."""

from .text import tokens_col, word_shingles, STOPWORDS
from .dedup import (
    exact_dedup,
    minhash_band_pairs,
    minhash_near_dups,
    ngram_jaccard_pairs,
    simhash64,
    simhash_near_pairs,
)
from .similarity import cosine_topk, lsh_bucket_topk, lsh_plane_weights

__all__ = [
    "tokens_col",
    "word_shingles",
    "STOPWORDS",
    "exact_dedup",
    "minhash_band_pairs",
    "minhash_near_dups",
    "ngram_jaccard_pairs",
    "simhash64",
    "simhash_near_pairs",
    "cosine_topk",
    "lsh_bucket_topk",
    "lsh_plane_weights",
]

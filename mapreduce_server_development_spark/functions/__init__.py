"""Text-analysis, dedup, similarity, graph, and scan building blocks
(DataFrame-first)."""

from .text import tokens_col, word_shingles, STOPWORDS
from .dedup import (
    connected_components,
    connected_components_star,
    deletion_neighborhood_pairs,
    edit_distance_pairs,
    exact_dedup,
    minhash_band_pairs,
    minhash_near_dups,
    ngram_jaccard_pairs,
    passjoin_pairs,
    prefix_suffix_typo_pairs,
    simhash64,
    simhash_near_pairs,
)
from .graph import pagerank_micro
from .prefix import global_running_sum
from .similarity import (
    cosine_topk,
    lsh_bucket_topk,
    lsh_plane_weights,
    semantic_dedup_flags,
)

__all__ = [
    "tokens_col",
    "word_shingles",
    "STOPWORDS",
    "connected_components",
    "connected_components_star",
    "deletion_neighborhood_pairs",
    "edit_distance_pairs",
    "exact_dedup",
    "minhash_band_pairs",
    "minhash_near_dups",
    "ngram_jaccard_pairs",
    "passjoin_pairs",
    "prefix_suffix_typo_pairs",
    "simhash64",
    "simhash_near_pairs",
    "pagerank_micro",
    "global_running_sum",
    "cosine_topk",
    "lsh_bucket_topk",
    "lsh_plane_weights",
]

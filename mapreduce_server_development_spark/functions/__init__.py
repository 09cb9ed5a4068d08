"""Text-analysis, dedup, similarity, graph, and scan building blocks
(DataFrame-first)."""

from .chunked import chunked_trailing_window
from .dedup import (
    connected_components,
    connected_components_star,
    deletion_neighborhood_pairs,
    edit_distance_pairs,
    exact_dedup,
    incremental_jaccard_dedup,
    minhash_band_pairs,
    minhash_near_dups,
    ngram_jaccard_pairs,
    passjoin_pairs,
    prefix_suffix_typo_pairs,
    simhash64,
    simhash_near_pairs,
)
from .graph import count_triangles, orient_edges_by_degree, pagerank_micro
from .joins import asof_join, packed_bloom_semijoin
from .prefix import global_row_number, global_running_sum
from .similarity import (
    cosine_topk,
    embedding_near_dup_pairs,
    ivf_topk,
    lsh_bucket_topk,
    lsh_plane_weights,
    semantic_dedup_flags,
)
from .skew import salted_join
from .text import STOPWORDS, tokens_col, word_shingles

__all__ = [
    "tokens_col",
    "word_shingles",
    "STOPWORDS",
    "chunked_trailing_window",
    "connected_components",
    "connected_components_star",
    "deletion_neighborhood_pairs",
    "edit_distance_pairs",
    "exact_dedup",
    "incremental_jaccard_dedup",
    "minhash_band_pairs",
    "minhash_near_dups",
    "ngram_jaccard_pairs",
    "passjoin_pairs",
    "prefix_suffix_typo_pairs",
    "simhash64",
    "simhash_near_pairs",
    "pagerank_micro",
    "orient_edges_by_degree",
    "count_triangles",
    "asof_join",
    "packed_bloom_semijoin",
    "global_running_sum",
    "global_row_number",
    "cosine_topk",
    "embedding_near_dup_pairs",
    "ivf_topk",
    "lsh_bucket_topk",
    "lsh_plane_weights",
    "semantic_dedup_flags",
    "salted_join",
]

from .search import topk_search, topk_single, ann_lsh_topk
from .dedup import (
    exact_dedup,
    exact_dup_groups,
    minhash_signatures,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash64,
    embedding_neardup_pairs,
)

__all__ = [
    "topk_search",
    "topk_single",
    "ann_lsh_topk",
    "exact_dedup",
    "exact_dup_groups",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "ngram_jaccard_pairs",
    "simhash64",
    "embedding_neardup_pairs",
]

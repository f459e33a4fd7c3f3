from .filters import compile_filter
from .vector import (
    cosine_similarity,
    dot_product,
    l2_distance,
    l2_norm,
    sparse_dot_product,
)
from .text import (
    detect_language,
    doc_fingerprint,
    char_entropy,
    compression_ratio,
    quality_score,
    token_count,
    word_count,
)

__all__ = [
    "compile_filter",
    "cosine_similarity",
    "dot_product",
    "l2_distance",
    "l2_norm",
    "sparse_dot_product",
    "detect_language",
    "doc_fingerprint",
    "char_entropy",
    "compression_ratio",
    "quality_score",
    "token_count",
    "word_count",
]

from .filters import compile_filter
from .vector import (
    cosine_similarity,
    dot_product,
    l2_distance,
    l2_norm,
    sparse_dot_product,
)
from .html import html_to_text, html_to_text_py, html_to_text_sql
from .text import (
    clean_text,
    clean_text_sql,
    detect_language,
    doc_fingerprint,
    char_entropy,
    compression_ratio,
    nfc_normalize,
    quality_score,
    token_count,
    unicode_normalize,
    word_count,
)

__all__ = [
    "compile_filter",
    "html_to_text",
    "html_to_text_py",
    "html_to_text_sql",
    "cosine_similarity",
    "dot_product",
    "l2_distance",
    "l2_norm",
    "sparse_dot_product",
    "clean_text",
    "clean_text_sql",
    "detect_language",
    "doc_fingerprint",
    "char_entropy",
    "compression_ratio",
    "nfc_normalize",
    "quality_score",
    "token_count",
    "unicode_normalize",
    "word_count",
]

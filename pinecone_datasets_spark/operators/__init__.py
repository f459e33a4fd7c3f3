from .search import (
    ann_lsh_topk,
    build_lsh_index,
    hamming_topk,
    lsh_index_topk,
    topk_search,
    topk_single,
)
from .lateinteraction import maxsim_score, maxsim_topk, maxsim_topk_arrow
from .dedup import (
    exact_dedup,
    exact_dup_groups,
    minhash_signatures,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash64,
    embedding_neardup_pairs,
    build_minhash_index,
    minhash_index_neardup,
)
from .decontaminate import (
    decontaminate,
    ngram_contamination,
    semantic_contamination,
    semantic_decontaminate,
)
from .semdedup import semantic_dedup, semantic_dedup_pairs, srp_cells
from .sampling import (
    deterministic_sample,
    hash_split,
    leakage_safe_split,
    stratified_sample_exact,
    weighted_sample,
)
from .dsir import (
    dsir_log_ratios,
    dsir_resample,
    dsir_weights,
)
from .embstats import embedding_dim_stats, embedding_drift
from .rerank import crossencoder_rerank, mmr_rerank
from .mining import mine_hard_negatives
from .evaluate import macro_metrics, retrieval_metrics
from .prf import (
    bm25_weighted_topk,
    rm3_index_search,
    rm3_query_model,
    rm3_search,
)
from .editsim import edit_distance_pairs
from .boilerplate import (
    boilerplate_profile,
    duplicated_spans,
    frequent_ngrams,
    remove_duplicated_sentence_spans,
    remove_duplicated_spans,
)
from .spans import (
    repeated_spans,
    repeated_window_positions,
    strip_repeated_spans,
)
from .packing import (
    chunk_text,
    length_bucketed_batches,
    pack_documents,
)
from .mixing import (
    domain_mixture_sample,
    interleave_by_weights,
    mixture_edges,
    mixture_report,
    write_curriculum,
)
from .phash import (
    hamming_neardup_pairs,
    image_neardup_pairs,
    image_phash,
)
from .profile import profile_dataset
from .pca import train_pca, pca_project, train_opq_rotation
from .sketch import (
    kmv_distinct,
    mg_heavy_hitters,
    cm_sketch,
    cm_estimate,
    hll_distinct,
    hll_estimate,
    hll_registers,
    quantile_estimate,
    quantile_sketch,
)
from .bpe import (
    bpe_token_counts,
    bpe_tokenize_udf,
    train_bpe,
    word_histogram,
)
from .pq import (
    build_ivfpq_index,
    ivfpq_index_topk,
    pq_encode,
    pq_topk,
    train_pq_codebooks,
)
from .pipeline import (
    curate_corpus,
    curate_corpus_full,
    curation_funnel,
    quantile_bucket_by_group,
)
from .timeseries import gapfill, interpolate_linear, locf, rolling_zscore
from .domains import (
    cap_domains,
    dedup_by_url,
    domain_report,
    filter_domains,
    normalize_url,
    registrable_domain,
    url_host,
)
from .shards import read_token_shards, write_token_shards
from .snapshot import diff_datasets, snapshot_diff, snapshot_summary
from .quality_model import (
    score_quality,
    train_quality_classifier,
    weak_labels,
)

__all__ = [
    "topk_search",
    "build_ivfpq_index",
    "kmv_distinct",
    "hll_distinct",
    "hll_estimate",
    "hll_registers",
    "quantile_sketch",
    "profile_dataset",
    "domain_mixture_sample",
    "hamming_neardup_pairs",
    "image_neardup_pairs",
    "image_phash",
    "interleave_by_weights",
    "mixture_edges",
    "mixture_report",
    "write_curriculum",
    "quantile_estimate",
    "train_pca",
    "train_opq_rotation",
    "pca_project",
    "cm_sketch",
    "cm_estimate",
    "bpe_token_counts",
    "bpe_tokenize_udf",
    "train_bpe",
    "word_histogram",
    "mg_heavy_hitters",
    "ivfpq_index_topk",
    "pq_encode",
    "pq_topk",
    "train_pq_codebooks",
    "topk_single",
    "ann_lsh_topk",
    "build_lsh_index",
    "lsh_index_topk",
    "hamming_topk",
    "maxsim_score",
    "maxsim_topk",
    "maxsim_topk_arrow",
    "exact_dedup",
    "exact_dup_groups",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "build_minhash_index",
    "minhash_index_neardup",
    "ngram_jaccard_pairs",
    "simhash64",
    "embedding_neardup_pairs",
    "decontaminate",
    "ngram_contamination",
    "semantic_contamination",
    "semantic_decontaminate",
    "semantic_dedup",
    "semantic_dedup_pairs",
    "srp_cells",
    "deterministic_sample",
    "hash_split",
    "dsir_log_ratios",
    "dsir_resample",
    "dsir_weights",
    "stratified_sample_exact",
    "weighted_sample",
    "leakage_safe_split",
    "embedding_dim_stats",
    "embedding_drift",
    "mmr_rerank",
    "crossencoder_rerank",
    "mine_hard_negatives",
    "retrieval_metrics",
    "macro_metrics",
    "rm3_query_model",
    "rm3_search",
    "rm3_index_search",
    "bm25_weighted_topk",
    "edit_distance_pairs",
    "boilerplate_profile",
    "remove_duplicated_sentence_spans",
    "duplicated_spans",
    "frequent_ngrams",
    "remove_duplicated_spans",
    "repeated_spans",
    "repeated_window_positions",
    "strip_repeated_spans",
    "chunk_text",
    "length_bucketed_batches",
    "pack_documents",
    "curate_corpus",
    "curate_corpus_full",
    "curation_funnel",
    "quantile_bucket_by_group",
    "gapfill",
    "interpolate_linear",
    "locf",
    "rolling_zscore",
    "cap_domains",
    "read_token_shards",
    "write_token_shards",
    "dedup_by_url",
    "normalize_url",
    "domain_report",
    "filter_domains",
    "registrable_domain",
    "url_host",
    "snapshot_diff",
    "snapshot_summary",
    "diff_datasets",
    "score_quality",
    "train_quality_classifier",
    "weak_labels",
]

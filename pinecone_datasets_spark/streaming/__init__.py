from .anomaly import stream_rolling_zscore
from .dedup import stream_exact_dedup
from .ingest import stream_documents, windowed_event_counts
from .curate import (
    dsir_gate,
    dsir_score,
    semantic_gate,
    stream_crawl_extract,
    stream_curate,
)
from .joins import stream_interval_join
from .sessions import streaming_sessionize
from .sketch import (
    stream_cm_sketch,
    stream_heavy_hitters,
    stream_hll_registers,
)

__all__ = [
    "stream_cm_sketch",
    "stream_interval_join",
    "streaming_sessionize",
    "stream_documents",
    "stream_exact_dedup",
    "stream_heavy_hitters",
    "stream_crawl_extract",
    "stream_curate",
    "dsir_score",
    "dsir_gate",
    "semantic_gate",
    "stream_hll_registers",
    "stream_rolling_zscore",
    "windowed_event_counts",
]

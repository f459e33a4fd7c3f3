from .dedup import stream_exact_dedup
from .ingest import stream_documents, windowed_event_counts

__all__ = [
    "stream_documents",
    "stream_exact_dedup",
    "windowed_event_counts",
]

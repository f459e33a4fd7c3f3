from .ingest import stream_documents, windowed_event_counts

__all__ = ["stream_documents", "windowed_event_counts"]

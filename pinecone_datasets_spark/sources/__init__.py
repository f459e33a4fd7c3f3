"""Source/sink layer re-exports (SURVEY.md §2.1).

Readers (S1-S6), sinks (S7-S10), FS connectors (S11), and the iteration
egress live in the top-level modules; this package groups them for
discoverability.
"""

from ..reader import read_documents, read_metadata, read_queries
from ..writer import write_dataset, write_documents, write_queries
from ..fs import FS, normalize_uri
from .events import read_events
from .corpus import (
    CorpusRead,
    read_csv,
    read_jsonl,
    read_text_files,
    stream_jsonl,
)
from .media import read_media
from .warc import (
    WarcRead,
    encode_warc,
    http_body,
    http_status,
    read_warc,
    stream_warc,
    wet_text,
    write_wet,
)

__all__ = [
    "WarcRead",
    "read_media",
    "encode_warc",
    "http_body",
    "http_status",
    "read_warc",
    "stream_warc",
    "wet_text",
    "write_wet",
    "read_documents",
    "read_metadata",
    "read_queries",
    "read_events",
    "CorpusRead",
    "read_jsonl",
    "read_csv",
    "read_text_files",
    "stream_jsonl",
    "write_dataset",
    "write_documents",
    "write_queries",
    "FS",
    "normalize_uri",
]

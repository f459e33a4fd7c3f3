"""Media directory source: files on disk → the typed media frame.

The multimodal operators all consume ``multimodal.MEDIA_SCHEMA``
(opaque binary + typed metadata), but until r8 nothing produced it
from a real directory of files — media frames existed only as
constructed fixtures. ``read_media`` closes that hop: one
``binaryFile`` scan, one Arrow probe kernel (the REAL header parses in
``media_codecs.probe_bytes`` — PNG IHDR, BMP DIB, GIF screen
descriptor, JPEG SOFn, AVI avih, WAV frames, FLAC STREAMINFO), and the
frame every downstream feature/dedup/sampling operator already
understands.

Contract, consistent with the rest of the package:

* ``media_id`` is the file path (stable, unique, re-derivable).
* Unrecognized bytes get ``format`` NULL and ``media_type``
  'unknown' (the schema's media_type is non-nullable) — the
  quarantine contract stays ``format IS NULL``, never a dead job.
* ``media_type`` derives from the probed format (image / audio /
  video), not from file extensions — the bytes are the truth.

Scale shape: parallelism is file-granular (``binaryFile``, the same
grain as the WARC source); the probe reads headers only, so the pass
is I/O-bound on the scan. Pair with ``spark.sql.files
.maxPartitionBytes`` tuning for many-small-file corpora, or compact
first.

Reference scope note: the reference (pinecone-io/pinecone-datasets)
has no media surface; Layer-B extension (SURVEY.md §2 "beyond the
reference"), cited against its data model only (cfg.py:23-36).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_TYPE_BY_FORMAT = {
    "png": "image",
    "bmp": "image",
    "gif": "image",
    "jpeg": "image",
    "wav": "audio",
    "flac": "audio",
    "aiff": "audio",
    "mp3": "audio",
    "ogg": "audio",
    "ogg-opus": "audio",
    "ogg-vorbis": "audio",
    "ogg-flac": "audio",
    "webm": "video",
    "mkv": "video",
    "webp": "image",
    "tiff": "image",
    "heic": "image",
    "avif": "image",
    "m4a": "audio",
    "mov": "video",
    "pdf": "document",
    "docx": "document",
    "rtf": "document",
    "odt": "document",
    "epub": "document",
    "zip": "archive",
    "avi": "video",
    "mpng": "video",
    "mp4": "video",
}



def _probe_kernel(batches: "Iterator[pd.DataFrame]"):
    """Shared Arrow kernel for read_media/stream_media: real header
    probes -> typed MEDIA_SCHEMA rows; quarantine keeps content."""
    from ..operators.media_codecs import probe_bytes

    for pdf in batches:
        out = {
            "media_id": [],
            "media_type": [],
            "content": [],
            "width": [],
            "height": [],
            "duration_ms": [],
            "format": [],
        }
        def _i32(v):
            # a hostile header can declare dims past int32 (e.g. PNG
            # IHDR width 0xFFFFFFFF): pd.array(dtype='Int32') then
            # raised TypeError and killed the probe job, violating the
            # never-a-dead-job contract (r11 review, confirmed). Out of
            # range -> NULL, like any other unprobeable attribute.
            return v if v is not None and -(1 << 31) <= v < (1 << 31) else None

        def _i64(v):
            return v if v is not None and -(1 << 63) <= v < (1 << 63) else None

        for p, content in zip(pdf["path"], pdf["content"]):
            blob = bytes(content) if content is not None else None
            fmt, w, h, dur = probe_bytes(blob)
            w, h, dur = _i32(w), _i32(h), _i64(dur)
            out["media_id"].append(str(p))
            out["media_type"].append(_TYPE_BY_FORMAT.get(fmt, "unknown"))
            out["content"].append(blob)
            out["width"].append(w)
            out["height"].append(h)
            out["duration_ms"].append(dur)
            out["format"].append(fmt)
        pdf_out = pd.DataFrame(out)
        pdf_out["width"] = pd.array(out["width"], dtype="Int32")
        pdf_out["height"] = pd.array(out["height"], dtype="Int32")
        pdf_out["duration_ms"] = pd.array(
            out["duration_ms"], dtype="Int64"
        )
        yield pdf_out


def read_media(
    spark: SparkSession,
    path: str,
    glob: str = "*",
    recursive: bool = False,
) -> DataFrame:
    """Read a directory of media files as a ``MEDIA_SCHEMA`` frame —
    ``(media_id, media_type, content, width, height, duration_ms,
    format)`` with format/dims/duration from real header probes.
    ``media_type`` is 'unknown' (and format NULL) for unrecognized
    bytes, but the row KEEPS its content so a quarantine audit can
    inspect it."""
    from ..operators.multimodal import MEDIA_SCHEMA
    from ..shipping import ensure_shipped

    ensure_shipped(spark)
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true" if recursive else "false")
        .load(path)
        .select("path", "content")
    )

    return raw.mapInPandas(_probe_kernel, MEDIA_SCHEMA)


def stream_media(
    spark: SparkSession,
    path: str,
    glob: str = "*",
    max_files_per_trigger: int = 16,
) -> DataFrame:
    """Append-only media directory as a stream of typed MEDIA_SCHEMA
    rows — the live-ingest twin of ``read_media``, same probe kernel,
    same ``maxFilesPerTrigger`` discipline as ``stream_warc`` (a
    dumped backlog of files becomes bounded micro-batches whose
    parallelism is the file count). Unrecognized bytes keep the batch
    reader's quarantine contract (format NULL, media_type 'unknown',
    content retained) — no rows are dropped, so batch and streaming
    reads of the same directory are row-identical."""
    from ..operators.multimodal import MEDIA_SCHEMA
    from ..shipping import ensure_shipped

    ensure_shipped(spark)
    raw = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("pathGlobFilter", glob)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path)
        .select("path", "content")
    )

    return raw.mapInPandas(_probe_kernel, MEDIA_SCHEMA)

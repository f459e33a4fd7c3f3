"""Subtitle/caption extraction: SRT and WebVTT (pure text parsing).

Video corpora carry their text as sidecar subtitles — the transcript
alignment layer multimodal training needs. Both ubiquitous formats are
line-structured text:

* **SRT**: blocks of ``index`` / ``HH:MM:SS,mmm --> HH:MM:SS,mmm`` /
  text lines, blank-line separated. Index lines are advisory (real
  files miscount); the timestamp arrow is the anchor.
* **WebVTT**: ``WEBVTT`` header, ``NOTE``/``STYLE``/``REGION`` blocks
  skipped, optional cue identifiers, ``HH:MM:SS.mmm`` (hours
  optional) timestamps with cue settings after the arrow, and inline
  markup (``<v Name>``, ``<i>``, ``<c.class>``) stripped.

``parse_subtitles`` dispatches by shape and returns typed cues;
``extract_subtitle_cues`` is the map-only Arrow kernel emitting one
row per cue — join on time ranges against frame/audio-segment tables
(``operators/ranges.py``) to align modalities.

Reference scope note: no media surface in the reference; Layer-B
extension (SURVEY.md §2 "beyond the reference").
"""

from __future__ import annotations

import re
from typing import Iterator, List, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .media_codecs import UnsupportedMediaError

__all__ = [
    "parse_subtitles",
    "extract_subtitle_cues",
    "encode_srt",
    "encode_vtt",
]

_TS = r"(?:(\d{1,2}):)?(\d{1,2}):(\d{2})[,.](\d{3})"
_ARROW_RE = re.compile(rf"^{_TS}\s*-->\s*{_TS}(?:\s+.*)?$")
_TAG_RE = re.compile(r"<[^>\n]*>")


def _ts_ms(h, m, s, ms) -> int:
    return (
        (int(h) if h else 0) * 3600_000
        + int(m) * 60_000
        + int(s) * 1000
        + int(ms)
    )


def parse_subtitles(blob: bytes) -> Tuple[str, List[tuple]]:
    """Subtitle bytes → ``(kind, [(start_ms, end_ms, text), ...])``
    with kind 'vtt' or 'srt'. Inline markup is stripped; multi-line
    cue text joins with newlines. Raises the shared typed error for
    bytes that are neither."""
    text = blob.decode("utf-8-sig", "replace")
    # spec line breaks are CR/LF only — str.splitlines would ALSO
    # split on \f \v \x1c-\x1e U+2028/U+2029, corrupting cue text
    # that legally contains them (hypothesis-found)
    lines = re.split(r"\r\n|\r|\n", text)
    is_vtt = bool(lines) and lines[0].strip().startswith("WEBVTT")
    if not is_vtt and not any(
        _ARROW_RE.match(ln.strip()) for ln in lines[:50]
    ):
        raise UnsupportedMediaError("not an SRT/WebVTT subtitle stream")
    cues: List[tuple] = []
    i = 1 if is_vtt else 0
    n = len(lines)
    while i < n:
        ln = lines[i].strip()
        if not ln:
            i += 1
            continue
        if is_vtt and ln.split(" ", 1)[0] in ("NOTE", "STYLE", "REGION"):
            while i < n and lines[i].strip():
                i += 1
            continue
        m = _ARROW_RE.match(ln)
        if m is None:
            # cue identifier (VTT) or SRT index line: the arrow must
            # be on the NEXT line, else this is junk to skip
            if i + 1 < n and _ARROW_RE.match(lines[i + 1].strip()):
                i += 1
                continue
            i += 1
            continue
        start = _ts_ms(*m.groups()[:4])
        end = _ts_ms(*m.groups()[4:])
        i += 1
        body: List[str] = []
        while i < n and lines[i].strip():
            body.append(_TAG_RE.sub("", lines[i]).strip())
            i += 1
        cues.append((start, end, "\n".join(b for b in body if b)))
    return ("vtt" if is_vtt else "srt"), cues


def extract_subtitle_cues(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Blob frame → one row per cue: ``(id, kind, cue_idx, start_ms,
    end_ms, text, error)``; undecodable blobs yield a single typed
    error row (quarantine = ``error IS NOT NULL``)."""
    from ..shipping import ensure_shipped

    ensure_shipped(df.sparkSession)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                try:
                    kind, cues = parse_subtitles(
                        bytes(content) if content is not None else b""
                    )
                    for k, (s, e, t) in enumerate(cues):
                        rows.append((mid, kind, k, s, e, t, None))
                except UnsupportedMediaError as exc:
                    rows.append(
                        (mid, None, None, None, None, None, str(exc))
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "kind", "cue_idx", "start_ms", "end_ms",
                    "text", "error",
                ],
            )

    return df.select(
        F.col(id_col).alias(id_col), F.col(content_col)
    ).mapInPandas(
        kernel,
        "id string, kind string, cue_idx int, start_ms long,"
        " end_ms long, text string, error string",
    )


def _fmt_ts(ms: int, sep: str) -> str:
    h, rem = divmod(int(ms), 3600_000)
    m, rem = divmod(rem, 60_000)
    s, milli = divmod(rem, 1000)
    return f"{h:02d}:{m:02d}:{s:02d}{sep}{milli:03d}"


def encode_srt(cues) -> bytes:
    """``[(start_ms, end_ms, text), ...]`` → SRT bytes (writer twin)."""
    out = []
    for k, (s, e, t) in enumerate(cues):
        out.append(
            f"{k + 1}\n{_fmt_ts(s, ',')} --> {_fmt_ts(e, ',')}\n{t}\n"
        )
    return "\n".join(out).encode("utf-8")


def encode_vtt(cues) -> bytes:
    """``[(start_ms, end_ms, text), ...]`` → WebVTT bytes."""
    out = ["WEBVTT\n"]
    for s, e, t in cues:
        out.append(f"{_fmt_ts(s, '.')} --> {_fmt_ts(e, '.')}\n{t}\n")
    return "\n".join(out).encode("utf-8")

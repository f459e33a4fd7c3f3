"""Embedded media metadata extraction: ID3v2, EXIF, PNG tEXt.

A corpus-scale curation pipeline needs the metadata INSIDE media blobs
— titles/artists for dedup keys, camera make/model for source
analysis, capture timestamps for recency filters, and GPS presence as
a PII signal — without shipping the blobs anywhere. This module parses
the three ubiquitous embedded-metadata envelopes with ``struct`` only:

* **ID3v2.2/2.3/2.4** (MP3 and anything else ID3-led): text frames
  (``T***``), syncsafe sizes, latin-1 / UTF-16(+BOM) / UTF-16BE /
  UTF-8 encodings.
* **EXIF** (JPEG APP1 ``Exif\\0\\0``): TIFF header (both endians),
  IFD0 + ExifIFD + GPS IFD walks, ASCII / SHORT / LONG / RATIONAL
  values for the common tags, GPS coordinates decoded from their
  rational triples, and a ``gps`` presence flag for PII screens even
  when coordinates don't parse.
* **PNG tEXt/iTXt** (uncompressed): keyword → value pairs.

Everything emits flat ``(media_id, key, value)`` STRING rows —
exploded, not a map column, so downstream filters/joins/oracles treat
metadata like any other relational data. Unparseable or absent
envelopes yield zero rows, never errors (the quarantine contract is
the media frame's, not this pass's: metadata absence is normal).

Scale shape: map-only Arrow kernel over the media frame (same grain as
every other multimodal kernel); header-bounded reads, no decode.

Reference scope note: the reference (pinecone-io/pinecone-datasets)
has no media surface; Layer-B extension (SURVEY.md §2 "beyond the
reference"), cited against its data model only (cfg.py:23-36).
"""

from __future__ import annotations

import struct
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame

__all__ = [
    "extract_media_metadata",
    "id3v2_fields",
    "exif_fields",
    "png_text_fields",
    "encode_id3v2",
    "encode_exif_jpeg",
    "append_png_text",
]

# ID3v2.2 three-letter frame ids → the v2.3/2.4 four-letter names, so
# callers see one vocabulary regardless of tag version
_ID3V22_MAP = {
    "TT2": "TIT2", "TP1": "TPE1", "TAL": "TALB", "TYE": "TYER",
    "TCO": "TCON", "TRK": "TRCK", "TEN": "TENC", "TSS": "TSSE",
}

_EXIF_TAGS = {
    0x010F: "Make",
    0x0110: "Model",
    0x0112: "Orientation",
    0x0131: "Software",
    0x0132: "DateTime",
    0x8769: None,  # ExifIFD pointer (recursed, not emitted)
    0x8825: None,  # GPS IFD pointer (recursed, not emitted)
    0x9003: "DateTimeOriginal",
    0xA002: "PixelXDimension",
    0xA003: "PixelYDimension",
    0x829A: "ExposureTime",
    0x829D: "FNumber",
    0x8827: "ISOSpeedRatings",
}


def _syncsafe(b: bytes) -> int:
    v = 0
    for x in b:
        v = (v << 7) | (x & 0x7F)
    return v


def _id3_text(payload: bytes) -> Optional[str]:
    """Decode one ID3v2 text-frame payload (leading encoding byte)."""
    if not payload:
        return None
    enc, rest = payload[0], payload[1:]
    try:
        if enc == 0:
            s = rest.decode("latin-1")
        elif enc == 1:
            s = rest.decode("utf-16")  # BOM-led
        elif enc == 2:
            s = rest.decode("utf-16-be")
        elif enc == 3:
            s = rest.decode("utf-8")
        else:
            return None
    except UnicodeDecodeError:
        return None
    return s.split("\x00", 1)[0].strip() or None


def id3v2_fields(content: bytes) -> dict:
    """``{frame_id: text}`` for the text frames of a leading ID3v2
    tag. Empty dict when there is no tag or it is unparseable."""
    out: dict = {}
    if len(content) < 10 or content[:3] != b"ID3":
        return out
    ver = content[3]
    size = _syncsafe(content[6:10])
    end = min(10 + size, len(content))
    pos = 10
    if ver >= 3 and (content[5] & 0x40):  # extended header
        if pos + 4 > end:
            return out
        if ver == 4:
            pos += _syncsafe(content[pos : pos + 4])
        else:
            pos += 4 + struct.unpack_from(">I", content, pos)[0]
    try:
        while pos + 6 <= end:
            if ver == 2:
                fid = content[pos : pos + 3]
                if fid == b"\x00\x00\x00":
                    break
                fsize = int.from_bytes(content[pos + 3 : pos + 6], "big")
                body = pos + 6
            else:
                if pos + 10 > end:
                    break
                fid = content[pos : pos + 4]
                if fid == b"\x00\x00\x00\x00":
                    break
                raw = content[pos + 4 : pos + 8]
                fsize = (
                    _syncsafe(raw) if ver == 4
                    else struct.unpack(">I", raw)[0]
                )
                body = pos + 10
            if fsize < 0 or body + fsize > end:
                break
            name = fid.decode("latin-1", "replace")
            if ver == 2:
                name = _ID3V22_MAP.get(name, name)
            if name.startswith("T") and name != "TXXX":
                text = _id3_text(content[body : body + fsize])
                if text is not None:
                    out.setdefault(name, text)
            pos = body + fsize
    except (struct.error, IndexError):
        pass
    return out


def _tiff_value(data, off, typ, count, endian):
    """One IFD entry's value (ASCII / SHORT / LONG / RATIONAL only)."""
    sizes = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 10: 8}
    if typ not in sizes:
        return None
    total = sizes[typ] * count
    if total <= 4:
        vpos = off
    else:
        (vpos,) = struct.unpack_from(endian + "I", data, off)
    if vpos + total > len(data):
        return None
    if typ == 2:  # ASCII
        raw = data[vpos : vpos + count]
        return raw.split(b"\x00", 1)[0].decode("ascii", "replace").strip()
    fmt = {1: "B", 3: "H", 4: "I"}.get(typ)
    if fmt:
        vals = struct.unpack_from(endian + fmt * count, data, vpos)
        return vals if count > 1 else vals[0]
    # (S)RATIONAL pairs
    sign = "i" if typ == 10 else "I"
    vals = []
    for i in range(count):
        num, den = struct.unpack_from(
            endian + sign * 2, data, vpos + 8 * i
        )
        vals.append((num, den))
    return vals if count > 1 else vals[0]


def _gps_decimal(triple, ref) -> Optional[str]:
    """GPS rational (deg, min, sec) + N/S/E/W ref → decimal string."""
    try:
        if not isinstance(triple, list) or len(triple) != 3:
            return None
        parts = []
        for num, den in triple:
            if den == 0:
                return None
            parts.append(num / den)
        val = parts[0] + parts[1] / 60.0 + parts[2] / 3600.0
        if ref in ("S", "W"):
            val = -val
        return f"{val:.6f}"
    except (TypeError, ValueError, ZeroDivisionError):
        return None


def exif_fields(content: bytes) -> dict:
    """``{tag_name: str}`` from a JPEG's EXIF APP1 segment (IFD0 +
    ExifIFD + GPS). ``gps='1'`` whenever a GPS IFD exists — the PII
    presence signal survives even when coordinates don't parse.
    Empty dict for non-JPEG bytes or absent/unparseable EXIF."""
    out: dict = {}
    if content[:2] != b"\xff\xd8":
        return out
    # find APP1/Exif among the leading marker segments
    i = 2
    tiff = None
    try:
        while i + 4 <= len(content) and content[i] == 0xFF:
            marker = content[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            (seglen,) = struct.unpack_from(">H", content, i + 2)
            if marker == 0xE1 and content[i + 4 : i + 10] == b"Exif\x00\x00":
                tiff = content[i + 10 : i + 2 + seglen]
                break
            if marker == 0xDA:
                break
            i += 2 + seglen
    except struct.error:
        return out
    if tiff is None or len(tiff) < 8:
        return out
    if tiff[:2] == b"II":
        endian = "<"
    elif tiff[:2] == b"MM":
        endian = ">"
    else:
        return out

    def walk_ifd(off: int, gps: bool) -> None:
        if off + 2 > len(tiff):
            return
        (n,) = struct.unpack_from(endian + "H", tiff, off)
        for k in range(n):
            e = off + 2 + 12 * k
            if e + 12 > len(tiff):
                return
            tag, typ, count = struct.unpack_from(endian + "HHI", tiff, e)
            if gps:
                slot = {
                    1: "_gps_lat_ref",
                    2: "_gps_lat",
                    3: "_gps_lon_ref",
                    4: "_gps_lon",
                }.get(tag)
                if slot:
                    out[slot] = _tiff_value(
                        tiff, e + 8, typ, count, endian
                    )
                continue
            if tag in (0x8769, 0x8825):
                ptr = _tiff_value(tiff, e + 8, typ, count, endian)
                if isinstance(ptr, int):
                    if tag == 0x8825:
                        out["gps"] = "1"
                    walk_ifd(ptr, gps=tag == 0x8825)
            elif tag in _EXIF_TAGS and _EXIF_TAGS[tag]:
                val = _tiff_value(tiff, e + 8, typ, count, endian)
                if val is not None:
                    if isinstance(val, tuple):
                        # a single RATIONAL (num, den) or a multi-value
                        # numeric tag — slash-join either way
                        val = "/".join(str(v) for v in val)
                    out[_EXIF_TAGS[tag]] = str(val)

    try:
        (ifd0,) = struct.unpack_from(endian + "I", tiff, 4)
        walk_ifd(ifd0, gps=False)
    except (struct.error, IndexError, RecursionError):
        pass
    lat = _gps_decimal(out.pop("_gps_lat", None), out.pop("_gps_lat_ref", None))
    lon = _gps_decimal(out.pop("_gps_lon", None), out.pop("_gps_lon_ref", None))
    if lat is not None:
        out["gps_lat"] = lat
    if lon is not None:
        out["gps_lon"] = lon
    return out


def png_text_fields(content: bytes) -> dict:
    """``{keyword: text}`` from a PNG's uncompressed tEXt/iTXt chunks."""
    out: dict = {}
    if content[:8] != b"\x89PNG\r\n\x1a\n":
        return out
    pos = 8
    try:
        while pos + 8 <= len(content):
            (ln,) = struct.unpack_from(">I", content, pos)
            ctype = content[pos + 4 : pos + 8]
            body = content[pos + 8 : pos + 8 + ln]
            if ctype == b"tEXt" and b"\x00" in body:
                k, v = body.split(b"\x00", 1)
                out.setdefault(
                    k.decode("latin-1", "replace"),
                    v.decode("latin-1", "replace"),
                )
            elif ctype == b"iTXt" and b"\x00" in body:
                # spec layout: keyword NUL comp_flag(1B) comp_method(1B)
                # lang NUL translated NUL text. The flag/method bytes
                # are RAW bytes, not NUL-terminated fields — the old
                # 5-way NUL split consumed the 0x00 flag byte as a
                # separator, so the uncompressed check could never pass
                # and iTXt was silently unreachable for every input
                # (r11 review, verified by simulation).
                k, rest = body.split(b"\x00", 1)
                if len(rest) >= 2 and rest[0] == 0:  # uncompressed
                    p = rest[2:].split(b"\x00", 2)
                    if len(p) == 3:
                        out.setdefault(
                            k.decode("latin-1", "replace"),
                            p[2].decode("utf-8", "replace"),
                        )
            elif ctype == b"IEND":
                break
            pos += 12 + ln
    except (struct.error, IndexError, ValueError):
        pass
    return out


# ---------------------------------------------------------------------------
# Fixture encoder twins (same role as encode_png/encode_wav/encode_warc:
# deterministic spec-shaped envelopes the parsers above decode for real)
# ---------------------------------------------------------------------------


def _syncsafe4(v: int) -> bytes:
    return bytes(
        [(v >> 21) & 0x7F, (v >> 14) & 0x7F, (v >> 7) & 0x7F, v & 0x7F]
    )


def encode_id3v2(frames, ver: int = 3) -> bytes:
    """``[(frame_id, text, enc)]`` → a spec-shaped ID3v2 tag (enc 0 =
    latin-1, 1 = UTF-16+BOM, 3 = UTF-8). Prepend to any audio bytes."""
    body = b""
    for fid, text, enc in frames:
        if enc == 0:
            payload = b"\x00" + text.encode("latin-1")
        elif enc == 1:
            payload = b"\x01" + text.encode("utf-16")
        else:
            payload = b"\x03" + text.encode("utf-8")
        size = (
            _syncsafe4(len(payload))
            if ver == 4
            else struct.pack(">I", len(payload))
        )
        body += fid.encode("ascii") + size + b"\x00\x00" + payload
    return b"ID3" + bytes([ver, 0, 0]) + _syncsafe4(len(body)) + body


def encode_exif_jpeg(entries, endian: str = "<", gps=None) -> bytes:
    """ASCII-tag dict (+optional ``(lat, lon)``) → a minimal JPEG whose
    APP1/Exif segment carries IFD0 and, when ``gps`` is given, a GPS
    IFD with rational (deg, min, sec) coordinates and N/S/E/W refs."""
    tag_order = sorted(entries)
    extra = b""
    ifd_entries = []
    n = len(tag_order) + (1 if gps else 0)
    data_start = 8 + 2 + 12 * n + 4

    def add(tag, typ, count, packed):
        nonlocal extra
        if len(packed) <= 4:
            val = packed.ljust(4, b"\x00")
        else:
            val = struct.pack(endian + "I", data_start + len(extra))
            extra += packed
        ifd_entries.append(
            struct.pack(endian + "HHI", tag, typ, count) + val
        )

    for tag in tag_order:
        text = entries[tag].encode("ascii") + b"\x00"
        add(tag, 2, len(text), text)
    if gps:
        add(0x8825, 4, 1, struct.pack(endian + "I", 0))  # patched below
    ifd0 = (
        struct.pack(endian + "H", n)
        + b"".join(ifd_entries)
        + struct.pack(endian + "I", 0)
    )
    tiff = (
        (b"II" if endian == "<" else b"MM")
        + struct.pack(endian + "H", 42)
        + struct.pack(endian + "I", 8)
        + ifd0
        + extra
    )
    if gps:
        lat, lon = gps
        lat_ref = b"N" if lat >= 0 else b"S"
        lon_ref = b"E" if lon >= 0 else b"W"
        lat, lon = abs(lat), abs(lon)
        gps_off = len(tiff)

        def rat3(v):
            deg = int(v)
            mins = int((v - deg) * 60)
            secs = (v - deg - mins / 60) * 3600
            return struct.pack(
                endian + "II" * 3,
                deg, 1, mins, 1, int(round(secs * 100)), 100,
            )

        lat_data_off = gps_off + 2 + 12 * 4 + 4
        lon_data_off = lat_data_off + 24
        gps_entries = (
            struct.pack(endian + "HHI", 1, 2, 2)
            + lat_ref + b"\x00\x00\x00"
            + struct.pack(endian + "HHI", 2, 5, 3)
            + struct.pack(endian + "I", lat_data_off)
            + struct.pack(endian + "HHI", 3, 2, 2)
            + lon_ref + b"\x00\x00\x00"
            + struct.pack(endian + "HHI", 4, 5, 3)
            + struct.pack(endian + "I", lon_data_off)
        )
        gps_ifd = (
            struct.pack(endian + "H", 4)
            + gps_entries
            + struct.pack(endian + "I", 0)
            + rat3(lat)
            + rat3(lon)
        )
        buf = bytearray(tiff + gps_ifd)
        base = 8 + 2
        for k in range(n):
            e = base + 12 * k
            (tag,) = struct.unpack_from(endian + "H", buf, e)
            if tag == 0x8825:
                buf[e + 8 : e + 12] = struct.pack(endian + "I", gps_off)
        tiff = bytes(buf)
    app1 = b"Exif\x00\x00" + tiff
    return (
        b"\xff\xd8"
        + b"\xff\xe1" + struct.pack(">H", len(app1) + 2) + app1
        + b"\xff\xd9"
    )


def append_png_text(png: bytes, pairs) -> bytes:
    """Insert ``tEXt`` chunks (keyword → latin-1 text) before a PNG's
    IEND; the result stays a spec-valid, decodable PNG."""
    import zlib

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    at = png.rfind(b"IEND") - 4
    extra = b"".join(
        chunk(b"tEXt", k.encode("ascii") + b"\x00" + v.encode("latin-1"))
        for k, v in pairs
    )
    return png[:at] + extra + png[at:]


def extract_media_metadata(
    media: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """media frame → exploded ``(media_id, key, value)`` string rows
    from every embedded envelope the blob carries (ID3v2 + EXIF + PNG
    text — a blob can emit from several). Zero rows for blobs with no
    parseable metadata; absence is normal, never an error."""
    from ..shipping import ensure_shipped

    ensure_shipped(media.sparkSession)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, keys, vals = [], [], []
            for mid, content in zip(pdf["media_id"], pdf[content_col]):
                blob = bytes(content) if content is not None else b""
                fields: dict = {}
                fields.update(id3v2_fields(blob))
                fields.update(exif_fields(blob))
                fields.update(png_text_fields(blob))
                for k in sorted(fields):
                    v = fields[k]
                    if v is None:
                        continue
                    ids.append(mid)
                    keys.append(k)
                    vals.append(str(v))
            yield pd.DataFrame(
                {"media_id": ids, "key": keys, "value": vals}
            )

    return media.select(
        media[id_col].alias("media_id"), media[content_col]
    ).mapInPandas(kernel, "media_id string, key string, value string")

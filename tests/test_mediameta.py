"""Embedded media metadata extraction (operators/mediameta.py)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pinecone_datasets_spark.operators.mediameta import (
    append_png_text,
    encode_exif_jpeg as exif_jpeg,
    encode_id3v2 as id3v2_tag,
    exif_fields,
    extract_media_metadata,
    id3v2_fields,
    png_text_fields,
)
from pinecone_datasets_spark.operators.mediameta import _syncsafe4


def png_with_text(pairs):
    from pinecone_datasets_spark.operators.media_codecs import encode_png

    return append_png_text(
        encode_png(np.zeros((2, 2, 3), np.uint8)), pairs
    )


def test_id3v2_text_frames_all_versions_and_encodings():
    tag = id3v2_tag(
        [("TIT2", "Ein Titel", 0), ("TPE1", "Artist éƏ", 1),
         ("TALB", "UTF8 ✓", 3)],
        ver=3,
    )
    got = id3v2_fields(tag + b"\xff\xfb\x90\x00" + b"\x00" * 400)
    assert got["TIT2"] == "Ein Titel"
    assert got["TPE1"] == "Artist éƏ"
    assert got["TALB"] == "UTF8 ✓"

    v4 = id3v2_tag([("TDRC", "2021-05-01", 3)], ver=4)
    assert id3v2_fields(v4)["TDRC"] == "2021-05-01"

    # v2.2: 3-letter ids normalize to the v2.3 vocabulary
    body = b"TT2" + (11).to_bytes(3, "big") + b"\x00Old School"
    v2 = b"ID3" + bytes([2, 0, 0]) + _syncsafe4(len(body)) + body
    assert id3v2_fields(v2)["TIT2"] == "Old School"

    assert id3v2_fields(b"not a tag") == {}
    assert id3v2_fields(id3v2_tag([])[:7]) == {}  # truncated header


def test_exif_both_endians_and_gps():
    jpg = exif_jpeg(
        {0x010F: "CamCo", 0x0110: "X100", 0x0132: "2020:01:02 03:04:05"},
        endian="<",
        gps=(48.8583, 2.2944),
    )
    got = exif_fields(jpg)
    assert got["Make"] == "CamCo"
    assert got["Model"] == "X100"
    assert got["DateTime"] == "2020:01:02 03:04:05"
    assert got["gps"] == "1"  # PII presence flag
    assert abs(float(got["gps_lat"]) - 48.8583) < 1e-3
    assert abs(float(got["gps_lon"]) - 2.2944) < 1e-3

    big = exif_fields(exif_jpeg({0x010F: "BigEndian Inc"}, endian=">"))
    assert big["Make"] == "BigEndian Inc"
    assert "gps" not in big

    assert exif_fields(b"\xff\xd8\xff\xd9") == {}  # no APP1
    assert exif_fields(b"notjpeg") == {}
    # truncated APP1 must not raise
    assert isinstance(exif_fields(jpg[:40]), dict)


def test_png_text_chunks():
    png = png_with_text([("Author", "Jane"), ("Comment", "hi there")])
    got = png_text_fields(png)
    assert got == {"Author": "Jane", "Comment": "hi there"}
    from pinecone_datasets_spark.operators.media_codecs import decode_png

    decode_png(png)  # still a valid PNG
    assert png_text_fields(b"\x89PNG\r\n\x1a\nxx") == {}


def test_extract_media_metadata_spark(spark):
    from pinecone_datasets_spark.operators.multimodal import MEDIA_SCHEMA

    mp3 = (
        id3v2_tag([("TIT2", "Song A", 0), ("TPE1", "Band B", 0)])
        + b"\xff\xfb\x90\x00" + b"\x00" * 413
    )
    jpg = exif_jpeg({0x010F: "CamCo"}, gps=(10.5, -3.25))
    png = png_with_text([("Software", "genpix")])
    df = spark.createDataFrame(
        [
            ("m0", "audio", mp3, None, None, None, "mp3"),
            ("m1", "image", jpg, None, None, None, "jpeg"),
            ("m2", "image", png, None, None, None, "png"),
            ("m3", "unknown", b"\x00junk", None, None, None, None),
            ("m4", "unknown", None, None, None, None, None),
        ],
        schema=MEDIA_SCHEMA,
    )
    rows = extract_media_metadata(df).collect()
    got = {(r["media_id"], r["key"]): r["value"] for r in rows}
    assert got[("m0", "TIT2")] == "Song A"
    assert got[("m0", "TPE1")] == "Band B"
    assert got[("m1", "Make")] == "CamCo"
    assert got[("m1", "gps")] == "1"
    assert got[("m2", "Software")] == "genpix"
    assert not [k for k in got if k[0] in ("m3", "m4")]  # zero rows

    # the PII screen a curation pipeline would run
    flagged = (
        extract_media_metadata(df)
        .where("key = 'gps'")
        .select("media_id")
        .collect()
    )
    assert [r["media_id"] for r in flagged] == ["m1"]


def test_gps_west_south_signs():
    got = exif_fields(exif_jpeg({}, gps=(-33.9, -70.6)))
    assert float(got["gps_lat"]) < 0 and float(got["gps_lon"]) < 0


def test_png_itxt_uncompressed_is_parsed():
    """r11 review: the 5-way NUL split consumed the 0x00 compression
    flag byte as a separator, so the uncompressed check could never
    pass — iTXt was unreachable for EVERY input."""
    import zlib as _zlib

    from pinecone_datasets_spark.operators.mediameta import png_text_fields

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", _zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    # keyword NUL flag(0) method(0) lang NUL translated NUL text
    body = b"Title\x00\x00\x00en\x00Titre\x00caf\xc3\xa9 text"
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0))
        + chunk(b"iTXt", body)
        + chunk(b"IEND", b"")
    )
    out = png_text_fields(png)
    assert out == {"Title": "café text"}, out
    # compressed flag (1) still skipped
    body_c = b"K\x00\x01\x00en\x00T\x00zzz"
    png_c = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0))
        + chunk(b"iTXt", body_c)
        + chunk(b"IEND", b"")
    )
    assert png_text_fields(png_c) == {}

"""Subtitle extraction (operators/subtitles.py)."""

from __future__ import annotations

import pytest

from pinecone_datasets_spark.operators.media_codecs import (
    UnsupportedMediaError,
)
from pinecone_datasets_spark.operators.subtitles import (
    encode_srt,
    encode_vtt,
    extract_subtitle_cues,
    parse_subtitles,
)


def test_srt_roundtrip_and_quirks():
    cues = [
        (0, 1500, "First line\nsecond line"),
        (90_000, 93_250, "Later cue"),
        (3_600_000 + 61_000, 3_600_000 + 62_000, "Past one hour"),
    ]
    kind, got = parse_subtitles(encode_srt(cues))
    assert kind == "srt" and got == cues

    # real-world quirks: BOM, miscounted indexes, <i> markup
    quirky = (
        b"\xef\xbb\xbf7\n00:00:01,000 --> 00:00:02,000\n"
        b"<i>styled</i> text\n\n"
        b"3\n00:00:05,000 --> 00:00:06,000\nplain\n"
    )
    kind, got = parse_subtitles(quirky)
    assert kind == "srt"
    assert got == [(1000, 2000, "styled text"), (5000, 6000, "plain")]


def test_vtt_header_notes_ids_settings_and_voice_tags():
    vtt = (
        b"WEBVTT - with description\n\n"
        b"NOTE\nthis block is skipped\nentirely\n\n"
        b"intro-cue\n00:01.000 --> 00:04.000 align:start line:0\n"
        b"<v Roger>Hello</v> <c.loud>there</c>\n\n"
        b"01:00:00.500 --> 01:00:02.000\nHour cue\n"
    )
    kind, got = parse_subtitles(vtt)
    assert kind == "vtt"
    assert got == [
        (1000, 4000, "Hello there"),
        (3_600_500, 3_602_000, "Hour cue"),
    ]
    # writer twin round-trips
    assert parse_subtitles(encode_vtt(got)) == ("vtt", got)


def test_refusal_and_spark_cues(spark):
    with pytest.raises(UnsupportedMediaError, match="subtitle"):
        parse_subtitles(b"just some prose, no timestamps")

    df = spark.createDataFrame(
        [
            ("s", encode_srt([(0, 1000, "a"), (1000, 2000, "b")])),
            ("v", encode_vtt([(0, 500, "c")])),
            ("junk", b"nope"),
        ],
        "media_id string, content binary",
    )
    rows = extract_subtitle_cues(df).collect()
    good = [(r["id"], r["cue_idx"], r["start_ms"], r["text"])
            for r in rows if r["error"] is None]
    assert sorted(good) == [
        ("s", 0, 0, "a"), ("s", 1, 1000, "b"), ("v", 0, 0, "c")
    ]
    errs = [r["id"] for r in rows if r["error"] is not None]
    assert errs == ["junk"]

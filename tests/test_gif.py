"""GIF codec (operators/gif.py): LZW round-trips, interlace, animation
composition (disposal/transparency), dispatch into the shared image
paths."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pinecone_datasets_spark.operators.gif import (
    _lzw_encode_always_clear,
    decode_gif,
    encode_gif,
    iter_gif_frames,
)
from pinecone_datasets_spark.operators.media_codecs import (
    UnsupportedMediaError,
)

_PAL = np.array(
    [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 0]],
    dtype=np.uint8,
)


def _idx_frame(h, w, seed):
    # deterministic pseudo-random indices without RNG state drift
    grid = (np.arange(h)[:, None] * 7 + np.arange(w)[None, :] * 3 + seed)
    return (grid % len(_PAL)).astype(np.uint8)


def test_single_frame_roundtrip_exact():
    idx = _idx_frame(13, 17, 1)
    blob = encode_gif([idx], _PAL)
    assert blob[:6] == b"GIF89a"
    img = decode_gif(blob)
    assert img.shape == (13, 17, 3)
    assert np.array_equal(img, _PAL[idx])
    # deterministic bytes
    assert blob == encode_gif([idx], _PAL)


def test_interlaced_roundtrip_exact():
    idx = _idx_frame(29, 10, 2)  # odd height exercises all 4 passes
    plain = decode_gif(encode_gif([idx], _PAL))
    inter = decode_gif(encode_gif([idx], _PAL, interlace=True))
    assert np.array_equal(plain, inter)
    assert np.array_equal(inter, _PAL[idx])


def test_animation_composition_and_delays():
    frames = [_idx_frame(8, 8, s) for s in range(3)]
    blob = encode_gif(frames, _PAL, delays_cs=[10, 20, 30])
    got = list(iter_gif_frames(blob))
    assert [g["delay_cs"] for g in got] == [10, 20, 30]
    assert [g["index"] for g in got] == [0, 1, 2]
    for g, idx in zip(got, frames):
        assert np.array_equal(g["image"], _PAL[idx])


def test_subrect_transparency_and_disposal_restore_bg():
    """Hand-built GIF: full first frame, then a 2x2 sub-rect frame at
    (1,1) whose index 0 is transparent (underlying pixels show), with
    disposal 2 (restore region to background) before a third frame."""
    sw, sh = 4, 4
    base = _idx_frame(sh, sw, 3)
    patch = np.array([[0, 2], [2, 0]], dtype=np.uint8)  # 0 = transparent
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", sw, sh, 0x80 | 2, 4, 0)  # 8-entry GCT, bg=4
    table = np.zeros((8, 3), np.uint8)
    table[: len(_PAL)] = _PAL
    out += table.tobytes()

    def image_block(idx, left, top, gce_flags, delay=0, tidx=0):
        b = bytearray()
        b += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, gce_flags, delay, tidx, 0)
        h, w = idx.shape
        b += struct.pack("<BHHHHB", 0x2C, left, top, w, h, 0)
        b.append(3)  # lzw min code (8-entry table)
        data = _lzw_encode_always_clear(3, idx)
        for off in range(0, len(data), 255):
            chunk = data[off : off + 255]
            b.append(len(chunk))
            b += chunk
        b.append(0)
        return b

    out += image_block(base, 0, 0, gce_flags=(1 << 2))        # disposal 1
    out += image_block(
        patch, 1, 1, gce_flags=(2 << 2) | 1, tidx=0
    )  # disposal 2, transparent idx 0
    out += image_block(base, 0, 0, gce_flags=(1 << 2))
    out.append(0x3B)

    got = list(iter_gif_frames(bytes(out)))
    assert len(got) == 3
    # frame 2: patch drawn over frame 1; transparent cells keep frame 1
    f2 = got[1]["image"]
    exp = _PAL[base].copy()
    exp[1, 2] = _PAL[2]
    exp[2, 1] = _PAL[2]
    assert np.array_equal(f2, exp)
    # frame 3: the disposal-2 region was restored to bg (idx 4) before
    # the full-screen redraw covered it — final equals base again
    assert np.array_equal(got[2]["image"], _PAL[base])


def test_guards():
    idx = _idx_frame(4, 4, 0)
    blob = bytearray(encode_gif([idx], _PAL))
    with pytest.raises(UnsupportedMediaError):
        decode_gif(b"NOTGIF" + bytes(blob[6:]))
    with pytest.raises(UnsupportedMediaError):
        decode_gif(bytes(blob[:-20]))  # truncated LZW / missing trailer
    # disposal 3 (restore previous) is honestly unsupported
    out = bytearray(encode_gif([idx, idx], _PAL, disposal=3))
    with pytest.raises(UnsupportedMediaError):
        list(iter_gif_frames(bytes(out)))


def test_gif_flows_into_image_features_and_phash(spark):
    from pinecone_datasets_spark.operators.multimodal import (
        extract_image_features,
    )
    from pinecone_datasets_spark.operators.phash import image_phash

    idx = _idx_frame(16, 16, 5)
    blob = encode_gif([idx], _PAL)
    df = spark.createDataFrame(
        [("g1", blob)], "media_id string, content binary"
    )
    feat = extract_image_features(df).collect()[0]
    assert (feat["width"], feat["height"]) == (16, 16)
    exp_luma = float(
        np.mean(_PAL[idx].astype(np.float64) @ [0.299, 0.587, 0.114])
    )
    assert abs(feat["mean_luma"] - exp_luma) < 1.0  # integer luma rounding
    ph = image_phash(df).collect()[0]
    assert ph["phash"] is not None
    assert (ph["width"], ph["height"]) == (16, 16)


def test_animated_gif_frame_sampling(spark):
    from pinecone_datasets_spark.operators.media_codecs import decode_png
    from pinecone_datasets_spark.operators.multimodal import (
        sample_video_frames,
    )

    frames = [_idx_frame(8, 8, s) for s in range(4)]
    blob = encode_gif(frames, _PAL, delays_cs=[50, 50, 50, 50])  # 500ms each
    df = spark.createDataFrame(
        [("anim", blob, None)],
        "media_id string, content binary, duration_ms long",
    )
    got = sample_video_frames(df, every_ms=500).collect()
    assert [r["ts_ms"] for r in got] == [0, 500, 1000, 1500]
    for r, idx in zip(got, frames):
        assert np.array_equal(decode_png(bytes(r["frame"])), _PAL[idx])
    # still GIF: exactly one row at ts 0
    still = spark.createDataFrame(
        [("still", encode_gif(frames[:1], _PAL), None)],
        "media_id string, content binary, duration_ms long",
    )
    assert [
        r["ts_ms"] for r in sample_video_frames(still, every_ms=250).collect()
    ] == [0]


def test_zero_delay_gif_samples_first_frame(spark):
    """ADVICE r7: all-zero delays (single-loop / malformed GIFs) must
    resolve ties at a timestamp to the EARLIEST covering frame, matching
    the fixed-interval path's frames[0] at ts=0 — the pre-fix scan
    picked the LAST frame."""
    from pinecone_datasets_spark.operators.media_codecs import decode_png
    from pinecone_datasets_spark.operators.multimodal import (
        sample_video_frames,
    )

    frames = [_idx_frame(8, 8, s) for s in range(3)]
    blob = encode_gif(frames, _PAL, delays_cs=[0, 0, 0])
    df = spark.createDataFrame(
        [("z", blob, None)],
        "media_id string, content binary, duration_ms long",
    )
    got = sample_video_frames(df, every_ms=250).collect()
    assert [r["ts_ms"] for r in got] == [0]
    assert np.array_equal(decode_png(bytes(got[0]["frame"])), _PAL[frames[0]])
    # mixed: a zero-delay run inside a variable-rate animation — the
    # tick landing on the run's shared start picks the run's FIRST frame
    frames4 = [_idx_frame(8, 8, s) for s in range(4)]
    blob4 = encode_gif(frames4, _PAL, delays_cs=[50, 0, 0, 50])
    df4 = spark.createDataFrame(
        [("m", blob4, None)],
        "media_id string, content binary, duration_ms long",
    )
    got4 = {
        r["ts_ms"]: bytes(r["frame"])
        for r in sample_video_frames(df4, every_ms=500).collect()
    }
    assert sorted(got4) == [0, 500]
    assert np.array_equal(decode_png(got4[0]), _PAL[frames4[0]])
    # starts are [0, 500, 500, 500]; ts=500 covers the run starting at
    # 500 and resolves to its earliest member (frame 1, not 3)
    assert np.array_equal(decode_png(got4[500]), _PAL[frames4[1]])

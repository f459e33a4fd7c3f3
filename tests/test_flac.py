"""FLAC codec (operators/flac.py): exact lossless round-trips,
stereo decorrelation, Rice residual paths, guards, and the audio
kernel/fingerprint integration through decode_audio dispatch."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pinecone_datasets_spark.operators.flac import (
    _Bits,
    _crc8,
    _crc16,
    _BitWriter,
    _write_utf8_coded,
    decode_flac,
    decode_flac_pcm,
    encode_flac,
)
from pinecone_datasets_spark.operators.media_codecs import (
    UnsupportedMediaError,
    decode_audio,
    probe_bytes,
)


def _sig(n=9000, seed=2):
    rng = np.random.default_rng(seed)
    return 0.4 * np.sin(np.arange(n) / 7.0) + 0.05 * rng.normal(size=n)


@pytest.mark.parametrize("order", [0, 1, 2])
def test_roundtrip_exact_mono(order):
    """Lossless format: decode(encode(x)) equals the quantized PCM
    EXACTLY — verbatim (order 0) and fixed-predictor + Rice paths."""
    sig = _sig()
    enc = encode_flac(sig, rate=16000, fixed_order=order, block_size=4096)
    pcm, sr, bps = decode_flac_pcm(enc)
    assert (sr, bps) == (16000, 16)
    expect = np.clip(np.round(sig * 32767), -32768, 32767).astype(np.int64)
    assert np.array_equal(pcm, expect)


def test_roundtrip_stereo_and_bit_depths():
    sig = _sig()
    st = np.stack([sig, -0.5 * sig], axis=1)
    pcm, sr, _ = decode_flac_pcm(encode_flac(st, rate=8000, fixed_order=2))
    assert pcm.shape == (len(sig), 2) and sr == 8000
    exp = np.clip(np.round(st * 32767), -32768, 32767).astype(np.int64)
    assert np.array_equal(pcm, exp)
    for bps in (8, 24):
        peak = (1 << (bps - 1)) - 1
        pcm, _, b = decode_flac_pcm(
            encode_flac(sig[:3000], bps=bps, fixed_order=1)
        )
        assert b == bps
        assert np.array_equal(
            pcm,
            np.clip(
                np.round(sig[:3000] * peak), -(peak + 1), peak
            ).astype(np.int64),
        )


def test_fixed_prediction_actually_compresses():
    sig = _sig()
    verb = encode_flac(sig, fixed_order=0)
    fixd = encode_flac(sig, fixed_order=1)
    assert len(fixd) < len(verb)  # Rice-coded residuals beat verbatim


def _hand_frame_mid_side(left, right, rate=16000, bps=16):
    """Hand-built single-frame FLAC with channel assignment 10
    (mid/side) and VERBATIM subframes — the decorrelation path the
    fixture encoder (independent channels) does not emit."""
    n = len(left)
    mid = (left + right) >> 1
    side = left - right
    out = bytearray(b"fLaC")
    info = bytearray()
    info += struct.pack(">HH", n, n)
    info += b"\x00\x00\x00" * 2
    info.append((rate >> 12) & 0xFF)
    info.append((rate >> 4) & 0xFF)
    info.append(((rate & 0x0F) << 4) | (1 << 1) | ((bps - 1) >> 4))
    info.append((((bps - 1) & 0x0F) << 4) | 0)
    info += struct.pack(">I", n)
    info += b"\x00" * 16
    out.append(0x80)
    out += struct.pack(">I", len(info))[1:]
    out += info
    w = _BitWriter()
    w.write(0b11111111111110, 14)
    w.write(0, 2)
    w.write(7, 4)          # 16-bit blocksize-1 follows
    w.write(0, 4)
    w.write(10, 4)         # mid/side
    w.write(0, 3)
    w.write(0, 1)
    _write_utf8_coded(w, 0)
    w.write(n - 1, 16)
    w.align()
    hdr = w.bytes()
    hdr += bytes([_crc8(hdr)])
    body = _BitWriter()
    for arr, width in ((mid, bps), (side, bps + 1)):
        body.write(0, 1)
        body.write(1, 6)   # VERBATIM
        body.write(0, 1)
        for v in arr:
            body.write(int(v) & ((1 << width) - 1), width)
    body.align()
    frame = hdr + body.bytes()
    out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)


def test_mid_side_decorrelation_decodes():
    rng = np.random.default_rng(9)
    left = rng.integers(-2000, 2000, 64).astype(np.int64)
    right = rng.integers(-2000, 2000, 64).astype(np.int64)
    blob = _hand_frame_mid_side(left, right)
    pcm, sr, _ = decode_flac_pcm(blob)
    assert np.array_equal(pcm[:, 0], left)
    assert np.array_equal(pcm[:, 1], right)


def test_guards_and_probe():
    sig = _sig(3000)
    enc = encode_flac(sig, rate=16000)
    fmt, w, h, dur = probe_bytes(enc)
    assert fmt == "flac" and (w, h) == (None, None)
    assert dur == 3000 * 1000 // 16000
    with pytest.raises(UnsupportedMediaError, match="not a FLAC"):
        decode_flac_pcm(b"garbage bytes here")
    with pytest.raises(UnsupportedMediaError):
        decode_flac_pcm(enc[: len(enc) // 2])  # truncated mid-frame
    # corrupt a frame-header byte -> CRC-8 refusal (sync byte offset:
    # first frame starts right after the 4+4+34-byte metadata)
    bad = bytearray(enc)
    bad[4 + 4 + 34 + 3] ^= 0x10
    with pytest.raises(UnsupportedMediaError):
        decode_flac_pcm(bytes(bad))


def test_decode_audio_dispatch_and_fingerprint(spark):
    """FLAC flows through the SAME audio kernels as WAV: spectral
    features agree between the two encodings of one signal, and the
    audio fingerprint matches across formats (format-independent
    near-dup)."""
    from pinecone_datasets_spark.operators.media_codecs import encode_wav
    from pinecone_datasets_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_fingerprint,
        extract_audio_features,
    )

    sig = _sig(16000)
    # hand encode_flac the EXACT int16 PCM the WAV encoder produces
    # (their float->int rounding differs by 1 LSB otherwise), so both
    # containers carry identical samples
    pcm16 = np.clip(sig * 32767.0, -32768, 32767).astype(np.int64)
    rows = [
        ("wavv", "audio", encode_wav(sig, rate=16000),
         None, None, None, None),
        ("flacv", "audio", encode_flac(pcm16, rate=16000, fixed_order=2),
         None, None, None, None),
    ]
    df = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    feats = {
        r["media_id"]: r for r in extract_audio_features(df).collect()
    }
    assert feats["flacv"]["sample_rate"] == 16000
    assert abs(feats["flacv"]["rms"] - feats["wavv"]["rms"]) < 1e-6
    fps = {r["media_id"]: r["afp"] for r in audio_fingerprint(df).collect()}
    assert fps["flacv"] == fps["wavv"]  # identical PCM -> identical bits
    # sanity: dispatch rejects unknown magic with the typed error
    with pytest.raises(UnsupportedMediaError):
        decode_audio(b"\x00\x01\x02\x03 not audio")


def test_flac_corruption_fuzz_never_uncontrolled():
    """Byte-flip fuzz: every mutation either decodes or raises the
    typed UnsupportedMediaError — no uncontrolled exception escapes
    the decode boundary (the audio kernels' quarantine contract)."""
    sig = _sig(4000)
    enc = encode_flac(sig, rate=16000, fixed_order=1)
    rng = np.random.default_rng(13)
    for pos in rng.integers(4, len(enc), size=150):
        mutated = bytearray(enc)
        mutated[pos] ^= 1 << int(rng.integers(0, 8))
        try:
            pcm, sr, bps = decode_flac_pcm(bytes(mutated))
            assert sr > 0 and bps in (8, 16, 24)
        except UnsupportedMediaError:
            pass


def test_flac_hostile_streams_raise_typed_errors():
    """r11 review (repro'd): two untyped leaks past the documented
    UnsupportedMediaError-only contract — blocksize < LPC order hit
    np.empty(negative) ValueError, and a STREAMINFO whose declared
    length is 34 but whose body is shorter hit raw IndexError."""
    from pinecone_datasets_spark.operators.flac import (
        UnsupportedMediaError,
        decode_flac_pcm,
    )

    # declared length 34, actual body 10 bytes
    truncated = b"fLaC" + bytes([0x80, 0, 0, 34]) + b"\x00" * 10
    with pytest.raises(UnsupportedMediaError):
        decode_flac_pcm(truncated)

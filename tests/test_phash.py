"""Perceptual image hashing + complete Hamming near-dup join."""

import numpy as np
import pytest

from pinecone_datasets_spark.operators.phash import (
    _pack_bits,
    ahash64,
    dhash64,
    hamming_neardup_pairs,
    image_neardup_pairs,
    image_phash,
    mean_pool,
)


# ---------------------------------------------------------------------------
# pure-numpy kernels
# ---------------------------------------------------------------------------


def test_mean_pool_exact_blocks():
    # 4x4 → 2x2: each cell is the mean of a 2x2 block
    a = np.arange(16, dtype=np.float64).reshape(4, 4)
    g = mean_pool(a, 2, 2)
    assert np.allclose(
        g, [[(0 + 1 + 4 + 5) / 4, (2 + 3 + 6 + 7) / 4],
            [(8 + 9 + 12 + 13) / 4, (10 + 11 + 14 + 15) / 4]]
    )


def test_mean_pool_uneven_and_tiny():
    # 5 rows into 2 → blocks of (2, 3) rows; integer-boundary, no interp
    a = np.ones((5, 3))
    g = mean_pool(a, 2, 2)
    assert g.shape == (2, 2) and np.allclose(g, 1.0)
    # tiny image upsamples by repetition — block means preserved exactly
    b = np.array([[1.0, 2.0], [3.0, 4.0]])
    g = mean_pool(b, 8, 8)
    assert g.shape == (8, 8)
    assert np.allclose(g[0, 0], 1.0) and np.allclose(g[7, 7], 4.0)
    with pytest.raises(ValueError):
        mean_pool(np.empty((0, 3)), 8, 8)


def test_pack_bits_signed_int64():
    bits = np.zeros(64, dtype=bool)
    bits[0] = True
    assert _pack_bits(bits) == 1
    bits = np.zeros(64, dtype=bool)
    bits[63] = True
    assert _pack_bits(bits) == -(1 << 63)  # two's complement wrap
    assert _pack_bits(np.ones(64, dtype=bool)) == -1


def _grad_image(h=40, w=56, tilt=1.0):
    y, x = np.mgrid[0:h, 0:w]
    return (x * tilt + y * 0.5).astype(np.float64)


def test_dhash_brightness_shift_invariant():
    luma = _grad_image()
    assert dhash64(luma) == dhash64(luma + 37.0)
    # ahash is NOT shift-invariant in general but IS contrast-scale
    # invariant (every cell-vs-mean comparison survives c * luma)
    assert ahash64(luma) == ahash64(luma * 3.5)


def test_hash_upscale_invariant():
    # pixel-doubling preserves every block mean → identical hashes
    luma = _grad_image(24, 24)
    up = np.repeat(np.repeat(luma, 2, axis=0), 2, axis=1)
    assert dhash64(luma) == dhash64(up)
    assert ahash64(luma) == ahash64(up)


def test_dhash_differs_across_images():
    a = dhash64(_grad_image(tilt=1.0))
    b = dhash64(_grad_image(tilt=-1.0))  # reversed gradient flips bits
    assert a != b
    assert bin((a ^ b) & ((1 << 64) - 1)).count("1") > 16


# ---------------------------------------------------------------------------
# pigeonhole Hamming join
# ---------------------------------------------------------------------------


def _flip_bits(h, positions):
    v = h & ((1 << 64) - 1)
    for p in positions:
        v ^= 1 << int(p)
    if v >= 1 << 63:
        v -= 1 << 64
    return v


def test_hamming_join_complete_vs_bruteforce(spark):
    """The band join finds EXACTLY the brute-force ≤ max_hamming set —
    recall 1.0 by pigeonhole, precision 1.0 by the bit_count verify."""
    rng = np.random.default_rng(11)
    base = [int(x) for x in rng.integers(-(1 << 62), 1 << 62, size=30)]
    rows = [(f"m{i}", h) for i, h in enumerate(base)]
    # seed pairs at controlled distances: 0, 3, 6 (in), 7, 20 (out) for k=6
    for j, dist in enumerate([0, 3, 6, 7, 20]):
        rows.append(
            (f"dup{j}", _flip_bits(base[j], rng.choice(64, dist, replace=False)))
        )
    df = spark.createDataFrame(rows, "media_id string, phash long")
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in hamming_neardup_pairs(df, max_hamming=6).collect()
    }
    # brute force
    want = {}
    for i, (ida, ha) in enumerate(rows):
        for idb, hb in rows[i + 1:]:
            d = bin((ha ^ hb) & ((1 << 64) - 1)).count("1")
            if d <= 6:
                key = (ida, idb) if ida < idb else (idb, ida)
                want[key] = d
    assert got == want
    assert got[("dup0", "m0")] == 0 and got[("dup2", "m2")] == 6
    assert not any("dup3" in k or "dup4" in k for pair in got for k in pair)


def test_hamming_join_excludes_null_hashes(spark):
    df = spark.createDataFrame(
        [("a", 5), ("b", 5), ("c", None)], "media_id string, phash long"
    )
    got = hamming_neardup_pairs(df, max_hamming=2).collect()
    assert [(r.id_a, r.id_b, r.hamming) for r in got] == [("a", "b", 0)]


def test_hamming_join_guards(spark):
    df = spark.createDataFrame([("a", 5)], "media_id string, phash long")
    with pytest.raises(ValueError):
        hamming_neardup_pairs(df, max_hamming=0)
    with pytest.raises(ValueError):
        hamming_neardup_pairs(df, max_hamming=64)


# ---------------------------------------------------------------------------
# Spark end-to-end over real PNG bytes
# ---------------------------------------------------------------------------


def _png_bytes(luma2d):
    from pinecone_datasets_spark.operators.media_codecs import encode_png

    img = np.stack([luma2d.astype(np.uint8)] * 3, axis=2)
    return encode_png(img)


def test_image_neardup_end_to_end(spark):
    base = (_grad_image(32, 32, tilt=2.0) % 200).astype(np.uint8).astype(float)
    noisy = base.copy()
    noisy[:2, :2] += 4.0  # tiny corner perturbation
    other = (_grad_image(32, 32, tilt=-2.0) % 200).astype(np.uint8).astype(float)
    rows = [
        ("base", bytearray(_png_bytes(base))),
        ("noisy", bytearray(_png_bytes(noisy))),
        ("other", bytearray(_png_bytes(other))),
        ("junk", bytearray(b"not an image")),
    ]
    media = spark.createDataFrame(rows, "media_id string, content binary")
    hashes = {r.media_id: r.phash for r in image_phash(media).collect()}
    assert hashes["junk"] is None
    assert hashes["base"] is not None
    pairs = {
        (r.id_a, r.id_b)
        for r in image_neardup_pairs(media, max_hamming=6).collect()
    }
    assert ("base", "noisy") in pairs
    assert ("base", "other") not in pairs and ("other", "base") not in pairs


def test_image_phash_fake_plumbing(spark):
    rows = [("a", bytearray(b"\x01\x02")), ("b", bytearray(b"\x01\x02")),
            ("c", bytearray(b"zzz"))]
    media = spark.createDataFrame(rows, "media_id string, content binary")
    out = {r.media_id: r.phash for r in image_phash(media, fake=True).collect()}
    assert out["a"] == out["b"] != out["c"]
    with pytest.raises(ValueError):
        image_phash(media, method="md5")


def test_image_phash_non_default_id_col(spark):
    """Regression: the kernel must read the post-select alias, not the
    caller's id_col name (pdf[id_col] KeyError'd inside the worker)."""
    base = (_grad_image(16, 16) % 200).astype(np.uint8).astype(float)
    rows = [("d1", bytearray(_png_bytes(base)))]
    media = spark.createDataFrame(rows, "doc_id string, content binary")
    out = image_phash(media, id_col="doc_id").collect()
    assert [r.media_id for r in out] == ["d1"]
    assert out[0].phash is not None
    # and through the pair join, which forwards id_col
    pairs = image_neardup_pairs(media, id_col="doc_id")
    assert pairs.count() == 0  # single image, no pairs — but no crash


def test_image_phash_corrupt_png_magic_yields_null(spark):
    """Bytes with a valid PNG magic but corrupt innards (truncated IHDR
    -> struct.error, bad IDAT -> zlib.error) yield NULL, not a failed
    job."""
    magic = b"\x89PNG\r\n\x1a\n"
    base = (_grad_image(16, 16) % 200).astype(np.uint8).astype(float)
    good = _png_bytes(base)
    rows = [
        ("trunc_hdr", bytearray(magic + b"\x00\x00\x00\x0dIHDR\x01")),
        ("bad_idat", bytearray(good[:40] + b"\xff" * 20)),
        ("ok", bytearray(good)),
    ]
    media = spark.createDataFrame(rows, "media_id string, content binary")
    out = {r.media_id: r.phash for r in image_phash(media).collect()}
    assert out["trunc_hdr"] is None
    assert out["bad_idat"] is None
    assert out["ok"] is not None

"""Baseline JPEG codec — pure stdlib + NumPy, no external codec libs.

Completes the honest-codec policy of ``media_codecs`` (PNG: real zlib
inflate + defilter; BMP/WAV/AVI: real struct parsing): MJPEG AVI frames
extracted by ``decode_avi`` are standalone baseline JPEGs, and until
this module they could not feed ``extract_image_features`` (VERDICT r6
item 7 — the DIB path could, the MJPG path could not).

Scope — baseline sequential DCT (SOF0/SOF1) AND progressive (SOF2:
spectral selection, successive approximation, EOB runs — the T.81 G.2
/ jdphuff.c state machine; ~10% of real web JPEGs), 8-bit samples,
Huffman coding, 1 (grayscale) or 3 (YCbCr/JFIF) components, sampling
factors 1–2 (4:4:4 / 4:2:2 / 4:2:0), restart markers, 8- and 16-bit
quantization tables. Arithmetic coding, hierarchical, lossless, and
12-bit raise ``UnsupportedMediaError`` — honest refusal, not a wrong
picture.

The encoder exists as the fixture twin (same role as ``encode_png`` /
``encode_wav``): round-trip tests bound decode error by the DCT
quantization the format itself introduces, with no third-party codec
in the loop. The decoder never assumes the encoder's tables — it reads
DQT/DHT/SOF/SOS from the stream like any conformant reader.

Spark integration is upstream: ``multimodal.extract_image_features``
dispatches ``FF D8`` bytes here inside its Arrow ``mapInPandas`` kernel
(batch-level Python crossing, pixels never shuffle — scale shape
unchanged). Reference scope: the reference stores opaque blobs and
never decodes (``cfg.py:23-36``); Layer-B extension.
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

from .media_codecs import MAX_DECODE_PIXELS, UnsupportedMediaError

# ---------------------------------------------------------------------------
# Tables (ITU-T T.81 Annex K)
# ---------------------------------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

_QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.float64,
)

_QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.float64,
)

# (BITS[1..16], HUFFVAL) — canonical code assignment makes the encoder
# and decoder agree by construction even if a value here drifted from
# Annex K; the decoder always reads DHT from the stream.
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# orthonormal DCT-II basis: FDCT F = C @ B @ C.T, IDCT B = C.T @ F @ C
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _cu = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
        _C[_u, _x] = 0.5 * _cu * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _canonical_codes(bits, values):
    """(BITS, HUFFVAL) → {value: (code, length)} via T.81 C.2."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits, values):
    """(BITS, HUFFVAL) → {(length, code): value} for the bit reader."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling, clamped to [1, 255]."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    t = np.floor((base * scale + 50) / 100)
    return np.clip(t, 1, 255)


def _magnitude(v: int) -> tuple[int, int]:
    """value → (category, magnitude bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # pad with 1s
        return bytes(self.buf)


def _fdct_quant(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """(H, W) float plane (already level-shifted) → (nby, nbx, 64)
    zigzagged quantized int coefficients; one einsum over all blocks."""
    h, w = plane.shape
    nby, nbx = h // 8, w // 8
    blocks = plane.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
    coef = np.einsum("ux,byxv,wv->byuw", _C, blocks, _C, optimize=True)
    qz = np.round(coef.reshape(nby, nbx, 64)[:, :, ZIGZAG] / qtab)
    return qz.astype(np.int64)


def _pad_edge(plane: np.ndarray, mult_h: int, mult_w: int) -> np.ndarray:
    """Edge-replicate pad each axis up to its own multiple."""
    h, w = plane.shape
    ph = (-h) % mult_h
    pw = (-w) % mult_w
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _prepare_coefs(
    pixels: np.ndarray, quality: int, subsample: str
):
    """Shared encoder front end: validate, color-convert, subsample,
    FDCT + quantize. Returns (coefs, gray, h, w, sh, sv, qy, qc)."""
    pixels = np.asarray(pixels)
    if pixels.dtype != np.uint8 or pixels.ndim not in (2, 3):
        raise ValueError("pixels must be uint8 (h,w,3) or (h,w)")
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    if h < 1 or w < 1:
        raise ValueError("empty image")
    if subsample not in ("444", "422", "420"):
        raise ValueError(f"subsample must be 444/422/420: {subsample}")
    sh, sv = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}[subsample]
    if gray:
        sh = sv = 1

    qy = _scaled_quant(_QUANT_LUMA, quality)[ZIGZAG]
    qc = _scaled_quant(_QUANT_CHROMA, quality)[ZIGZAG]

    p = pixels.astype(np.float64)
    if gray:
        planes = [p]
    else:
        r, g, b = p[:, :, 0], p[:, :, 1], p[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if (sh, sv) != (1, 1):
            cbp = _pad_edge(cb, sv, sh)
            crp = _pad_edge(cr, sv, sh)
            cb = cbp.reshape(
                cbp.shape[0] // sv, sv, cbp.shape[1] // sh, sh
            ).mean(axis=(1, 3))
            cr = crp.reshape(
                crp.shape[0] // sv, sv, crp.shape[1] // sh, sh
            ).mean(axis=(1, 3))
        planes = [y, cb, cr]

    # luma pads to the MCU grid (8*sv rows × 8*sh cols); each chroma
    # plane then pads to exactly (mcus_y*8, mcus_x*8) so every MCU has
    # its full block complement
    luma = _pad_edge(planes[0], 8 * sv, 8 * sh)
    coefs = [_fdct_quant(luma - 128.0, qy)]
    ch, cw = luma.shape[0] // sv, luma.shape[1] // sh
    for c in planes[1:]:
        c = np.pad(
            c,
            ((0, ch - c.shape[0]), (0, cw - c.shape[1])),
            mode="edge",
        )
        coefs.append(_fdct_quant(c - 128.0, qc))
    return coefs, gray, h, w, sh, sv, qy, qc


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(
        ">H", len(payload) + 2
    ) + payload


def _dht_seg(cls: int, tid: int, bits, values) -> bytes:
    return _seg(
        0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(values)
    )


def _headers(
    gray: bool, h: int, w: int, sh: int, sv: int, qy, qc,
    sof_marker: int, ac_tables,
) -> bytes:
    """SOI..DHT header prefix shared by the baseline and progressive
    encoders (the SOF marker and AC table pair differ)."""
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(
        0xE0,
        b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00",
    )
    out += _seg(0xDB, bytes([0x00]) + bytes(int(v) for v in qy))
    if not gray:
        out += _seg(0xDB, bytes([0x01]) + bytes(int(v) for v in qc))
    ncomp = 1 if gray else 3
    sof = bytearray(struct.pack(">BHHB", 8, h, w, ncomp))
    samp = [(sh << 4) | sv, 0x11, 0x11]
    qids = [0, 1, 1]
    for ci in range(ncomp):
        sof += bytes(
            [
                ci + 1,
                samp[ci] if not gray else 0x11,
                qids[ci] if not gray else 0,
            ]
        )
    out += _seg(sof_marker, bytes(sof))
    ac_luma, ac_chroma = ac_tables
    out += _dht_seg(0, 0, *_DC_LUMA)
    out += _dht_seg(1, 0, *ac_luma)
    if not gray:
        out += _dht_seg(0, 1, *_DC_CHROMA)
        out += _dht_seg(1, 1, *ac_chroma)
    return bytes(out)


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 85,
    subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """uint8 (h, w, 3) RGB or (h, w) grayscale → baseline JFIF bytes.

    ``subsample``: '444' (no chroma subsampling), '422', or '420'
    (2×2-mean downsampled chroma). ``restart_interval`` > 0 inserts
    DRI/RSTn markers every that many MCUs.
    """
    coefs, gray, h, w, sh, sv, qy, qc = _prepare_coefs(
        pixels, quality, subsample
    )
    n_planes = 1 if gray else 3

    dc_y = _canonical_codes(*_DC_LUMA)
    ac_y = _canonical_codes(*_AC_LUMA)
    dc_c = _canonical_codes(*_DC_CHROMA)
    ac_c = _canonical_codes(*_AC_CHROMA)
    comp_codes = [(dc_y, ac_y)] + [(dc_c, ac_c)] * (n_planes - 1)

    def emit_block(wtr, zz, pred, dc_tab, ac_tab):
        diff = int(zz[0]) - pred
        size, bits = _magnitude(diff)
        code, length = dc_tab[size]
        wtr.put(code, length)
        wtr.put(bits, size)
        run = 0
        last_nz = 0
        for i in range(63, 0, -1):
            if zz[i]:
                last_nz = i
                break
        for i in range(1, last_nz + 1):
            v = int(zz[i])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_tab[0xF0]  # ZRL
                wtr.put(code, length)
                run -= 16
            size, bits = _magnitude(v)
            code, length = ac_tab[(run << 4) | size]
            wtr.put(code, length)
            wtr.put(bits, size)
            run = 0
        if last_nz < 63:
            code, length = ac_tab[0x00]  # EOB
            wtr.put(code, length)
        return int(zz[0])

    mcus_x = coefs[0].shape[1] // sh
    mcus_y = coefs[0].shape[0] // sv
    wtr = _BitWriter()
    preds = [0] * n_planes
    scan = bytearray()
    rst = 0
    n_mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (
                restart_interval
                and n_mcu
                and n_mcu % restart_interval == 0
            ):
                scan += wtr.flush()
                scan += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                wtr = _BitWriter()
                preds = [0] * n_planes
            for ci, coef in enumerate(coefs):
                dc_tab, ac_tab = comp_codes[ci]
                if ci == 0:
                    for by in range(sv):
                        for bx in range(sh):
                            preds[0] = emit_block(
                                wtr,
                                coef[my * sv + by, mx * sh + bx],
                                preds[0],
                                dc_tab,
                                ac_tab,
                            )
                else:
                    preds[ci] = emit_block(
                        wtr, coef[my, mx], preds[ci], dc_tab, ac_tab
                    )
            n_mcu += 1
    scan += wtr.flush()

    # ---- headers -------------------------------------------------------
    out = bytearray(
        _headers(gray, h, w, sh, sv, qy, qc, 0xC0, (_AC_LUMA, _AC_CHROMA))
    )
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    ncomp = n_planes
    sos = bytearray([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if (gray or ci == 0) else 0x11])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, bytes(sos))
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _build_huffman(freqs: dict) -> tuple[list[int], list[int]]:
    """Optimal length-limited Huffman table from symbol frequencies —
    T.81 K.2 (the jchuff.c procedure): pair-merge code sizes, fold
    lengths > 16 down, drop the reserved all-ones code point. Needed
    because progressive AC scans emit EOBn symbols (r<<4, r>0) that
    the Annex-K tables have no room for (their 16-bit level has a
    single spare code)."""
    freq = [0] * 257
    for sym, f in freqs.items():
        freq[sym] = f
    freq[256] = 1  # reserved: guarantees no real symbol gets all-ones
    codesize = [0] * 257
    others = [-1] * 257
    while True:
        nz = [(f, -v) for v, f in enumerate(freq) if f > 0]
        if len(nz) < 2:
            break
        nz.sort()
        v1 = -nz[0][1]
        v2 = -nz[1][1]
        freq[v1] += freq[v2]
        freq[v2] = 0
        codesize[v1] += 1
        while others[v1] >= 0:
            v1 = others[v1]
            codesize[v1] += 1
        others[v1] = v2
        codesize[v2] += 1
        while others[v2] >= 0:
            v2 = others[v2]
            codesize[v2] += 1
    bits = [0] * 33
    for v in range(257):
        if codesize[v]:
            bits[codesize[v]] += 1
    i = 32
    while i > 16:
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    i = 16
    while i > 0 and bits[i] == 0:
        i -= 1
    if i > 0:
        bits[i] -= 1  # remove the reserved code point
    # range(1, 33), NOT 17: the length-limit fold above only adjusts
    # bits[] — symbols whose PRE-fold code size exceeded 16 still carry
    # codesize > 16 and must be emitted (in their original depth order)
    # or bits/huffval go inconsistent and _canonical_codes IndexErrors
    # on sufficiently skewed symbol distributions (r11 review, repro'd;
    # jchuff.c iterates to MAX_CLEN=32 for exactly this reason)
    huffval = [
        v
        for size in range(1, 33)
        for v in range(256)
        if codesize[v] == size
    ]
    return bits[1:17], huffval


class _FreqCounter:
    """Pass-1 'writer': counts Huffman symbols, ignores raw bits."""

    def __init__(self) -> None:
        self.freqs: dict = {}

    def sym(self, s: int) -> None:
        self.freqs[s] = self.freqs.get(s, 0) + 1

    def raw(self, val: int, n: int) -> None:
        pass


class _CodeWriter:
    """Pass-2 writer: canonical codes into a _BitWriter."""

    def __init__(self, wtr: _BitWriter, codes: dict) -> None:
        self.wtr = wtr
        self.codes = codes

    def sym(self, s: int) -> None:
        code, length = self.codes[s]
        self.wtr.put(code, length)

    def raw(self, val: int, n: int) -> None:
        self.wtr.put(val, n)


def _emit_ac_first(out, blocks, ss, se, al) -> None:
    """AC first-scan emission (G.1.2.2): band values point-transformed
    by ``|v| >> al`` with sign reapplied, EOB-run accumulation."""
    eobrun = 0

    def flush() -> None:
        nonlocal eobrun
        if eobrun > 0:
            r = eobrun.bit_length() - 1
            out.sym(r << 4)
            out.raw(eobrun - (1 << r), r)
            eobrun = 0

    for zz in blocks:
        vals = [
            (1 if int(v) >= 0 else -1) * (abs(int(v)) >> al)
            for v in zz[ss : se + 1]
        ]
        if not any(vals):
            eobrun += 1
            if eobrun == 0x4000:
                flush()
            continue
        flush()
        run = 0
        last_nz = max(i for i, v in enumerate(vals) if v)
        for v in vals[: last_nz + 1]:
            if v == 0:
                run += 1
                continue
            while run > 15:
                out.sym(0xF0)  # ZRL
                run -= 16
            size, bits = _magnitude(v)
            out.sym((run << 4) | size)
            out.raw(bits, size)
            run = 0
        if last_nz < len(vals) - 1:
            eobrun += 1
    flush()


def _emit_ac_refine(out, blocks, ss, se, al) -> None:
    """AC refinement emission (G.1.2.3, the jcphuff.c state machine):
    newly-significant coefficients as (run<<4)|1 + sign bit,
    already-significant ones as buffered correction bits, EOB runs
    carrying their correction bits."""
    eobrun = 0
    eob_bits: list[int] = []

    def flush() -> None:
        nonlocal eobrun, eob_bits
        if eobrun > 0:
            r = eobrun.bit_length() - 1
            out.sym(r << 4)
            out.raw(eobrun - (1 << r), r)
            eobrun = 0
        for bval in eob_bits:
            out.raw(bval, 1)
        eob_bits = []

    for zz in blocks:
        band = [int(v) for v in zz[ss : se + 1]]
        absv = [abs(v) >> al for v in band]
        eob_pos = -1
        for i, a in enumerate(absv):
            if a == 1:
                eob_pos = i
        r = 0
        br: list[int] = []
        for i, a in enumerate(absv):
            if a == 0:
                r += 1
                continue
            while r > 15 and i <= eob_pos:
                flush()
                out.sym(0xF0)  # ZRL
                r -= 16
                for bval in br:
                    out.raw(bval, 1)
                br = []
            if a > 1:
                br.append(a & 1)
                continue
            flush()
            out.sym((r << 4) | 1)
            out.raw(1 if band[i] >= 0 else 0, 1)
            for bval in br:
                out.raw(bval, 1)
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            eob_bits.extend(br)
            if eobrun == 0x4000:
                flush()
    flush()


def encode_jpeg_progressive(
    pixels: np.ndarray,
    quality: int = 85,
    subsample: str = "444",
) -> bytes:
    """uint8 (h, w, 3) RGB or (h, w) grayscale → progressive (SOF2)
    JFIF bytes — the fixture twin for the SOF2 decode path (same role
    as ``encode_jpeg`` for baseline; ~10% of real web JPEGs are
    progressive, so pHash dedup needs this slice decoded, not
    quarantined).

    Scan script (spectral selection × one successive-approximation
    level, the jcparam.c shape): interleaved DC first at Al=1; per
    component AC first scans (luma split 1–5 / 6–63 to exercise band
    logic, chroma 1–63) at Al=1; DC refinement to Al=0; matching AC
    refinement scans to Al=0. Each AC scan carries its own K.2-optimal
    Huffman table in a preceding DHT (EOBn symbols don't fit the
    Annex-K tables — the reason IJG requires optimized tables for
    progressive). Quantized coefficients are identical to
    ``encode_jpeg``'s, so decoding either stream yields bit-identical
    pixels — the round-trip tests assert exactly that."""
    coefs, gray, h, w, sh, sv, qy, qc = _prepare_coefs(
        pixels, quality, subsample
    )
    n_planes = 1 if gray else 3
    dc_codes = [_canonical_codes(*_DC_LUMA)] + [
        _canonical_codes(*_DC_CHROMA)
    ] * (n_planes - 1)

    mcus_x = coefs[0].shape[1] // sh
    mcus_y = coefs[0].shape[0] // sv
    samp = [(sh, sv)] + [(1, 1)] * (n_planes - 1)

    def comp_blocks(ci: int) -> np.ndarray:
        """Component's blocks in raster order, true dims (non-
        interleaved scans never visit MCU padding blocks)."""
        hi, vi = samp[ci]
        nby, nbx = _comp_block_dims(h, w, hi, vi, sh, sv)
        return coefs[ci][:nby, :nbx].reshape(nby * nbx, 64)

    def sos_header(comp_ids, ss, se, ah, al) -> bytes:
        sos = bytearray([len(comp_ids)])
        for ci in comp_ids:
            sos += bytes([ci + 1, (min(ci, 1) << 4) | min(ci, 1)])
        sos += bytes([ss, se, (ah << 4) | al])
        return _seg(0xDA, bytes(sos))

    def dc_scan(refine: bool) -> bytes:
        wtr = _BitWriter()
        preds = [0] * n_planes
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci in range(n_planes):
                    hi, vi = samp[ci]
                    for by in range(vi):
                        for bx in range(hi):
                            yy = my * vi + by if ci == 0 else my
                            xx = mx * hi + bx if ci == 0 else mx
                            c0 = int(coefs[ci][yy, xx, 0])
                            if refine:
                                wtr.put(c0 & 1, 1)
                            else:
                                v = c0 >> 1  # Al=1 point transform
                                diff = v - preds[ci]
                                preds[ci] = v
                                size, bits = _magnitude(diff)
                                code, length = dc_codes[ci][size]
                                wtr.put(code, length)
                                wtr.put(bits, size)
        hdr = sos_header(
            list(range(n_planes)), 0, 0, 1 if refine else 0,
            0 if refine else 1,
        )
        return hdr + wtr.flush()

    out = bytearray(
        _headers(
            gray, h, w, sh, sv, qy, qc, 0xC2, (_AC_LUMA, _AC_CHROMA)
        )
    )
    out += dc_scan(refine=False)

    al_ac = 1
    comp_bands = [(0, (1, 5)), (0, (6, 63))] + [
        (ci, (1, 63)) for ci in range(1, n_planes)
    ]

    def ac_scan(ci, ss, se, refine: bool) -> bytes:
        blocks = comp_blocks(ci)
        emit = _emit_ac_refine if refine else _emit_ac_first
        counter = _FreqCounter()
        emit(counter, blocks, ss, se, 0 if refine else al_ac)
        bits, vals = _build_huffman(counter.freqs)
        tid = min(ci, 1)
        wtr = _BitWriter()
        emit(
            _CodeWriter(wtr, _canonical_codes(bits, vals)),
            blocks, ss, se, 0 if refine else al_ac,
        )
        return (
            _dht_seg(1, tid, bits, vals)
            + sos_header(
                [ci], ss, se, 1 if refine else 0,
                0 if refine else al_ac,
            )
            + wtr.flush()
        )

    for ci, (ss, se) in comp_bands:
        out += ac_scan(ci, ss, se, refine=False)
    out += dc_scan(refine=True)
    for ci, (ss, se) in comp_bands:
        out += ac_scan(ci, ss, se, refine=True)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise UnsupportedMediaError("truncated JPEG scan data")
        self.acc = (self.acc << 8) | self.data[self.pos]
        self.pos += 1
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            v = table.get((length, code))
            if v is not None:
                return v
        raise UnsupportedMediaError("invalid Huffman code in JPEG scan")


def _extend(bits: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: magnitude bits → signed value."""
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


def decode_jpeg(content: bytes) -> np.ndarray:
    """Baseline (SOF0/SOF1) or progressive (SOF2) JPEG bytes → uint8
    (h, w, 3) RGB (grayscale replicated).

    Raises ``UnsupportedMediaError`` on arithmetic-coded/hierarchical/
    12-bit streams and malformed/truncated data — never returns a
    wrong picture.
    """
    try:
        return _decode_jpeg(content)
    except UnsupportedMediaError:
        raise  # intentional refusals keep their own message (a
        # ValueError subclass — the clause below would double-wrap it)
    except (struct.error, IndexError, KeyError, ValueError) as e:
        # truncated headers/tables surface as short reads; corrupt
        # component/table ids as missing-key lookups; same honest
        # refusal as the bit reader's in-scan truncation path
        raise UnsupportedMediaError(f"malformed JPEG: {e!r}") from e


def _decode_jpeg(content: bytes) -> np.ndarray:
    if content[:2] != b"\xff\xd8":
        raise UnsupportedMediaError("not a JPEG")
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    sof = None
    progressive = False
    restart = 0
    i = 2
    n = len(content)
    # each scan: (scan_comps, ss, se, ah, al, restart, segments, htabs)
    scans: list[tuple] = []
    while i + 4 <= n:
        if content[i] != 0xFF:
            raise UnsupportedMediaError("bad JPEG marker stream")
        marker = content[i + 1]
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", content, i + 2)
        payload = content[i + 4 : i + 2 + seglen]
        if marker == 0xDB:
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                p += 1
                if pq == 0:
                    tab = np.frombuffer(
                        payload[p : p + 64], dtype=np.uint8
                    ).astype(np.float64)
                    p += 64
                else:
                    tab = np.frombuffer(
                        payload[p : p + 128], dtype=">u2"
                    ).astype(np.float64)
                    p += 128
                qtabs[tq] = tab
        elif marker == 0xC4:
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0x0F
                bits = list(payload[p + 1 : p + 17])
                cnt = sum(bits)
                vals = list(payload[p + 17 : p + 17 + cnt])
                htabs[(tc, th)] = _decode_table(bits, vals)
                p += 17 + cnt
        elif marker in (0xC0, 0xC1, 0xC2):
            prec, fh, fw, nc = struct.unpack_from(">BHHB", payload, 0)
            if prec != 8:
                raise UnsupportedMediaError(f"{prec}-bit JPEG unsupported")
            comps = []
            for c in range(nc):
                cid, hv, tq = payload[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            sof = (fh, fw, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise UnsupportedMediaError(
                "only baseline (SOF0/SOF1) and progressive (SOF2) "
                "JPEG are supported"
            )
        elif marker == 0xDD:
            (restart,) = struct.unpack_from(">H", payload, 0)
        elif marker == 0xDA:
            ns = payload[0]
            scan_comps = [
                (payload[1 + 2 * c], payload[2 + 2 * c] >> 4,
                 payload[2 + 2 * c] & 0x0F)
                for c in range(ns)
            ]
            ss = payload[1 + 2 * ns]
            se = payload[2 + 2 * ns]
            ah = payload[3 + 2 * ns] >> 4
            al = payload[3 + 2 * ns] & 0x0F
            i = i + 2 + seglen
            # entropy bytes: unstuff FF00, split on RSTn, stop at the
            # next real marker (another SOS/DHT/DRI or EOI)
            segments: list[bytes] = []
            cur = bytearray()
            while i < n:
                b = content[i]
                if b != 0xFF:
                    cur.append(b)
                    i += 1
                    continue
                nxt = content[i + 1] if i + 1 < n else 0xD9
                if nxt == 0x00:
                    cur.append(0xFF)
                    i += 2
                elif 0xD0 <= nxt <= 0xD7:
                    segments.append(bytes(cur))
                    cur = bytearray()
                    i += 2
                else:
                    break  # EOI or next marker segment
            segments.append(bytes(cur))
            scans.append(
                (scan_comps, ss, se, ah, al, restart, segments,
                 dict(htabs))
            )
            continue  # i already advanced past the entropy data
        i = i + 2 + seglen
    if sof is None or not scans:
        raise UnsupportedMediaError("JPEG missing SOF/SOS")

    fh, fw, comps = sof
    if fh < 1 or fw < 1:
        raise UnsupportedMediaError("empty JPEG frame")
    if any(hi < 1 or vi < 1 for _, hi, vi, _ in comps):
        # a corrupt SOF with zero sampling factors previously escaped
        # as a raw ZeroDivisionError no kernel catches — one hostile
        # JPEG row killed the whole job (r11 review, repro'd)
        raise UnsupportedMediaError("zero sampling factor in SOF")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax > 2 or vmax > 2:
        raise UnsupportedMediaError("sampling factors > 2 unsupported")
    # Guard on the ACTUAL coefficient allocation, not the bare frame
    # pixel count: both decode paths hold one array element per coded
    # sample per COMPONENT, padded to whole MCUs, so a just-under-cap
    # 4:4:4 frame used to allocate 3× what the same cap bounds for a
    # uint8 PNG/GIF canvas (×8 B/elem on top).  Cap the summed padded
    # samples instead (≤ 100M elems → ≤ 400 MB int32 progressive /
    # 800 MB float64 sequential, linear in the same constant that
    # bounds the PNG canvas); a 64 MP 4:2:0 photo (96M samples) still
    # passes.  A hostile SOF costs a quarantine row, never an OOM.
    mx, my = -(-fw // (8 * hmax)), -(-fh // (8 * vmax))
    coef_samples = sum(
        (my * vi * 8) * (mx * hi * 8) for _, hi, vi, _ in comps
    )
    if coef_samples > MAX_DECODE_PIXELS:
        raise UnsupportedMediaError(
            f"JPEG frame {fw}x{fh}x{len(comps)} coefficient storage"
            f" ({coef_samples} samples) exceeds MAX_DECODE_PIXELS"
            f" ({MAX_DECODE_PIXELS})"
        )

    if progressive:
        coefs = _decode_progressive_scans(
            scans, fh, fw, comps, hmax, vmax
        )
        return _reconstruct(coefs, qtabs, fh, fw, comps, hmax, vmax)

    if len(scans) != 1:
        raise UnsupportedMediaError(
            "multi-scan sequential JPEG unsupported"
        )
    scan_comps, ss, se, ah, al, restart, segments, htabs = scans[0]

    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))
    coefs = {
        cid: np.zeros((mcus_y * vi, mcus_x * hi, 64), dtype=np.float64)
        for cid, hi, vi, _ in comps
    }
    comp_by_id = {cid: (hi, vi, tq) for cid, hi, vi, tq in comps}
    scan_tabs = {cid: (dc, ac) for cid, dc, ac in scan_comps}
    if set(scan_tabs) - set(comp_by_id):
        raise UnsupportedMediaError(
            "SOS references a component id absent from SOF"
        )

    n_mcu_total = mcus_x * mcus_y
    mcu_index = 0
    seg_idx = 0
    reader = _BitReader(segments[0])
    preds = {cid: 0 for cid, *_ in comps}
    while mcu_index < n_mcu_total:
        if restart and mcu_index and mcu_index % restart == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise UnsupportedMediaError("missing RST segment")
            reader = _BitReader(segments[seg_idx])
            preds = {cid: 0 for cid, *_ in comps}
        my, mx = divmod(mcu_index, mcus_x)
        for cid, hi, vi, tq in comps:
            dc_id, ac_id = scan_tabs[cid]
            dc_tab = htabs.get((0, dc_id))
            ac_tab = htabs.get((1, ac_id))
            if dc_tab is None or ac_tab is None:
                raise UnsupportedMediaError("JPEG missing Huffman table")
            for by in range(vi):
                for bx in range(hi):
                    zz = np.zeros(64, dtype=np.float64)
                    size = reader.huff(dc_tab)
                    diff = _extend(reader.bits(size), size)
                    preds[cid] += diff
                    zz[0] = preds[cid]
                    k = 1
                    while k < 64:
                        rs = reader.huff(ac_tab)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:
                                k += 16  # ZRL
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise UnsupportedMediaError(
                                "JPEG AC index overflow"
                            )
                        zz[k] = _extend(reader.bits(s), s)
                        k += 1
                    coefs[cid][my * vi + by, mx * hi + bx] = zz
        mcu_index += 1

    return _reconstruct(coefs, qtabs, fh, fw, comps, hmax, vmax)


def _reconstruct(coefs, qtabs, fh, fw, comps, hmax, vmax) -> np.ndarray:
    """Shared decode tail: dequantize + dezigzag + IDCT + upsample +
    color-convert a {cid: (nby, nbx, 64)} coefficient dict."""
    planes = {}
    for cid, hi, vi, tq in comps:
        qt = qtabs.get(tq)
        if qt is None:
            raise UnsupportedMediaError("JPEG missing quant table")
        zz = coefs[cid].astype(np.float64) * qt  # still zigzagged
        blk = np.zeros_like(zz)
        blk[:, :, ZIGZAG] = zz
        nby, nbx = blk.shape[:2]
        b8 = blk.reshape(nby, nbx, 8, 8)
        pix = np.einsum("xu,byuv,vw->byxw", _C.T, b8, _C, optimize=True)
        plane = (
            pix.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8) + 128.0
        )
        # upsample to full resolution by replication
        ry, rx = vmax // vi, hmax // hi
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes[cid] = plane[:fh, :fw]

    order = [c[0] for c in comps]
    if len(order) == 1:
        y = np.clip(np.round(planes[order[0]]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=2)
    if len(order) != 3:
        raise UnsupportedMediaError(
            f"{len(order)}-component JPEG unsupported"
        )
    y, cb, cr = (planes[c] for c in order)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Progressive (SOF2) scan decoding — T.81 G.2 / the jdphuff.c state
# machine: DC first/refine scans (interleaved MCU order), AC
# first/refine scans (single component, raster block order), EOB runs,
# and successive-approximation bit planes. Coefficients accumulate as
# int32 across scans (refinement is bitwise; |coef| < 2^15), then feed
# the shared ``_reconstruct`` tail.
# ---------------------------------------------------------------------------


def _comp_block_dims(fh, fw, hi, vi, hmax, vmax) -> tuple[int, int]:
    """True (rows, cols) of a component's block grid (T.81 A.1.1)."""
    ch = -(-(fh * vi) // vmax)
    cw = -(-(fw * hi) // hmax)
    return -(-ch // 8), -(-cw // 8)


def _decode_progressive_scans(scans, fh, fw, comps, hmax, vmax):
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))
    coefs = {
        # int32 suffices: |coef| < 2^15 and successive-approximation
        # shifts stay within the 12-bit-precision coded range (T.81
        # F.1.2.1) — halves the refinement-state footprint vs int64
        cid: np.zeros((mcus_y * vi, mcus_x * hi, 64), dtype=np.int32)
        for cid, hi, vi, _ in comps
    }
    comp_by_id = {cid: (hi, vi, tq) for cid, hi, vi, tq in comps}

    for scan_comps, ss, se, ah, al, restart, segments, htabs in scans:
        if {c[0] for c in scan_comps} - set(comp_by_id):
            raise UnsupportedMediaError(
                "SOS references a component id absent from SOF"
            )
        if ss == 0 and se == 0:
            _dc_scan(
                scan_comps, ah, al, restart, segments, htabs, coefs,
                comp_by_id, fh, fw, hmax, vmax, mcus_x, mcus_y,
            )
        elif ss == 0 or se > 63 or ss > se:
            raise UnsupportedMediaError(
                f"bad progressive spectral band {ss}..{se}"
            )
        else:
            if len(scan_comps) != 1:
                raise UnsupportedMediaError(
                    "progressive AC scan must be non-interleaved"
                )
            _ac_scan(
                scan_comps[0], ss, se, ah, al, restart, segments,
                htabs, coefs, comp_by_id, fh, fw, hmax, vmax,
            )
    return coefs


def _dc_scan(
    scan_comps, ah, al, restart, segments, htabs, coefs, comp_by_id,
    fh, fw, hmax, vmax, mcus_x, mcus_y,
):
    interleaved = len(scan_comps) > 1
    if interleaved:
        n_units = mcus_x * mcus_y
    else:
        cid = scan_comps[0][0]
        hi, vi, _ = comp_by_id[cid]
        nby, nbx = _comp_block_dims(fh, fw, hi, vi, hmax, vmax)
        n_units = nby * nbx
    reader = _BitReader(segments[0])
    seg_idx = 0
    preds = {c[0]: 0 for c in scan_comps}
    for unit in range(n_units):
        if restart and unit and unit % restart == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise UnsupportedMediaError("missing RST segment")
            reader = _BitReader(segments[seg_idx])
            preds = {c[0]: 0 for c in scan_comps}
        for cid, dc_id, _ac_id in scan_comps:
            hi, vi, _tq = comp_by_id[cid]
            if interleaved:
                my, mx = divmod(unit, mcus_x)
                blocks = [
                    (my * vi + by, mx * hi + bx)
                    for by in range(vi)
                    for bx in range(hi)
                ]
            else:
                nby, nbx = _comp_block_dims(
                    fh, fw, hi, vi, hmax, vmax
                )
                blocks = [divmod(unit, nbx)]
            for by, bx in blocks:
                if ah == 0:
                    dc_tab = htabs.get((0, dc_id))
                    if dc_tab is None:
                        raise UnsupportedMediaError(
                            "JPEG missing DC Huffman table"
                        )
                    size = reader.huff(dc_tab)
                    preds[cid] += _extend(reader.bits(size), size)
                    coefs[cid][by, bx, 0] = preds[cid] << al
                else:
                    if reader.bit():
                        coefs[cid][by, bx, 0] |= 1 << al


def _ac_scan(
    scan_comp, ss, se, ah, al, restart, segments, htabs, coefs,
    comp_by_id, fh, fw, hmax, vmax,
):
    cid, _dc_id, ac_id = scan_comp
    hi, vi, _tq = comp_by_id[cid]
    nby, nbx = _comp_block_dims(fh, fw, hi, vi, hmax, vmax)
    ac_tab = htabs.get((1, ac_id))
    if ac_tab is None:
        raise UnsupportedMediaError("JPEG missing AC Huffman table")
    arr = coefs[cid]
    reader = _BitReader(segments[0])
    seg_idx = 0
    eobrun = 0
    for unit in range(nby * nbx):
        if restart and unit and unit % restart == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise UnsupportedMediaError("missing RST segment")
            reader = _BitReader(segments[seg_idx])
            eobrun = 0
        by, bx = divmod(unit, nbx)
        zz = arr[by, bx]
        if ah == 0:
            eobrun = _ac_first_block(
                reader, ac_tab, zz, ss, se, al, eobrun
            )
        else:
            eobrun = _ac_refine_block(
                reader, ac_tab, zz, ss, se, al, eobrun
            )


def _ac_first_block(reader, ac_tab, zz, ss, se, al, eobrun) -> int:
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.huff(ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += reader.bits(r)
                return eobrun - 1  # the run includes this block
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise UnsupportedMediaError("JPEG AC index overflow")
        zz[k] = _extend(reader.bits(s), s) << al
        k += 1
    return 0


def _ac_refine_block(reader, ac_tab, zz, ss, se, al, eobrun) -> int:
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.huff(ac_tab)
            r, s = rs >> 4, rs & 0x0F
            s_val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.bits(r)
                    break
                # r == 15: ZRL — skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise UnsupportedMediaError(
                        "bad AC refinement magnitude"
                    )
                s_val = p1 if reader.bit() else -p1
            while k <= se:
                if zz[k] != 0:
                    if reader.bit() and not (int(zz[k]) & p1):
                        zz[k] += p1 if zz[k] >= 0 else -p1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s_val and k <= se:
                zz[k] = s_val
            k += 1
    if eobrun > 0:
        while k <= se:
            if zz[k] != 0:
                if reader.bit() and not (int(zz[k]) & p1):
                    zz[k] += p1 if zz[k] >= 0 else -p1
            k += 1
        eobrun -= 1
    return eobrun

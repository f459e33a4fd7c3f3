"""Pure-stdlib GIF codec: LZW decode, frame iteration, fixture encoder.

Closes the last still-image gap in the honest-codec policy
(media_codecs.py): PNG/BMP/baseline-JPEG decode for real, GIF was
header-probe only. GIF is also a *motion* format (animated stickers /
reaction GIFs are a real slice of multimodal training data), so the
frame iterator feeds ``multimodal.sample_video_frames`` the same way
the AVI/MPNG parsers do.

Scope (honest, spec-cited):

* GIF87a / GIF89a, global + local color tables, interlaced images
  (the 4-pass row order), 3–12-bit variable-code LZW with CLEAR/END
  handling and the deferred-clear edge (code table full, no clear —
  codes simply stop growing, per spec appendix).
* Animation: frame composition over the logical screen with disposal
  methods 0/1 (leave in place) and 2 (restore to background);
  method 3 (restore to previous) raises — it needs a frame stack no
  sane training-data GIF uses.
* Transparency: the GCE transparent index leaves the underlying pixel.

The encoder twin ``encode_gif`` emits spec-valid streams for fixtures:
index-array frames + palette in, optionally interlaced, LZW written in
the always-clear style (CLEAR before every literal — larger but
deterministic and trivially correct). Decode(encode(x)) is exact, so
round-trip tests bound nothing: they assert byte equality.

Reference scope note: the reference (pinecone-io/pinecone-datasets) has
no media surface; Layer-B extension (SURVEY.md §2 "beyond the
reference"), cited against its data model only (cfg.py:23-36).
"""

from __future__ import annotations

import struct
from typing import Iterator, Optional, Sequence

import numpy as np

from .media_codecs import MAX_DECODE_PIXELS, UnsupportedMediaError

_MAGICS = (b"GIF87a", b"GIF89a")

#: 4-pass interlace row schedule: (first row, step) per pass.
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(height: int) -> list[int]:
    order: list[int] = []
    for first, step in _INTERLACE_PASSES:
        order.extend(range(first, height, step))
    return order


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> np.ndarray:
    """GIF-flavor LZW: LSB-first variable-width codes, CLEAR resets the
    table, END terminates; the table freezes at 4096 entries until the
    next CLEAR (deferred clear)."""
    clear = 1 << min_code_size
    end = clear + 1
    # bit reader state
    bits = 0
    acc = 0
    pos = 0
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0

    def reset() -> tuple[list[bytes], int]:
        return (
            [bytes([i]) for i in range(clear)] + [b"", b""],
            min_code_size + 1,
        )

    table, code_size = reset()
    prev: Optional[bytes] = None
    while n_out < n_pixels:
        while bits < code_size:
            if pos >= len(data):
                raise UnsupportedMediaError("GIF: LZW stream truncated")
            acc |= data[pos] << bits
            bits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        bits -= code_size
        if code == clear:
            table, code_size = reset()
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise UnsupportedMediaError("GIF: bad first LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
                if len(table) == (1 << code_size) and code_size < 12:
                    code_size += 1
        elif code == len(table):
            entry = prev + prev[:1]
            if len(table) < 4096:
                table.append(entry)
                if len(table) == (1 << code_size) and code_size < 12:
                    code_size += 1
        else:
            raise UnsupportedMediaError("GIF: LZW code out of range")
        take = min(len(entry), n_pixels - n_out)
        out[n_out : n_out + take] = np.frombuffer(
            entry[:take], dtype=np.uint8
        )
        n_out += take
        prev = entry
    if n_out < n_pixels:
        raise UnsupportedMediaError("GIF: LZW ended before raster filled")
    return out


def _sub_blocks(content: bytes, i: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks starting at i; return (data, next)."""
    parts = []
    while True:
        if i >= len(content):
            raise UnsupportedMediaError("GIF: unterminated sub-blocks")
        n = content[i]
        i += 1
        if n == 0:
            return b"".join(parts), i
        parts.append(content[i : i + n])
        i += n


def iter_gif_frames(content: bytes) -> Iterator[dict]:
    """Yield composed frames of a GIF as dicts: ``image`` (h, w, 3
    uint8, full logical screen), ``delay_cs`` (centiseconds, 0 when no
    GCE), ``index`` — honoring disposal 0/1/2 and transparency."""
    if content[:6] not in _MAGICS:
        raise UnsupportedMediaError("not a GIF")
    sw, sh, flags, bg_idx, _ = struct.unpack("<HHBBB", content[6:13])
    i = 13
    gct: Optional[np.ndarray] = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(content, np.uint8, n * 3, i).reshape(n, 3)
        i += n * 3
    if sw == 0 or sh == 0:
        raise UnsupportedMediaError("GIF: zero logical screen")
    if sw * sh > MAX_DECODE_PIXELS:
        # a corrupt/hostile screen descriptor must cost a quarantine
        # row, not a multi-GB canvas allocation (same guard as
        # jpeg.MAX_DECODE_PIXELS / decode_png)
        raise UnsupportedMediaError(
            f"GIF screen {sw}x{sh} exceeds MAX_DECODE_PIXELS"
            f" ({MAX_DECODE_PIXELS})"
        )
    # background canvas: bg color when a GCT exists, else black
    if gct is not None and bg_idx < len(gct):
        bg_rgb = gct[bg_idx]
    else:
        bg_rgb = np.zeros(3, np.uint8)
    screen = np.broadcast_to(bg_rgb, (sh, sw, 3)).copy()
    transparent: Optional[int] = None
    delay_cs = 0
    disposal = 0
    frame_no = 0
    while i < len(content):
        b = content[i]
        if b == 0x3B:  # trailer
            return
        if b == 0x21:  # extension
            label = content[i + 1]
            if label == 0xF9:  # graphic control
                blk, j = _sub_blocks(content, i + 2)
                if len(blk) >= 4:
                    gflags = blk[0]
                    delay_cs = struct.unpack("<H", blk[1:3])[0]
                    transparent = blk[3] if gflags & 0x01 else None
                    disposal = (gflags >> 2) & 0x07
                    if disposal == 3:
                        raise UnsupportedMediaError(
                            "GIF: disposal 'restore previous' unsupported"
                        )
                i = j
            else:  # comment / plain text / application: skip
                _, i = _sub_blocks(content, i + 2)
            continue
        if b == 0x2C:  # image descriptor
            left, top, w, h, iflags = struct.unpack(
                "<HHHHB", content[i + 1 : i + 10]
            )
            i += 10
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                ct = np.frombuffer(content, np.uint8, n * 3, i).reshape(
                    n, 3
                )
                i += n * 3
            if ct is None:
                raise UnsupportedMediaError("GIF: no color table")
            min_code = content[i]
            i += 1
            data, i = _sub_blocks(content, i)
            idx = _lzw_decode(min_code, data, w * h).reshape(h, w)
            if iflags & 0x40:  # interlaced: rows arrive pass-ordered
                ordered = np.empty_like(idx)
                ordered[_interlace_order(h), :] = idx
                idx = ordered
            if left + w > sw or top + h > sh:
                raise UnsupportedMediaError("GIF: frame exceeds screen")
            if idx.max(initial=0) >= len(ct):
                raise UnsupportedMediaError("GIF: index beyond palette")
            region = screen[top : top + h, left : left + w]
            rgb = ct[idx]
            if transparent is not None:
                mask = (idx != transparent)[:, :, None]
                rgb = np.where(mask, rgb, region)
            screen[top : top + h, left : left + w] = rgb
            yield {
                "image": screen.copy(),
                "delay_cs": delay_cs,
                "index": frame_no,
            }
            frame_no += 1
            if disposal == 2:  # restore region to background
                screen[top : top + h, left : left + w] = bg_rgb
            transparent = None
            delay_cs = 0
            disposal = 0
            continue
        raise UnsupportedMediaError(f"GIF: unknown block 0x{b:02x}")
    raise UnsupportedMediaError("GIF: missing trailer")


def decode_gif(content: bytes) -> np.ndarray:
    """First frame of a GIF as a (height, width, 3) uint8 RGB array
    (full logical screen) — the still-image view, shape-compatible with
    ``decode_png``/``decode_bmp``/``decode_jpeg``."""
    for frame in iter_gif_frames(content):
        return frame["image"]
    raise UnsupportedMediaError("GIF: no image data")


# ---------------------------------------------------------------------------
# Fixture encoder twin
# ---------------------------------------------------------------------------


def _lzw_encode_always_clear(min_code_size: int, idx: np.ndarray) -> bytes:
    """Spec-valid LZW in the always-clear style: CLEAR before every
    literal keeps the code width fixed at min_code_size+1 — larger
    output, trivially correct, fully deterministic."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    acc = 0
    bits = 0
    out = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, bits
        acc |= code << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    emit(clear)
    for v in idx.ravel().tolist():
        emit(int(v))
        emit(clear)
    emit(end)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(
    frames: Sequence[np.ndarray],
    palette: np.ndarray,
    delays_cs: Optional[Sequence[int]] = None,
    interlace: bool = False,
    bg_index: int = 0,
    disposal: int = 1,
) -> bytes:
    """Serialize index-array frames (each (h, w) uint8, full screen)
    + an (n, 3) uint8 palette into a GIF89a stream. Deterministic
    bytes; ``decode(encode(x))`` is exact."""
    if not frames:
        raise ValueError("encode_gif: no frames")
    palette = np.asarray(palette, dtype=np.uint8)
    n_colors = len(palette)
    if n_colors < 2 or n_colors > 256:
        raise ValueError(f"palette size out of range: {n_colors}")
    ct_bits = max(1, (n_colors - 1).bit_length())
    ct_n = 1 << ct_bits
    h, w = frames[0].shape
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | (ct_bits - 1), bg_index, 0)
    table = np.zeros((ct_n, 3), np.uint8)
    table[:n_colors] = palette
    out += table.tobytes()
    min_code = max(2, ct_bits)
    for k, frame in enumerate(frames):
        if frame.shape != (h, w):
            raise ValueError("encode_gif: frame shape drift")
        delay = delays_cs[k] if delays_cs is not None else 0
        out += struct.pack(
            "<BBBBHBB", 0x21, 0xF9, 4, (disposal & 0x07) << 2, delay, 0, 0
        )
        iflags = 0x40 if interlace else 0
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, iflags)
        idx = np.asarray(frame, dtype=np.uint8)
        if interlace:
            idx = idx[_interlace_order(h), :]
        out.append(min_code)
        data = _lzw_encode_always_clear(min_code, idx)
        for off in range(0, len(data), 255):
            chunk = data[off : off + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)

"""Pure-stdlib media codecs for the multimodal operators (Layer B).

No Pillow / opencv / ffmpeg exist in this environment, but several real
formats are decodable with nothing beyond the standard library + numpy:

* **PNG** — ``zlib`` decompress + defilter (SPEC: the 5 scanline filters);
  8-bit grayscale / RGB / RGBA, non-interlaced.
* **BMP** — uncompressed 24-bpp ``BITMAPINFOHEADER``; plain ``struct``.
* **WAV** — stdlib ``wave`` module; PCM-16 sample decode via numpy.
* **JPEG** — header probe here (dimensions from the SOF walk); FULL
  baseline entropy decode/encode lives in ``jpeg.py`` (Huffman + IDCT,
  stdlib + numpy) — extracted MJPEG frames and still JPEGs both decode
  for real.
* **GIF** — header probe here (dimensions from the logical screen
  descriptor); FULL LZW decode, animation composition, and the fixture
  encoder live in ``gif.py``.

These run *inside* Arrow-batched kernels (see ``multimodal.py``), so all
functions here are plain ``bytes -> python/numpy`` — no Spark imports.
A minimal PNG/WAV **encoder** is included so tests and benchmarks can
synthesize real files without any external library.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib
from typing import Optional, Tuple

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

#: Decode-side allocation guard shared by the stdlib codecs (PNG here,
#: GIF's screen canvas, and — as ``jpeg.MAX_DECODE_PIXELS`` — the JPEG
#: coefficient arrays): a corrupt or hostile header claiming a huge
#: frame must cost one quarantine row, never a multi-GB allocation.
MAX_DECODE_PIXELS = 100_000_000
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray, RGB, RGBA


class UnsupportedMediaError(ValueError):
    """Raised when bytes are recognized but the variant is not decodable
    with the stdlib-only codecs (e.g. interlaced PNG, JPEG pixel data)."""


# ---------------------------------------------------------------------------
# probing (format + dimensions/duration from headers — all real parses)
# ---------------------------------------------------------------------------

#: MPEG audio header tables (ISO/IEC 11172-3 / 13818-3 frame headers —
#: public structural constants). Bitrate in kbit/s per (version-group,
#: layer); index 0 = "free format" (frame size not derivable from the
#: header alone), index 15 = invalid.
_MPEG_BITRATES = {
    # MPEG-1
    (1, 1): (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352,
             384, 416, 448),
    (1, 2): (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
             320, 384),
    (1, 3): (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
             256, 320),
    # MPEG-2 / 2.5 (LSF)
    (2, 1): (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192,
             224, 256),
    (2, 2): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
             160),
    (2, 3): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
             160),
}
_MPEG_RATES = {
    3: (44100, 48000, 32000),   # version bits 11 = MPEG-1
    2: (22050, 24000, 16000),   # version bits 10 = MPEG-2
    0: (11025, 12000, 8000),    # version bits 00 = MPEG-2.5
}


def _mpeg_frame(data: bytes, pos: int):
    """Parse one MPEG audio frame header at ``pos``. Returns
    ``(frame_bytes, samples_per_frame, sample_rate, bitrate_kbps,
    layer, n_channels)`` or None when the 4 bytes there are not a
    valid header. ``frame_bytes`` is None for free-format streams
    (bitrate index 0 — size not derivable from the header)."""
    if pos + 4 > len(data):
        return None
    h = int.from_bytes(data[pos : pos + 4], "big")
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    vbits = (h >> 19) & 0x3
    lbits = (h >> 17) & 0x3
    if vbits == 1 or lbits == 0:
        return None  # reserved version / reserved layer
    layer = 4 - lbits  # bits 11->layer I, 10->II, 01->III
    vgroup = 1 if vbits == 3 else 2
    bidx = (h >> 12) & 0xF
    ridx = (h >> 10) & 0x3
    if bidx == 15 or ridx == 3:
        return None
    rate = _MPEG_RATES[vbits][ridx]
    bitrate = _MPEG_BITRATES[(vgroup, layer)][bidx]
    padding = (h >> 9) & 0x1
    mode = (h >> 6) & 0x3
    n_channels = 1 if mode == 3 else 2
    if layer == 1:
        spf = 384
        nbytes = (
            (12 * bitrate * 1000 // rate + padding) * 4 if bitrate else None
        )
    else:
        spf = 1152 if (layer == 2 or vgroup == 1) else 576
        factor = 144 if spf == 1152 else 72
        nbytes = (
            factor * bitrate * 1000 // rate + padding if bitrate else None
        )
    return nbytes, spf, rate, bitrate, layer, n_channels


def probe_mp3(content: bytes):
    """Walk an MPEG audio stream's frame chain (ID3v2 skipped, ID3v1
    tail tolerated): ``(n_frames, duration_ms, sample_rate, layer,
    n_channels, truncated)`` or None when no complete valid frame with
    a consistent successor exists. Probe-only — Layer III DECODE stays
    a typed refusal (see ``decode_audio``)."""
    if not content:
        return None
    pos = 0
    if content[:3] == b"ID3" and len(content) >= 10:
        sz = 0
        for b in content[6:10]:
            sz = (sz << 7) | (b & 0x7F)  # syncsafe
        pos = 10 + sz
    end = len(content)
    if end >= 128 and content[-128:-125] == b"TAG":
        end -= 128  # ID3v1 tail
    # find the first header whose implied NEXT position is either the
    # stream end or another valid header — one random 0xFFF in junk
    # bytes must not probe as mp3
    start = None
    first = None
    scan_limit = min(end - 4, pos + 65536)
    while pos <= scan_limit:
        fr = _mpeg_frame(content, pos)
        if fr is not None:
            nbytes = fr[0]
            if nbytes is not None and pos + nbytes <= end:
                nxt = pos + nbytes
                if nxt == end or _mpeg_frame(content, nxt) is not None:
                    start, first = pos, fr
                    break
        pos += 1
    if start is None:
        return None
    n_frames = 0
    samples = 0
    truncated = False
    _, spf, rate, _, layer, nch = first
    pos = start
    while pos + 4 <= end:
        fr = _mpeg_frame(content, pos)
        if fr is None:
            break  # garbage after a valid chain: stop counting
        nbytes = fr[0]
        if nbytes is None or pos + nbytes > end:
            truncated = nbytes is not None
            break
        n_frames += 1
        samples += fr[1]
        pos += nbytes
    if n_frames == 0:
        return None
    duration_ms = samples * 1000 // rate
    return n_frames, duration_ms, rate, layer, nch, truncated


def probe_mp4(content: bytes):
    """ISO-BMFF (mp4/mov/m4a) container probe: walk the box tree for
    moov/mvhd (timescale + duration), the first ``vide`` track's tkhd
    dimensions, and the set of track handler types. Returns ``(width,
    height, duration_ms, handlers)`` or None when the bytes are not a
    BMFF stream. Probe-only — inter-frame video DECODE stays the
    honest ``NotImplementedError`` (``multimodal.sample_video_frames``):
    H.264/AAC entropy decode needs codec data tables this clean-room
    build cannot verifiably reproduce; the probe keeps the slice typed
    and inventoried instead of invisible."""
    if len(content) < 12 or content[4:8] != b"ftyp":
        return None
    dur_ms = None
    width = height = None
    handlers = set()

    def boxes(lo: int, hi: int):
        pos = lo
        while pos + 8 <= hi:
            (size,) = struct.unpack_from(">I", content, pos)
            btype = content[pos + 4 : pos + 8]
            body = pos + 8
            if size == 1:
                if pos + 16 > hi:
                    return
                (size,) = struct.unpack_from(">Q", content, pos + 8)
                body = pos + 16
            elif size == 0:
                size = hi - pos
            if size < 8 or pos + size > hi:
                return  # truncated/corrupt box: stop, keep what we have
            yield btype, body, pos + size
            pos += size

    def walk(lo: int, hi: int, in_trak: bool, depth: int) -> None:
        nonlocal dur_ms, width, height
        if depth >= 6:
            return  # moov/trak/mdia legitimately nest ≤3 deep; a hostile
            # blob of nested trak boxes must not exhaust the C stack
            # (same cap as probe_webm — ADVICE r9 high finding)
        for btype, body, end in boxes(lo, hi):
            if btype in (b"moov", b"trak", b"mdia"):
                walk(body, end, in_trak or btype == b"trak", depth + 1)
            elif btype == b"mvhd" and end - body >= 20:
                ver = content[body]
                if ver == 1 and end - body >= 28:
                    (ts,) = struct.unpack_from(">I", content, body + 20)
                    (dur,) = struct.unpack_from(">Q", content, body + 24)
                else:
                    (ts,) = struct.unpack_from(">I", content, body + 12)
                    (dur,) = struct.unpack_from(">I", content, body + 16)
                if ts:
                    dur_ms = dur * 1000 // ts
            elif btype == b"hdlr" and end - body >= 12:
                handlers.add(
                    content[body + 8 : body + 12].decode("ascii", "replace")
                )
            elif btype == b"tkhd" and in_trak:
                # width/height (16.16 fixed) trail the 36-byte matrix:
                # v0 layout 4+20+8+8+36 = 76, v1 adds 12 (64-bit times)
                ver = content[body]
                off = body + (88 if ver == 1 else 76)
                if off + 8 <= end and width is None:
                    w16, h16 = struct.unpack_from(">II", content, off)
                    if w16 and h16:  # 16.16 fixed point; audio traks are 0
                        width, height = w16 >> 16, h16 >> 16

    try:
        walk(0, len(content), False, 0)
    except (struct.error, IndexError):
        pass
    return width, height, dur_ms, handlers


def probe_ogg(content: bytes):
    """Ogg container probe: page-header walk ("OggS" capture pattern,
    segment-table sizing), codec identification from the first
    packet's magic (OpusHead / \\x01vorbis / \\x7fFLAC), duration from
    the LAST page's granule position (Opus granules run at 48 kHz by
    spec with a 312-ms pre-skip subtracted; Vorbis/FLAC granules at
    the stream's own rate). Returns ``(codec, rate, duration_ms)`` or
    None when the bytes are not an Ogg stream. Probe-only: Opus/Vorbis
    DECODE needs codebook data this build cannot verifiably reproduce
    (same honest scoping as mp3 — see ``decode_audio``)."""
    if content[:4] != b"OggS" or len(content) < 28:
        return None
    codec = None
    rate = None
    pre_skip = 0
    last_granule = None
    pos = 0
    n = len(content)
    first = True
    while pos + 27 <= n and content[pos : pos + 4] == b"OggS":
        granule = int.from_bytes(
            content[pos + 6 : pos + 14], "little", signed=True
        )
        nseg = content[pos + 26]
        seg_table = content[pos + 27 : pos + 27 + nseg]
        if len(seg_table) < nseg:
            break  # truncated page header
        body_len = sum(seg_table)
        body = pos + 27 + nseg
        if first:
            pkt = content[body : body + min(body_len, 64)]
            if pkt[:8] == b"OpusHead" and len(pkt) >= 14:
                codec = "opus"
                pre_skip = int.from_bytes(pkt[10:12], "little")
                rate = 48000  # Opus granules are 48 kHz by spec
            elif pkt[:7] == b"\x01vorbis" and len(pkt) >= 16:
                codec = "vorbis"
                rate = int.from_bytes(pkt[12:16], "little")
            elif pkt[:5] == b"\x7fFLAC" and len(pkt) >= 31:
                codec = "flac"
                body17 = pkt[13:]  # embedded STREAMINFO block
                if len(body17) >= 18:
                    rate = (
                        (body17[14] << 12)
                        | (body17[15] << 4)
                        | (body17[16] >> 4)
                    )
            first = False
        if granule >= 0:
            last_granule = granule
        if body + body_len > n:
            break  # truncated body: keep what we have
        pos = body + body_len
    if codec is None:
        return "ogg", None, None  # Ogg, unknown payload codec
    dur = None
    if last_granule is not None and rate:
        samples = max(last_granule - pre_skip, 0)
        dur = samples * 1000 // rate
    return codec, rate, dur


def _ebml_vint(data: bytes, pos: int, keep_marker: bool):
    """One EBML variable-length integer at ``pos`` → (value, next_pos)
    or None. ``keep_marker`` keeps the length-marker bit (element IDs)
    or strips it (sizes)."""
    if pos >= len(data):
        return None
    first = data[pos]
    if first == 0:
        return None
    length = 9 - first.bit_length()
    if pos + length > len(data):
        return None
    val = first if keep_marker else first & ((1 << (8 - length)) - 1)
    for i in range(1, length):
        val = (val << 8) | data[pos + i]
    return val, pos + length


def probe_webm(content: bytes):
    """Matroska/WebM probe: EBML header docType, then the first
    Segment Info's TimecodeScale (default 10^6 ns) and float Duration.
    Returns ``(doctype, duration_ms)`` or None when not EBML. Cluster
    payloads (VP8/VP9/AV1/Opus blocks) stay undecoded — same honest
    scoping as mp4."""
    if content[:4] != b"\x1a\x45\xdf\xa3":
        return None
    doctype = None
    tscale = 1_000_000
    duration = None

    def walk(lo: int, hi: int, depth: int) -> None:
        nonlocal doctype, tscale, duration
        pos = lo
        while pos < hi and depth < 6:
            got = _ebml_vint(content, pos, True)
            if got is None:
                return
            eid, pos = got
            got = _ebml_vint(content, pos, False)
            if got is None:
                return
            size, pos = got
            end = min(pos + size, hi)
            if eid in (0x1A45DFA3, 0x18538067, 0x1549A966):
                # EBML header, Segment, Info — recurse
                walk(pos, end, depth + 1)
            elif eid == 0x4282:  # DocType
                doctype = content[pos:end].decode("ascii", "replace")
            elif eid == 0x2AD7B1:  # TimecodeScale (ns per tick)
                tscale = int.from_bytes(content[pos:end], "big") or tscale
            elif eid == 0x4489:  # Duration (float ticks)
                raw = content[pos:end]
                if len(raw) == 4:
                    (duration,) = struct.unpack(">f", raw)
                elif len(raw) == 8:
                    (duration,) = struct.unpack(">d", raw)
            pos = end

    try:
        walk(0, len(content), 0)
    except (struct.error, IndexError):
        pass
    if doctype is None:
        doctype = "matroska"
    dur_ms = (
        int(duration * tscale / 1_000_000)
        if duration is not None
        else None
    )
    return doctype, dur_ms


def probe_bytes(
    content: Optional[bytes],
) -> Tuple[Optional[str], Optional[int], Optional[int], Optional[int]]:
    """Sniff (format, width, height, duration_ms) from magic + headers.

    Unknown/empty content probes to (None, None, None, None) rather than
    raising — at corpus scale a bad row must not kill the job; callers
    filter on ``format IS NULL`` to quarantine.
    """
    if not content:
        return None, None, None, None
    try:
        if content[:8] == _PNG_MAGIC:
            w, h = struct.unpack(">II", content[16:24])
            return "png", w, h, None
        if content[:5] == MPNG_MAGIC:
            # our own motion-PNG fixture container — previously the
            # _TYPE_BY_FORMAT 'mpng' entry was unreachable because the
            # prober never emitted it (r11 review): header is
            # MPNG\x01 | u32 n_frames | u32 interval_ms | (u32 len +
            # png)*, dims from the first frame's IHDR
            n_frames, interval = struct.unpack_from(">II", content, 5)
            w = h = None
            first = content[17 : 17 + 24]
            if first[:8] == _PNG_MAGIC:
                w, h = struct.unpack(">II", first[16:24])
            return "mpng", w, h, n_frames * interval
        if content[:2] == b"BM":
            w, h = struct.unpack("<ii", content[18:26])
            return "bmp", w, abs(h), None
        if content[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", content[6:10])
            return "gif", w, h, None
        if content[:2] == b"\xff\xd8":
            dims = _jpeg_dimensions(content)
            if dims is not None:
                return "jpeg", dims[0], dims[1], None
            return "jpeg", None, None, None
        if content[:4] == b"RIFF" and content[8:12] == b"AVI ":
            # avih leads the hdrl list (normally within the first ~40
            # bytes); 4 KiB headroom covers writers that pad JUNK ahead
            # of it (ADVICE r6: 512 was tighter than some muxers).
            # Dims come from avih's own dwWidth/dwHeight words, never
            # from strf, so no stream-type dependence here.
            at = content.find(b"avih", 12, 4096)
            if at >= 0 and at + 48 <= len(content):
                base = at + 8
                (usec,) = struct.unpack_from("<I", content, base)
                (nframes,) = struct.unpack_from("<I", content, base + 16)
                w, h = struct.unpack_from("<ii", content, base + 32)
                dur = (usec // 1000) * nframes if usec else None
                return "avi", w or None, abs(h) or None, dur
            return "avi", None, None, None
        if content[:4] == b"RIFF" and content[8:12] == b"WEBP":
            # VP8X extended header: 24-bit canvas dims minus one;
            # VP8 (lossy): 14-bit dims in the frame tag;
            # VP8L (lossless): 14-bit dims packed after the 0x2F byte
            c4 = content[12:16]
            if c4 == b"VP8X" and len(content) >= 30:
                w = int.from_bytes(content[24:27], "little") + 1
                h = int.from_bytes(content[27:30], "little") + 1
                return "webp", w, h, None
            if c4 == b"VP8 " and len(content) >= 30:
                w = int.from_bytes(content[26:28], "little") & 0x3FFF
                h = int.from_bytes(content[28:30], "little") & 0x3FFF
                return "webp", w or None, h or None, None
            if c4 == b"VP8L" and len(content) >= 25 and content[20] == 0x2F:
                bits = int.from_bytes(content[21:25], "little")
                w = (bits & 0x3FFF) + 1
                h = ((bits >> 14) & 0x3FFF) + 1
                return "webp", w, h, None
            return "webp", None, None, None
        if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
            try:
                with wave.open(io.BytesIO(content)) as wf:
                    dur = wf.getnframes() * 1000 // max(wf.getframerate(), 1)
                return "wav", None, None, dur
            # EOFError = truncated header, RuntimeError = stdlib
            # Chunk.seek on a lying chunk size (both fuzz-found)
            except (wave.Error, EOFError, RuntimeError):
                return "wav", None, None, None
        if content[:4] == b"FORM" and content[8:12] in (b"AIFF", b"AIFC"):
            at = content.find(b"COMM", 12)
            if at >= 0 and at + 26 <= len(content):
                nch, nframes, bits_ = struct.unpack(
                    ">HIH", content[at + 8 : at + 16]
                )
                try:
                    rate = int(round(_f80(content[at + 16 : at + 26])))
                except UnsupportedMediaError:
                    rate = 0
                dur = nframes * 1000 // rate if rate else None
                return "aiff", None, None, dur
            return "aiff", None, None, None
        if content[:4] in (b"II*\x00", b"MM\x00*"):
            endian = "<" if content[:2] == b"II" else ">"
            try:
                tags = _tiff_ifd_entries(content, endian)
                w = h = None
                if 256 in tags:
                    typ, count, off = tags[256]
                    w = _tiff_ints(content, endian, typ, count, off)[0]
                if 257 in tags:
                    typ, count, off = tags[257]
                    h = _tiff_ints(content, endian, typ, count, off)[0]
                return "tiff", w, h, None
            except UnsupportedMediaError:
                return "tiff", None, None, None
        if content[:4] == b"fLaC":
            # STREAMINFO (first metadata block, type 0): rate is 20
            # bits at byte offset 18 of the block body; total samples
            # the trailing 36 bits
            body = content[8:]
            if (content[4] & 0x7F) == 0 and len(body) >= 34:
                rate = (body[10] << 12) | (body[11] << 4) | (body[12] >> 4)
                total = (
                    ((body[13] & 0x0F) << 32)
                    | (body[14] << 24)
                    | (body[15] << 16)
                    | (body[16] << 8)
                    | body[17]
                )
                dur = total * 1000 // rate if rate else None
                return "flac", None, None, dur
            return "flac", None, None, None
        if content.lstrip()[:5] == b"%PDF-":
            return "pdf", None, None, None
        if content.lstrip()[:5] == b"{\\rtf":
            return "rtf", None, None, None
        if content[:4] in (b"PK\x03\x04", b"PK\x05\x06"):
            from .office import sniff_zip_document

            kind = sniff_zip_document(content)
            return kind or "zip", None, None, None
        mp4 = probe_mp4(content)
        if mp4 is not None:
            w, h, dur, _handlers = mp4
            brand = content[8:12]
            if brand in (b"heic", b"heix", b"mif1", b"msf1"):
                fmt = "heic"
            elif brand in (b"avif", b"avis"):
                fmt = "avif"
            elif brand == b"M4A ":
                fmt = "m4a"
            elif brand.startswith(b"qt"):
                fmt = "mov"
            else:
                fmt = "mp4"
            return fmt, w, h, dur
        ogg = probe_ogg(content)
        if ogg is not None:
            codec, _rate, dur = ogg
            return (
                "ogg" if codec == "ogg" else f"ogg-{codec}",
                None,
                None,
                dur,
            )
        ebml = probe_webm(content)
        if ebml is not None:
            doctype, dur = ebml
            return (
                "webm" if doctype == "webm" else "mkv",
                None,
                None,
                dur,
            )
        mp3 = probe_mp3(content)
        if mp3 is not None:
            _n, dur, _rate, _layer, _nch, _trunc = mp3
            return "mp3", None, None, dur
    except (struct.error, IndexError, RecursionError):
        # RecursionError: defense in depth behind the walk depth caps —
        # one hostile blob must never kill the probe job (ADVICE r9)
        return None, None, None, None
    return None, None, None, None


def _jpeg_dimensions(content: bytes) -> Optional[Tuple[int, int]]:
    """Walk JPEG marker segments to the first SOFn frame header."""
    i = 2
    n = len(content)
    while i + 4 <= n:
        if content[i] != 0xFF:
            return None
        marker = content[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if i + 4 > n:
            return None
        seg_len = struct.unpack(">H", content[i + 2 : i + 4])[0]
        # SOF0..SOF15 minus DHT(C4)/JPG(C8)/DAC(CC)
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if i + 9 > n:
                return None
            h, w = struct.unpack(">HH", content[i + 5 : i + 9])
            return w, h
        i += 2 + seg_len
    return None


# ---------------------------------------------------------------------------
# PNG decode (real: zlib inflate + scanline defilter)
# ---------------------------------------------------------------------------


def decode_png(content: bytes) -> np.ndarray:
    """PNG bytes → uint8 array of shape (height, width, channels).

    Supports bit depth 8, color types 0/2/6, non-interlaced — the shape
    virtually all machine-generated PNGs take. Filters 0-2 (None/Sub/Up)
    defilter vectorized; 3-4 (Average/Paeth) fall back to a per-pixel
    loop, correct per the PNG spec reconstruction functions.
    """
    if content[:8] != _PNG_MAGIC:
        raise UnsupportedMediaError("not a PNG")
    width = height = None
    bit_depth = color_type = interlace = None
    idat = []
    i = 8
    while i + 8 <= len(content):
        (length,) = struct.unpack(">I", content[i : i + 4])
        ctype = content[i + 4 : i + 8]
        data = content[i + 8 : i + 8 + length]
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        i += 12 + length  # length + type + data + crc
    if width is None or not idat:
        raise UnsupportedMediaError("truncated PNG")
    if bit_depth != 8 or color_type not in _PNG_CHANNELS or interlace != 0:
        raise UnsupportedMediaError(
            f"unsupported PNG variant (depth={bit_depth}, "
            f"color={color_type}, interlace={interlace})"
        )
    ch = _PNG_CHANNELS[color_type]
    if width * height * ch > MAX_DECODE_PIXELS:
        raise UnsupportedMediaError(
            f"PNG {width}x{height} exceeds MAX_DECODE_PIXELS"
            f" ({MAX_DECODE_PIXELS})"
        )
    stride = width * ch
    expected = (stride + 1) * height
    # bounded inflate: a zip-bomb IDAT must not expand past the size
    # the header promises (+1 to detect overflow) before the mismatch
    # check can reject it
    dec = zlib.decompressobj()
    raw = dec.decompress(b"".join(idat), expected + 1)
    if len(raw) != expected or dec.unconsumed_tail:
        raise UnsupportedMediaError("PNG payload size mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = rows[:, 0]
    data = rows[:, 1:].astype(np.int64)
    out = np.zeros((height, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(height):
        f = filters[y]
        row = data[y]
        if f == 0:
            rec = row
        elif f == 1:  # Sub: prefix sum per channel lane
            rec = row.reshape(width, ch).cumsum(axis=0).reshape(stride) % 256
        elif f == 2:  # Up
            rec = (row + prev) % 256
        elif f in (3, 4):
            rec = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = rec[x - ch] if x >= ch else 0
                b = prev[x]
                if f == 3:
                    rec[x] = (row[x] + (a + b) // 2) % 256
                else:
                    c = prev[x - ch] if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    if pa <= pb and pa <= pc:
                        pred = a
                    elif pb <= pc:
                        pred = b
                    else:
                        pred = c
                    rec[x] = (row[x] + pred) % 256
        else:
            raise UnsupportedMediaError(f"bad PNG filter {f}")
        out[y] = rec
        prev = rec
    return out.astype(np.uint8).reshape(height, width, ch)


def encode_png(pixels: np.ndarray) -> bytes:
    """uint8 (h, w) or (h, w, {1,3,4}) → PNG bytes (filter 0, one IDAT).

    Test/bench fixture encoder — emits spec-valid files ``decode_png``
    and any external viewer can read.
    """
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color_type = {1: 0, 3: 2, 4: 6}[ch]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# MPNG: minimal motion-PNG container (real, pure stdlib)
# ---------------------------------------------------------------------------

MPNG_MAGIC = b"MPNG\x01"


def encode_mpng(frames, interval_ms: int = 100) -> bytes:
    """Pack PNG frames into the repo's minimal motion container:
    ``MPNG\\x01 | u32 n_frames | u32 interval_ms | (u32 len + png)*``.

    Real video codecs need ffmpeg (absent here); this container is the
    honest stdlib alternative — every frame is a spec-valid PNG, the
    layout is seekable (length-prefixed), and ``sample_video_frames``
    decodes it with the same real PNG path the image operators use.
    ``frames`` are uint8 pixel arrays (``encode_png`` input shapes).
    """
    if interval_ms <= 0:
        raise ValueError(f"interval_ms must be positive: {interval_ms}")
    payload = [MPNG_MAGIC, struct.pack(">II", len(frames), interval_ms)]
    for f in frames:
        png = encode_png(f)
        payload.append(struct.pack(">I", len(png)))
        payload.append(png)
    return b"".join(payload)


def decode_mpng(content: bytes):
    """(interval_ms, [png_bytes, ...]) from an MPNG container."""
    if not content.startswith(MPNG_MAGIC):
        raise ValueError("not an MPNG container")
    off = len(MPNG_MAGIC)
    n, interval_ms = struct.unpack_from(">II", content, off)
    off += 8
    frames = []
    for _ in range(n):
        (ln,) = struct.unpack_from(">I", content, off)
        off += 4
        frames.append(content[off : off + ln])
        off += ln
    if len(frames) != n:
        raise ValueError("truncated MPNG container")
    return interval_ms, frames


# ---------------------------------------------------------------------------
# AVI: minimal RIFF container (real, pure stdlib) — MJPG + uncompressed DIB
# ---------------------------------------------------------------------------
#
# The standard interchange shape for "video without a codec stack":
# Motion-JPEG AVIs store one complete JPEG per frame, uncompressed AVIs
# one DIB (BMP-style) pixel array per frame — both extractable with
# struct alone. Frame *extraction* (what sample_video_frames needs) never
# requires JPEG entropy decode: MJPG frames come out as standalone JPEG
# bytes (fully decodable by ``jpeg.decode_jpeg`` since r7), DIB frames
# are re-wrapped into spec-valid BMPs decodable by ``decode_bmp``.


def is_avi(content: bytes) -> bool:
    return (
        len(content) >= 12
        and content[:4] == b"RIFF"
        and content[8:12] == b"AVI "
    )


def encode_avi(
    frames,
    interval_ms: int = 100,
    fourcc: str = "MJPG",
    width: int = 0,
    height: int = 0,
    audio=None,
    audio_rate: int = 16000,
) -> bytes:
    """Pack per-frame payloads into a minimal spec-valid AVI.

    ``frames`` are the already-encoded per-frame bytes: complete JPEGs
    for ``fourcc="MJPG"``, raw bottom-up 24-bpp BGR DIB rows (4-byte
    aligned) for ``fourcc="DIB "``. Layout: RIFF(AVI ) { LIST hdrl
    { avih, LIST strl { strh, strf } }, LIST movi { 00dc/00db ... } }.
    No idx1 index — players tolerate its absence and ``decode_avi``
    walks the movi list directly. Fixture encoder, same role as
    ``encode_png``/``encode_wav``.

    ``audio`` (r9): optional float mono samples in [-1, 1] — adds a
    second stream (``auds`` strh + PCM-16 WAVEFORMATEX strf, payload
    in ``01wb`` movi chunks split at ~64 KiB like real muxers), the
    audio-visual container ``decode_avi_audio`` extracts."""
    if interval_ms <= 0:
        raise ValueError(f"interval_ms must be positive: {interval_ms}")
    fcc = fourcc.encode("ascii").ljust(4)[:4]
    if fcc not in (b"MJPG", b"DIB "):
        raise ValueError(f"unsupported fourcc: {fourcc!r}")
    usec = int(interval_ms) * 1000
    n = len(frames)
    max_len = max((len(f) for f in frames), default=0)

    def chunk(cid: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return cid + struct.pack("<I", len(data)) + data + pad

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    n_streams = 1 if audio is None else 2
    avih = struct.pack(
        "<14I",
        usec, 0, 0, 0x10,  # usec/frame, maxbytes/sec, padding, HASINDEX-less flags
        n, 0, n_streams, max_len,  # total frames, initial, streams, sugg. buffer
        width, height, 0, 0, 0, 0,
    )
    # dwScale/dwRate = (interval_ms, 1000) keeps fps exact for
    # non-divisor intervals; avih's µs/frame stays authoritative.
    strh = (
        b"vids" + fcc
        + struct.pack(
            "<10I", 0, 0, 0, int(interval_ms), 1000, 0, n, max_len,
            0xFFFFFFFF, 0,
        )
        + struct.pack("<4H", 0, 0, width, height)
    )
    biComp = 0 if fcc == b"DIB " else struct.unpack("<I", b"MJPG")[0]
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, 24, biComp,
        max_len, 0, 0, 0, 0,
    )
    strls = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    audio_chunks = b""
    if audio is not None:
        pcm = np.clip(
            np.asarray(audio) * 32767.0, -32768, 32767
        ).astype("<i2").tobytes()
        a_strh = (
            b"auds" + b"\x00" * 4
            + struct.pack(
                "<10I", 0, 0, 0, 1, int(audio_rate), 0,
                len(pcm) // 2, len(pcm), 0xFFFFFFFF, 0,
            )
            + struct.pack("<4H", 0, 0, 0, 0)
        )
        # WAVEFORMATEX: PCM (tag 1), mono, 16-bit
        a_strf = struct.pack(
            "<HHIIHH", 1, 1, int(audio_rate), int(audio_rate) * 2, 2, 16
        )
        strls += lst(
            b"strl", chunk(b"strh", a_strh) + chunk(b"strf", a_strf)
        )
        audio_chunks = b"".join(
            chunk(b"01wb", pcm[i : i + 65536])
            for i in range(0, max(len(pcm), 1), 65536)
        )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strls)
    cid = b"00dc" if fcc == b"MJPG" else b"00db"
    movi = lst(
        b"movi",
        b"".join(chunk(cid, bytes(f)) for f in frames) + audio_chunks,
    )
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(content: bytes):
    """AVI bytes → ``(interval_ms, fourcc, (width, height), [frame_bytes])``.

    Walks the RIFF tree with ``struct`` only: ``avih`` gives the frame
    interval (µs/frame — authoritative over strh scale/rate), ``strh``
    the stream handler fourcc, ``strf`` the dimensions, and the ``movi``
    list the per-frame payloads (``..db``/``..dc`` chunks). Raises
    ``UnsupportedMediaError`` on non-AVI bytes or a truncated tree.
    """
    if not is_avi(content):
        raise UnsupportedMediaError("not an AVI")
    usec_per_frame = None
    fourcc = None
    dims = (0, 0)
    frames: list = []

    # stream type of the most recent strh: strf's layout depends on it
    # (BITMAPINFOHEADER for 'vids', WAVEFORMATEX for 'auds' — ADVICE r6:
    # a multi-stream AVI whose first strl is audio must not read dims
    # out of audio-format bytes). Per spec strh precedes strf within
    # each strl list, so "last seen" is the enclosing stream's type.
    cur_stream = [b"    "]

    def walk(lo: int, hi: int, depth: int = 0) -> None:
        nonlocal usec_per_frame, fourcc, dims
        if depth >= 8:
            return  # RIFF(AVI){hdrl{strl},movi} nests 3 deep; a hostile
            # chain of nested LISTs must not exhaust the C stack
        pos = lo
        while pos + 8 <= hi:
            cid = content[pos : pos + 4]
            (size,) = struct.unpack_from("<I", content, pos + 4)
            data_lo = pos + 8
            data_hi = min(data_lo + size, hi)
            if cid == b"LIST":
                if content[data_lo : data_lo + 4] == b"strl":
                    cur_stream[0] = b"    "  # new stream scope
                walk(data_lo + 4, data_hi, depth + 1)  # skip list fourcc
            elif cid == b"avih" and size >= 4:
                (usec_per_frame,) = struct.unpack_from(
                    "<I", content, data_lo
                )
            elif cid == b"strh" and size >= 8:
                cur_stream[0] = content[data_lo : data_lo + 4]
                if cur_stream[0] == b"vids":
                    fourcc = (
                        content[data_lo + 4 : data_lo + 8]
                        .decode("ascii", "replace")
                    )
            elif cid == b"strf" and size >= 16:
                if cur_stream[0] == b"vids":
                    w, h = struct.unpack_from("<ii", content, data_lo + 4)
                    if w and dims == (0, 0):
                        # KEEP the sign: negative biHeight = top-down
                        # DIB rows. abs() here made bmp_wrap re-declare
                        # the frame bottom-up and every sampled frame
                        # decoded vertically FLIPPED — silently wrong
                        # pixels, wrong pHash (r11 review). decode_bmp
                        # handles the signed height correctly.
                        dims = (w, h)
            elif cid[2:4] in (b"db", b"dc"):
                frames.append(content[data_lo:data_hi])
            pos = data_lo + size + (size % 2)

    try:
        walk(12, len(content))
    except struct.error as e:
        raise UnsupportedMediaError(f"truncated AVI: {e}") from e
    if usec_per_frame is None:
        raise UnsupportedMediaError("AVI without avih header")
    interval_ms = max(int(usec_per_frame) // 1000, 1)
    return interval_ms, (fourcc or "????"), dims, frames


def decode_avi_audio(content: bytes):
    """AVI bytes → (float32 mono samples in [-1, 1], sample_rate) from
    the container's first ``auds`` stream (r8 verdict item 8 — the
    audio half of the audio-visual pair; ``decode_avi`` extracts the
    frames, this the soundtrack, so one container feeds BOTH sides of
    the multimodal dedup matrix).

    Walks the same RIFF tree as ``decode_avi``: the nth ``strl`` list
    is stream n, whose movi chunks are ``NNwb``/``NNwa``. Supports
    uncompressed PCM (WAVEFORMATEX tag 1, 8/16-bit, any channel count
    — downmixed to mono like every other decoder here); compressed
    audio tags (MP3=0x55, AAC, ADPCM...) refuse with the typed error.
    Returns None when the AVI simply has no audio stream — absence is
    not an error, it is the common case for MJPG captures."""
    if not is_avi(content):
        raise UnsupportedMediaError("not an AVI")
    stream_types: list = []  # fourcc per strl, in order
    wfx = {}  # stream index -> (format_tag, nch, rate, bits)
    payload: dict = {}

    def walk(lo: int, hi: int, depth: int = 0) -> None:
        if depth >= 8:
            return  # depth cap: see decode_avi (ADVICE r9 high finding)
        pos = lo
        while pos + 8 <= hi:
            cid = content[pos : pos + 4]
            (size,) = struct.unpack_from("<I", content, pos + 4)
            data_lo = pos + 8
            data_hi = min(data_lo + size, hi)
            if cid == b"LIST":
                if content[data_lo : data_lo + 4] == b"strl":
                    stream_types.append(b"    ")
                walk(data_lo + 4, data_hi, depth + 1)
            elif cid == b"strh" and size >= 4 and stream_types:
                stream_types[-1] = content[data_lo : data_lo + 4]
            elif (
                cid == b"strf"
                and size >= 16
                and stream_types
                and stream_types[-1] == b"auds"
            ):
                tag, nch, rate, _avg, _align, bits = struct.unpack_from(
                    "<HHIIHH", content, data_lo
                )
                wfx[len(stream_types) - 1] = (tag, nch, rate, bits)
            elif cid[2:4] in (b"wb", b"wa") and cid[:2].isdigit():
                payload.setdefault(int(cid[:2]), []).append(
                    content[data_lo:data_hi]
                )
            pos = data_lo + size + (size % 2)

    try:
        walk(12, len(content))
    except struct.error as e:
        raise UnsupportedMediaError(f"truncated AVI: {e}") from e
    auds = [i for i, t in enumerate(stream_types) if t == b"auds"]
    if not auds:
        return None
    idx = auds[0]
    if idx not in wfx:
        raise UnsupportedMediaError("AVI auds stream without strf")
    tag, nch, rate, bits = wfx[idx]
    if tag != 1:
        raise UnsupportedMediaError(
            f"AVI audio format tag 0x{tag:x} unsupported (PCM only)"
        )
    if bits not in (8, 16) or nch < 1 or rate <= 0:
        raise UnsupportedMediaError(
            f"AVI PCM shape unsupported: {bits}-bit x{nch} @{rate}"
        )
    raw = b"".join(payload.get(idx, []))
    if not raw:
        raise UnsupportedMediaError("AVI auds stream without payload")
    if bits == 8:
        # RIFF convention: 8-bit PCM is unsigned
        samples = (
            np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
            - 128.0
        ) / 128.0
    else:
        raw = raw[: len(raw) - (len(raw) % (2 * nch))]
        samples = (
            np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
        )
    if nch > 1:
        samples = samples[: len(samples) - (len(samples) % nch)]
        samples = samples.reshape(-1, nch).mean(axis=1)
    return samples, int(rate)


def bmp_wrap(dib_rows: bytes, width: int, height: int) -> bytes:
    """Raw 24-bpp BGR DIB rows → standalone BMP bytes that
    ``decode_bmp`` (and anything else) accepts. ``height`` is SIGNED
    per the BMP spec: positive = bottom-up rows, negative = top-down
    (pass it through from the AVI strf header unchanged)."""
    header_size = 14 + 40
    info = struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, 24, 0,
        len(dib_rows), 0, 0, 0, 0,
    )
    file_hdr = struct.pack(
        "<2sIHHI", b"BM", header_size + len(dib_rows), 0, 0, header_size
    )
    return file_hdr + info + dib_rows


def encode_dib_frame(pixels: np.ndarray) -> bytes:
    """uint8 (h, w, 3) RGB → raw bottom-up BGR DIB rows (the ``DIB ``
    AVI frame payload; ``bmp_wrap`` of the result is a valid BMP)."""
    h, w = pixels.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    bgr = pixels[:, :, ::-1]
    out = np.zeros((h, row_bytes), dtype=np.uint8)
    out[:, : w * 3] = bgr.reshape(h, w * 3)
    return out[::-1].tobytes()


# ---------------------------------------------------------------------------
# BMP decode (real: uncompressed 24-bpp)
# ---------------------------------------------------------------------------


def decode_bmp(content: bytes) -> np.ndarray:
    """BMP bytes → uint8 (height, width, 3) RGB array.

    Uncompressed 24-bpp BITMAPINFOHEADER only (the standard
    machine-generated shape); rows are 4-byte aligned, bottom-up unless
    height is negative.
    """
    if content[:2] != b"BM":
        raise UnsupportedMediaError("not a BMP")
    (data_off,) = struct.unpack("<I", content[10:14])
    w, h = struct.unpack("<ii", content[18:26])
    bpp, comp = struct.unpack("<HI", content[28:34])
    if bpp != 24 or comp != 0:
        raise UnsupportedMediaError(f"unsupported BMP (bpp={bpp}, comp={comp})")
    top_down = h < 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    buf = np.frombuffer(
        content, dtype=np.uint8, count=row_bytes * h, offset=data_off
    ).reshape(h, row_bytes)
    img = buf[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    return img if top_down else img[::-1]


# ---------------------------------------------------------------------------
# WAV decode (real: stdlib wave + PCM16 samples)
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# TIFF: baseline uncompressed (the scan/export shape) — real IFD walk
# ---------------------------------------------------------------------------


def _tiff_ifd_entries(content: bytes, endian: str):
    """IFD0 entries of a TIFF stream → {tag: (type, count, value_off)}.
    Raises UnsupportedMediaError on a malformed header."""
    if len(content) < 8:
        raise UnsupportedMediaError("truncated TIFF header")
    (ifd0,) = struct.unpack_from(endian + "I", content, 4)
    if ifd0 + 2 > len(content):
        raise UnsupportedMediaError("TIFF IFD offset out of range")
    (n,) = struct.unpack_from(endian + "H", content, ifd0)
    out = {}
    for k in range(n):
        e = ifd0 + 2 + 12 * k
        if e + 12 > len(content):
            raise UnsupportedMediaError("truncated TIFF IFD")
        tag, typ, count = struct.unpack_from(endian + "HHI", content, e)
        out[tag] = (typ, count, e + 8)
    return out


def _tiff_ints(content, endian, typ, count, off):
    """SHORT/LONG scalar-or-array value of one IFD entry."""
    size = {3: 2, 4: 4}.get(typ)
    if size is None:
        raise UnsupportedMediaError(f"TIFF value type {typ} unsupported")
    total = size * count
    vpos = off
    if total > 4:
        (vpos,) = struct.unpack_from(endian + "I", content, off)
    if vpos + total > len(content):
        raise UnsupportedMediaError("TIFF value out of range")
    fmt = "H" if typ == 3 else "I"
    return list(struct.unpack_from(endian + fmt * count, content, vpos))


def decode_tiff(content: bytes) -> np.ndarray:
    """Baseline TIFF bytes → uint8 (height, width, channels) array.

    Uncompressed (Compression=1), 8-bit, chunky planar, gray or RGB,
    strip layout — the shape scanners and exporters emit. Anything
    else (LZW/JPEG-in-TIFF, 16-bit, tiles, planar=2) refuses with the
    typed error: one exotic scan must cost a quarantine row."""
    if content[:4] == b"II*\x00":
        endian = "<"
    elif content[:4] == b"MM\x00*":
        endian = ">"
    else:
        raise UnsupportedMediaError("not a TIFF")
    tags = _tiff_ifd_entries(content, endian)

    def one(tag, default=None):
        if tag not in tags:
            if default is None:
                raise UnsupportedMediaError(f"TIFF missing tag {tag}")
            return default
        typ, count, off = tags[tag]
        return _tiff_ints(content, endian, typ, count, off)[0]

    w = one(256)
    h = one(257)
    comp = one(259, default=1)
    spp = one(277, default=1)
    planar = one(284, default=1)
    if comp != 1:
        raise UnsupportedMediaError(f"TIFF compression {comp} unsupported")
    if planar != 1:
        raise UnsupportedMediaError("TIFF planar configuration 2 unsupported")
    if spp not in (1, 3):
        raise UnsupportedMediaError(f"TIFF {spp} samples/px unsupported")
    if 258 in tags:
        typ, count, off = tags[258]
        bps = _tiff_ints(content, endian, typ, count, off)
        if any(b != 8 for b in bps):
            raise UnsupportedMediaError(f"TIFF {bps}-bit unsupported")
    if w < 1 or h < 1 or w * h * spp > MAX_DECODE_PIXELS:
        raise UnsupportedMediaError(
            f"TIFF frame {w}x{h}x{spp} outside decodable range"
        )
    typ, count, off = tags.get(273, (None, None, None))
    if typ is None:
        raise UnsupportedMediaError("TIFF missing StripOffsets")
    offsets = _tiff_ints(content, endian, typ, count, off)
    typ2, count2, off2 = tags.get(279, (None, None, None))
    if typ2 is None:
        # single uncompressed strip without byte counts: derive
        counts = [w * h * spp] if len(offsets) == 1 else None
        if counts is None:
            raise UnsupportedMediaError("TIFF missing StripByteCounts")
    else:
        counts = _tiff_ints(content, endian, typ2, count2, off2)
    data = bytearray()
    for o, c in zip(offsets, counts):
        if o + c > len(content):
            raise UnsupportedMediaError("TIFF strip out of range")
        data += content[o : o + c]
    need = w * h * spp
    if len(data) < need:
        raise UnsupportedMediaError("TIFF pixel data truncated")
    arr = np.frombuffer(bytes(data[:need]), dtype=np.uint8).reshape(
        h, w, spp
    )
    if spp == 1:
        photometric = one(262, default=1)
        if photometric == 0:  # WhiteIsZero
            arr = 255 - arr
        arr = np.repeat(arr, 3, axis=2)
    return arr


def encode_tiff(pixels: np.ndarray) -> bytes:
    """uint8 (h, w[, 3]) → single-strip uncompressed little-endian
    TIFF (fixture encoder twin; ``decode_tiff`` round-trips exactly)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, spp = px.shape
    if spp not in (1, 3):
        raise ValueError(f"encode_tiff: {spp} channels unsupported")
    data = px.tobytes()
    entries = []

    def entry(tag, typ, count, value):
        entries.append(struct.pack("<HHII", tag, typ, count, value))

    n_entries = 9
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * n_entries + 4
    bps_off = data_off + len(data)
    entry(256, 4, 1, w)
    entry(257, 4, 1, h)
    if spp == 3:
        entry(258, 3, 3, bps_off)  # three SHORTs live past the data
    else:
        entry(258, 3, 1, 8)
    entry(259, 3, 1, 1)  # uncompressed
    entry(262, 3, 1, 2 if spp == 3 else 1)  # RGB / BlackIsZero
    entry(273, 4, 1, data_off)
    entry(277, 3, 1, spp)
    entry(278, 4, 1, h)  # one strip
    entry(279, 4, 1, len(data))
    out = bytearray(b"II*\x00")
    out += struct.pack("<I", ifd_off)
    out += struct.pack("<H", n_entries)
    out += b"".join(entries)
    out += struct.pack("<I", 0)
    out += data
    if spp == 3:
        out += struct.pack("<HHH", 8, 8, 8)
    return bytes(out)


def decode_wav(content: bytes) -> Tuple[np.ndarray, int]:
    """WAV bytes → (float32 mono samples in [-1, 1], sample_rate)."""
    try:
        with wave.open(io.BytesIO(content)) as wf:
            rate = wf.getframerate()
            nch = wf.getnchannels()
            sw = wf.getsampwidth()
            frames = wf.readframes(wf.getnframes())
    except (wave.Error, EOFError, RuntimeError) as e:
        raise UnsupportedMediaError(f"bad WAV: {e}") from e
    if sw != 2:
        raise UnsupportedMediaError(f"unsupported WAV sample width {sw}")
    samples = np.frombuffer(frames, dtype="<i2").astype(np.float32) / 32768.0
    if nch > 1:
        samples = samples.reshape(-1, nch).mean(axis=1)
    return samples, rate


def _f80(b: bytes) -> float:
    """80-bit IEEE-754 extended float → float (AIFF's sample rate
    field; stdlib's ``aifc`` parser was removed in Python 3.13)."""
    if len(b) != 10:
        raise UnsupportedMediaError("AIFF: bad extended float")
    sign = -1.0 if b[0] & 0x80 else 1.0
    exp = ((b[0] & 0x7F) << 8) | b[1]
    mant = int.from_bytes(b[2:10], "big")
    if exp == 0 and mant == 0:
        return 0.0
    if exp == 0x7FFF:
        raise UnsupportedMediaError("AIFF: non-finite sample rate")
    return sign * mant * 2.0 ** (exp - 16383 - 63)


def decode_aiff(content: bytes) -> Tuple[np.ndarray, int]:
    """AIFF bytes → (float32 mono samples in [-1, 1], sample_rate).
    Uncompressed big-endian PCM (8/16/24-bit), the 'AIFF' form type —
    'AIFC' compression variants refuse honestly."""
    if content[:4] != b"FORM" or content[8:12] not in (b"AIFF", b"AIFC"):
        raise UnsupportedMediaError("not an AIFF stream")
    if content[8:12] == b"AIFC":
        raise UnsupportedMediaError("AIFC (compressed AIFF) unsupported")
    i = 12
    comm = ssnd = None
    n = len(content)
    while i + 8 <= n:
        cid = content[i : i + 4]
        (length,) = struct.unpack(">I", content[i + 4 : i + 8])
        body = content[i + 8 : i + 8 + length]
        if cid == b"COMM":
            comm = body
        elif cid == b"SSND":
            ssnd = body
        i += 8 + length + (length & 1)  # chunks are word-aligned
    if comm is None or ssnd is None or len(comm) < 18 or len(ssnd) < 8:
        raise UnsupportedMediaError("AIFF: missing COMM/SSND")
    nch, nframes, bits = struct.unpack(">HIH", comm[:8])
    rate = int(round(_f80(comm[8:18])))
    if rate <= 0:
        raise UnsupportedMediaError("AIFF: bad sample rate")
    if bits not in (8, 16, 24):
        raise UnsupportedMediaError(f"AIFF: {bits}-bit unsupported")
    (offset,) = struct.unpack(">I", ssnd[:4])
    raw = ssnd[8 + offset :]
    step = bits // 8
    need = nframes * nch * step
    if len(raw) < need:
        raise UnsupportedMediaError("AIFF: truncated sample data")
    raw = raw[:need]
    if bits == 8:
        pcm = np.frombuffer(raw, dtype=np.int8).astype(np.float32) / 128.0
    elif bits == 16:
        pcm = np.frombuffer(raw, dtype=">i2").astype(np.float32) / 32768.0
    else:  # 24-bit big-endian
        b3 = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3).astype(
            np.int64
        )
        v = (b3[:, 0] << 16) | (b3[:, 1] << 8) | b3[:, 2]
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
        pcm = v.astype(np.float32) / float(1 << 23)
    if nch > 1:
        pcm = pcm.reshape(-1, nch).mean(axis=1)
    return pcm, rate


def encode_aiff(samples: np.ndarray, rate: int = 16000) -> bytes:
    """float mono [-1, 1] → 16-bit big-endian AIFF bytes (fixture
    encoder twin; the 80-bit rate field written for real)."""
    pcm = np.clip(np.asarray(samples) * 32767.0, -32768, 32767).astype(
        ">i2"
    )
    nframes = len(pcm)
    if int(rate) <= 0:
        # mant = 0 would never satisfy the normalization shift below —
        # an infinite loop instead of an error (r11 review); mirrors
        # decode_aiff's guard
        raise ValueError(f"rate must be positive: {rate}")
    # 80-bit extended float for the rate
    exp = 16383 + 63
    mant = int(rate)
    while mant < 1 << 63:
        mant <<= 1
        exp -= 1
    f80 = bytes([(exp >> 8) & 0x7F, exp & 0xFF]) + mant.to_bytes(8, "big")
    comm = struct.pack(">HIH", 1, nframes, 16) + f80
    ssnd = struct.pack(">II", 0, 0) + pcm.tobytes()
    body = (
        b"AIFF"
        + b"COMM" + struct.pack(">I", len(comm)) + comm
        + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
    )
    return b"FORM" + struct.pack(">I", len(body)) + body


def decode_audio(content: bytes) -> Tuple[np.ndarray, int]:
    """Magic-dispatched audio decode — (float32 mono [-1, 1], rate)
    from WAV (stdlib PCM-16), FLAC (``operators/flac.py``, the real
    pure-stdlib decoder), or AIFF (big-endian PCM). The one entry
    point the audio kernels use, mirroring ``multimodal._real_decode``
    for images; unknown magic raises the shared typed refusal."""
    if content[:4] == b"RIFF":
        if content[8:12] == b"AVI ":
            # r9: an AVI's PCM soundtrack IS audio — dispatch it here
            # so every audio kernel (features, fingerprint) consumes
            # video containers natively, like any other format
            track = decode_avi_audio(content)
            if track is None:
                raise UnsupportedMediaError("AVI without an audio track")
            return track
        return decode_wav(content)
    if content[:4] == b"fLaC":
        from .flac import decode_flac

        return decode_flac(content)
    if content[:4] == b"FORM":
        return decode_aiff(content)
    if content[:4] == b"OggS":
        raise UnsupportedMediaError(
            "Ogg audio (opus/vorbis) decode unsupported: codebook data"
            " tables unavailable in this build; stream is probed, not"
            " decoded"
        )
    if content[:3] == b"ID3" or (
        len(content) >= 4
        and _mpeg_frame(content, 0) is not None
    ):
        # Recognized but deliberately undecodable here: MPEG audio
        # decode requires the spec's numeric data tables (Layer III
        # Huffman tables B.7, the 512-tap synthesis window D.1) which
        # are published constants, not derivable algorithms — this
        # clean-room, no-network build refuses rather than ship an
        # unverifiable reconstruction that would decode silently
        # WRONG. probe_mp3/probe_bytes still inventory the stream
        # (frames, duration, rate, layer) so the slice is typed and
        # auditable in quarantine, not invisible.
        raise UnsupportedMediaError(
            "MPEG audio (mp3) decode unsupported: spec data tables"
            " unavailable in this build; stream is probed, not decoded"
        )
    raise UnsupportedMediaError("no stdlib audio decoder for this format")


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """float mono [-1, 1] → PCM-16 WAV bytes (fixture encoder)."""
    pcm = np.clip(np.asarray(samples) * 32767.0, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


# ---------------------------------------------------------------------------
# feature kernels (shared by the Spark operators)
# ---------------------------------------------------------------------------


def image_luma(img: np.ndarray) -> np.ndarray:
    """(h, w, ch) uint8 → (h, w) float luma (Rec. 601 weights)."""
    if img.shape[2] == 1:
        return img[:, :, 0].astype(np.float64)
    rgb = img[:, :, :3].astype(np.float64)
    return rgb @ np.array([0.299, 0.587, 0.114])


def luma_histogram(luma: np.ndarray, bins: int) -> np.ndarray:
    """Normalized luma histogram — a real, deterministic image feature."""
    hist, _ = np.histogram(luma, bins=bins, range=(0.0, 256.0))
    return (hist / max(luma.size, 1)).astype(np.float32)

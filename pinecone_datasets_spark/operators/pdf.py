"""PDF text extraction: pure stdlib (zlib + struct), corpus-tolerant.

Academic and book corpora arrive overwhelmingly as PDF; a training-data
engine that cannot read them silently loses the highest-quality text
slice. This module extracts page text with the stdlib only, built for
corpus reality rather than viewer fidelity:

* **Tolerant object scan, not xref trust.** Real crawled PDFs have
  broken/incremental xref tables; like every "repair mode" extractor,
  we scan the byte stream for ``N G obj ... endobj`` frames directly
  and take the LAST definition of each object id (incremental updates
  append re-definitions — last wins, same rule as the xref chain).
* **Object streams (PDF 1.5+)**: ``/Type /ObjStm`` FlateDecode streams
  carrying packed objects are unpacked for real (``/N`` pairs +
  ``/First`` offset), so modern PDFs don't probe as empty.
* **Content streams**: FlateDecode (zlib) or raw; the text operators
  ``Tj ' " TJ`` collect literal ``(...)`` strings (with the full
  escape table incl. octal and line continuations) and ``<hex>``
  strings; ``Td TD T* '`` line moves emit newlines, ``TJ`` kerning
  gaps below -100 units emit spaces (the usual word-gap heuristic).
* **Font decoding, honestly scoped**: fonts with a ``/ToUnicode``
  CMap decode through real ``bfchar``/``bfrange`` parsing (1- or
  2-byte codes); simple fonts without one decode as Latin-1 (the
  WinAnsi/Standard core overlaps ASCII, which is what corpus text
  mostly is); 2-byte CID fonts WITHOUT a ToUnicode map cannot be
  decoded truthfully — their strings are dropped and the page is
  flagged, never silently mojibake'd.
* **Quarantine contract**: encrypted PDFs (``/Encrypt``) and
  undecodable blobs yield a typed ``error`` instead of a dead job —
  ``extract_pdf_text`` is one map-only Arrow kernel over the corpus.

A deterministic fixture writer twin (``encode_simple_pdf``: real xref
table, FlateDecode content streams, escaped literals) serves tests and
the hash oracle, the same encoder-twin pattern as WARC/WAV/PNG/JPEG.

Reference scope note: the reference (pinecone-io/pinecone-datasets)
has no document-format surface; Layer-B extension (SURVEY.md §2
"beyond the reference").
"""

from __future__ import annotations

import re
import struct
import zlib
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .media_codecs import UnsupportedMediaError

__all__ = ["extract_pdf_text", "pdf_to_text", "encode_simple_pdf"]

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"

# Per-stream inflate ceiling: a flate bomb (tiny stream, huge expansion)
# must cost at most this much executor memory, then quarantine — same
# hostile-input stance as archives.max_member_bytes / MAX_DECODE_PIXELS
# (ADVICE r9 medium finding).
MAX_STREAM_BYTES = 256 * 1024 * 1024


# ---------------------------------------------------------------------------
# Minimal PDF object parser (dicts, arrays, names, numbers, strings, refs)
# ---------------------------------------------------------------------------


class _P:
    """Cursor over object bytes."""

    __slots__ = ("b", "i")

    def __init__(self, b: bytes, i: int = 0) -> None:
        self.b = b
        self.i = i

    def skip_ws(self) -> None:
        b, i, n = self.b, self.i, len(self.b)
        while i < n:
            c = b[i]
            if c in _WS:
                i += 1
            elif c == 0x25:  # % comment to EOL
                while i < n and b[i] not in b"\r\n":
                    i += 1
            else:
                break
        self.i = i

    def peek(self, k: int = 1) -> bytes:
        return self.b[self.i : self.i + k]


def _parse_value(p: _P):
    p.skip_ws()
    b, i = p.b, p.i
    if i >= len(b):
        return None
    c = b[i : i + 1]
    if b[i : i + 2] == b"<<":
        p.i += 2
        d = {}
        while True:
            p.skip_ws()
            if p.peek(2) == b">>":
                p.i += 2
                return d
            if p.peek(1) != b"/":
                # malformed dict: bail to what we have
                return d
            key = _parse_name(p)
            d[key] = _parse_value(p)
    if c == b"[":
        p.i += 1
        arr = []
        while True:
            p.skip_ws()
            if p.peek(1) == b"]":
                p.i += 1
                return arr
            if p.i >= len(b):
                return arr
            arr.append(_parse_value(p))
    if c == b"/":
        return ("name", _parse_name(p))
    if c == b"(":
        return ("str", _parse_literal_string(p))
    if c == b"<":  # single '<' (the '<<' dict case returned above)
        return ("str", _parse_hex_string(p))
    if c in b"+-.0123456789":
        return _parse_number_or_ref(p)
    m = re.match(rb"true|false|null", b[i:])
    if m:
        p.i += m.end()
        return {"true": True, "false": False, "null": None}[
            m.group().decode()
        ]
    p.i += 1  # unknown token byte: skip
    return None


def _parse_name(p: _P) -> str:
    b = p.b
    assert b[p.i : p.i + 1] == b"/"
    i = p.i + 1
    out = bytearray()
    n = len(b)
    while i < n and b[i] not in _WS and b[i] not in _DELIM:
        if b[i] == 0x23 and i + 2 < n:  # #xx hex escape
            try:
                out.append(int(b[i + 1 : i + 3], 16))
                i += 3
                continue
            except ValueError:
                pass
        out.append(b[i])
        i += 1
    p.i = i
    return out.decode("latin-1")


def _parse_literal_string(p: _P) -> bytes:
    b = p.b
    i = p.i + 1  # past (
    depth = 1
    out = bytearray()
    n = len(b)
    while i < n:
        c = b[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = b[i]
            if e in b"nrtbf":
                out.append(
                    {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}[e]
                )
                i += 1
            elif e in b"()\\":
                out.append(e)
                i += 1
            elif e in b"01234567":
                oct_ = bytes([e])
                i += 1
                for _ in range(2):
                    if i < n and b[i] in b"01234567":
                        oct_ += bytes([b[i]])
                        i += 1
                out.append(int(oct_, 8) & 0xFF)
            elif e in b"\r\n":  # line continuation
                i += 1
                if e == 0x0D and i < n and b[i] == 0x0A:
                    i += 1
            else:
                out.append(e)
                i += 1
        elif c == 0x28:
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                i += 1
                break
            out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    p.i = i
    return bytes(out)


def _parse_hex_string(p: _P) -> bytes:
    b = p.b
    i = p.i + 1
    out = bytearray()
    digits = ""
    n = len(b)
    while i < n and b[i : i + 1] != b">":
        ch = chr(b[i])
        if ch in "0123456789abcdefABCDEF":
            digits += ch
        i += 1
    if len(digits) % 2:
        digits += "0"
    for k in range(0, len(digits), 2):
        out.append(int(digits[k : k + 2], 16))
    p.i = i + 1
    return bytes(out)


def _parse_number_or_ref(p: _P):
    b = p.b
    m = re.match(rb"[+-]?(\d+\.\d*|\.\d+|\d+)", b[p.i :])
    if not m:
        p.i += 1
        return None
    tok = m.group()
    end = p.i + m.end()
    # lookahead for "G R" (indirect reference)
    m2 = re.match(rb"\s+(\d+)\s+R\b", b[end:])
    if m2 and b"." not in tok:
        p.i = end + m2.end()
        return ("ref", int(tok), int(m2.group(1)))
    p.i = end
    return float(tok) if b"." in tok else int(tok)


# ---------------------------------------------------------------------------
# Document scan
# ---------------------------------------------------------------------------


def _scan_objects(blob: bytes) -> dict:
    """{obj_num: (dict_or_value, stream_bytes_or_None)} — tolerant
    whole-byte scan; LAST definition of an id wins (incremental
    updates). Streams are cut at the matching ``endstream``.

    The scan is SEQUENTIAL, resuming after each object's extent:
    compressed stream payloads are arbitrary bytes and can contain
    ``N 0 obj`` patterns — a naive finditer would let such a payload
    byte-string SHADOW a real object under the last-wins rule."""
    objs: dict = {}
    pos = 0
    n = len(blob)
    while pos < n:
        m = _OBJ_RE.search(blob, pos)
        if m is None:
            break
        num = int(m.group(1))
        body_start = m.end()
        end = blob.find(b"endobj", body_start)
        if end < 0:
            end = n
        # the stream keyword (in the object DICT region) is located
        # BEFORE trusting the endobj position: compressed payload bytes
        # can contain the ASCII substring 'endobj', and cutting there
        # truncated the object and resumed the scan INSIDE the payload
        # — re-enabling the payload-shadowing this sequential scan
        # exists to prevent (r11 review). With a stream present, the
        # payload extent comes from a direct /Length when the dict has
        # one (the spec-trusting path), else the next 'endstream', and
        # endobj is searched only after the payload.
        sm = re.compile(rb"stream\r?\n").search(blob, body_start, end)
        stream = None
        if sm:
            seg = blob[body_start : sm.start()]
            val = _parse_value(_P(seg))
            length = (
                val.get("Length") if isinstance(val, dict) else None
            )
            se = -1
            if isinstance(length, int) and 0 <= length <= n:
                cand = sm.end() + length
                # trust /Length only when endstream actually follows
                tail = blob[cand : cand + 16]
                if b"endstream" in tail:
                    se = cand
            if se < 0:
                se = blob.find(b"endstream", sm.end())
                if se < 0:
                    se = n
            stream = blob[sm.end() : se]
            # spec: EOL may precede endstream and is not stream data
            if stream.endswith(b"\r\n"):
                stream = stream[:-2]
            elif stream.endswith(b"\n") or stream.endswith(b"\r"):
                stream = stream[:-1]
            end = blob.find(b"endobj", se)
            if end < 0:
                end = n
        else:
            seg = blob[body_start:end]
            val = _parse_value(_P(seg))
        objs[num] = (val, stream)
        pos = end + 6 if end < n else n
    return objs


def _deref(objs: dict, v, depth: int = 0):
    while (
        isinstance(v, tuple) and len(v) == 3 and v[0] == "ref"
        and depth < 32
    ):
        got = objs.get(v[1])
        v = got[0] if got else None
        depth += 1
    return v


def _stream_data(objs: dict, num: int) -> Optional[bytes]:
    got = objs.get(num)
    if not got:
        return None
    d, raw = got
    if raw is None:
        return None
    return _decode_stream(objs, d if isinstance(d, dict) else {}, raw)


def _decode_stream(objs: dict, d: dict, raw: bytes) -> Optional[bytes]:
    ln = _deref(objs, d.get("Length"))
    if isinstance(ln, (int, float)) and 0 < int(ln) <= len(raw):
        raw = raw[: int(ln)]
    filt = _deref(objs, d.get("Filter"))
    names = []
    if isinstance(filt, tuple) and filt[0] == "name":
        names = [filt[1]]
    elif isinstance(filt, list):
        names = [f[1] for f in filt if isinstance(f, tuple)]
    data = raw
    for name in names:
        if name == "FlateDecode":
            try:
                # capped streamed inflate (tolerates trailing garbage by
                # construction): a flate bomb hits the ceiling after
                # MAX_STREAM_BYTES+1 output bytes instead of inflating
                # fully in executor memory
                data = zlib.decompressobj().decompress(
                    data, MAX_STREAM_BYTES + 1
                )
            except zlib.error:
                return None
            if len(data) > MAX_STREAM_BYTES:
                raise UnsupportedMediaError(
                    "PDF stream inflates past MAX_STREAM_BYTES "
                    f"({MAX_STREAM_BYTES})"
                )
        elif name in ("ASCIIHexDecode",):
            hexs = re.sub(rb"[^0-9a-fA-F]", b"", data.split(b">")[0])
            if len(hexs) % 2:
                hexs += b"0"
            data = bytes.fromhex(hexs.decode("ascii"))
        else:
            return None  # unsupported filter (DCT, LZW, ...): not text
    return data


def _unpack_objstms(objs: dict) -> None:
    """Unpack /Type /ObjStm packed objects into the object table (the
    PDF 1.5+ layout); packed definitions do NOT override a later
    top-level redefinition."""
    for num in list(objs):
        d, raw = objs[num]
        if not (isinstance(d, dict) and raw is not None):
            continue
        t = d.get("Type")
        if not (isinstance(t, tuple) and t[1] == "ObjStm"):
            continue
        data = _decode_stream(objs, d, raw)
        if data is None:
            continue
        n = _deref(objs, d.get("N"))
        first = _deref(objs, d.get("First"))
        if not isinstance(n, int) or not isinstance(first, int):
            continue
        head = data[:first]
        pairs = re.findall(rb"(\d+)\s+(\d+)", head)[:n]
        for k, (onum, off) in enumerate(pairs):
            onum, off = int(onum), int(off)
            end = (
                first + int(pairs[k + 1][1])
                if k + 1 < len(pairs)
                else len(data)
            )
            if onum in objs:
                continue  # top-level definition wins
            val = _parse_value(_P(data[first + off : end]))
            objs[onum] = (val, None)


# ---------------------------------------------------------------------------
# Fonts: ToUnicode CMaps
# ---------------------------------------------------------------------------


def _parse_tounicode(data: bytes) -> dict:
    """CMap bfchar/bfrange sections → {code_int: str}; also returns
    the code byte-width under key ``None`` (1 or 2)."""
    cmap: dict = {}
    width = 1
    for m in re.finditer(
        rb"begincodespacerange(.*?)endcodespacerange", data, re.S
    ):
        for h in re.findall(rb"<([0-9a-fA-F]+)>", m.group(1)):
            width = max(width, len(h) // 2)
    for m in re.finditer(rb"beginbfchar(.*?)endbfchar", data, re.S):
        for src, dst in re.findall(
            rb"<([0-9a-fA-F]+)>\s*<([0-9a-fA-F]+)>", m.group(1)
        ):
            if len(dst) % 2:
                continue  # malformed odd-length hex: skip the entry
            code = int(src, 16)
            width = max(width, len(src) // 2)
            cmap[code] = (
                bytes.fromhex(dst.decode()).decode(
                    "utf-16-be", "replace"
                )
            )
    for m in re.finditer(rb"beginbfrange(.*?)endbfrange", data, re.S):
        body = m.group(1)
        for lo, hi, dst in re.findall(
            rb"<([0-9a-fA-F]+)>\s*<([0-9a-fA-F]+)>\s*<([0-9a-fA-F]+)>",
            body,
        ):
            if len(dst) % 2:
                continue
            lo_i, hi_i = int(lo, 16), int(hi, 16)
            width = max(width, len(lo) // 2)
            dst_b = bytes.fromhex(dst.decode())
            if len(dst_b) <= 2:
                # single UTF-16 unit destination; masked increment so
                # the old chr(base + k) can never leave chr()'s range
                # (the fi-ligature class <00660069> previously raised
                # an uncaught ValueError — r11 review)
                base = int(dst, 16)
                for k in range(min(hi_i - lo_i + 1, 65536)):
                    cmap[lo_i + k] = chr((base + k) & 0xFFFF)
            else:
                # multi-unit destination (ligatures, astral pairs):
                # UTF-16BE string whose LAST code unit increments
                # across the range, per the CMap spec
                prefix, last = dst_b[:-2], int.from_bytes(
                    dst_b[-2:], "big"
                )
                for k in range(min(hi_i - lo_i + 1, 65536)):
                    unit = ((last + k) & 0xFFFF).to_bytes(2, "big")
                    cmap[lo_i + k] = (prefix + unit).decode(
                        "utf-16-be", "replace"
                    )
    cmap[None] = width
    return cmap


def _page_fonts(objs: dict, page: dict) -> dict:
    """Font resource name → decoder dict {None: width, code: str} or
    {'latin1': True} for simple fonts, {'drop': True} for undecodable
    CID fonts. Resources absent on the page itself are inherited from
    the /Parent /Pages chain (depth-capped), the common real-PDF layout
    — without this, ToUnicode fonts fall back to latin-1 mojibake
    (ADVICE r9 low)."""
    node, depth = page, 0
    res = _deref(objs, node.get("Resources"))
    while not isinstance(res, dict) and depth < 32:
        parent = node.get("Parent")
        if not (isinstance(parent, tuple) and parent[0] == "ref"):
            break
        got = objs.get(parent[1])
        node = got[0] if got and isinstance(got[0], dict) else None
        if node is None:
            break
        res = _deref(objs, node.get("Resources"))
        depth += 1
    out: dict = {}
    if not isinstance(res, dict):
        return out
    fonts = _deref(objs, res.get("Font"))
    if not isinstance(fonts, dict):
        return out
    for fname, fref in fonts.items():
        fd = _deref(objs, fref)
        if not isinstance(fd, dict):
            out[fname] = {"latin1": True}
            continue
        tu = fd.get("ToUnicode")
        if isinstance(tu, tuple) and tu[0] == "ref":
            data = _stream_data(objs, tu[1])
            if data:
                out[fname] = _parse_tounicode(data)
                continue
        sub = fd.get("Subtype")
        if isinstance(sub, tuple) and sub[1] == "Type0":
            # 2-byte CID font with no usable ToUnicode: dropping is
            # honest; latin-1 on CID bytes would be silent mojibake
            out[fname] = {"drop": True}
        else:
            out[fname] = {"latin1": True}
    return out


def _decode_shown(raw: bytes, font: Optional[dict]) -> Optional[str]:
    if font is None or font.get("latin1"):
        return raw.decode("latin-1")
    if font.get("drop"):
        return None
    width = font.get(None, 1)
    out = []
    for i in range(0, len(raw) - (width - 1), width):
        code = int.from_bytes(raw[i : i + width], "big")
        out.append(font.get(code, "�"))
    return "".join(out)


# ---------------------------------------------------------------------------
# Content-stream text
# ---------------------------------------------------------------------------

_OPNAME_RE = re.compile(rb"[A-Za-z'\"*]+")


def _content_tokens(data: bytes):
    """Content-stream token scanner: literal strings go through the
    REAL nesting/escape parser (a regex cannot match nested parens),
    inline-image binary (``ID ... EI``) is skipped whole."""
    p = _P(data)
    n = len(data)
    while True:
        p.skip_ws()
        if p.i >= n:
            return
        c = data[p.i]
        if c == 0x28:  # (
            yield ("str", _parse_literal_string(p))
        elif data[p.i : p.i + 2] == b"<<":
            p.i += 2
            yield ("mark", b"<<")
        elif c == 0x3C:  # <
            yield ("str", _parse_hex_string(p))
        elif c == 0x2F:  # /
            yield ("name", _parse_name(p))
        elif c in b"[]{}>)":
            p.i += 1
            yield ("mark", bytes([c]))
        elif c in b"+-.0123456789":
            v = _parse_number_or_ref(p)
            yield ("num", float(v) if isinstance(v, (int, float)) else 0.0)
        else:
            m = _OPNAME_RE.match(data, p.i)
            if m:
                p.i = m.end()
                op = m.group()
                if op == b"ID":  # inline image: raw bytes until EI
                    at = data.find(b"EI", p.i)
                    p.i = len(data) if at < 0 else at + 2
                    continue
                yield ("op", op)
            else:
                p.i += 1


def _content_text(data: bytes, fonts: dict) -> tuple[str, bool]:
    """Text shown by one content stream; returns (text, dropped_cid)."""
    out: list = []
    stack: list = []
    cur_font: Optional[dict] = None
    dropped = False

    def show(raw: bytes) -> None:
        nonlocal dropped
        s = _decode_shown(raw, cur_font)
        if s is None:
            dropped = True
        elif s:
            out.append(s)

    for kind, tok in _content_tokens(data):
        if kind == "str":
            stack.append(("str", tok))
        elif kind == "name":
            stack.append(("name", tok))
        elif kind == "mark":
            stack.append(tok)
        elif kind == "num":
            stack.append(tok)
        else:
            op = tok
            if op == b"Tj":
                strs = [s for s in stack if isinstance(s, tuple)
                        and s[0] == "str"]
                if strs:
                    show(strs[-1][1])
            elif op in (b"'", b'"'):
                strs = [s for s in stack if isinstance(s, tuple)
                        and s[0] == "str"]
                if strs:
                    out.append("\n")
                    show(strs[-1][1])
            elif op == b"TJ":
                # the array contents sit on the stack between [ and ]
                items = []
                for s in reversed(stack):
                    if s == b"[":
                        break
                    items.append(s)
                for s in reversed(items):
                    if isinstance(s, tuple) and s[0] == "str":
                        show(s[1])
                    elif isinstance(s, float) and s < -100:
                        out.append(" ")  # kerning word gap
            elif op == b"Tf":
                names = [s for s in stack if isinstance(s, tuple)
                         and s[0] == "name"]
                if names:
                    cur_font = fonts.get(names[-1][1])
            elif op in (b"Td", b"TD", b"T*"):
                if out and out[-1] != "\n":
                    out.append("\n")
            elif op == b"ET":
                if out and out[-1] != "\n":
                    out.append("\n")
            stack.clear()
            continue
    text = "".join(out)
    text = re.sub(r"\n{2,}", "\n", text).strip("\n")
    return text, dropped


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def pdf_to_text(blob: bytes) -> tuple[str, int, bool]:
    """PDF bytes → ``(text, n_pages, dropped_cid_text)``.

    Pages join with form feeds (``\\f``). Raises the shared typed
    ``UnsupportedMediaError`` for non-PDF bytes, encrypted documents,
    and documents with no extractable page tree."""
    if not blob.lstrip()[:5].startswith(b"%PDF-"):
        raise UnsupportedMediaError("not a PDF")
    objs = _scan_objects(blob)
    if not objs:
        raise UnsupportedMediaError("PDF: no parseable objects")
    _unpack_objstms(objs)
    # encryption: any trailer dict with /Encrypt
    if re.search(rb"/Encrypt\b", blob[-4096:]) or any(
        isinstance(d, dict) and "Encrypt" in d
        for d, _s in objs.values()
        if isinstance(d, dict) and d.get("Root") is not None
    ):
        raise UnsupportedMediaError("PDF: encrypted (no decryption)")
    # page objects: every dict with /Type /Page, document order by
    # object number (tolerant-scan stand-in for the Kids tree walk,
    # robust to broken /Pages chains)
    pages = [
        (num, d)
        for num, (d, _s) in sorted(objs.items())
        if isinstance(d, dict)
        and isinstance(d.get("Type"), tuple)
        and d["Type"][1] == "Page"
    ]
    if not pages:
        raise UnsupportedMediaError("PDF: no page objects")
    texts = []
    dropped = False
    for _num, page in pages:
        fonts = _page_fonts(objs, page)
        contents = page.get("Contents")
        streams = []
        refs = []
        if isinstance(contents, tuple) and contents[0] == "ref":
            # a ref either names the stream itself or an ARRAY of
            # stream refs (both legal) — disambiguate by what's there
            target = objs.get(contents[1])
            if target and isinstance(target[0], list):
                refs = target[0]
            else:
                refs = [contents]
        elif isinstance(contents, list):
            refs = contents
        for ref in refs:
            if isinstance(ref, tuple) and ref[0] == "ref":
                data = _stream_data(objs, ref[1])
                if data:
                    streams.append(data)
        page_text, pd_dropped = _content_text(b"\n".join(streams), fonts)
        dropped = dropped or pd_dropped
        texts.append(page_text)
    return "\f".join(texts), len(pages), dropped


def extract_pdf_text(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Blob frame → ``(id, text, n_pages, dropped_cid, error)`` — one
    map-only Arrow kernel; failures land as typed ``error`` rows
    (quarantine = ``error IS NOT NULL``), never a dead job."""
    from ..shipping import ensure_shipped

    ensure_shipped(df.sparkSession)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, texts, npages, drops, errs = [], [], [], [], []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                ids.append(mid)
                try:
                    t, n, dr = pdf_to_text(
                        bytes(content) if content is not None else b""
                    )
                    texts.append(t)
                    npages.append(n)
                    drops.append(dr)
                    errs.append(None)
                # the full quarantine family, not just the typed
                # refusal: hand-written format parsers over hostile
                # bytes can leak stdlib exceptions (chr() range,
                # int() parses, odd-length hex...) and ONE such row
                # must cost a quarantine row, never the job (r11
                # review found reachable ValueError paths in both
                # extractors)
                except (UnsupportedMediaError, RecursionError,
                        ValueError, KeyError, IndexError, struct.error,
                        zlib.error, EOFError) as e:
                    texts.append(None)
                    npages.append(None)
                    drops.append(None)
                    errs.append(str(e))
            yield pd.DataFrame(
                {
                    "id": ids,
                    "text": texts,
                    "n_pages": pd.array(npages, dtype="Int32"),
                    "dropped_cid": pd.array(drops, dtype="boolean"),
                    "error": errs,
                }
            )

    return df.select(
        F.col(id_col).alias(id_col), F.col(content_col)
    ).mapInPandas(
        kernel,
        "id string, text string, n_pages int, dropped_cid boolean,"
        " error string",
    )


# ---------------------------------------------------------------------------
# Fixture writer twin
# ---------------------------------------------------------------------------


def _esc_literal(s: str) -> bytes:
    out = s.encode("latin-1", "replace")
    out = out.replace(b"\\", b"\\\\")
    out = out.replace(b"(", b"\\(").replace(b")", b"\\)")
    return out


def encode_simple_pdf(
    pages: list,
    compress: bool = True,
) -> bytes:
    """``[page_text, ...]`` → a spec-valid one-font-per-page PDF with a
    REAL xref table and (by default) FlateDecode content streams; each
    text line becomes one ``Tj`` + line move, so
    ``pdf_to_text(encode_simple_pdf(pages))`` reproduces the text
    exactly (pages joined with ``\\f``)."""
    objs: list = []  # (num, bytes) in order

    def obj(num: int, body: bytes) -> None:
        objs.append((num, body))

    n_pages = len(pages)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    obj(
        2,
        (
            f"<< /Type /Pages /Count {n_pages} /Kids [{kids}] >>"
        ).encode(),
    )
    font_num = 3 + 2 * n_pages
    for i, text in enumerate(pages):
        pnum = 3 + 2 * i
        cnum = pnum + 1
        obj(
            pnum,
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
                f" /Resources << /Font << /F1 {font_num} 0 R >> >>"
                f" /Contents {cnum} 0 R >>"
            ).encode(),
        )
        lines = text.split("\n")
        body = bytearray(b"BT /F1 12 Tf 72 720 Td\n")
        for k, line in enumerate(lines):
            if k:
                body += b"0 -14 Td\n"
            body += b"(" + _esc_literal(line) + b") Tj\n"
        body += b"ET"
        data = bytes(body)
        if compress:
            data = zlib.compress(data)
            head = (
                f"<< /Length {len(data)} /Filter /FlateDecode >>"
            ).encode()
        else:
            head = f"<< /Length {len(data)} >>".encode()
        obj(cnum, head + b"\nstream\n" + data + b"\nendstream")
    obj(
        font_num,
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    )

    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num, body in objs:
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for num, _ in sorted(objs):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)

"""PDF text extraction (operators/pdf.py)."""

from __future__ import annotations

import zlib

import pytest

from pinecone_datasets_spark.operators.media_codecs import (
    UnsupportedMediaError,
)
from pinecone_datasets_spark.operators.pdf import (
    encode_simple_pdf,
    extract_pdf_text,
    pdf_to_text,
)


def test_roundtrip_escapes_and_multipage():
    pages = [
        "Hello PDF.\nLine with (parens), \\ backslash and % percent.",
        "Page 2: tabs\tand digits 0123456789.",
        "Page 3 only line",
    ]
    for compress in (True, False):
        text, n, dropped = pdf_to_text(
            encode_simple_pdf(pages, compress=compress)
        )
        assert n == 3 and not dropped
        assert text == "\f".join(pages)


def test_literal_string_escape_table():
    """Octal escapes, \\n\\r\\t\\b\\f, line continuations, nested
    parens — the full PDF 7.3.4.2 escape table through a hand-built
    content stream."""
    body = (
        b"BT /F1 12 Tf 72 720 Td\n"
        b"(octal \\101\\102 nl\\n nested (ok) cont\\\n inued) Tj\n"
        b"ET"
    )
    pdf = _wrap_single_stream(body)
    text, n, _ = pdf_to_text(pdf)
    assert text == "octal AB nl\n nested (ok) cont inued"


def _wrap_single_stream(body: bytes) -> bytes:
    """Minimal hand-rolled PDF around one raw content stream."""
    return (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Count 1 /Kids [3 0 R] >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(body)).encode() + b" >>\n"
        b"stream\n" + body + b"\nendstream\nendobj\n"
        b"trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n"
    )


def test_tj_arrays_hex_strings_and_kerning_gaps():
    body = (
        b"BT\n"
        b"[ (Hel) -50 (lo) -250 (world) ] TJ\n"
        b"0 -14 Td\n"
        b"<4869 2074 6865 7265> Tj\n"
        b"ET"
    )
    text, _, _ = pdf_to_text(_wrap_single_stream(body))
    # -50 is kerning (no gap); -250 is a word gap; hex string decodes
    # (whitespace inside hex strings is legal and ignored)
    assert text == "Hello world\nHi there"


def test_tounicode_cmap_and_cid_drop():
    """A 2-byte CID font WITH /ToUnicode decodes through real
    bfchar/bfrange parsing; the same strings under a Type0 font
    WITHOUT one are dropped and flagged, never mojibake'd."""
    cmap = (
        b"/CIDInit /ProcSet findresource begin\n"
        b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        b"2 beginbfchar\n<0041> <0057>\n<0042> <00E9>\nendbfchar\n"
        b"1 beginbfrange\n<0100> <0102> <0061>\nendbfrange\n"
        b"endcmap\n"
    )
    common = (
        b"%PDF-1.5\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Count 1 /Kids [3 0 R] >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Resources"
        b" << /Font << /F9 6 0 R >> >> /Contents 4 0 R >>\nendobj\n"
    )
    body = b"BT /F9 10 Tf <00410042010001010102> Tj ET"
    content = (
        b"4 0 obj\n<< /Length " + str(len(body)).encode() + b" >>\n"
        b"stream\n" + body + b"\nendstream\nendobj\n"
    )
    tounicode = (
        b"5 0 obj\n<< /Length " + str(len(cmap)).encode() + b" >>\n"
        b"stream\n" + cmap + b"\nendstream\nendobj\n"
    )
    with_map = common + content + tounicode + (
        b"6 0 obj\n<< /Type /Font /Subtype /Type0 /ToUnicode 5 0 R >>\n"
        b"endobj\ntrailer\n<< /Root 1 0 R >>\n%%EOF\n"
    )
    text, _, dropped = pdf_to_text(with_map)
    assert text == "Wéabc"
    assert not dropped

    without_map = common + content + (
        b"6 0 obj\n<< /Type /Font /Subtype /Type0 >>\n"
        b"endobj\ntrailer\n<< /Root 1 0 R >>\n%%EOF\n"
    )
    text, _, dropped = pdf_to_text(without_map)
    assert dropped and text == ""


def test_objstm_unpacking():
    """PDF 1.5 object streams: page + catalog objects packed inside a
    FlateDecode /ObjStm still extract."""
    inner = (
        b"<< /Type /Catalog /Pages 2 0 R >>"
        b" << /Type /Pages /Count 1 /Kids [3 0 R] >>"
        b" << /Type /Page /Parent 2 0 R /Contents 4 0 R >>"
    )
    # offsets of the three objects inside `inner`
    o2 = inner.index(b"<< /Type /Pages")
    o3 = inner.index(b"<< /Type /Page ")
    head = f"1 0 2 {o2} 3 {o3} ".encode()
    packed = head + inner
    z = zlib.compress(packed)
    body = b"BT (from objstm) Tj ET"
    pdf = (
        b"%PDF-1.5\n"
        b"7 0 obj\n<< /Type /ObjStm /N 3 /First "
        + str(len(head)).encode()
        + b" /Length " + str(len(z)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + z
        + b"\nendstream\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(body)).encode() + b" >>\n"
        b"stream\n" + body + b"\nendstream\nendobj\n"
        b"%%EOF\n"
    )
    text, n, _ = pdf_to_text(pdf)
    assert (text, n) == ("from objstm", 1)


def test_incremental_update_last_definition_wins():
    base = encode_simple_pdf(["original text"])
    # append a redefinition of the content object (5 0 obj in the
    # writer's layout: page=3, content=4) — incremental-update style
    body = b"BT (updated text) Tj ET"
    update = (
        b"\n4 0 obj\n<< /Length " + str(len(body)).encode() + b" >>\n"
        b"stream\n" + body + b"\nendstream\nendobj\n%%EOF\n"
    )
    text, _, _ = pdf_to_text(base + update)
    assert text == "updated text"


def test_refusals_and_quarantine(spark):
    with pytest.raises(UnsupportedMediaError, match="not a PDF"):
        pdf_to_text(b"plain text")
    enc = encode_simple_pdf(["secret"]).replace(
        b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R"
    )
    with pytest.raises(UnsupportedMediaError, match="encrypted"):
        pdf_to_text(enc)
    with pytest.raises(UnsupportedMediaError, match="no page"):
        pdf_to_text(b"%PDF-1.4\n1 0 obj\n<< >>\nendobj\n%%EOF")

    df = spark.createDataFrame(
        [
            ("good", encode_simple_pdf(["spark row"])),
            ("junk", b"%PDF-1.4 but garbage"),
            ("notpdf", b"hello"),
        ],
        "media_id string, content binary",
    )
    rows = {r["id"]: r for r in extract_pdf_text(df).collect()}
    assert rows["good"]["text"] == "spark row"
    assert rows["good"]["n_pages"] == 1 and rows["good"]["error"] is None
    assert rows["junk"]["error"] is not None
    assert rows["notpdf"]["error"] is not None
    assert rows["junk"]["text"] is None


def test_probe_and_media_source(spark, tmp_path):
    from pinecone_datasets_spark.operators.media_codecs import probe_bytes
    from pinecone_datasets_spark.sources.media import read_media

    blob = encode_simple_pdf(["probed"])
    assert probe_bytes(blob)[0] == "pdf"
    (tmp_path / "doc.pdf").write_bytes(blob)
    r = read_media(spark, str(tmp_path)).collect()[0]
    assert (r["format"], r["media_type"]) == ("pdf", "document")


def test_obj_pattern_inside_stream_payload_does_not_shadow():
    """Compressed stream payloads are arbitrary bytes; a '4 0 obj'
    byte pattern INSIDE one must not shadow the real object 4 under
    the last-definition-wins rule (the scan resumes after each
    object's extent)."""
    body = b"BT (real text) Tj ET"
    # craft a raw stream whose payload embeds a fake redefinition
    evil = b"junk 4 0 obj\n<< >>\nstream\nBT (evil) Tj ET\nendstream junk"
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Count 1 /Kids [3 0 R] >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        b"5 0 obj\n<< /Length " + str(len(evil)).encode() + b" >>\n"
        b"stream\n" + evil + b"\nendstream\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(body)).encode() + b" >>\n"
        b"stream\n" + body + b"\nendstream\nendobj\n"
        b"%%EOF\n"
    )
    text, n, _ = pdf_to_text(pdf)
    assert (text, n) == ("real text", 1)


def test_flate_bomb_quarantines_not_inflates(monkeypatch):
    """ADVICE r10 (medium): a tiny FlateDecode stream that inflates
    past MAX_STREAM_BYTES must cost a typed quarantine at cap+1 bytes,
    never a full inflate in executor memory."""
    from pinecone_datasets_spark.operators import pdf as pdf_mod

    monkeypatch.setattr(pdf_mod, "MAX_STREAM_BYTES", 4096)
    bomb = zlib.compress(b"(A) Tj " * 100_000)  # ~700 KB inflated
    blob = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Count 1 /Kids [3 0 R] >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\n"
        b"endobj\n"
        b"4 0 obj\n<< /Length " + str(len(bomb)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + bomb
        + b"\nendstream\nendobj\n"
        b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    )
    with pytest.raises(UnsupportedMediaError, match="MAX_STREAM_BYTES"):
        pdf_to_text(blob)
    # sane streams still extract under the tiny cap
    text, n, _ = pdf_to_text(encode_simple_pdf(["small page"]))
    assert n == 1 and text == "small page"


def test_resources_inherited_from_parent_pages_node():
    """ADVICE r10 (low): real PDFs commonly hoist /Resources to the
    parent /Pages node; the font table must be found through the
    /Parent chain so ToUnicode CMaps apply instead of silent latin-1
    mojibake on 2-byte CID strings."""
    cmap = (
        b"/CIDInit /ProcSet findresource begin\n"
        b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        b"2 beginbfchar\n<0041> <0057>\n<0042> <00E9>\nendbfchar\n"
        b"endcmap\n"
    )
    body = b"BT /F9 10 Tf <00410042> Tj ET"
    blob = (
        b"%PDF-1.5\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        # Resources live on the PAGES node, not the page
        b"2 0 obj\n<< /Type /Pages /Count 1 /Kids [3 0 R] /Resources"
        b" << /Font << /F9 6 0 R >> >> >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\n"
        b"endobj\n"
        b"4 0 obj\n<< /Length " + str(len(body)).encode() + b" >>\n"
        b"stream\n" + body + b"\nendstream\nendobj\n"
        b"5 0 obj\n<< /Length " + str(len(cmap)).encode() + b" >>\n"
        b"stream\n" + cmap + b"\nendstream\nendobj\n"
        b"6 0 obj\n<< /Type /Font /Subtype /Type0 /ToUnicode 5 0 R >>\n"
        b"endobj\ntrailer\n<< /Root 1 0 R >>\n%%EOF\n"
    )
    text, _, dropped = pdf_to_text(blob)
    assert text == "Wé"
    assert not dropped

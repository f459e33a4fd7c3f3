"""Office/ebook extraction (operators/office.py)."""

from __future__ import annotations

import io
import zipfile

import pytest

from pinecone_datasets_spark.operators.media_codecs import (
    UnsupportedMediaError,
)
from pinecone_datasets_spark.operators.office import (
    docx_to_text,
    document_to_text,
    epub_to_text,
    extract_document_text,
    odt_to_text,
    sniff_zip_document,
)

_W = 'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"'
_T = 'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0"'


def make_docx(paragraphs) -> bytes:
    body = ""
    for runs in paragraphs:
        inner = "".join(
            f"<w:r><w:t xml:space=\"preserve\">{r}</w:t></w:r>"
            if r not in ("<TAB>", "<BR>")
            else ("<w:r><w:tab/></w:r>" if r == "<TAB>"
                  else "<w:r><w:br/></w:r>")
            for r in runs
        )
        body += f"<w:p>{inner}</w:p>"
    xml = (
        f'<?xml version="1.0"?><w:document {_W}>'
        f"<w:body>{body}</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("[Content_Types].xml", "<Types/>")
        zf.writestr("word/document.xml", xml)
    return buf.getvalue()


def make_odt(paragraphs) -> bytes:
    body = "".join(f"<text:p>{p}</text:p>" for p in paragraphs)
    xml = (
        f'<?xml version="1.0"?><office:document-content'
        f' xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"'
        f" {_T}><office:body><office:text>{body}</office:text>"
        f"</office:body></office:document-content>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", "application/vnd.oasis.opendocument.text")
        zf.writestr("content.xml", xml)
    return buf.getvalue()


def make_epub(chapters, broken_opf: bool = False) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", "application/epub+zip")
        zf.writestr(
            "META-INF/container.xml",
            '<?xml version="1.0"?><container><rootfiles>'
            '<rootfile full-path="OEBPS/content.opf"/>'
            "</rootfiles></container>",
        )
        manifest = "".join(
            f'<item id="c{i}" href="ch{i}.xhtml"'
            f' media-type="application/xhtml+xml"/>'
            for i in range(len(chapters))
        )
        # spine deliberately REVERSED vs name order to prove OPF wins
        spine = "".join(
            f'<itemref idref="c{i}"/>'
            for i in reversed(range(len(chapters)))
        )
        if not broken_opf:
            zf.writestr(
                "OEBPS/content.opf",
                f'<?xml version="1.0"?><package><manifest>{manifest}'
                f"</manifest><spine>{spine}</spine></package>",
            )
        for i, html in enumerate(chapters):
            zf.writestr(f"OEBPS/ch{i}.xhtml", html)
    return buf.getvalue()


def test_docx_runs_tabs_breaks_and_entities():
    blob = make_docx(
        [
            ["Hello ", "world &amp; more"],
            ["second", "<TAB>", "tabbed"],
            ["a", "<BR>", "b"],
        ]
    )
    assert sniff_zip_document(blob) == "docx"
    assert docx_to_text(blob) == (
        "Hello world & more\nsecond\ttabbed\na\nb"
    )


def test_odt_spaces_tabs_linebreaks():
    blob = make_odt(
        [
            'lead<text:s text:c="3"/>gap',
            "tab<text:tab/>here",
            "line<text:line-break/>break",
            "nested <text:span>span text</text:span> tail",
        ]
    )
    assert sniff_zip_document(blob) == "odt"
    assert odt_to_text(blob) == (
        "lead   gap\ntab\there\nline\nbreak\nnested span text tail"
    )


def test_epub_spine_order_and_fallback():
    ch0 = "<html><body><p>FIRST chapter</p></body></html>"
    ch1 = (
        "<html><body><h1>Title</h1><p>Body &amp; entity</p>"
        "<script>skip()</script></body></html>"
    )
    blob = make_epub([ch0, ch1])
    assert sniff_zip_document(blob) == "epub"
    text = epub_to_text(blob)
    # spine is reversed: ch1 first, script content skipped
    assert text.split("\f") == ["Title\nBody & entity", "FIRST chapter"]

    # broken OPF: name-ordered fallback still extracts
    fb = epub_to_text(make_epub([ch0, ch1], broken_opf=True))
    assert "FIRST chapter" in fb and "Body & entity" in fb


def test_entity_expansion_guard():
    bomb = (
        '<?xml version="1.0"?><!DOCTYPE x [<!ENTITY a "aaaa">]>'
        f"<w:document {_W}><w:body><w:p><w:r><w:t>&a;</w:t></w:r>"
        "</w:p></w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", bomb)
    with pytest.raises(UnsupportedMediaError, match="entity expansion"):
        docx_to_text(buf.getvalue())


def test_unified_dispatch_and_spark_quarantine(spark):
    from pinecone_datasets_spark.operators.pdf import encode_simple_pdf

    rows = [
        ("p", encode_simple_pdf(["pdf text"])),
        ("d", make_docx([["docx text"]])),
        ("o", make_odt(["odt text"])),
        ("e", make_epub(["<p>epub text</p>"])),
        ("z", _plain_zip()),
        ("x", b"not a document"),
        ("n", None),
    ]
    for mid, blob in rows[:4]:
        kind, text = document_to_text(blob)
        assert text.endswith("text"), (mid, text)
    with pytest.raises(UnsupportedMediaError):
        document_to_text(_plain_zip())

    df = spark.createDataFrame(rows, "media_id string, content binary")
    got = {r["id"]: r for r in extract_document_text(df).collect()}
    assert {got[k]["kind"] for k in "pdoe"} == {"pdf", "docx", "odt", "epub"}
    assert all(got[k]["error"] is None for k in "pdoe")
    assert got["z"]["error"] is not None  # plain zip: not a document
    assert got["x"]["error"] is not None
    assert got["n"]["error"] is not None


def _plain_zip() -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("data.bin", b"\x00\x01")
    return buf.getvalue()


def test_probe_and_media_source_type_documents(spark, tmp_path):
    from pinecone_datasets_spark.operators.media_codecs import probe_bytes
    from pinecone_datasets_spark.sources.media import read_media

    (tmp_path / "a.docx").write_bytes(make_docx([["hi"]]))
    (tmp_path / "b.odt").write_bytes(make_odt(["hi"]))
    (tmp_path / "c.epub").write_bytes(make_epub(["<p>hi</p>"]))
    (tmp_path / "d.zip").write_bytes(_plain_zip())
    assert probe_bytes(make_docx([["x"]]))[0] == "docx"
    rows = {
        r["media_id"].split("/")[-1]: (r["format"], r["media_type"])
        for r in read_media(spark, str(tmp_path)).collect()
    }
    assert rows == {
        "a.docx": ("docx", "document"),
        "b.odt": ("odt", "document"),
        "c.epub": ("epub", "document"),
        "d.zip": ("zip", "archive"),
    }


def test_rtf_extraction_and_roundtrip():
    """RTF: group-aware control-word walk — \\'hh cp1252 escapes, \\uN
    with the \\ucN fallback-skip rule, destination groups (fonttbl,
    {\\*\\generator}) skipped, \\par/\\tab/\\emdash specials; writer-
    twin round-trip exact incl. braces, backslashes, and unicode."""
    from pinecone_datasets_spark.operators.office import (
        encode_simple_rtf,
        rtf_to_text,
    )

    pages = [
        "Braces {x} and back\\slash survive.",
        "Unicode: é ü — and beyond BMP stays honest…",
        "Plain third paragraph.",
    ]
    assert rtf_to_text(encode_simple_rtf(pages)) == "\n".join(pages)

    rtf = (
        b"{\\rtf1\\ansi{\\fonttbl{\\f0 Arial;}}"
        b"{\\*\\generator Fake 1.0;}{\\info{\\author X}}"
        b"\\uc2\\f0 Caf\\'e9 time\\par \\u9274ZZ after"
        b"\\par A\\tab B\\emdash C\\par {\\pict 0011}done}"
    )
    got = rtf_to_text(rtf)
    assert got == "Café time\n␺ after\nA\tB—C\ndone"

    with pytest.raises(UnsupportedMediaError, match="RTF"):
        rtf_to_text(b"not rtf at all")

    kind, text = document_to_text(encode_simple_rtf(["via dispatch"]))
    assert (kind, text) == ("rtf", "via dispatch")


def test_zip_member_bomb_quarantines_not_inflates(monkeypatch):
    """ADVICE r10 (medium): a DOCX whose document.xml member inflates
    past MAX_MEMBER_BYTES must cost a typed quarantine at cap+1 bytes
    (streamed read), never a whole-member inflate in executor memory."""
    from pinecone_datasets_spark.operators import office as office_mod

    from pinecone_datasets_spark.operators.office import (
        encode_simple_docx,
    )

    monkeypatch.setattr(office_mod, "MAX_MEMBER_BYTES", 4096)
    # document.xml deflates tiny but inflates to ~1 MB
    big_xml = (
        b'<?xml version="1.0"?><w:document'
        b' xmlns:w="http://schemas.openxmlformats.org/wordprocessingml'
        b'/2006/main"><w:body>'
        + b"<w:p><w:r><w:t>x</w:t></w:r></w:p>" * 30_000
        + b"</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("word/document.xml", big_xml)
    with pytest.raises(UnsupportedMediaError, match="MAX_MEMBER_BYTES"):
        docx_to_text(buf.getvalue())
    # sane members still extract under the tiny cap
    assert "hello" in docx_to_text(encode_simple_docx(["hello"]))

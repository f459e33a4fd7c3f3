"""HTML → text extraction (functions/html.py): expression path,
DuckDB twin parity, html.parser fidelity path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pinecone_datasets_spark.functions.html import (
    html_to_text,
    html_to_text_py,
    html_to_text_sql,
)

_DOCS = [
    (
        '<html><!-- note --><head><style>p{color:red}</style>'
        '<script type="t">var x = 1 < 2;</script></head>'
        "<body><h1>Title</h1><p>para one</p>"
        "<p>para&nbsp;two &amp; more &lt;tag&gt;</p>"
        "<div>  spaced   out  </div></body></html>"
    ),
    "no markup at all",
    "<p>a</p><p></p><p>b</p>",
    "<ul><li>x</li><li>y</li></ul>tail",
    '<P CLASS="big">UPPER tags</P>',
    "<span>inline <b>bold</b> run</span>",
    "entity chain &amp;lt; stays encoded once",
    "<!-- <script>var hidden = 1;</script> -->visible",
    None,
]


def test_html_to_text_known_answers(spark):
    df = spark.createDataFrame([(d,) for d in _DOCS], "html string")
    got = [r[0] for r in df.select(html_to_text("html")).collect()]
    assert got[0] == "Title\npara one\npara two & more <tag>\nspaced out"
    assert got[1] == "no markup at all"
    assert got[2] == "a\nb"                      # empty block collapses
    assert got[3] == "x\ny\ntail"
    assert got[4] == "UPPER tags"                # case-insensitive tags
    assert got[5] == "inline bold run"           # inline tags → spaces
    assert got[6] == "entity chain &lt; stays encoded once"
    assert got[7] == "visible"                   # commented-out script dies
    assert got[8] is None


def test_html_to_text_duckdb_twin_parity(spark):
    duckdb = pytest.importorskip("duckdb")
    df = spark.createDataFrame([(d,) for d in _DOCS], "html string")
    got = [r[0] for r in df.select(html_to_text("html")).collect()]
    con = duckdb.connect()
    expr = html_to_text_sql("html")
    for d, a in zip(_DOCS, got):
        b = con.execute(
            f"SELECT {expr} FROM (SELECT ? AS html)", [d]
        ).fetchone()[0]
        assert a == b, (d, a, b)


def test_html_to_text_py_matches_expression_on_template_html(spark):
    df = spark.createDataFrame([(d,) for d in _DOCS], "html string")
    a = [r[0] for r in df.select(html_to_text("html")).collect()]
    b = [r[0] for r in df.select(html_to_text_py("html")).collect()]
    assert a == b


def test_html_to_text_py_fidelity_beyond_regex(spark):
    """Numeric character references and uncommon named entities — the
    parser path decodes them, the regex path leaves them (documented)."""
    rows = [
        ("&#72;&#105; &hellip; &#x21;",),
        ("<script>if (a </b> c) {}</script>after",),
    ]
    df = spark.createDataFrame(rows, "html string")
    got = [r[0] for r in df.select(html_to_text_py("html")).collect()]
    assert got[0] == "Hi … !"
    # literal "</b>" inside script text: parser state still ends the
    # script at the real close tag and keeps only trailing text
    assert got[1] == "after"


def test_html_to_text_wet_equivalence_on_corpus(spark, sf_dir):
    """Round-trip: wrap corpus docs in an HTML template, extract, and
    the visible text must come back exactly (template adds a known
    title line)."""
    doc = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    planted = doc.select(
        "doc_id",
        "text",
        F.concat(
            F.lit("<html><head></head><body><h1>D"),
            F.col("doc_id").cast("string"),
            F.lit('</h1><script>var x = "</div>";</script><p>'),
            F.col("text"),
            F.lit("</p></body></html>"),
        ).alias("html"),
    )
    out = planted.select(
        "doc_id",
        "text",
        html_to_text("html").alias("extracted"),
    ).collect()
    for r in out:
        assert r["extracted"] == f"D{r['doc_id']}\n{r['text']}"

"""HTML → text extraction: the hop between raw crawl responses and
WET-style plain text.

WARC ``response`` records carry HTML; every text pipeline built on raw
crawls (C4, CC-Net, RefinedWeb) extracts visible text before any
quality gate runs. Two paths, same contract as the rest of
``functions/``:

* ``html_to_text`` — pure column expressions (chained ``regexp_replace``
  stages, whole-stage codegen, zero Python crossings), dialect-portable:
  ``html_to_text_sql`` emits the identical stage chain for DuckDB
  replay. This is the C4-class extractor: comments, script/style blocks,
  and tags stripped (block-level tags become newlines), the six
  ubiquitous named entities decoded, whitespace normalized. Every regex
  avoids backreferences and lookaround so Java regex and RE2 read it
  identically.
* ``html_to_text_py`` — Arrow-batched ``html.parser`` walk for full
  fidelity (numeric character references, all named entities via
  ``html.unescape``, CDATA-ish script payloads containing literal
  ``</`` + text). One Python crossing per batch; use it when the corpus
  is real-web messy rather than template-shaped.

Reference scope note: the reference (pinecone-io/pinecone-datasets) has
no text edge at all — Layer-B extension (SURVEY.md §2 "beyond the
reference"), cited against its data model only (cfg.py:23-36).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

ColumnOrName = Column | str

#: Tags whose open/close implies a line break in the visible text.
_BLOCK_TAGS = (
    "p|div|br|li|ul|ol|dl|dt|dd|h1|h2|h3|h4|h5|h6|tr|td|th|table|"
    "thead|tbody|blockquote|section|article|aside|nav|header|footer|"
    "pre|hr|form|figure|figcaption"
)

#: (pattern, replacement) stages shared verbatim by the Spark and DuckDB
#: paths. Order is load-bearing: comments before scripts (a commented-out
#: script should vanish with the comment), blocks before the generic tag
#: strip, ``&amp;`` decoded LAST so ``&amp;lt;`` stays ``&lt;`` (the
#: standard single-pass decode order).
_STAGES: tuple[tuple[str, str], ...] = (
    (r"(?s)<!--.*?-->", ""),
    (r"(?is)<script\b[^>]*>.*?</script\s*>", ""),
    (r"(?is)<style\b[^>]*>.*?</style\s*>", ""),
    (rf"(?is)</?({_BLOCK_TAGS})\b[^>]*>", "\n"),
    (r"(?s)<[^>]*>", " "),
    (r"&nbsp;", " "),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"&#39;", "'"),
    (r"&amp;", "&"),
    # whitespace normalization: horizontal runs → one space, spaces
    # hugging newlines dropped, newline runs → one newline, edges bare
    (r"[ \t\f\x0B\r]+", " "),
    (r" ?\n ?", "\n"),
    (r"\n+", "\n"),
    (r"^[ \n]+", ""),
    (r"[ \n]+$", ""),
)


def html_to_text(html: ColumnOrName) -> Column:
    """Visible text of an HTML column — expression path (see module
    docstring). NULL in, NULL out."""
    c = F.col(html) if isinstance(html, str) else html
    for pat, rep in _STAGES:
        c = F.regexp_replace(c, pat, rep)
    return c


def html_to_text_sql(html_expr: str) -> str:
    """DuckDB twin of ``html_to_text`` — the same stage chain, emitted
    as nested ``regexp_replace(..., 'g')`` calls, for oracle replay."""
    expr = html_expr
    for pat, rep in _STAGES:
        p = pat.replace("'", "''")
        # replacement as an e'...' escape literal: RE2's rewrite string
        # has no \n escape of its own, so the newline must be a real
        # character in the SQL string
        r = (
            rep.replace("\\", "\\\\")
            .replace("'", "''")
            .replace("\n", "\\n")
        )
        expr = f"regexp_replace({expr}, '{p}', e'{r}', 'g')"
    return expr


def html_to_text_py(html: ColumnOrName) -> Column:
    """Visible text via a real ``html.parser`` walk (Arrow-batched) —
    full entity decode (numeric references included), script/style
    payloads skipped by parser state rather than by regex. One Python
    crossing per batch."""

    @F.pandas_udf(StringType())
    def _extract(s: pd.Series) -> pd.Series:
        from html.parser import HTMLParser

        block = set(_BLOCK_TAGS.split("|"))

        class _Text(HTMLParser):
            def __init__(self) -> None:
                super().__init__(convert_charrefs=True)
                self.parts: list[str] = []
                self._skip = 0

            def handle_starttag(self, tag, attrs):
                if tag in ("script", "style"):
                    self._skip += 1
                elif tag in block:
                    self.parts.append("\n")

            def handle_endtag(self, tag):
                if tag in ("script", "style"):
                    self._skip = max(0, self._skip - 1)
                elif tag in block:
                    self.parts.append("\n")

            def handle_data(self, data):
                if not self._skip:
                    self.parts.append(data)

        import re

        # \xa0: html.unescape turns &nbsp; into NBSP — whitespace for
        # text-extraction purposes, matching the expression path
        ws_h = re.compile(r"[ \t\f\x0B\r\xa0]+")
        ws_nl = re.compile(r" ?\n ?")
        nl = re.compile(r"\n+")

        def one(h):
            if h is None:
                return None
            p = _Text()
            p.feed(h)
            p.close()
            t = ws_h.sub(" ", "".join(p.parts))
            t = nl.sub("\n", ws_nl.sub("\n", t))
            return t.strip(" \n")

        return s.map(one)

    c = F.col(html) if isinstance(html, str) else html
    return _extract(c)

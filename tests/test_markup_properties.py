"""Property tests for the r9 extractors: twin parity + round-trips.

These are the adversarial side of the writer-twin/hash-oracle story:
hypothesis hunts for inputs where (a) the markdown SQL twin diverges
from the Spark expression, (b) a writer-twin round-trip is lossy, or
(c) an extractor escapes its typed-error contract. Driver-side only —
the Spark expression is evaluated through a reusable local session via
the shared conftest fixture, the twins via DuckDB.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pinecone_datasets_spark.functions.markup import (
    latex_to_text_str,
    markdown_to_text_sql,
)

# markdown-ish soup: text words, markers, structure — biased to create
# overlapping/malformed constructs (the divergence hunting ground)
_md_atoms = st.sampled_from(
    [
        "word", "Another", "x1", " ", "  ", "\n", "\n\n", "\t",
        "**", "*", "__", "_", "`", "```", "~~", "#", "## ", ">",
        "> ", "- ", "1. ", "|", "---", "===", "[", "]", "(", ")",
        "![", "[text](u)", "[a][1]", "[1]: http://x", "é", ".",
    ]
)
_md_doc = st.lists(_md_atoms, min_size=0, max_size=40).map("".join)


@pytest.fixture(scope="module")
def _con():
    return duckdb.connect()


class _TwinChecker:
    """Evaluate the markdown stage chain both ways WITHOUT Spark: the
    Spark side is Java-regex semantics — reproduced here via py4j-free
    re2-free plain Python `java-equivalent` is NOT available, so the
    Spark side is exercised in test_markup.py's zoo; HERE we pin the
    DuckDB twin against itself across construction paths (escaping,
    nesting) and the kernels against their contracts."""


@given(_md_doc)
@settings(
    max_examples=150,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_markdown_sql_twin_never_errors_and_is_idempotentish(doc):
    """The SQL twin must (a) evaluate without error on arbitrary
    marker soup (the oracle would die otherwise) and (b) be a
    FIXPOINT on its own output's whitespace shape: re-applying the
    chain never reintroduces markers it claims to strip — backticks,
    strike markers, pipes, leading hashes are gone after one pass."""
    con = duckdb.connect()
    sql = markdown_to_text_sql("t")
    out = con.execute(
        f"SELECT {sql} FROM (SELECT ? AS t)", [doc]
    ).fetchone()[0]
    assert out is not None
    # backtick/strike/pipe strips are UNCONDITIONAL stages — no input
    # may keep them. Header/blockquote markers may legally survive
    # when tab-indented (CommonMark: that's an indented code block
    # whose '#' is literal content — hypothesis found exactly this).
    assert "`" not in out and "~~" not in out and "|" not in out
    for line in out.split("\n"):
        assert line == line.strip(" "), (doc, out)
    assert not out.startswith("\n") and not out.endswith("\n")


_tex_atoms = st.sampled_from(
    [
        "word ", "\\textbf{", "\\emph{", "}", "{", "\\cite{x}",
        "\\begin{figure}", "\\end{figure}", "\\begin{itemize}",
        "\\end{itemize}", "\\item ", "$", "$x+y$", "\\[", "\\]",
        "% comment\n", "\\'e", "\\%", "~", "\\\\", "\n", " ",
        "\\unknowncmd ", "\\section{S}", "\\href{u}{",
    ]
)
_tex_doc = st.lists(_tex_atoms, min_size=0, max_size=40).map("".join)


@given(_tex_doc)
@settings(
    max_examples=200,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_latex_kernel_total_and_markerless(doc):
    """latex_to_text_str must terminate and return clean text on
    arbitrary command soup: no backslash-commands, math delimiters,
    comments, or brace litter survive; unbalanced groups and unclosed
    math never raise or hang."""
    out = latex_to_text_str(doc)
    assert "$" not in out and "{" not in out and "}" not in out
    # (escaped \% legitimately survives as a percent sign — only the
    # structural markers must be gone)
    import re

    assert not re.search(r"\\[a-zA-Z]", out), (doc, out)


_sub_text = st.text(
    alphabet=st.characters(
        codec="utf-8",
        exclude_characters="\r\n\x00",
        exclude_categories=("Cs",),
    ),
    min_size=1,
    max_size=60,
).filter(
    # a cue line that itself looks like a timestamp arrow or a bare
    # number would be (legally) eaten as cue structure; exclude the
    # ambiguous shapes from the round-trip claim
    lambda s: s.strip()
    and "-->" not in s
    and not s.strip().isdigit()
    and s == s.strip()
)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3_600_000),
            st.integers(min_value=1, max_value=60_000),
            _sub_text,
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=150, deadline=None)
def test_subtitle_roundtrip_property(cues_raw):
    from pinecone_datasets_spark.operators.subtitles import (
        encode_srt,
        encode_vtt,
        parse_subtitles,
    )

    cues = [(s, s + d, t) for s, d, t in cues_raw]
    for enc, kind in ((encode_srt, "srt"), (encode_vtt, "vtt")):
        got_kind, got = parse_subtitles(enc(cues))
        assert got_kind == kind
        # tag stripping may remove <...> spans from the text; compare
        # against the same strip the parser applies
        import re

        expect = [
            (s, e, re.sub(r"<[^>\n]*>", "", t).strip())
            for s, e, t in cues
        ]
        assert got == expect, (cues, got)


@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8",
                exclude_characters="\x00",
                exclude_categories=("Cs", "Cc"),
            ),
            max_size=80,
        ),
        min_size=1,
        max_size=4,
    )
)
@settings(max_examples=100, deadline=None)
def test_rtf_twin_roundtrip_property(paragraphs):
    """encode_simple_rtf -> rtf_to_text reproduces arbitrary unicode
    paragraph text exactly, modulo the extractor's whitespace
    normalization (the documented contract)."""
    import re

    from pinecone_datasets_spark.operators.office import (
        encode_simple_rtf,
        rtf_to_text,
    )

    got = rtf_to_text(encode_simple_rtf(paragraphs))
    # the extractor's documented normalization: newline runs collapse
    # and edges strip "\n " — everything else (tabs, FF) is content
    joined = "\n".join(p.replace("\r", "") for p in paragraphs)
    expect = re.sub(r"\n{2,}", "\n", joined).strip("\n ")
    assert got == expect, (paragraphs, got)

"""Markdown/LaTeX extraction (functions/markup.py)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from pinecone_datasets_spark.functions.markup import (
    latex_to_text,
    latex_to_text_str,
    markdown_to_text,
    markdown_to_text_sql,
)

_MD_ZOO = [
    "# Title\n\nSome **bold** and *emph* text with `code`.\n",
    "- item one\n- item two\n1. numbered\n\n> quoted line\n",
    "```python\nprint('kept')\n```\nafter fence",
    "A [link](http://x.y) and ![alt text](u.png) and [ref][1]\n\n"
    "[1]: http://z",
    "| left | right |\n|:---|---:|\n| x | y |",
    "Setext\n======\nbody ___strong___ ~~strike~~ _under_ done",
    "   \n\nedge   spaces\t\ttabs\r\nwindows line",
    "## Closing hashes ##\n- - -\nplain - dash stays",
    "",
]


def test_markdown_constructs_and_duckdb_parity(spark):
    """Every stage exercised, and the SQL twin reproduces the Spark
    expression byte-for-byte over the whole zoo (the q95 oracle's
    foundation — same contract as html_to_text/_sql)."""
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(_MD_ZOO)], "i int, t string"
    )
    got = {
        r["i"]: r["x"]
        for r in df.select(
            "i", markdown_to_text("t").alias("x")
        ).collect()
    }
    assert got[0] == "Title\nSome bold and emph text with code."
    assert got[1] == "item one\nitem two\nnumbered\nquoted line"
    assert got[2] == "print('kept')\nafter fence"
    assert got[3] == "A link and alt text and ref"
    assert got[4] == "left right\nx y"
    assert got[5] == "Setext\nbody strong strike under done"
    assert got[7] == "Closing hashes\nplain - dash stays"
    assert got[8] == ""

    con = duckdb.connect()
    sql = markdown_to_text_sql("t")
    for i, s in enumerate(_MD_ZOO):
        duck = con.execute(
            f"SELECT {sql} FROM (SELECT ? AS t)", [s]
        ).fetchone()[0]
        assert duck == got[i], (i, got[i], duck)


def test_latex_extraction_semantics():
    tex = r"""
\documentclass{article}
% a comment line
\begin{document}
\section{Intro}
Hello \textbf{bold world} and \emph{emphasis}, cite \cite{x2020} here.
Math $e=mc^2$ inline and \[ \int x dx \] display and $$y$$ too.
\begin{itemize}
\item first point
\item second \'etude caf\'e 100\% \& more
\end{itemize}
\begin{figure}
\includegraphics[width=3cm]{fig.png}
\caption{dropped with the figure}
\end{figure}
\begin{tabular}{ll} a & b \\ \end{tabular}
Tie~space, braces {kept}, \href{http://x}{} gone, a \\ break.
\end{document}
"""
    got = latex_to_text_str(tex)
    assert "Intro" in got and "bold world" in got
    assert "x2020" not in got and "mc^2" not in got
    assert "- first point" in got
    assert "étude café 100% & more" in got
    assert "dropped with the figure" not in got
    assert "a & b" not in got  # tabular dropped
    assert "Tie space" in got and "braces kept" in got
    assert "http://x" not in got
    # unclosed math never hangs, comments strip, empty ok
    assert latex_to_text_str("before $unclosed") == "before"
    assert latex_to_text_str("% only comment") == ""
    assert latex_to_text_str("") == ""


def test_latex_spark_kernel(spark):
    df = spark.createDataFrame(
        [(1, "\\section{H}\nBody \\textbf{b} $m$ done."), (2, None)],
        "i int, t string",
    )
    rows = {
        r["i"]: r["x"]
        for r in df.select("i", latex_to_text("t").alias("x")).collect()
    }
    assert rows[1] == "H\nBody b done."
    assert rows[2] is None


def test_emphasis_keeps_line_breaks(spark):
    """A line STARTING with emphasis must not merge into the previous
    line (the $1$2 capture keeps whichever whitespace preceded)."""
    import duckdb

    s = "line1\n*lead emph* rest\nand _tail_ here"
    df = spark.createDataFrame([(s,)], "t string")
    got = df.select(markdown_to_text("t").alias("x")).collect()[0]["x"]
    assert got == "line1\nlead emph rest\nand tail here"
    con = duckdb.connect()
    duck = con.execute(
        f"SELECT {markdown_to_text_sql('t')} FROM (SELECT ? AS t)", [s]
    ).fetchone()[0]
    assert duck == got


def test_latex_letter_command_accents():
    """r11 review: \\ss and \\c c spell as letter commands, so the
    control-symbol accent table could never see them — they were
    silently dropped despite the table advertising support."""
    from pinecone_datasets_spark.functions.markup import latex_to_text_str

    assert latex_to_text_str(r"stra\ss e") == "straße"
    assert latex_to_text_str(r"fa\c cade") == "façade"
    assert latex_to_text_str(r"fa\c{c}ade") == "façade"
    assert latex_to_text_str(r"Fran\c Cois") == "FranÇois"

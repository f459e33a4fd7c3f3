"""Exact repeated-substring span dedup (operators/spans.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pinecone_datasets_spark.operators.spans import (
    repeated_spans,
    repeated_window_positions,
    strip_repeated_spans,
)


def _corpus(spark):
    # 26 distinct filler words (a..z as wN) keep unique regions unique;
    # BOILER is an 8-word block shared verbatim by docs 1 and 2.
    boiler = "all rights reserved see license terms at example"
    uniq = lambda tag, n: " ".join(f"{tag}{i}" for i in range(n))  # noqa: E731
    rows = [
        (1, f"{uniq('a', 6)} {boiler} {uniq('b', 6)}"),
        (2, f"{uniq('c', 4)} {boiler} {uniq('d', 9)}"),
        (3, uniq("e", 20)),
        (4, "tiny doc"),  # shorter than any window
        # doc 5 self-repeats a 9-word run (two overlapping repeated
        # 8-windows -> one merged span per occurrence run)
        (5, f"{uniq('f', 3)} one two three four five six seven eight nine "
            f"{uniq('g', 3)} one two three four five six seven eight nine "
            f"{uniq('h', 3)}"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.parametrize("hash_fn", ["md5", "xxhash64"])
def test_repeated_positions_cross_doc(spark, hash_fn):
    df = _corpus(spark)
    got = {
        (r.doc_id, r.pos)
        for r in repeated_window_positions(
            df, window=8, hash_fn=hash_fn
        ).collect()
    }
    # boiler occupies words 7..14 in doc 1 (after 6 uniques) and 5..12 in
    # doc 2: exactly one 8-window each.
    assert (1, 7) in got and (2, 5) in got
    assert not any(d == 3 or d == 4 for d, _ in got)


def test_spans_merge_overlapping_windows(spark):
    df = _corpus(spark)
    spans = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in repeated_spans(df, window=8).collect()
    }
    assert (1, 7, 14, 8) in spans
    assert (2, 5, 12, 8) in spans
    # doc 5: 9-word run at words 4..12 and 16..24 -> positions 4,5 and
    # 16,17 flagged; each pair merges into one 9-token span.
    assert (5, 4, 12, 9) in spans
    assert (5, 16, 24, 9) in spans
    assert all(d != 3 and d != 4 for d, *_ in spans)


def test_adjacent_windows_merge_into_one_span(spark):
    # one 16-word block shared by two docs = 9 consecutive repeated
    # 8-windows, one span of 16 tokens
    block = " ".join(f"blk{i}" for i in range(16))
    df = spark.createDataFrame(
        [(1, f"x0 x1 {block}"), (2, f"y0 {block} y1 y2")],
        "doc_id long, text string",
    )
    spans = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in repeated_spans(df, window=8).collect()
    }
    assert spans == {(1, 3, 18, 16), (2, 2, 17, 16)}


def test_strip_removes_all_occurrences_and_counts(spark):
    df = _corpus(spark)
    out = {r.doc_id: r for r in strip_repeated_spans(df, window=8).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    assert out[1].n_tokens_removed == 8
    assert "reserved" not in out[1].text and out[1].text.startswith("a0")
    assert out[2].n_tokens_removed == 8
    # untouched docs: zero removed, normalized text preserved verbatim
    assert out[3].n_tokens_removed == 0
    assert out[3].text == _corpus(spark).where("doc_id=3").first().text
    assert out[4].n_tokens_removed == 0
    # doc 5 loses both 9-token occurrences
    assert out[5].n_tokens_removed == 18
    assert "three" not in out[5].text
    # kept+removed always partitions the token stream
    chk = strip_repeated_spans(df, window=8).select(
        F.size(F.split("text", r"\s+")).alias("rebuilt"),
        "n_tokens_kept",
    ).where(F.col("n_tokens_kept") > 0)
    assert all(r.rebuilt == r.n_tokens_kept for r in chk.collect())


def test_shuffle_semi_join_path_matches_broadcast(spark):
    df = _corpus(spark)
    a = sorted(
        map(tuple, repeated_spans(df, window=8, broadcast_hits=True).collect())
    )
    b = sorted(
        map(tuple, repeated_spans(df, window=8, broadcast_hits=False).collect())
    )
    assert a == b


def test_window_floor_misses_shorter_repeats(spark):
    # the documented floor: a 7-word repeat is invisible at window=8
    seven = "s1 s2 s3 s4 s5 s6 s7"
    df = spark.createDataFrame(
        [(1, f"u1 u2 u3 {seven} u4"), (2, f"v1 {seven} v2 v3 v4")],
        "doc_id long, text string",
    )
    assert repeated_spans(df, window=8).count() == 0
    assert repeated_spans(df, window=7).count() == 2


def test_bad_args(spark):
    df = _corpus(spark)
    with pytest.raises(ValueError):
        repeated_spans(df, window=1)
    with pytest.raises(ValueError):
        repeated_spans(df, window=8, hash_fn="sha1")


def test_span_free_docs_keep_original_text(spark):
    """r11 review: docs with NO repeated spans were rebuilt from the
    normalized (lowercased, whitespace-collapsed) word stream — a
    corpus-wide quality regression for the untouched majority."""
    from pinecone_datasets_spark.operators.spans import strip_repeated_spans

    w = " ".join(f"w{i}" for i in range(16))
    rows = [
        (1, "Unique CASED\ttext  with   Structure kept verbatim here ok"),
        (2, w + " MARKER one"),
        (3, w + " MARKER two"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["text"], r["n_tokens_removed"])
        for r in strip_repeated_spans(df, window=8).collect()
    }
    # untouched doc: byte-identical original text
    assert out[1] == (rows[0][1], 0)
    # stripped docs actually lost the repeated window
    assert out[2][1] > 0 and out[3][1] > 0

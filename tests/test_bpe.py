"""BPE tokenizer (operators/bpe.py): known-answer training, roundtrip
decode, histogram-only training equivalence, distributed encode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pinecone_datasets_spark.operators.bpe import (
    EOW,
    bpe_token_counts,
    bpe_tokenize_udf,
    bpe_vocab,
    train_bpe,
    word_histogram,
)


def test_classic_sennrich_example():
    """The ACL-2016 worked example: {low, lower, newest, widest} —
    frequent pairs merge first, 'est</w>' emerges as a unit."""
    hist = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_bpe(hist, n_merges=10)
    assert merges[0] == ("e", "s")  # 9 occurrences, most frequent
    assert ("es", "t") in merges[:3]
    joined = {a + b for a, b in merges}
    assert "est" + EOW in joined or "est" in joined


def test_tie_break_deterministic():
    hist = [("ab", 3), ("cd", 3)]
    merges = train_bpe(hist, n_merges=1)
    # equal counts -> lexicographic pair order decides
    assert merges[0] == ("a", "b")
    assert train_bpe(list(reversed(hist)), n_merges=1)[0] == ("a", "b")


def test_no_memorization_of_singletons():
    # every word unique: after exhausting repeated pairs, training stops
    hist = [("abcdef", 1)]
    merges = train_bpe(hist, n_merges=100)
    assert merges == []  # no pair repeats


def test_encode_decode_roundtrip(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    hist = word_histogram(docs, max_words=5000)
    merges = train_bpe(hist, n_merges=300)
    # the small fixture saturates (no pair repeats) before 300 merges —
    # training stops rather than memorizing singletons
    assert 50 < len(merges) <= 300
    sample = docs.select("doc_id", "text").limit(20)
    toks = sample.withColumn(
        "toks", bpe_tokenize_udf(merges)(F.col("text"))
    ).collect()
    import re

    for r in toks:
        # decode: concatenating tokens and stripping EOW reproduces the
        # pre-tokenized text exactly
        decoded = "".join(r["toks"]).replace(EOW, "")
        expected = "".join(
            re.findall(r"[a-z0-9]+|[^a-z0-9\s]", r["text"].lower())
        )
        assert decoded == expected


def test_ids_mode_has_no_unknowns_on_training_data(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    hist = word_histogram(docs, max_words=5000)
    merges = train_bpe(hist, n_merges=200)
    vocab = bpe_vocab(merges)
    sample = docs.select("text").limit(10)
    rows = sample.withColumn(
        "ids", bpe_tokenize_udf(merges, ids=True, vocab=vocab)(F.col("text"))
    ).collect()
    seen = [i for r in rows for i in r["ids"]]
    assert seen
    # single chars outside any merge CAN be unknown; every non-negative
    # id must round-trip through the vocab
    for i in seen:
        assert i == -1 or 0 <= i < len(vocab)
    # unknowns are surfaced, not silently dropped: token count matches
    toks = sample.withColumn(
        "toks", bpe_tokenize_udf(merges)(F.col("text"))
    ).collect()
    assert [len(r["ids"]) for r in rows] == [len(r["toks"]) for r in toks]


def test_token_counts_compress_vs_chars(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    hist = word_histogram(docs, max_words=5000)
    merges = train_bpe(hist, n_merges=500)
    counted = bpe_token_counts(docs, merges).select(
        "doc_id", "bpe_tokens", "n_chars"
    )
    agg = counted.agg(
        F.sum("bpe_tokens").alias("t"), F.sum("n_chars").alias("c")
    ).collect()[0]
    # a trained vocab must beat 1 token/char on its own training corpus
    assert 0 < agg["t"] < agg["c"]
    assert counted.where(F.col("bpe_tokens") <= 0).count() == 0


def test_histogram_cap_preserves_head_merges():
    """The scale-path claim (train on the top-N words) made checkable:
    when the dropped tail's pair mass cannot reorder head pair counts,
    capped and full training agree. Tail = singleton words over a
    disjoint alphabet, so every tail pair has count 1 (< the merge
    threshold) and shares no symbol with the head."""
    head = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    tail = [
        (chr(0x4E00 + 2 * i) + chr(0x4E01 + 2 * i), 1) for i in range(100)
    ]
    m_full = train_bpe(head + tail, n_merges=8)
    m_head = train_bpe(head, n_merges=8)
    assert m_full == m_head


def test_histogram_cap_keeps_most_frequent(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    full = dict(word_histogram(docs, max_words=1_000_000))
    capped = word_histogram(docs, max_words=50)
    floor = min(n for _, n in capped)
    # truncation keeps a top slice: nothing dropped outranks anything kept
    assert all(full[w] == n for w, n in capped)
    assert sum(1 for n in full.values() if n > floor) <= 50

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


# -- byte-level (GPT-2-style) mode (r8) -------------------------------------


def test_bytes_to_unicode_is_bijective():
    from pinecone_datasets_spark.operators.bpe import bytes_to_unicode

    table = bytes_to_unicode()
    assert len(table) == 256
    assert len(set(table.values())) == 256
    # printable latin bytes map to themselves
    assert table[ord("A")] == "A" and table[ord("~")] == "~"
    # control/space bytes map OUT of the raw range (visible symbols)
    assert ord(table[0x20]) >= 256 and ord(table[0x0A]) >= 256


def test_byte_bpe_lossless_roundtrip():
    """The property word-level BPE cannot give: decode(encode(text))
    reproduces the input EXACTLY — case, whitespace, punctuation,
    unicode, everything."""
    from pinecone_datasets_spark.operators.bpe import (
        byte_bpe_decode,
        byte_bpe_tokenize_udf,
        bytes_to_unicode,
        train_byte_bpe,
        _byte_map_str,
        _encode_word,
    )
    import re

    from pinecone_datasets_spark.operators.bpe import _BYTE_PRETOKEN_PY

    texts = [
        "Hello, World!  Multiple  spaces\tand\ttabs.\nNewlines too.",
        "CamelCase and snake_case and 'contractions' don't break",
        "unicode: café — emoji \U0001f600 CJK 中文",
        "   leading and trailing   ",
        "",
    ]
    hist = {}
    table = bytes_to_unicode()
    pat = re.compile(_BYTE_PRETOKEN_PY)
    for t in texts:
        for w in pat.findall(t):
            bw = _byte_map_str(w, table)
            hist[bw] = hist.get(bw, 0) + 1
    merges = train_byte_bpe(sorted(hist.items()), n_merges=50)
    ranks = {p: i for i, p in enumerate(merges)}
    for t in texts:
        toks = []
        for w in pat.findall(t):
            toks.extend(_encode_word(_byte_map_str(w, table), ranks, eow=False))
        assert byte_bpe_decode(toks) == t


def test_byte_bpe_no_unknown_ids_ever():
    """ids 0..255 are the closed byte alphabet — NO input can produce
    -1, unlike the word-level vocab (which surfaces unknowns)."""
    from pinecone_datasets_spark.operators.bpe import (
        byte_bpe_vocab,
        bytes_to_unicode,
        train_byte_bpe,
        _byte_map_str,
        _encode_word,
    )

    table = bytes_to_unicode()
    merges = train_byte_bpe([(_byte_map_str("the the", table), 5)], 10)
    vocab = byte_bpe_vocab(merges)
    assert len(vocab) == 256 + len(merges)
    tid = {t: i for i, t in enumerate(vocab)}
    # adversarial input sharing nothing with training
    weird = _byte_map_str("\x00\xff ZZZ €", table)
    ids = [tid.get(t, -1) for t in _encode_word(weird, {p: i for i, p in enumerate(merges)}, eow=False)]
    assert ids and all(i >= 0 for i in ids)


def test_byte_bpe_spark_path_and_java_python_pretoken_parity(spark):
    """End-to-end on the fixture corpus: Spark histogram (Java regex) +
    driver training + Arrow encode; every doc decodes back exactly; and
    the Java and Python pre-tokenizations agree on this (ASCII) corpus."""
    from pinecone_datasets_spark.operators.bpe import (
        BYTE_PRETOKEN_RE,
        byte_bpe_decode,
        byte_bpe_tokenize_udf,
        byte_pretoken_histogram,
        train_byte_bpe,
        _BYTE_PRETOKEN_PY,
    )
    import re

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    hist = byte_pretoken_histogram(docs, max_words=5000)
    assert hist and all(n > 0 for _, n in hist)
    merges = train_byte_bpe(hist, n_merges=150)
    assert merges
    sample = docs.select("doc_id", "text").limit(15)
    toks = sample.withColumn(
        "toks", byte_bpe_tokenize_udf(merges)(F.col("text"))
    ).collect()
    texts = {r["doc_id"]: r["text"] for r in sample.collect()}
    for r in toks:
        assert byte_bpe_decode(r["toks"]) == texts[r["doc_id"]]
    # ids mode: closed alphabet, token-count parity
    ids = sample.withColumn(
        "ids", byte_bpe_tokenize_udf(merges, ids=True)(F.col("text"))
    ).collect()
    for ri, rt in zip(ids, toks):
        assert len(ri["ids"]) == len(rt["toks"])
        assert all(i >= 0 for i in ri["ids"])
    # Java-vs-Python pre-token parity on this corpus
    pat = re.compile(_BYTE_PRETOKEN_PY)
    jrows = (
        sample.select(
            "doc_id",
            F.regexp_extract_all(
                F.col("text"), F.lit(BYTE_PRETOKEN_RE), 0
            ).alias("pt"),
        )
    ).collect()
    for r in jrows:
        assert list(r["pt"]) == pat.findall(texts[r["doc_id"]])


def test_byte_bpe_compresses_fixture(spark):
    from pinecone_datasets_spark.operators.bpe import (
        byte_bpe_tokenize_udf,
        byte_pretoken_histogram,
        train_byte_bpe,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    merges = train_byte_bpe(byte_pretoken_histogram(docs), n_merges=300)
    agg = docs.select(
        F.size(byte_bpe_tokenize_udf(merges)(F.col("text"))).alias("t"),
        F.length("text").alias("c"),
    ).agg(F.sum("t").alias("t"), F.sum("c").alias("c")).collect()[0]
    assert 0 < agg["t"] < agg["c"]  # beats 1 token/byte on its corpus


def test_byte_fixture_pretokens_survive_production_regex():
    """The q49 'byte_bpe' oracle holds pre-tokenization fixed with the
    RE2-safe `_BYTE_FIXTURE_PAT`; its correctness rests on the
    invariant that the production GPT-2 regex, applied to any single
    fixture pre-token, returns that pre-token WHOLE (so the real
    byte_bpe_tokenize_udf per pre-token equals _encode_word on its
    byte-mapped form). Property-check the invariant over every fixture
    pre-token of a text zoo that exercises contractions, underscores,
    mixed alnum, punct runs, and multi-space gaps."""
    import re
    import sys

    sys.path.insert(0, "/root/repo")
    from __spark_entry__ import _BYTE_FIXTURE_PAT

    from pinecone_datasets_spark.operators.bpe import _BYTE_PRETOKEN_PY

    fix = re.compile(_BYTE_FIXTURE_PAT)
    prod = re.compile(_BYTE_PRETOKEN_PY)
    zoo = [
        "it's a don't-stop world, isn't it?",
        "x_y __init__ a_b_c",
        "ab12 34cd A1B2",
        "!!! ?!? ... ''' `{~} [a](b)",
        "multi   space\tand\nnewlines  end  ",
        "'s 't 're 've 'm 'll 'd '",
        "CamelCase UPPER lower 0123456789",
        "a'b c'd e'' 'f",
    ]
    checked = 0
    for text in zoo:
        for w in fix.findall(text):
            assert prod.findall(w) == [w], (text, w, prod.findall(w))
            checked += 1
    assert checked > 40


def test_gpt2_interchange_roundtrip(tmp_path, spark):
    """save_bpe_files/load_bpe_files speak the GPT-2 interchange layout
    (merges.txt + vocab.json): a trained byte-level tokenizer round-
    trips exactly, the loaded merges+vocab drive the real Arrow
    encoder to identical ids, and malformed files fail loudly."""
    import json

    from pinecone_datasets_spark.operators.bpe import (
        byte_bpe_tokenize_udf,
        byte_bpe_vocab,
        byte_pretoken_histogram,
        load_bpe_files,
        save_bpe_files,
        train_byte_bpe,
    )

    docs = spark.createDataFrame(
        [(i, f"the quick brown fox {i} jumps over the lazy dog") for i in range(30)],
        "doc_id long, text string",
    )
    merges = train_byte_bpe(
        byte_pretoken_histogram(docs, max_words=500), 25
    )
    d = str(tmp_path / "tok")
    save_bpe_files(merges, d)
    merges2, vocab2 = load_bpe_files(d)
    assert merges2 == merges
    assert vocab2 == byte_bpe_vocab(merges)

    # loaded artifacts drive the encoder to identical ids
    u1 = byte_bpe_tokenize_udf(merges, ids=True)
    u2 = byte_bpe_tokenize_udf(merges2, ids=True, vocab=vocab2)
    import pyspark.sql.functions as F

    a = docs.select(u1(F.col("text")).alias("t")).collect()
    b = docs.select(u2(F.col("text")).alias("t")).collect()
    assert [r["t"] for r in a] == [r["t"] for r in b]

    # merges-only directory loads with vocab None
    import os

    os.unlink(os.path.join(d, "vocab.json"))
    m3, v3 = load_bpe_files(d)
    assert m3 == merges and v3 is None

    # malformed artifacts fail loudly
    with open(os.path.join(d, "merges.txt"), "a") as fh:
        fh.write("threeparts in line\n")
    with pytest.raises(ValueError, match="malformed"):
        load_bpe_files(d)
    save_bpe_files(merges, d)
    with open(os.path.join(d, "vocab.json"), "w") as fh:
        json.dump({"a": 0, "b": 2}, fh)
    with pytest.raises(ValueError, match="contiguous|out of range"):
        load_bpe_files(d)


def test_train_bpe_incremental_matches_naive_reference():
    """r11 review replaced the full-recount trainer with incremental
    pair bookkeeping (Sennrich's learn_bpe shape) — the merge sequence
    must stay bit-identical to the naive formulation (which the q49
    oracle replays in SQL)."""
    import random

    from pinecone_datasets_spark.operators.bpe import EOW, train_bpe

    def naive(histogram, n_merges, eow):
        tail = (EOW,) if eow else ()
        words = {}
        for w, n in histogram:
            if not w:
                continue
            words[tuple(w) + tail] = words.get(tuple(w) + tail, 0) + n
        merges = []
        for _ in range(n_merges):
            pairs = {}
            for sym, n in words.items():
                for i in range(len(sym) - 1):
                    p = (sym[i], sym[i + 1])
                    pairs[p] = pairs.get(p, 0) + n
            if not pairs:
                break
            best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            if pairs[best] < 2:
                break
            merges.append(best)
            merged = best[0] + best[1]
            nw = {}
            for sym, n in words.items():
                out, i = [], 0
                while i < len(sym):
                    if (
                        i < len(sym) - 1
                        and sym[i] == best[0]
                        and sym[i + 1] == best[1]
                    ):
                        out.append(merged)
                        i += 2
                    else:
                        out.append(sym[i])
                        i += 1
                k = tuple(out)
                nw[k] = nw.get(k, 0) + n
            words = nw
        return merges

    rng = random.Random(7)
    hist = [
        (
            "".join(rng.choice("abcde") for _ in range(rng.randint(1, 10))),
            rng.randint(1, 40),
        )
        for _ in range(800)
    ] + [("aaaa", 25), ("aaab", 15), ("", 3)]
    for eow in (True, False):
        assert train_bpe(hist, 120, eow) == naive(hist, 120, eow)


def test_bpe_token_counts_byte_level_mode_and_guard(spark):
    """r11 review: counting with byte-level merges through the
    word-level pre-tokenizer matched almost no merge (counts inflated
    ~4x, silently). Byte merges are refused word-level and counted
    correctly with byte_level=True."""
    from pinecone_datasets_spark.operators.bpe import (
        bpe_token_counts,
        byte_bpe_tokenize_udf,
        byte_pretoken_histogram,
        train_byte_bpe,
    )

    df = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the the the")],
        "doc_id long, text string",
    )
    merges = train_byte_bpe(byte_pretoken_histogram(df), n_merges=50)
    with pytest.raises(ValueError, match="byte_level=True"):
        bpe_token_counts(df, merges)
    got = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_token_counts(df, merges, byte_level=True).collect()
    }
    tok = byte_bpe_tokenize_udf(merges)
    want = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", F.size(tok(F.col("text"))).alias("n")
        ).collect()
    }
    assert got == want

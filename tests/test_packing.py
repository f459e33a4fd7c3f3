"""Sequence packing via distributed prefix sum (operators/packing.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pinecone_datasets_spark.operators.packing import (
    chunk_summary,
    pack_documents,
    whitespace_token_count,
)

from conftest import TESTDATA


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{TESTDATA}/documents.parquet")


def test_pack_known_answer(spark):
    df = spark.createDataFrame(
        [(1, 4), (2, 3), (3, 5), (4, 1), (5, 0), (6, 7)],
        "doc_id long, toks long",
    )
    out = {
        r["doc_id"]: (
            r["global_start"],
            r["chunk_id"],
            r["end_chunk_id"],
            r["spans_boundary"],
        )
        for r in pack_documents(
            df, max_tokens=8, token_count_col="toks", num_partitions=3
        ).collect()
    }
    # stream: doc1 [0,4) doc2 [4,7) doc3 [7,12) doc4 [12,13) doc5 [13,13) doc6 [13,20)
    assert out[1] == (0, 0, 0, False)
    assert out[2] == (4, 0, 0, False)
    assert out[3] == (7, 0, 1, True)  # crosses the 8-token edge
    assert out[4] == (12, 1, 1, False)
    assert out[5] == (13, 1, 1, False)  # empty doc: stays at its offset
    assert out[6] == (13, 1, 2, True)


def test_pack_invariant_to_partitioning(spark):
    rows = [(i, (i * 7) % 13 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, toks long")
    a = pack_documents(
        df, 64, token_count_col="toks", num_partitions=1
    ).collect()
    b = pack_documents(
        df.repartition(11), 64, token_count_col="toks", num_partitions=7
    ).collect()
    key = lambda rs: sorted((r["doc_id"], r["global_start"]) for r in rs)
    assert key(a) == key(b)
    # exact prefix-sum: last doc's start + tokens == total tokens
    total = sum(t for _, t in rows)
    last = max(a, key=lambda r: r["global_start"])
    assert last["global_start"] + last["n_tokens"] == total


def test_pack_no_single_partition_window(spark, docs):
    """The plan must not contain a global (partition-less) window — the
    window below operates within _pid partitions only."""
    plan = (
        pack_documents(docs, 512)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "windowspecdefinition(_pid" in plan or "_pid" in plan
    # A global-order window would surface as an empty partitionBy spec:
    assert "windowspecdefinition(_ord" not in plan


def test_pack_fixture_token_parity_and_summary(spark, docs):
    out = pack_documents(docs, 256)
    got = out.agg(F.sum("n_tokens")).collect()[0][0]
    want = docs.select(
        whitespace_token_count("text").alias("t")
    ).agg(F.sum("t")).collect()[0][0]
    assert got == want
    summ = chunk_summary(out, 256)
    srows = summ.collect()
    assert all(r["n_docs"] >= 1 for r in srows)
    assert abs(summ.agg(F.sum("n_tokens")).collect()[0][0] - want) == 0


def test_pack_rejects_bad_max(spark, docs):
    with pytest.raises(ValueError):
        pack_documents(docs, 0)


# ---------------------------------------------------------------------------
# length_bucketed_batches (distributed per-bucket rank, no global window)
# ---------------------------------------------------------------------------


def test_bucketed_batches_known_answer(spark):
    from pinecone_datasets_spark.operators.packing import (
        batch_summary,
        length_bucketed_batches,
    )

    rows = [
        (1, "a"),                      # 1 tok  -> bucket 0
        (2, "a b"),                    # 2 tok  -> bucket 0
        (3, "a b c"),                  # 3 tok  -> bucket 1
        (4, "a b c d"),                # 4 tok  -> bucket 1
        (5, "a b c d e"),              # 5 tok  -> bucket 1
        (6, "a b c d e f g h i j k"),  # 11 tok -> overflow bucket 2
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["bucket"], r["rank_in_bucket"], r["batch_id"])
        for r in length_bucketed_batches(
            df, batch_size=2, bucket_edges=[2, 8]
        ).collect()
    }
    assert out == {
        1: (0, 1, 0),
        2: (0, 2, 0),
        3: (1, 1, 0),
        4: (1, 2, 0),
        5: (1, 3, 1),
        6: (2, 1, 0),
    }
    summ = {
        (r["bucket"], r["batch_id"]): (
            r["n_docs"],
            r["pad_len"],
            r["real_tokens"],
            r["pad_efficiency"],
        )
        for r in batch_summary(
            length_bucketed_batches(df, 2, [2, 8]), 2
        ).collect()
    }
    assert summ[(0, 0)] == (2, 2, 3, 0.75)
    assert summ[(1, 0)] == (2, 4, 7, 0.875)
    assert summ[(1, 1)] == (1, 5, 5, 1.0)


def test_bucketed_batches_invariant_to_partitioning(spark, docs):
    from pinecone_datasets_spark.operators.packing import (
        length_bucketed_batches,
    )

    a = {
        (r["doc_id"], r["bucket"], r["rank_in_bucket"], r["batch_id"])
        for r in length_bucketed_batches(
            docs, 16, [100, 200, 400], num_partitions=3
        ).collect()
    }
    b = {
        (r["doc_id"], r["bucket"], r["rank_in_bucket"], r["batch_id"])
        for r in length_bucketed_batches(
            docs.repartition(11), 16, [100, 200, 400], num_partitions=7
        ).collect()
    }
    assert a == b
    # ranks are a permutation of 1..n within each bucket
    by_bucket: dict[int, list[int]] = {}
    for _, bucket, rk, _ in a:
        by_bucket.setdefault(bucket, []).append(rk)
    for rks in by_bucket.values():
        assert sorted(rks) == list(range(1, len(rks) + 1))


def test_bucketed_batches_no_single_partition_window(spark, docs):
    from pinecone_datasets_spark.operators.packing import (
        length_bucketed_batches,
    )

    plan = (
        length_bucketed_batches(docs, 16, [100, 200, 400])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the only unpartitioned window runs over the P×B per-partition
    # count rows, never the corpus: corpus-side windows carry _pid
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "_pid" in line or "_c" in line or "bucket" in line


def test_bucketed_batches_validates(spark, docs):
    from pinecone_datasets_spark.operators.packing import (
        length_bucketed_batches,
    )

    with pytest.raises(ValueError):
        length_bucketed_batches(docs, 0, [10])
    with pytest.raises(ValueError):
        length_bucketed_batches(docs, 4, [])
    with pytest.raises(ValueError):
        length_bucketed_batches(docs, 4, [20, 10])


# ---------------------------------------------------------------------------
# chunk_text (RAG overlapping window chunker)
# ---------------------------------------------------------------------------


def test_chunk_text_known_answer(spark):
    from pinecone_datasets_spark.operators.packing import chunk_text

    rows = [
        (1, "a b c d e f g"),   # 7 tokens
        (2, "x"),               # 1 token -> one short chunk
        (3, "   "),             # empty -> no chunks
        (4, None),              # null -> no chunks
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["chunk_n_tokens"])
        for r in chunk_text(df, chunk_tokens=3, overlap=1).collect()
    }
    # stride 2: starts 0,2,4 — start 6's chunk ("g") is fully contained
    # in chunk 2 ("e f g") and is dropped since r11 (no pure-duplicate
    # tail sub-chunks)
    assert got == {
        (1, 0): ("a b c", 3),
        (1, 1): ("c d e", 3),
        (1, 2): ("e f g", 3),
        (2, 0): ("x", 1),
    }


def test_chunk_text_no_overlap_covers_exactly(spark, docs):
    from pinecone_datasets_spark.operators.packing import (
        chunk_text,
        whitespace_token_count,
    )

    out = chunk_text(docs, chunk_tokens=64, overlap=0)
    per_doc = out.groupBy("doc_id").agg(
        F.sum("chunk_n_tokens").alias("s"),
        F.count(F.lit(1)).alias("c"),
        F.max("chunk_idx").alias("m"),
    )
    base = docs.select(
        "doc_id", whitespace_token_count("text").alias("n")
    )
    joined = per_doc.join(base, "doc_id").collect()
    assert joined
    for r in joined:
        # zero-overlap chunks partition the token stream exactly
        assert r["s"] == r["n"]
        assert r["c"] == (r["n"] + 63) // 64
        assert r["m"] == r["c"] - 1


def test_chunk_text_overlap_token_accounting(spark, docs):
    from pinecone_datasets_spark.operators.packing import (
        chunk_text,
        whitespace_token_count,
    )

    k, ov = 64, 16
    out = chunk_text(docs, chunk_tokens=k, overlap=ov)
    per_doc = out.groupBy("doc_id").agg(
        F.sum("chunk_n_tokens").alias("s"), F.count(F.lit(1)).alias("c")
    )
    base = docs.select(
        "doc_id", whitespace_token_count("text").alias("n")
    )
    for r in per_doc.join(base, "doc_id").collect():
        # every token once + ov extra per chunk boundary that overlaps
        assert r["s"] == r["n"] + ov * (r["c"] - 1) or r["s"] == r["n"] + ov * (
            r["c"] - 1
        ) - max(0, ov - (r["n"] - (r["c"] - 1) * (k - ov)))


def test_chunk_text_validates(spark, docs):
    from pinecone_datasets_spark.operators.packing import chunk_text

    with pytest.raises(ValueError):
        chunk_text(docs, 0)
    with pytest.raises(ValueError):
        chunk_text(docs, 10, overlap=10)


def test_chunk_text_no_fully_contained_tail_chunk(spark):
    """r11 review: with overlap > 0, a doc whose length mod stride
    lands in [1, overlap] emitted a final chunk fully contained in the
    previous one — a pure-duplicate RAG sub-chunk."""
    from pinecone_datasets_spark.operators.packing import chunk_text

    words9 = " ".join(f"w{i}" for i in range(1, 10))
    df = spark.createDataFrame(
        [(1, words9), (2, "w1 w2 w3"), (3, " ".join(f"v{i}" for i in range(1, 13)))],
        "doc_id long, text string",
    )
    out = {}
    for r in chunk_text(df, chunk_tokens=8, overlap=4).collect():
        out.setdefault(r["doc_id"], []).append(r["chunk_text"])
    # 9 words, stride 4: chunks [1-8], [5-9] — NOT a third [9-9]
    assert out[1] == ["w1 w2 w3 w4 w5 w6 w7 w8", "w5 w6 w7 w8 w9"]
    # shorter than one window: exactly one chunk
    assert out[2] == ["w1 w2 w3"]
    # 12 words: [1-8], [5-12] — start 8 adds tokens 9-12 via... stride 4
    # starts 0,4,8: s=8 -> 8+4 < 12? no -> dropped; s=4 covers 5-12
    assert out[3] == [
        "v1 v2 v3 v4 v5 v6 v7 v8",
        "v5 v6 v7 v8 v9 v10 v11 v12",
    ]
    # every token of every doc is still covered by some chunk
    for doc_id, chunks in out.items():
        toks = set()
        for c in chunks:
            toks.update(c.split(" "))
        n = {1: 9, 2: 3, 3: 12}[doc_id]
        assert len(toks) == n


def test_pack_documents_null_text_counts_zero(spark):
    """r11 review: a NULL-text doc poisoned the window sums and came
    out with NULL global_start/chunk_id; it now packs as 0 tokens."""
    from pinecone_datasets_spark.operators.packing import pack_documents

    df = spark.createDataFrame(
        [(1, "a b c"), (2, None), (3, "d e")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in pack_documents(df, max_tokens=4).collect()}
    assert out[2]["n_tokens"] == 0
    assert out[2]["global_start"] is not None
    assert all(r["chunk_id"] is not None for r in out.values())


def test_batch_summary_zero_token_batch_no_crash(spark):
    """r11 review: a batch of zero-token docs made pad_len 0 and the
    efficiency division died with ANSI DIVIDE_BY_ZERO."""
    from pinecone_datasets_spark.operators.packing import (
        batch_summary,
        length_bucketed_batches,
    )

    df = spark.createDataFrame(
        [(i, "") for i in range(4)] + [(9, "a b c")],
        "doc_id long, text string",
    )
    batches = length_bucketed_batches(df, 4, [2])
    summ = batch_summary(batches, batch_size=4).collect()
    assert all(r["pad_efficiency"] is not None for r in summ)
    zero = [r for r in summ if r["pad_len"] == 0]
    assert zero and zero[0]["pad_efficiency"] == 1.0

"""Streaming crawl curation: the corpus JSONL source composed with the
quality gates and streaming dedup — availableNow over a static
directory must equal the batch pipeline over the same files (the
standard equivalence that proves a streaming plan computes the batch
semantics incrementally)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pinecone_datasets_spark.functions.text import quality_score, word_count
from pinecone_datasets_spark.operators.dedup import exact_dedup
from pinecone_datasets_spark.sources.corpus import read_jsonl, stream_jsonl
from pinecone_datasets_spark.streaming.dedup import stream_exact_dedup

DOCS_DDL = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


@pytest.fixture(scope="module")
def jsonl_dir(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("stream_crawl"))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    dupes = (
        docs.orderBy("doc_id")
        .limit(15)
        .withColumn("doc_id", F.col("doc_id") + 500_000)
    )
    docs.unionByName(dupes).write.mode("overwrite").json(root)
    return root


def _gates(df):
    return df.where(
        (word_count("text") >= 3) & (quality_score("text") > 0.2)
    )


def test_streaming_curation_equals_batch(spark, jsonl_dir):
    stream = _gates(
        stream_jsonl(spark, jsonl_dir, DOCS_DDL, max_files_per_trigger=3)
    )
    deduped = stream_exact_dedup(stream)
    q = (
        deduped.writeStream.format("memory")
        .queryName("stream_curated")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("select * from stream_curated")

    batch = exact_dedup(
        _gates(read_jsonl(spark, jsonl_dir, DOCS_DDL).good)
    )
    # streaming dedup keeps an arbitrary representative per fingerprint
    # (arrival order); compare on content fingerprints, not ids
    s_fps = {r["text"] for r in got.collect()}
    b_fps = {r["text"] for r in batch.collect()}
    assert s_fps == b_fps
    assert got.count() == batch.count()
    # the injected duplicates collapsed: one survivor per content
    assert (
        got.groupBy("text").count().where(F.col("count") > 1).count() == 0
    )


def test_streaming_semantic_gate_equals_batch(spark, sf_dir, tmp_path):
    """semantic_gate over availableNow == batch semantic_decontaminate
    on the same files; benchmark collected at plan time, gate map-only."""
    from pinecone_datasets_spark.operators.decontaminate import (
        semantic_decontaminate,
    )
    from pinecone_datasets_spark.streaming.curate import semantic_gate

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    root = str(tmp_path / "emb_stream")
    corpus = emb.where(F.col("vec_id") % 97 != 0)
    bench = emb.where(F.col("vec_id") % 97 == 0)
    corpus.write.mode("overwrite").parquet(root)

    stream = (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(root)
    )
    gated = semantic_gate(stream, bench, threshold=0.3)
    q = (
        gated.writeStream.format("memory")
        .queryName("sem_gated")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        r.vec_id for r in spark.sql("select vec_id from sem_gated").collect()
    )
    stored = spark.read.parquet(root)
    want = sorted(
        r.vec_id
        for r in semantic_decontaminate(
            stored, bench, threshold=0.3
        ).collect()
    )
    assert got == want and 0 < len(got) < stored.count()
    # guard parity with the batch wrapper
    with pytest.raises(ValueError, match="threshold"):
        semantic_gate(stream, bench, threshold=1.5)


def test_stream_curate_line_gates_equal_batch(spark, tmp_path):
    """stream_curate(line_gates=...) over availableNow == the same
    map-only structural filters applied in batch."""
    from pinecone_datasets_spark.functions.text import (
        bullet_line_fraction,
        duplicate_line_fraction,
    )
    from pinecone_datasets_spark.streaming.curate import stream_curate

    rows = [
        {"doc_id": 1, "text": "Plain prose sentence here.\nAnother good line."},
        {"doc_id": 2, "text": "- b\n- b\n- b\n- b"},            # bullet spam
        {"doc_id": 3, "text": "same\nsame\nsame\nsame\nend"},   # dup lines
        {"doc_id": 4, "text": "One decent line of text.\nAnd one more."},
    ]
    import json as _json

    d = tmp_path / "lines"
    d.mkdir()
    (d / "a.jsonl").write_text(
        "\n".join(_json.dumps(r) for r in rows) + "\n"
    )
    gates = {"max_bullet_line_frac": 0.5, "max_dup_line_frac": 0.5}
    stream = spark.readStream.schema("doc_id long, text string").json(
        str(d)
    )
    out = stream_curate(stream, min_words=1, line_gates=gates)
    q = (
        out.writeStream.format("memory")
        .queryName("line_gate_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        r["doc_id"]
        for r in spark.sql("select doc_id from line_gate_stream").collect()
    )
    batch = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in rows], "doc_id long, text string"
    )
    exp = sorted(
        r["doc_id"]
        for r in batch.where(
            (bullet_line_fraction("text") <= 0.5)
            & (duplicate_line_fraction("text") <= 0.5)
        ).collect()
    )
    assert got == exp == [1, 4]
    with pytest.raises(ValueError):
        stream_curate(stream, line_gates={"bogus": 1})

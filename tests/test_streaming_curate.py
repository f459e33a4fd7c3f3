"""Streaming curation chain (streaming/curate.py): train-batch /
apply-stream DSIR scoring and the composed gate+dedup pipeline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pinecone_datasets_spark.functions.text import (
    doc_fingerprint,
    quality_score,
    word_count,
)
from pinecone_datasets_spark.operators.dsir import (
    dsir_log_ratios,
    dsir_weights,
)
from pinecone_datasets_spark.streaming.curate import (
    dsir_gate,
    dsir_score,
    stream_curate,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


@pytest.fixture(scope="module")
def ratios(spark, docs):
    tgt = docs.where(F.col("lang") == "en").select("text")
    return dsir_log_ratios(docs, tgt, n=2, n_buckets=500, dense=True).cache()


def test_dsir_score_matches_batch_weights(spark, docs, ratios):
    # the map-only Arrow scorer replays the batch operator's weights
    # (same hash/buckets; float summation order differs -> ~1e-9)
    got = {
        r.doc_id: r.log_weight
        for r in dsir_score(docs, ratios, n=2, n_buckets=500)
        .select("doc_id", "log_weight")
        .collect()
    }
    tgt = docs.where(F.col("lang") == "en").select("text")
    want = {
        r.doc_id: r.log_weight
        for r in dsir_weights(docs, tgt, n=2, n_buckets=500).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)


def test_dsir_gate_thresholds(spark, docs, ratios):
    kept = dsir_gate(docs, ratios, threshold=0.0, n=2, n_buckets=500,
                     keep_weight=True)
    assert kept.where(F.col("log_weight") < 0.0).count() == 0
    # gate keeps schema when keep_weight=False
    bare = dsir_gate(docs, ratios, threshold=0.0, n=2, n_buckets=500)
    assert bare.columns == docs.columns


def test_ratio_array_guard(spark, ratios):
    with pytest.raises(ValueError, match="dense"):
        dsir_score(
            spark.createDataFrame([("x",)], "text string"),
            ratios,
            n_buckets=10,  # ratio table was fitted with 500 buckets
        )


def test_unseen_buckets_carry_smoothed_prior(spark, docs):
    # novel-vocabulary text (buckets unseen by either fit corpus) must
    # score with the smoothed prior, not 0
    import math

    tgt = docs.where(F.col("lang") == "en").select("text")
    dense = dsir_log_ratios(docs, tgt, n=2, n_buckets=500, dense=True)
    novel = spark.createDataFrame(
        [(1, "zzqx1 zzqx2 zzqx3")], "doc_id long, text string"
    )
    w = dsir_score(novel, dense, n=2, n_buckets=500).first().log_weight
    # prior = ln((a/(n_t + aB)) / (a/(n_r + aB))) = ln((n_r+aB)/(n_t+aB));
    # the raw corpus is larger than its English slice -> prior > 0
    assert w > 0.0


def test_stream_curate_available_now_equals_batch(
    spark, docs, ratios, tmp_path_factory
):
    root = str(tmp_path_factory.mktemp("curate_stream"))
    # plant exact dups so dedup state actually fires across micro-batches
    dup = docs.where(F.col("doc_id") % 4 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    corpus = docs.unionByName(dup)
    corpus.repartition(6).write.mode("overwrite").parquet(root)

    stream = (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(root)
    )
    out = stream_curate(
        stream,
        min_words=5,
        min_quality=0.1,
        ratios=ratios,
        dsir_threshold=-5.0,
        dsir_n_buckets=500,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("curated")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.table("curated")

    static = spark.read.parquet(root)
    gated = static.where(word_count(F.col("text")) >= 5).where(
        quality_score(F.col("text")) >= 0.1
    )
    gated = dsir_gate(gated, ratios, -5.0, n_buckets=500)
    batch_fps = (
        gated.select(doc_fingerprint(F.col("text")).alias("fp"))
        .distinct()
        .count()
    )
    # one survivor per distinct fingerprint, same fingerprint set
    assert got.count() == batch_fps
    got_fps = (
        got.select(doc_fingerprint(F.col("text")).alias("fp"))
        .distinct()
        .count()
    )
    assert got_fps == batch_fps
    # every emitted doc passes every gate
    assert got.where(word_count(F.col("text")) < 5).count() == 0
    assert got.where(quality_score(F.col("text")) < 0.1).count() == 0


def test_dsir_score_unicode_whitespace_parity(spark, ratios):
    """r11 review: bare str.strip() removed Unicode whitespace (NBSP,
    ideographic space) that the batch ASCII tokenizer keeps attached to
    tokens — a leading NBSP hashed to a DIFFERENT bucket stream-side.
    Parity must hold on hostile whitespace too: replay the stream
    scorer's sum with the batch expression tokenizer over the SAME
    ratio table."""
    from pinecone_datasets_spark.operators.dsir import doc_bucket_counts

    hostile = spark.createDataFrame(
        [
            (900001, "\u00a0foo bar baz qux quux corge"),
            (900002, "\u3000ideographic lead word word word word"),
            (900003, "tab\tand newline\nseparated words here ok"),
            (900004, "plain spaced words for the control row"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.log_weight
        for r in dsir_score(hostile, ratios, n=2, n_buckets=500).collect()
    }
    want = {
        r["doc_id"]: r["w"]
        for r in doc_bucket_counts(hostile, n=2, n_buckets=500)
        .join(ratios, "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("cnt") * F.col("log_ratio")).alias("w")
        )
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9), k

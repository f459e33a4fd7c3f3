"""Bloom filter (operators/sketch.py bloom_build / bloom_might_contain /
bloom_sql): no-false-negative invariant, python bit-replay, word packing,
merge-by-or, DuckDB parity, zero-Python broadcast-probe plan."""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F

from pinecone_datasets_spark.operators.sketch import (
    _BLOOM_WORD,
    bloom_build,
    bloom_might_contain,
    bloom_sql,
)
from pinecone_datasets_spark.plans.explain import formatted_plan

M, K = 1 << 12, 4


def _py_positions(value: str, n_hashes: int = K, n_bits: int = M):
    for s in range(n_hashes):
        h = hashlib.md5(f"{s}:{value}".encode()).hexdigest()[:13]
        yield int(h, 16) % n_bits


def _py_bloom(values, n_hashes: int = K, n_bits: int = M):
    words: dict[int, int] = {}
    for v in values:
        for p in _py_positions(str(v), n_hashes, n_bits):
            w, b = p // _BLOOM_WORD, p % _BLOOM_WORD
            words[w] = words.get(w, 0) | (1 << b)
    return words


@pytest.fixture(scope="module")
def keys(spark):
    return spark.range(400).select(
        F.concat(F.lit("key-"), F.col("id")).alias("v")
    )


def test_filter_matches_python_replay(spark, keys):
    got = {
        r["word"]: r["bits"]
        for r in bloom_build(keys, "v", n_bits=M, n_hashes=K).collect()
    }
    want = _py_bloom([r["v"] for r in keys.collect()])
    assert got == want


def test_no_false_negatives(spark, keys):
    bl = bloom_build(keys, "v", n_bits=M, n_hashes=K)
    out = bloom_might_contain(bl, keys, "v", n_bits=M, n_hashes=K)
    assert out.where(~F.col("might_contain")).count() == 0
    assert out.count() == 400


def test_absent_keys_mostly_reject(spark, keys):
    bl = bloom_build(keys, "v", n_bits=M, n_hashes=K)
    absent = spark.range(400).select(
        F.concat(F.lit("other-"), F.col("id")).alias("v")
    )
    out = bloom_might_contain(bl, absent, "v", n_bits=M, n_hashes=K)
    fp = out.where(F.col("might_contain")).count()
    # 400 keys x 4 hashes in 4096 bits -> ~32% load, FPR ~1%; the test
    # bound is loose (deterministic given md5, so this never flakes)
    assert fp <= 40, fp


def test_filters_merge_by_bit_or(spark):
    a = spark.range(0, 200).select(F.col("id").cast("string").alias("v"))
    b = spark.range(200, 500).select(F.col("id").cast("string").alias("v"))
    merged = (
        bloom_build(a, "v", n_bits=M, n_hashes=K)
        .unionByName(bloom_build(b, "v", n_bits=M, n_hashes=K))
        .groupBy("word")
        .agg(F.bit_or("bits").alias("bits"))
    )
    whole = bloom_build(
        spark.range(500).select(F.col("id").cast("string").alias("v")),
        "v",
        n_bits=M,
        n_hashes=K,
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_bloom_sql_duckdb_parity(spark, sf_dir):
    doc = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = doc.where("doc_id % 5 != 0").select(
        F.md5("text").alias("f")
    )
    probes = doc.select(F.md5("text").alias("f")).distinct()
    bl = bloom_build(corpus, "f", n_bits=M, n_hashes=K)
    got = {
        r["f"]: r["might_contain"]
        for r in bloom_might_contain(
            bl, probes, "f", n_bits=M, n_hashes=K
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet'"
    )
    sql = bloom_sql(
        "c.f",
        "(SELECT md5(text) AS f FROM documents WHERE doc_id % 5 != 0) c",
        "SELECT DISTINCT md5(text) AS f FROM documents",
        "f",
        n_bits=M,
        n_hashes=K,
    )
    want = {r[0]: r[1] for r in con.execute(sql).fetchall()}
    assert got == want
    # every corpus fingerprint must probe true (no false negatives)
    corpus_f = {r["f"] for r in corpus.distinct().collect()}
    assert all(got[f] for f in corpus_f)


def test_plan_no_python_and_broadcast_probe(spark, sf_dir):
    doc = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bl = bloom_build(doc, "text", n_bits=M, n_hashes=K)
    plan = formatted_plan(bl)
    assert "EvalPython" not in plan
    probe = bloom_might_contain(
        bl, doc.select(F.col("text")), "text", n_bits=M, n_hashes=K
    )
    pplan = formatted_plan(probe)
    assert "EvalPython" not in pplan
    # the word table is the broadcast side; the probe frame never
    # builds a hash table over its own rows
    assert "BroadcastHashJoin" in pplan


def test_param_guard(spark):
    df = spark.range(5).select(F.col("id").cast("string").alias("v"))
    with pytest.raises(ValueError):
        bloom_build(df, "v", n_bits=10)
    with pytest.raises(ValueError):
        bloom_build(df, "v", n_hashes=0)

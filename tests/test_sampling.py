"""Deterministic sampling/splitting operators (operators/sampling.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pinecone_datasets_spark.operators.sampling import (
    SPLIT_BUCKETS,
    cap_per_group,
    deterministic_sample,
    hash_split,
    split_bucket,
    stratified_sample_exact,
)

from conftest import TESTDATA


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{TESTDATA}/documents.parquet")


def test_hash_split_disjoint_exhaustive_and_proportional(spark, docs):
    out = hash_split(
        docs, {"train": 0.8, "val": 0.1, "test": 0.1}, key_col="doc_id"
    )
    counts = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    total = docs.count()
    assert sum(counts.values()) == total  # exhaustive, disjoint
    assert set(counts) == {"train", "val", "test"}
    # 500 docs: expect roughly 400/50/50, tolerate hash variance.
    assert counts["train"] > 0.65 * total
    assert counts["val"] + counts["test"] < 0.35 * total


def test_hash_split_stable_under_repartition_and_subset(spark, docs):
    weights = {"train": 0.9, "test": 0.1}
    a = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs, weights).select("doc_id", "split").collect()
    }
    shuffled = docs.repartition(7, "lang")
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(shuffled, weights)
        .select("doc_id", "split")
        .collect()
    }
    assert a == b
    # Assignment is a pure function of the key: a subset sees the same
    # splits (df.sample() fails this — per-partition seeding).
    sub = docs.where(F.col("doc_id") % 3 == 0)
    c = {
        r["doc_id"]: r["split"]
        for r in hash_split(sub, weights).select("doc_id", "split").collect()
    }
    assert c == {k: v for k, v in a.items() if k % 3 == 0}


def test_hash_split_rejects_bad_weights(docs):
    with pytest.raises(ValueError):
        hash_split(docs, {})
    with pytest.raises(ValueError):
        hash_split(docs, {"train": 1.0, "bad": -0.1})


def test_deterministic_sample_nested_and_sized(spark, docs):
    small = deterministic_sample(docs, 0.05, seed=7)
    big = deterministic_sample(docs, 0.20, seed=7)
    small_ids = {r["doc_id"] for r in small.select("doc_id").collect()}
    big_ids = {r["doc_id"] for r in big.select("doc_id").collect()}
    assert small_ids <= big_ids  # nested ladder at a fixed seed
    n = docs.count()
    assert 0.01 * n <= len(small_ids) <= 0.12 * n
    assert 0.10 * n <= len(big_ids) <= 0.32 * n


def test_split_bucket_matches_duckdb(spark, docs):
    """The portable-md5 bucket must be bit-identical to the SQL twin the
    q45-q47 oracles use."""
    import duckdb

    got = {
        r["doc_id"]: r["b"]
        for r in docs.select(
            "doc_id", split_bucket("doc_id", seed=42).alias("b")
        ).collect()
    }
    con = duckdb.connect()
    want = dict(
        con.execute(
            f"""
            SELECT doc_id,
                   ('0x' || substr(md5('42|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                   % {SPLIT_BUCKETS} AS b
            FROM '{TESTDATA}/documents.parquet'
            """
        ).fetchall()
    )
    assert got == want


def test_cap_per_group_truncates_best_first(spark, docs):
    capped = cap_per_group(
        docs,
        "source",
        3,
        order_by=[F.col("n_chars").desc(), F.col("doc_id")],
    )
    per = {
        r["source"]: r["n"]
        for r in capped.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert all(n <= 3 for n in per.values())
    # best-first: kept rows are the 3 longest docs of each source
    one_source = docs.where(F.col("source") == "web")
    want = [
        r["doc_id"]
        for r in one_source.orderBy(
            F.col("n_chars").desc(), F.col("doc_id")
        ).limit(3).collect()
    ]
    got = [
        r["doc_id"]
        for r in capped.where(F.col("source") == "web")
        .orderBy(F.col("n_chars").desc(), F.col("doc_id"))
        .collect()
    ]
    assert got == want


def test_cap_per_group_plans_window_group_limit(spark, docs):
    plan = cap_per_group(
        docs, "source", 5, order_by=[F.col("doc_id")]
    )._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_stratified_sample_exact_counts(spark, docs):
    out = stratified_sample_exact(docs, "lang", 4, seed=11)
    sizes = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    full = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert sizes == {k: min(4, v) for k, v in full.items()}
    # deterministic across invocations
    again = stratified_sample_exact(docs, "lang", 4, seed=11)
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )

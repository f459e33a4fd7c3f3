"""1-bit sign codes + Hamming top-k (functions/vector.py sign_bits /
hamming_distance, operators/search.py hamming_topk)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pinecone_datasets_spark.functions.vector import (
    hamming_distance,
    sign_bits,
)
from pinecone_datasets_spark.operators.search import (
    hamming_topk,
    topk_search_arrow,
)
from pinecone_datasets_spark.plans.explain import formatted_plan


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return emb.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("values")
    )


def _np_pack(v):
    bits = (np.asarray(v) > 0).astype(np.uint64)
    out = []
    for w in range(0, len(bits), 64):
        word = np.uint64(0)
        for i, b in enumerate(bits[w : w + 64]):
            word |= np.uint64(b) << np.uint64(i)
        out.append(np.int64(word.astype(np.int64)))
    return out


def test_sign_bits_match_numpy(spark, corpus):
    rows = corpus.limit(20).select(
        "id", "values", sign_bits(F.col("values"), 64).alias("code")
    ).collect()
    for r in rows:
        assert list(r["code"]) == _np_pack(r["values"]), r["id"]
        assert len(r["code"]) == 1  # 64 dims pack into one long


def test_sign_bits_odd_dim_padding(spark):
    df = spark.createDataFrame(
        [([1.0] * 70,)], "values array<double>"
    )
    (code,) = df.select(sign_bits(F.col("values"), 70).alias("c")).collect()[
        0
    ]
    assert len(code) == 2
    # padded dims read as 0.0 -> bit 0, never garbage
    assert code[1] == (1 << 6) - 1


def test_hamming_matches_numpy(spark, corpus):
    rows = corpus.limit(10).collect()
    a, b = rows[0]["values"], rows[1]["values"]
    expect = int(
        bin(
            int(np.uint64(_np_pack(a)[0]))
            ^ int(np.uint64(_np_pack(b)[0]))
        ).count("1")
    )
    df = spark.createDataFrame([(a, b)], "a array<double>, b array<double>")
    got = df.select(
        hamming_distance(
            sign_bits(F.col("a"), 64), sign_bits(F.col("b"), 64)
        ).alias("h")
    ).collect()[0]["h"]
    assert got == expect


def test_hamming_topk_all_jvm_and_self_match(spark, corpus):
    queries = corpus.where(F.col("id") < 10).select(
        F.col("id").alias("query_id"), F.col("values").alias("vector")
    )
    res = hamming_topk(corpus, queries, dim=64, k=5)
    plan = formatted_plan(res)
    assert "EvalPython" not in plan, plan[:1500]  # zero Python crossings
    top1 = {
        r["query_id"]: r["id"]
        for r in res.where(F.col("rank") == 1).collect()
    }
    # self Hamming distance is 0 -> every query's own id ranks first
    assert top1 == {q: q for q in range(10)}


def test_hamming_rerank_recall(spark, corpus):
    rows = corpus.where(F.col("id") < 20).orderBy("id").collect()
    ids = [r["id"] for r in rows]
    mat = np.asarray([r["values"] for r in rows])
    queries = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in zip(ids, mat)],
        "query_id long, vector array<double>",
    )
    exact = topk_search_arrow(corpus, mat, ids, k=5, metric="cosine")
    ex = {}
    for r in exact.collect():
        ex.setdefault(r["query_id"], set()).add(r["id"])

    def recall(df):
        a = {}
        for r in df.collect():
            a.setdefault(r["query_id"], set()).add(r["id"])
        return sum(len(a.get(q, set()) & s) for q, s in ex.items()) / sum(
            len(s) for s in ex.values()
        )

    coarse = recall(hamming_topk(corpus, queries, dim=64, k=5))
    reranked = recall(
        hamming_topk(corpus, queries, dim=64, k=5, rerank=8)
    )
    # 64 sign bits on near-random vectors: coarse is noisy, a wide
    # rerank recovers most of the metric's order (empirical margins)
    assert coarse >= 0.2, coarse
    assert reranked >= max(coarse, 0.5), (coarse, reranked)

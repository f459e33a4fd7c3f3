"""MMR diversity re-ranking (operators/rerank.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pinecone_datasets_spark.operators.rerank import mmr_rerank


@pytest.fixture(scope="module")
def cands(spark):
    """Two near-identical high-relevance docs + one orthogonal
    mid-relevance doc, for two queries."""
    rows = []
    for q in (100, 200):
        rows += [
            (q, 1, 0.95, [1.0, 0.0, 0.0]),
            (q, 2, 0.94, [0.999, 0.01, 0.0]),  # near-dup of doc 1
            (q, 3, 0.60, [0.0, 1.0, 0.0]),     # orthogonal
            (q, 4, 0.10, [0.0, 0.0, 1.0]),
        ]
    return spark.createDataFrame(
        rows, "query_id long, id long, score double, values array<double>"
    )


def test_mmr_diversifies_over_pure_relevance(spark, cands):
    out = {
        q: [None] * 3
        for q in (100, 200)
    }
    for r in mmr_rerank(cands, k=3, lam=0.5).collect():
        out[r["query_id"]][r["mmr_rank"] - 1] = r["id"]
    # pure relevance would give [1, 2, 3]; MMR demotes the near-dup 2
    # (redundancy ~1 with doc 1) below BOTH orthogonal docs
    for q in (100, 200):
        assert out[q] == [1, 3, 4]


def test_mmr_lam_one_is_relevance_order(spark, cands):
    got = [
        (r["query_id"], r["mmr_rank"], r["id"])
        for r in mmr_rerank(cands, k=4, lam=1.0).collect()
    ]
    for q in (100, 200):
        ranks = sorted(
            [(rk, d) for (qq, rk, d) in got if qq == q]
        )
        assert [d for (_, d) in ranks] == [1, 2, 3, 4]


def test_mmr_known_answer_objective(spark, cands):
    """mmr_score replays the greedy objective by hand for one query."""
    import numpy as np

    lam = 0.5
    out = {
        r["mmr_rank"]: (r["id"], r["mmr_score"])
        for r in mmr_rerank(cands, k=3, lam=lam).collect()
        if r["query_id"] == 100
    }
    vecs = {
        1: np.array([1.0, 0.0, 0.0]),
        2: np.array([0.999, 0.01, 0.0]),
        3: np.array([0.0, 1.0, 0.0]),
        4: np.array([0.0, 0.0, 1.0]),
    }
    u = {d: v / np.linalg.norm(v) for d, v in vecs.items()}
    rel = {1: 0.95, 2: 0.94, 3: 0.60}
    # pick 1: no redundancy term
    assert out[1] == (1, pytest.approx(lam * rel[1], abs=1e-12))
    # pick 2: doc 3 wins with sim(3,1)=0
    m3 = lam * rel[3] - (1 - lam) * float(u[3] @ u[1])
    assert out[2] == (3, pytest.approx(m3, abs=1e-12))
    # pick 3: doc 4 (orthogonal to both picks, redundancy 0) beats the
    # near-dup doc 2 whose redundancy with doc 1 is ~1
    assert out[3] == (4, pytest.approx(lam * 0.10, abs=1e-12))


def test_mmr_determinism_and_bounds(spark, cands):
    a = sorted(
        map(tuple, mmr_rerank(cands, k=10, lam=0.7).collect())
    )
    b = sorted(
        map(tuple, mmr_rerank(cands.repartition(5), k=10, lam=0.7).collect())
    )
    assert a == b
    per_q = {}
    for row in a:
        per_q[row[0]] = per_q.get(row[0], 0) + 1
    assert all(v == 4 for v in per_q.values())  # min(k, n_cands)
    with pytest.raises(ValueError):
        mmr_rerank(cands, k=0)
    with pytest.raises(ValueError):
        mmr_rerank(cands, lam=0.0)


def test_mmr_composes_with_topk_search(spark, sf_dir):
    """End-to-end: retrieval candidates -> vector join -> MMR."""
    from pinecone_datasets_spark.operators.search import topk_search

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    docs = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("values"),
    )
    queries = docs.where(F.col("id") < 3).select(
        F.col("id").alias("query_id"), F.col("values").alias("vector")
    )
    hits = topk_search(
        docs, queries, metric="cosine", k=20, metadata_col=None
    ).select("query_id", "id", "score")
    cands = hits.join(docs, "id")
    out = mmr_rerank(cands, k=5, lam=0.6)
    rows = out.collect()
    assert len(rows) == 3 * 5
    # rank 1 is always the relevance argmax (the query itself)
    top = {r["query_id"]: r["id"] for r in rows if r["mmr_rank"] == 1}
    assert top == {0: 0, 1: 1, 2: 2}

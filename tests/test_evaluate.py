"""IR evaluation metrics (operators/evaluate.py)."""

from __future__ import annotations

import math

import pytest

from pinecone_datasets_spark.operators.evaluate import (
    macro_metrics,
    retrieval_metrics,
)


def _frames(spark):
    # q1: relevant {a (rel 2), b (rel 1), z (rel 1)}; retrieved a@1, x@2, b@3
    # q2: relevant {c}; retrieved y@1, c@2
    # q3: relevant {d}; never retrieved
    results = spark.createDataFrame(
        [
            ("q1", "a", 1), ("q1", "x", 2), ("q1", "b", 3),
            ("q2", "y", 1), ("q2", "c", 2),
        ],
        "query_id string, id string, rank int",
    )
    qrels = spark.createDataFrame(
        [
            ("q1", "a", 2), ("q1", "b", 1), ("q1", "z", 1),
            ("q2", "c", 1),
            ("q3", "d", 1),
        ],
        "query_id string, id string, rel int",
    )
    return results, qrels


def test_per_query_known_answers(spark):
    results, qrels = _frames(spark)
    out = {r.query_id: r for r in retrieval_metrics(results, qrels, k=3).collect()}
    assert set(out) == {"q1", "q2", "q3"}

    q1 = out["q1"]
    assert q1.n_relevant == 3 and q1.hits_at_k == 2
    assert abs(q1.recall_at_k - 2 / 3) < 1e-12
    assert abs(q1.precision_at_k - 2 / 3) < 1e-12
    assert abs(q1.mrr_at_k - 1.0) < 1e-12
    dcg = (2**2 - 1) / math.log2(2) + (2**1 - 1) / math.log2(4)
    idcg = (2**2 - 1) / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
    assert abs(q1.ndcg_at_k - dcg / idcg) < 1e-12

    q2 = out["q2"]
    assert q2.hits_at_k == 1 and abs(q2.mrr_at_k - 0.5) < 1e-12
    assert abs(q2.ndcg_at_k - (1 / math.log2(3)) / 1.0) < 1e-12

    q3 = out["q3"]  # judged but never retrieved: all-zero row, not absent
    assert q3.hits_at_k == 0 and q3.recall_at_k == 0.0
    assert q3.mrr_at_k == 0.0 and q3.ndcg_at_k == 0.0


def test_rank_truncation_and_duplicate_judgments(spark):
    results, qrels = _frames(spark)
    # k=2 drops q1's b@3 hit
    out = {r.query_id: r for r in retrieval_metrics(results, qrels, k=2).collect()}
    assert out["q1"].hits_at_k == 1
    assert abs(out["q1"].precision_at_k - 0.5) < 1e-12
    # duplicate judgment keeps max rel: adding (q2, c, 3) raises the gain
    dup = qrels.union(
        qrels.sparkSession.createDataFrame(
            [("q2", "c", 3)], "query_id string, id string, rel int"
        )
    )
    out2 = {r.query_id: r for r in retrieval_metrics(results, dup, k=2).collect()}
    assert out2["q2"].n_relevant == 1
    assert abs(out2["q2"].ndcg_at_k - (7 / math.log2(3)) / 7.0) < 1e-12


def test_perfect_retrieval_is_all_ones(spark):
    _, qrels = _frames(spark)
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("query_id").orderBy(F.desc("rel"), "id")
    perfect = qrels.select(
        "query_id", "id", F.row_number().over(w).alias("rank")
    )
    out = retrieval_metrics(perfect, qrels, k=3).collect()
    for r in out:
        assert r.recall_at_k == 1.0 and r.mrr_at_k == 1.0
        assert abs(r.ndcg_at_k - 1.0) < 1e-12


def test_macro_averages(spark):
    results, qrels = _frames(spark)
    per_q = retrieval_metrics(results, qrels, k=3)
    m = macro_metrics(per_q).first()
    rows = {r.query_id: r for r in per_q.collect()}
    assert m.n_queries == 3
    exp = sum(r.recall_at_k for r in rows.values()) / 3
    assert abs(m.recall_at_k - exp) < 1e-12


def test_bad_k(spark):
    results, qrels = _frames(spark)
    with pytest.raises(ValueError):
        retrieval_metrics(results, qrels, k=0)

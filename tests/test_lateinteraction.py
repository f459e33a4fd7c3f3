"""ColBERT-style MaxSim late interaction (operators/lateinteraction.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pinecone_datasets_spark.operators.lateinteraction import (
    maxsim_score,
    maxsim_topk,
    maxsim_topk_arrow,
)


def _docs(spark):
    # 2-d token vectors, hand-checkable maxima.
    rows = [
        ("d1", [[1.0, 0.0], [0.0, 1.0]]),          # covers both axes
        ("d2", [[1.0, 0.0], [1.0, 0.0]]),          # only x
        ("d3", [[0.5, 0.5]]),                      # single middling token
        ("d4", []),                                # empty -> score 0
    ]
    return spark.createDataFrame(
        rows, "id string, token_vecs array<array<double>>"
    )


def test_maxsim_known_answer(spark):
    docs = _docs(spark)
    q = spark.createDataFrame(
        [("q1", [[1.0, 0.0], [0.0, 1.0]])],
        "query_id string, token_vecs array<array<double>>",
    )
    out = {r.id: r.score for r in maxsim_topk(docs, q, k=4).collect()}
    # d1: max_x=1 + max_y=1 = 2 ; d2: 1 + 0 = 1 ; d3: .5+.5 = 1 ; d4: 0
    assert out["d1"] == pytest.approx(2.0)
    assert out["d2"] == pytest.approx(1.0)
    assert out["d3"] == pytest.approx(1.0)
    assert out["d4"] == pytest.approx(0.0)
    ranks = {
        r.id: r.rank
        for r in maxsim_topk(docs, q, k=4).collect()
    }
    assert ranks["d1"] == 1
    assert ranks["d2"] == 2 and ranks["d3"] == 3  # tie broken on id


def test_phrase_evidence_beats_pooling(spark):
    # the motivating case: mean-pooled vectors of d_good and d_bad are
    # IDENTICAL, but MaxSim separates them because per-token structure
    # survives.
    docs = spark.createDataFrame(
        [
            ("d_good", [[1.0, 0.0], [0.0, 1.0]]),
            ("d_bad", [[0.5, 0.5], [0.5, 0.5]]),
        ],
        "id string, token_vecs array<array<double>>",
    )
    q = spark.createDataFrame(
        [("q", [[1.0, 0.0], [0.0, 1.0]])],
        "query_id string, token_vecs array<array<double>>",
    )
    out = {r.id: r.score for r in maxsim_topk(docs, q, k=2).collect()}
    assert out["d_good"] > out["d_bad"]


def test_arrow_path_matches_expression_path(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # synthesize 8 tokens of 8 dims by slicing the 64-dim embedding
    docs = emb.select(
        F.col("vec_id").cast("string").alias("id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(7)),
            lambda i: F.slice(
                F.col("embedding").cast("array<double>"), i * 8 + 1, 8
            ),
        ).alias("token_vecs"),
    )
    qrows = docs.where(F.col("id").cast("long") < 3).collect()
    queries = spark.createDataFrame(qrows, docs.schema).select(
        F.col("id").alias("query_id"), "token_vecs"
    )
    expr = maxsim_topk(docs, queries, k=5)
    arrow = maxsim_topk_arrow(
        docs,
        [r.token_vecs for r in qrows],
        [r.id for r in qrows],
        k=5,
        dim=8,
    )
    a = sorted(
        (r.query_id, r.id, round(r.score, 9), r.rank) for r in expr.collect()
    )
    b = sorted(
        (r.query_id, r.id, round(r.score, 9), r.rank) for r in arrow.collect()
    )
    assert a == b
    # self-match sanity: a doc queried with its own tokens is rank 1
    top1 = {r.query_id: r.id for r in expr.collect() if r.rank == 1}
    assert all(qid == did for qid, did in top1.items())


def test_arrow_path_empty_query_matrices(spark):
    # Zero-token queries must score 0 everywhere (the expression path's
    # coalesce contract) — including MIDDLE and LAST positions, which
    # used to corrupt the reduceat segment boundaries (middle: stole the
    # next query's first-token max; last: indexed past the end).
    docs = _docs(spark)
    qmats = [
        [[1.0, 0.0], [0.0, 1.0]],  # normal
        [],                        # middle empty
        [[0.0, 1.0]],              # normal
        [],                        # LAST empty (the IndexError case)
    ]
    qids = ["qa", "qempty1", "qb", "qempty2"]
    out = maxsim_topk_arrow(docs, qmats, qids, k=4, dim=2)
    got = {(r.query_id, r.id): r.score for r in out.collect()}
    assert got[("qa", "d1")] == pytest.approx(2.0)
    assert got[("qb", "d1")] == pytest.approx(1.0)
    assert got[("qb", "d2")] == pytest.approx(0.0)
    for qid in ("qempty1", "qempty2"):
        for did in ("d1", "d2", "d3", "d4"):
            assert got[(qid, did)] == 0.0
    # equivalence with the expression path on the same inputs
    q = spark.createDataFrame(
        list(zip(qids, qmats)),
        "query_id string, token_vecs array<array<double>>",
    )
    expr = {
        (r.query_id, r.id): r.score
        for r in maxsim_topk(docs, q, k=4).collect()
    }
    assert {k: round(v, 9) for k, v in got.items()} == {
        k: round(v, 9) for k, v in expr.items()
    }


def test_arrow_path_all_queries_empty(spark):
    docs = _docs(spark)
    out = maxsim_topk_arrow(docs, [[], []], ["q1", "q2"], k=2, dim=2)
    rows = out.collect()
    assert len(rows) == 4  # 2 queries x top-2, all score 0
    assert all(r.score == 0.0 for r in rows)


def test_empty_docs_and_bad_args(spark):
    docs = _docs(spark)
    q = spark.createDataFrame(
        [("q1", [[1.0, 0.0]])],
        "query_id string, token_vecs array<array<double>>",
    )
    with pytest.raises(ValueError):
        maxsim_topk(docs, q, k=0)
    with pytest.raises(ValueError):
        maxsim_topk_arrow(docs, [[[1.0, 0.0]]], ["a", "b"], k=1, dim=2)
    # empty-token docs appear with score 0, never crash
    out = maxsim_topk(docs, q, k=4).where(F.col("id") == "d4").collect()
    assert len(out) == 1 and out[0].score == 0.0

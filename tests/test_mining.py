"""Hard-negative mining (operators/mining.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pinecone_datasets_spark.operators.mining import mine_hard_negatives


def _fixture(spark):
    # 2-d vectors with hand-checkable cosines. Query q1 = (1, 0).
    docs = spark.createDataFrame(
        [
            ("d1", [1.0, 0.0]),     # cos 1.0   (labeled positive)
            ("d2", [1.0, 0.1]),     # cos .995  (hardest negative)
            ("d3", [1.0, 0.3]),     # cos .958
            ("d4", [0.0, 1.0]),     # cos 0
            ("d5", [1.0, 1.0]),     # cos .707  (labeled positive)
        ],
        "id string, values array<double>",
    )
    queries = spark.createDataFrame(
        [("q1", [1.0, 0.0])], "query_id string, vector array<double>"
    )
    positives = spark.createDataFrame(
        [("q1", "d1"), ("q1", "d5")], "query_id string, id string"
    )
    return docs, queries, positives


def test_excludes_positives_and_ranks(spark):
    docs, queries, positives = _fixture(spark)
    out = mine_hard_negatives(docs, queries, positives, k=2).collect()
    got = [(r.id, r.neg_rank) for r in sorted(out, key=lambda r: r.neg_rank)]
    assert got == [("d2", 1), ("d3", 2)]
    assert all(r.query_id == "q1" for r in out)


def test_margin_against_hardest_positive(spark):
    docs, queries, positives = _fixture(spark)
    out = {r.id: r for r in mine_hard_negatives(docs, queries, positives, k=3).collect()}
    # hardest positive is d5 at cos .707
    exp_pos = 1.0 / math.sqrt(2.0)
    for r in out.values():
        assert abs(r.pos_score_min - exp_pos) < 1e-9
    # d2 scores above the hardest positive -> negative margin (retriever
    # failure, the informative case)
    assert out["d2"].margin < 0
    assert out["d4"].margin > 0
    for r in out.values():
        assert abs(r.margin - (r.pos_score_min - r.score)) < 1e-12


def test_positive_outside_topk_still_anchors_margin(spark):
    # d5 is the worst-scoring item; with k=1, overfetch=1 the candidate
    # list never contains it, but its exact score must still set the floor.
    docs, queries, positives = _fixture(spark)
    out = mine_hard_negatives(docs, queries, positives, k=1, overfetch=1).collect()
    assert len(out) == 1 and out[0].id == "d2"
    assert abs(out[0].pos_score_min - 1.0 / math.sqrt(2.0)) < 1e-9


def test_query_without_positives_gets_null_margin(spark):
    docs, queries, _ = _fixture(spark)
    empty = spark.createDataFrame([], "query_id string, id string")
    out = mine_hard_negatives(docs, queries, empty, k=2).collect()
    assert [r.id for r in sorted(out, key=lambda r: r.neg_rank)] == ["d1", "d2"]
    assert all(r.pos_score_min is None and r.margin is None for r in out)
    # unlabeled, not drifted: both counts are 0
    assert all(r.n_labeled == 0 and r.n_positives_scored == 0 for r in out)


def test_missing_positive_distinguishable_from_unlabeled(spark):
    # All of q1's labeled positives point at doc ids absent from the
    # corpus (label/corpus drift). pos/margin are NULL either way; the
    # counts expose WHY: n_labeled > 0 but n_positives_scored == 0.
    docs, queries, _ = _fixture(spark)
    ghosts = spark.createDataFrame(
        [("q1", "gone1"), ("q1", "gone2")], "query_id string, id string"
    )
    out = mine_hard_negatives(docs, queries, ghosts, k=2).collect()
    assert all(r.pos_score_min is None and r.margin is None for r in out)
    assert all(r.n_labeled == 2 and r.n_positives_scored == 0 for r in out)
    # partial drift: one ghost, one real -> floor anchored by the real one
    mixed = spark.createDataFrame(
        [("q1", "gone1"), ("q1", "d5")], "query_id string, id string"
    )
    out = mine_hard_negatives(docs, queries, mixed, k=2).collect()
    assert all(r.n_labeled == 2 and r.n_positives_scored == 1 for r in out)
    assert all(abs(r.pos_score_min - 1.0 / math.sqrt(2.0)) < 1e-9 for r in out)


def test_precomputed_candidates_path(spark):
    docs, queries, positives = _fixture(spark)
    cands = spark.createDataFrame(
        [("q1", "d3", 0.9), ("q1", "d1", 1.0), ("q1", "d4", 0.1)],
        "query_id string, id string, score double",
    )
    out = mine_hard_negatives(
        docs, queries, positives, k=5, candidates=cands
    ).collect()
    assert [(r.id, r.neg_rank) for r in sorted(out, key=lambda r: r.neg_rank)] == [
        ("d3", 1),
        ("d4", 2),
    ]


def test_bad_args(spark):
    docs, queries, positives = _fixture(spark)
    with pytest.raises(ValueError):
        mine_hard_negatives(docs, queries, positives, k=0)
    with pytest.raises(ValueError):
        mine_hard_negatives(docs, queries, positives, k=1, overfetch=-1)


def test_fixture_scale_smoke(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    docs = emb.select(
        F.col("vec_id").cast("string").alias("id"),
        F.col("embedding").cast("array<double>").alias("values"),
    )
    queries = docs.where(F.col("id").cast("long") < 5).select(
        F.col("id").alias("query_id"), F.col("values").alias("vector")
    )
    # self-pair is each query's only positive: mined negatives must
    # exclude self and margin must be 1.0 - score (cosine self = 1).
    positives = queries.select(
        "query_id", F.col("query_id").alias("id")
    )
    out = mine_hard_negatives(docs, queries, positives, k=3).collect()
    assert len(out) == 15
    assert all(r.id != r.query_id for r in out)
    assert all(abs(r.pos_score_min - 1.0) < 1e-9 for r in out)
    assert all(r.margin > 0 for r in out)

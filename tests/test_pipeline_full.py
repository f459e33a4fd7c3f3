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


def test_full_chain_crawl_pre_stages(spark):
    """r7 pre-stages compose: URL dedup, C4 sentence-span removal (so
    span-stripped copies exact-dedup), and line gates."""
    from pinecone_datasets_spark.operators.pipeline import (
        curate_corpus_full,
    )

    shared = (
        "Alpha beta gamma one. Delta epsilon zeta two. Eta theta iota three."
    )
    base1 = (
        "Original body one with plenty of distinct words in this text. "
        "More unique prose follows in a second sentence here. "
        "And a third original sentence closes it out."
    )
    base3 = (
        "Completely different body three with its own vocabulary set. "
        "Nothing here repeats the first document at all. "
        "Its closing sentence is also entirely its own."
    )
    rows = [
        # 1 and 2: same canonical URL (variants) — URL dedup keeps 1,
        # so doc 2's copy of `shared` never reaches the span counter
        (1, f"{base1} {shared}", "https://a.com/x?b=2&a=1"),
        (2, f"{base1} {shared}", "HTTPS://A.com:443/x/?a=1&b=2&utm_source=m"),
        # 3: different body, same boilerplate span — the span dies in
        # BOTH 1 and 3 (symmetric), the unique bodies survive
        (3, f"{base3} {shared}", "https://b.com/y"),
        # 4: bullet spam — dies at the line gates
        (4, "- one\n- two\n- three\n- four\n- five\n- six", "https://c.com/z"),
        # 5: clean unique doc — survives everything untouched
        (5, "Unique survivor five. Plain prose only here.", "https://d.com/w"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, url string")
    out = curate_corpus_full(
        df,
        min_quality=0.0,
        min_words=1,
        url_col="url",
        sentence_span_n=3,
        line_gates={"max_bullet_line_frac": 0.5},
    ).cache()
    kept = sorted(r["doc_id"] for r in out.collect())
    assert kept == [1, 3, 5]
    texts = {r["doc_id"]: r["text"] for r in out.collect()}
    # the shared boilerplate span is gone from both carriers; the
    # unique bodies (and doc 5) are intact
    for d in (1, 3):
        assert "Alpha beta gamma one." not in texts[d]
    assert texts[1].startswith("Original body one")
    assert texts[3].startswith("Completely different body three")
    assert texts[5] == rows[4][1]
    with pytest.raises(ValueError):
        curate_corpus_full(df, line_gates={"nope": 1})


def test_line_gates_see_pre_rewrite_text(spark):
    """ADVICE r7: line gates must run on the ORIGINAL text, before the
    sentence-span rewrite collapses newlines — post-rewrite, a doc
    that is pure duplicated-line spam reads as one long line with
    duplicate_line_fraction ~0 and would sail through the gate."""
    from pinecone_datasets_spark.operators.pipeline import (
        curate_corpus_full,
    )

    spam_line = "Click here to subscribe to our newsletter now."
    spam = "\n".join([spam_line] * 6 + ["One unique closing thought here."])
    clean = (
        "Plain paragraph of ordinary prose for the survivor doc.\n"
        "A second distinct line keeps its duplicate fraction at zero."
    )
    df = spark.createDataFrame(
        [(1, spam), (2, clean)], "doc_id long, text string"
    )
    out = curate_corpus_full(
        df,
        min_quality=0.0,
        min_words=1,
        sentence_span_n=3,
        line_gates={"max_dup_line_frac": 0.3},
    )
    assert sorted(r["doc_id"] for r in out.collect()) == [2]


def test_mixture_weights_without_budget_fails_upfront(spark):
    """r11 review: weights-without-budget crashed on float(None) deep
    inside mixing, AFTER the full curation scan — it must fail before
    any Spark work."""
    import pytest as _pytest

    from pinecone_datasets_spark.operators.pipeline import curate_corpus_full

    df = spark.createDataFrame(
        [(1, "some text here", "s0", 10)],
        "doc_id long, text string, source string, n_chars long",
    )
    with _pytest.raises(ValueError, match="mixture_budget"):
        curate_corpus_full(df, mixture_weights={"s0": 1.0})


def test_neardup_max_df_is_plumbed_through(spark):
    """r11 review: the comment claimed ngram_jaccard_pairs takes
    max_df but nothing passed it; the hot-shingle cap must now be
    settable from the pipeline entry points."""
    from pinecone_datasets_spark.operators.pipeline import curation_funnel

    text = "the quick brown fox jumps over the lazy dog again and again ok"
    df = spark.createDataFrame(
        [(i, text + f" tail{i}") for i in range(6)],
        "doc_id long, text string",
    )
    # without the cap, near-identical texts get dropped as near-dups
    base = curation_funnel(
        df, min_words=3, min_quality=0.0, neardup_jaccard=0.2,
    ).collect()[0]
    assert base["n_neardup"] < base["n_exact_dedup"]
    # max_df=1 drops every shared shingle -> no near-dup candidates
    capped = curation_funnel(
        df, min_words=3, min_quality=0.0,
        neardup_jaccard=0.2, neardup_max_df=1,
    ).collect()[0]
    assert capped["n_neardup"] == capped["n_exact_dedup"] == 6

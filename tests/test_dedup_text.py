"""Dedup + text-analysis operators against the driver documents fixture."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pinecone_datasets_spark.functions.text import (
    detect_language,
    doc_fingerprint,
    quality_score,
    token_count,
    word_count,
)
from pinecone_datasets_spark.operators.dedup import (
    char_shingles,
    embedding_neardup_pairs,
    exact_dedup,
    exact_dup_groups,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash64,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


@pytest.fixture(scope="module")
def dup_docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "The  Quick Brown  Fox jumps over the lazy dog"),  # norm dup
        (4, "the quick brown fox leaps over the lazy dog"),  # near dup
        (5, "completely different text about spark engines"),
    ]
    return spark.createDataFrame(rows, schema="doc_id long, text string")


def test_exact_dedup(dup_docs):
    out = exact_dedup(dup_docs)
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == [1, 4, 5]


def test_exact_dup_groups(dup_docs):
    groups = exact_dup_groups(dup_docs).collect()
    assert len(groups) == 1
    assert groups[0]["n_members"] == 3
    assert groups[0]["representative"] == 1


def test_shingles(spark):
    df = spark.createDataFrame([("abcdef",)], schema="t string")
    out = df.select(char_shingles(F.col("t"), 3).alias("s")).collect()[0]["s"]
    assert out == ["abc", "bcd", "cde", "def"]


def test_minhash_similar_docs_share_bands(dup_docs):
    cands = minhash_lsh_candidates(
        dup_docs, num_hashes=32, bands=16, shingle_k=3
    )
    pairs = {(r["id_a"], r["id_b"]) for r in cands.collect()}
    assert (1, 2) in pairs  # exact dups always collide
    assert (1, 3) in pairs  # normalization dups collide
    assert (1, 4) in pairs  # near dup should collide at 16 bands
    assert (1, 5) not in pairs


def test_minhash_md5_portable_variant(dup_docs):
    sigs = minhash_signatures(
        dup_docs, num_hashes=8, shingle_k=3, hash_fn="md5"
    ).collect()
    by_id = {r["doc_id"]: r["signature"] for r in sigs}
    assert by_id[1] == by_id[2]
    assert by_id[1] != by_id[5]


def test_ngram_jaccard(dup_docs):
    out = ngram_jaccard_pairs(dup_docs, threshold=0.5, shingle_k=3)
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out.collect()}
    assert pairs[(1, 2)] == 1.0
    assert (1, 4) in pairs and pairs[(1, 4)] < 1.0
    assert (1, 5) not in pairs


def test_ngram_jaccard_max_df_caps_hot_shingles(spark):
    """A stopword-ish shingle shared by every doc explodes the self-join;
    max_df drops it from the inverted index, shrinking the candidate set,
    while a cap above every document frequency changes nothing."""
    rows = [
        # all docs share 'zzz' (the hot shingle); only 1/2 truly overlap
        (1, "zzz alpha beta gamma delta"),
        (2, "zzz alpha beta gamma delta"),
        (3, "zzz totally different words here"),
        (4, "zzz unrelated content again folks"),
        (5, "zzz more nothing in common text"),
    ]
    docs = spark.createDataFrame(rows, schema="doc_id long, text string")
    uncapped = ngram_jaccard_pairs(docs, threshold=0.0, shingle_k=3)
    # cap above any shingle's DF: identical results
    slack = ngram_jaccard_pairs(docs, threshold=0.0, shingle_k=3, max_df=100)
    key = lambda r: (r["id_a"], r["id_b"])  # noqa: E731
    assert sorted(map(key, uncapped.collect())) == sorted(
        map(key, slack.collect())
    )
    # tight cap: the df=5 hot shingles drop out, so pairs that only share
    # hot shingles disappear while the real near-dup pair survives
    capped = ngram_jaccard_pairs(docs, threshold=0.5, shingle_k=3, max_df=4)
    capped_pairs = {key(r) for r in capped.collect()}
    assert (1, 2) in capped_pairs
    n_uncapped = uncapped.count()
    n_capped = ngram_jaccard_pairs(
        docs, threshold=0.0, shingle_k=3, max_df=4
    ).count()
    assert n_capped < n_uncapped


def test_minhash_rolling_variant_bands(dup_docs):
    # rolling numeric k-gram hash must reproduce the same LSH collision
    # behavior as the string-shingle path on the fixture corpus
    cands = minhash_lsh_candidates(
        dup_docs, num_hashes=32, bands=16, shingle_k=3, hash_fn="rolling"
    )
    pairs = {(r["id_a"], r["id_b"]) for r in cands.collect()}
    assert (1, 2) in pairs
    assert (1, 3) in pairs
    assert (1, 4) in pairs
    assert (1, 5) not in pairs


def test_rolling_kgram_injective_on_ascii(spark):
    # base-257 polynomial over codepoints < 257 is injective per k-gram:
    # distinct window-hash count == distinct shingle count
    from pinecone_datasets_spark.operators.dedup import (
        _norm_shingled,
        _rolling_hashed,
    )

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        schema="doc_id long, text string",
    )
    n_h = _rolling_hashed(df, "text", "doc_id", 5).distinct().count()
    n_s = _norm_shingled(df, "text", "doc_id", 5).distinct().count()
    assert n_h == n_s


def test_minhash_bands_must_divide_num_hashes(dup_docs):
    with pytest.raises(ValueError, match="must divide"):
        minhash_lsh_candidates(dup_docs, num_hashes=32, bands=5)


def test_minhash_oph_variant(dup_docs):
    # one-permutation hashing: full-length, null-free, deterministic
    # signatures; exact/normalization dups share every band, near dups
    # collide at 16 bands, dissimilar docs don't
    sigs = {
        r["doc_id"]: r["signature"]
        for r in minhash_signatures(
            dup_docs, num_hashes=32, shingle_k=3, hash_fn="oph"
        ).collect()
    }
    assert all(len(s) == 32 and None not in s for s in sigs.values())
    assert sigs[1] == sigs[2]  # exact dup -> identical signature
    cands = minhash_lsh_candidates(
        dup_docs, num_hashes=32, bands=16, shingle_k=3, hash_fn="oph"
    )
    pairs = {(r["id_a"], r["id_b"]) for r in cands.collect()}
    assert (1, 2) in pairs
    assert (1, 3) in pairs
    assert (1, 4) in pairs
    assert (1, 5) not in pairs


def test_minhash_oph_densifies_short_docs(spark):
    # a doc with fewer shingles than bins must still get a full signature
    df = spark.createDataFrame(
        [(1, "abcd")], schema="doc_id long, text string"
    )
    (sig,) = minhash_signatures(
        df, num_hashes=16, shingle_k=3, hash_fn="oph"
    ).collect()
    assert len(sig["signature"]) == 16
    assert None not in sig["signature"]


def test_minhash_oph_wide_and_two_step_forms_identical(
    dup_docs, monkeypatch
):
    """Above _OPH_WIDE_AGG_MAX_BINS the operator switches from the
    single-groupBy conditional-MIN aggregate to the two-step (doc, bin)
    form (codegen row-width limit, r13 ADVICE) — the two forms must
    produce bit-identical signatures. num_hashes=128 takes the two-step
    branch by default; forcing the cap up replays the wide branch."""
    from pinecone_datasets_spark.operators import dedup as d

    def sigs():
        return {
            r["doc_id"]: list(r["signature"])
            for r in minhash_signatures(
                dup_docs, num_hashes=128, shingle_k=3, hash_fn="oph"
            ).collect()
        }

    assert d._OPH_WIDE_AGG_MAX_BINS < 128
    two_step = sigs()
    monkeypatch.setattr(d, "_OPH_WIDE_AGG_MAX_BINS", 1024)
    wide = sigs()
    assert wide == two_step
    assert all(
        len(s) == 128 and None not in s for s in two_step.values()
    )


def test_simhash_md5_portable_variant(dup_docs):
    out = {
        r["doc_id"]: r["simhash"]
        for r in simhash64(dup_docs, hash_fn="md5").collect()
    }
    assert out[1] == out[2]  # exact dups identical
    assert out[1] != out[5]  # unrelated docs differ


def test_simhash_near_dups_close(dup_docs):
    out = {r["doc_id"]: r["simhash"] for r in simhash64(dup_docs).collect()}
    assert out[1] == out[2]

    def hamming(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert hamming(out[1], out[4]) < hamming(out[1], out[5])


def test_embedding_neardup(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),
        (3, [0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, schema="vec_id long, embedding array<float>")
    out = embedding_neardup_pairs(df, threshold=0.99).collect()
    assert [(r["id_a"], r["id_b"]) for r in out] == [(1, 2)]


def test_embedding_lsh_candidates_recall(spark, sf_dir):
    """LSH candidates must contain the truly-similar pairs the exact
    cross-join finds (here: all pairs >= 0.35 on the driver embeddings)."""
    from pinecone_datasets_spark.operators.dedup import (
        embedding_lsh_candidate_pairs,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # the driver embeddings are near-random (max pairwise cosine ~0.51),
    # the adversarial case for LSH: measure recall on the strongest pairs
    # (>= 0.4) with wide-band settings
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_pairs(emb, threshold=0.4).collect()
    }
    cands = {
        (r["id_a"], r["id_b"])
        for r in embedding_lsh_candidate_pairs(
            emb, bands=16, bits=4
        ).collect()
    }
    assert exact, "fixture should contain similar pairs"
    recall = len(exact & cands) / len(exact)
    assert recall >= 0.7, (recall, len(exact), len(cands))
    # and the candidate set must prune at least some of the pair matrix
    # (real corpora cluster; random data is the worst case)
    n = emb.count()
    assert len(cands) < n * (n - 1) / 2 * 0.8


def test_rolling_hash_fingerprint(spark):
    from pinecone_datasets_spark.functions.text import (
        rolling_hash_fingerprint,
    )

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox"),
            (2, "the quick brown fox"),
            (3, "fox brown quick the"),  # same tokens, different order
        ],
        schema="doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["fp"]
        for r in df.select(
            "doc_id", rolling_hash_fingerprint("text").alias("fp")
        ).collect()
    }
    assert out[1] == out[2]
    assert out[1] != out[3]  # order-sensitive
    assert 0 <= out[1] < 2147483647


def test_text_functions(spark):
    df = spark.createDataFrame(
        [("the quick brown fox is in the yard",)], schema="text string"
    )
    row = df.select(
        word_count("text").alias("wc"),
        token_count("text").alias("tc"),
        doc_fingerprint("text").alias("fp"),
        quality_score("text").alias("q"),
    ).collect()[0]
    assert row["wc"] == 8
    assert row["tc"] >= 8
    assert len(row["fp"]) == 32
    assert 0.0 <= row["q"] <= 1.0


def test_word_count_edge_cases(spark):
    df = spark.createDataFrame([("",), ("  ",), ("one",)], schema="text string")
    out = [r[0] for r in df.select(word_count("text")).collect()]
    assert out == [0, 0, 1]


def test_detect_language(spark):
    df = spark.createDataFrame(
        [
            ("the cat is on the mat and it is happy",),
            ("der hund ist nicht in das haus und",),
            ("el perro es un animal y que los gatos",),
            ("le chat est une bete et les chiens des",),
            ("zzz qqq xxx",),
        ],
        schema="text string",
    )
    out = [r[0] for r in df.select(detect_language("text")).collect()]
    assert out == ["en", "de", "es", "fr", "unknown"]


def test_corpus_stats_runs(docs):
    out = (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.avg("n_chars").alias("avg_chars"),
        )
        .collect()
    )
    assert len(out) >= 1


def test_incremental_dedup(spark):
    from pinecone_datasets_spark.operators.dedup import incremental_dedup

    corpus = spark.createDataFrame(
        [(1, "old news today"), (2, "standing corpus text")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, "Old   NEWS today"),   # dup of corpus doc 1 (normalized)
            (11, "fresh content one"),
            (12, "fresh content one"),  # in-batch dup of 11
            (13, "fresh content two"),
        ],
        "doc_id long, text string",
    )
    kept = sorted(
        r["doc_id"] for r in incremental_dedup(batch, corpus).collect()
    )
    assert kept == [11, 13]


def test_incremental_dedup_corpus_not_shuffled(spark):
    from pinecone_datasets_spark.operators.dedup import incremental_dedup

    corpus = spark.createDataFrame(
        [(i, f"text {i}") for i in range(100)], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(1000, "text 7"), (1001, "brand new")], "doc_id long, text string"
    )
    plan = (
        incremental_dedup(batch, corpus)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# Persisted MinHash index: incremental near-dup
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def mh_index(spark, tmp_path_factory):
    from pinecone_datasets_spark.operators.dedup import build_minhash_index

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = docs.where(F.col("doc_id") < 400)
    path = str(tmp_path_factory.mktemp("mh_index")) + "/idx"
    build_minhash_index(corpus, path, num_hashes=32, bands=8)
    return path, corpus


def test_mh_index_finds_planted_copies(spark, mh_index):
    from pinecone_datasets_spark.operators.dedup import minhash_index_neardup

    path, corpus = mh_index
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    batch = (
        docs.where((F.col("doc_id") % 8 == 0) & (F.col("doc_id") < 400))
        .select((F.col("doc_id") + 10_000).alias("batch_id"), "text")
    )
    out = minhash_index_neardup(spark, path, batch, threshold=0.99)
    got = {(r.batch_id, r.index_id) for r in out.collect()
           if r.est_jaccard == 1.0}
    planted = {(d + 10_000, d) for d in range(0, 400, 8)}
    assert planted <= got  # every exact copy must verify at 1.0


def test_mh_index_matches_inplan_candidates(spark, mh_index):
    """Cross pairs from the index probe == the in-plan banded self-join
    restricted to (batch x corpus) — same hashes, same banding."""
    from pinecone_datasets_spark.operators.dedup import (
        minhash_index_neardup,
        minhash_lsh_candidates,
    )

    path, corpus = mh_index
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    batch = docs.where(F.col("doc_id") >= 400).select(
        (F.col("doc_id") + 10_000).alias("batch_id"), "text"
    )
    via_index = {
        (r.batch_id - 10_000, r.index_id)
        for r in minhash_index_neardup(
            spark, path, batch, threshold=0.0
        ).collect()
    }
    # in-plan twin over corpus + batch (batch re-tagged into id space)
    union = corpus.select("doc_id", "text").unionByName(
        batch.select(
            (F.col("batch_id") - 10_000 + 100_000).alias("doc_id"), "text"
        )
    )
    cands = minhash_lsh_candidates(
        union, num_hashes=32, bands=8, hash_fn="xxhash64"
    )
    cross = {
        (max(r.id_a, r.id_b) - 100_000, min(r.id_a, r.id_b))
        for r in cands.collect()
        if (r.id_a >= 100_000) != (r.id_b >= 100_000)
    }
    assert via_index == cross


def test_mh_index_est_jaccard_matches_signature_agreement(spark, mh_index):
    from pinecone_datasets_spark.operators.dedup import (
        minhash_index_neardup,
        minhash_signatures,
    )

    path, corpus = mh_index
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    batch = docs.where(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 10_000).alias("batch_id"), "text"
    )
    out = minhash_index_neardup(spark, path, batch, threshold=0.0).collect()
    bs = {
        r.batch_id: r.signature
        for r in minhash_signatures(
            batch, "text", "batch_id", 32, 5, "xxhash64"
        ).collect()
    }
    cs = {
        r.doc_id: r.signature
        for r in minhash_signatures(
            corpus, "text", "doc_id", 32, 5, "xxhash64"
        ).collect()
    }
    for r in out:
        agree = sum(
            1 for a, b in zip(bs[r.batch_id], cs[r.index_id]) if a == b
        ) / 32.0
        assert r.est_jaccard == pytest.approx(round(agree, 6))


def test_mh_index_probe_pushes_literal_keys(spark, mh_index):
    from pinecone_datasets_spark.operators.dedup import minhash_index_neardup
    from pinecone_datasets_spark.plans.explain import formatted_plan

    path, corpus = mh_index
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    batch = docs.where(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 10_000).alias("batch_id"), "text"
    )
    plan = formatted_plan(
        minhash_index_neardup(spark, path, batch, threshold=0.5)
    )
    # small batch -> literal bb IN pushed into the band scan
    assert "PushedFilters: [In(bb" in plan or "bb#" in plan and "In(bb" in plan


def test_mh_index_threshold_guard(spark, mh_index):
    from pinecone_datasets_spark.operators.dedup import minhash_index_neardup

    path, corpus = mh_index
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    batch = docs.limit(1).select(F.col("doc_id").alias("batch_id"), "text")
    with pytest.raises(ValueError):
        minhash_index_neardup(spark, path, batch, threshold=1.5)


def test_mh_probe_session_releases_cache_per_batch(spark, mh_index):
    """minhash_probe_session (VERDICT r6 item 5): an N-batch ingest loop
    must not accumulate persisted batch-signature RDDs — storage returns
    to its pre-loop state after every with-block."""
    from pinecone_datasets_spark.operators.dedup import (
        minhash_probe_session,
    )

    path, corpus = mh_index
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    def n_cached() -> int:
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    base = n_cached()
    results = []
    for mod in (3, 5, 7):
        batch = docs.where(F.col("doc_id") % mod == 0).select(
            (F.col("doc_id") + 10_000).alias("batch_id"), "text"
        )
        with minhash_probe_session(
            spark, path, batch, threshold=0.99
        ) as dupes:
            inside = n_cached()
            results.append(dupes.count())
            assert inside >= base  # the batch cache is live in-block
        assert n_cached() == base, "probe cache leaked past the block"
    assert all(r >= 0 for r in results) and results[0] > 0


def test_mh_probe_session_same_rows_as_plain_probe(spark, mh_index):
    from pinecone_datasets_spark.operators.dedup import (
        minhash_index_neardup,
        minhash_probe_session,
    )

    path, corpus = mh_index
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    batch = docs.where(F.col("doc_id") % 8 == 0).select(
        (F.col("doc_id") + 10_000).alias("batch_id"), "text"
    )
    plain = sorted(
        map(tuple, minhash_index_neardup(
            spark, path, batch, threshold=0.5
        ).collect())
    )
    with minhash_probe_session(spark, path, batch, threshold=0.5) as out:
        managed = sorted(map(tuple, out.collect()))
    assert managed == plain


def test_rolling_shingles_large_k_no_ansi_overflow(spark):
    """shingle_k >= 8 overflowed the long accumulator under ANSI (the
    modulus was applied only after the full fold) and killed the job;
    per-step reduction is congruent mod p so k <= 7 hashes are
    unchanged while any k now works (r10 review, runtime-confirmed)."""
    from pinecone_datasets_spark.operators.dedup import (
        minhash_signatures,
    )

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again"),
         (2, "completely different words across this row \U0001F600")],
        "doc_id long, text string",
    )
    for k in (8, 12):
        out = minhash_signatures(
            df, num_hashes=4, shingle_k=k, hash_fn="rolling"
        ).collect()
        assert len(out) == 2 and all(len(r["signature"]) == 4 for r in out)


def test_sparse_dot_duplicate_indices_quarantine_and_signed_sparsify(spark):
    """r11 review: duplicate indices in the map side killed the whole
    job with DUPLICATED_MAP_KEY (now NULL-quarantined per row), and
    dense_to_sparse dropped NEGATIVE components (now magnitude-based),
    so signed embeddings sparsified to the wrong dot product."""
    from pyspark.sql import functions as F

    from pinecone_datasets_spark.functions.vector import (
        dense_to_sparse,
        sparse_dot_product,
    )

    dense = spark.createDataFrame(
        [(1, [0.5, -0.7, 0.2]), (2, [0.5, -0.7, 0.2])],
        "id long, v array<double>",
    )
    sp = dense.select("id", dense_to_sparse("v").alias("sv"))
    pair = (
        sp.where(F.col("id") == 1)
        .select(F.col("sv").alias("a"))
        .crossJoin(sp.where(F.col("id") == 2).select(F.col("sv").alias("b")))
    )
    got = pair.select(
        F.round(sparse_dot_product("a", "b"), 6).alias("d")
    ).collect()[0]["d"]
    assert got == round(0.25 + 0.49 + 0.04, 6), got  # negatives kept

    # malformed duplicate-index row -> NULL, not a dead job
    bad = spark.createDataFrame(
        [
            (
                ([3, 3], [1.0, 2.0]),
                ([3], [1.0]),
            )
        ],
        "a struct<indices: array<bigint>, values: array<float>>, "
        "b struct<indices: array<bigint>, values: array<float>>",
    )
    out = bad.select(sparse_dot_product("a", "b").alias("d")).collect()
    assert out[0]["d"] is None

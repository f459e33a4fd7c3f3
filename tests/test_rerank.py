"""MMR diversity re-ranking (operators/rerank.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pinecone_datasets_spark.operators.rerank import mmr_rerank


@pytest.fixture(scope="module")
def cands(spark):
    """Two near-identical high-relevance docs + one orthogonal
    mid-relevance doc, for two queries."""
    rows = []
    for q in (100, 200):
        rows += [
            (q, 1, 0.95, [1.0, 0.0, 0.0]),
            (q, 2, 0.94, [0.999, 0.01, 0.0]),  # near-dup of doc 1
            (q, 3, 0.60, [0.0, 1.0, 0.0]),     # orthogonal
            (q, 4, 0.10, [0.0, 0.0, 1.0]),
        ]
    return spark.createDataFrame(
        rows, "query_id long, id long, score double, values array<double>"
    )


def test_mmr_diversifies_over_pure_relevance(spark, cands):
    out = {
        q: [None] * 3
        for q in (100, 200)
    }
    for r in mmr_rerank(cands, k=3, lam=0.5).collect():
        out[r["query_id"]][r["mmr_rank"] - 1] = r["id"]
    # pure relevance would give [1, 2, 3]; MMR demotes the near-dup 2
    # (redundancy ~1 with doc 1) below BOTH orthogonal docs
    for q in (100, 200):
        assert out[q] == [1, 3, 4]


def test_mmr_lam_one_is_relevance_order(spark, cands):
    got = [
        (r["query_id"], r["mmr_rank"], r["id"])
        for r in mmr_rerank(cands, k=4, lam=1.0).collect()
    ]
    for q in (100, 200):
        ranks = sorted(
            [(rk, d) for (qq, rk, d) in got if qq == q]
        )
        assert [d for (_, d) in ranks] == [1, 2, 3, 4]


def test_mmr_known_answer_objective(spark, cands):
    """mmr_score replays the greedy objective by hand for one query."""
    import numpy as np

    lam = 0.5
    out = {
        r["mmr_rank"]: (r["id"], r["mmr_score"])
        for r in mmr_rerank(cands, k=3, lam=lam).collect()
        if r["query_id"] == 100
    }
    vecs = {
        1: np.array([1.0, 0.0, 0.0]),
        2: np.array([0.999, 0.01, 0.0]),
        3: np.array([0.0, 1.0, 0.0]),
        4: np.array([0.0, 0.0, 1.0]),
    }
    u = {d: v / np.linalg.norm(v) for d, v in vecs.items()}
    rel = {1: 0.95, 2: 0.94, 3: 0.60}
    # pick 1: no redundancy term
    assert out[1] == (1, pytest.approx(lam * rel[1], abs=1e-12))
    # pick 2: doc 3 wins with sim(3,1)=0
    m3 = lam * rel[3] - (1 - lam) * float(u[3] @ u[1])
    assert out[2] == (3, pytest.approx(m3, abs=1e-12))
    # pick 3: doc 4 (orthogonal to both picks, redundancy 0) beats the
    # near-dup doc 2 whose redundancy with doc 1 is ~1
    assert out[3] == (4, pytest.approx(lam * 0.10, abs=1e-12))


def test_mmr_determinism_and_bounds(spark, cands):
    a = sorted(
        map(tuple, mmr_rerank(cands, k=10, lam=0.7).collect())
    )
    b = sorted(
        map(tuple, mmr_rerank(cands.repartition(5), k=10, lam=0.7).collect())
    )
    assert a == b
    per_q = {}
    for row in a:
        per_q[row[0]] = per_q.get(row[0], 0) + 1
    assert all(v == 4 for v in per_q.values())  # min(k, n_cands)
    with pytest.raises(ValueError):
        mmr_rerank(cands, k=0)
    with pytest.raises(ValueError):
        mmr_rerank(cands, lam=0.0)


def test_mmr_normalize_false_equals_true_on_unit_vectors(spark, cands):
    """With pre-normalized vectors, raw-dot redundancy == cosine
    redundancy, so the two modes must select identically; mmr_score may
    differ only by float rounding of the explicit normalize step."""
    unit = cands.withColumn(
        "norm",
        F.sqrt(
            F.aggregate(
                F.transform("values", lambda x: x * x),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ),
    ).withColumn(
        "values", F.transform("values", lambda x: x / F.col("norm"))
    ).drop("norm")
    a = sorted(
        (r["query_id"], r["id"], r["mmr_rank"])
        for r in mmr_rerank(unit, k=3, lam=0.5, normalize=True).collect()
    )
    b = sorted(
        (r["query_id"], r["id"], r["mmr_rank"])
        for r in mmr_rerank(unit, k=3, lam=0.5, normalize=False).collect()
    )
    assert a == b


def test_mmr_normalize_false_dyadic_grid_is_exact(spark):
    """normalize=False on dyadic-grid vectors: mmr_score values are
    exact multiples of 2^-21 (lam=0.5 over 1/1024-grid dots) — the
    property the q32_q86 'mmr' oracle part relies on."""
    rows = [
        (1, d, float(5 - d) / 8.0, [float(v) / 1024.0 for v in vec])
        for d, vec in enumerate(
            [[513, -37, 200], [511, -37, 201], [-900, 44, 3], [2, 1023, -5]]
        )
    ]
    cands = spark.createDataFrame(
        rows, "query_id long, id long, score double, values array<double>"
    )
    out = mmr_rerank(cands, k=4, lam=0.5, normalize=False).collect()
    assert len(out) == 4
    for r in out:
        scaled = r["mmr_score"] * (1 << 21)
        assert scaled == int(scaled)  # exactly on the 2^-21 grid


def test_mmr_composes_with_topk_search(spark, sf_dir):
    """End-to-end: retrieval candidates -> vector join -> MMR."""
    from pinecone_datasets_spark.operators.search import topk_search

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    docs = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("values"),
    )
    queries = docs.where(F.col("id") < 3).select(
        F.col("id").alias("query_id"), F.col("values").alias("vector")
    )
    hits = topk_search(
        docs, queries, metric="cosine", k=20, metadata_col=None
    ).select("query_id", "id", "score")
    cands = hits.join(docs, "id")
    out = mmr_rerank(cands, k=5, lam=0.6)
    rows = out.collect()
    assert len(rows) == 3 * 5
    # rank 1 is always the relevance argmax (the query itself)
    top = {r["query_id"]: r["id"] for r in rows if r["mmr_rank"] == 1}
    assert top == {0: 0, 1: 1, 2: 2}


# ---------------------------------------------------------------------------
# crossencoder_rerank
# ---------------------------------------------------------------------------


def _xe_fixtures(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    queries = docs.where(F.col("doc_id") < 8).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("query_text")
    )
    # first-stage candidates: cross of 8 queries x 30 docs (id-adjacent)
    cand = queries.select("query_id").crossJoin(
        docs.select("doc_id").where(F.col("doc_id") < 30)
    )
    return docs, queries, cand


def test_xe_rerank_shapes_and_self_match(spark):
    from pinecone_datasets_spark.operators.rerank import crossencoder_rerank

    docs, queries, cand = _xe_fixtures(spark)
    out = crossencoder_rerank(cand, queries, docs, k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {r.query_id for r in queries.collect()}
    for qid, rows in by_q.items():
        assert [r.rank for r in sorted(rows, key=lambda x: x.rank)] == [1, 2, 3, 4, 5]
        scores = [r.xe_score for r in sorted(rows, key=lambda x: x.rank)]
        assert scores == sorted(scores, reverse=True)
        # query IS a document (<30): a perfect-overlap candidate exists,
        # so rank 1 must carry full overlap (the synthetic corpus shares
        # vocabulary, so supersets tie the self-doc — rank-1 identity is
        # pinned by test_xe_rerank_self_match_unique_vocab instead)
        if qid < 30:
            assert scores[0] >= 1.0


def test_xe_rerank_self_match_unique_vocab(spark):
    from pinecone_datasets_spark.operators.rerank import crossencoder_rerank

    # disjoint vocabularies: only the self-doc overlaps at all
    docs = spark.createDataFrame(
        [(i, f"tok{i}a tok{i}b tok{i}c") for i in range(6)],
        "doc_id long, text string",
    )
    queries = docs.select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("query_text")
    )
    cand = queries.select("query_id").crossJoin(docs.select("doc_id"))
    out = crossencoder_rerank(cand, queries, docs, k=1).collect()
    assert {r.query_id: r.doc_id for r in out} == {i: i for i in range(6)}
    assert all(r.xe_score >= 1.0 for r in out)
    # string ids flow through untouched (output schema mirrors inputs)
    sdocs = docs.select(
        F.concat(F.lit("d"), "doc_id").alias("doc_id"), "text"
    )
    squeries = sdocs.select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("query_text")
    )
    scand = squeries.select("query_id").crossJoin(sdocs.select("doc_id"))
    sout = crossencoder_rerank(scand, squeries, sdocs, k=1).collect()
    assert {r.query_id: r.doc_id for r in sout} == {
        f"d{i}": f"d{i}" for i in range(6)
    }


def test_xe_rerank_batch_size_invariant(spark):
    from pinecone_datasets_spark.operators.rerank import crossencoder_rerank

    docs, queries, cand = _xe_fixtures(spark)
    a = crossencoder_rerank(cand, queries, docs, k=4, batch_size=7).collect()
    b = crossencoder_rerank(cand, queries, docs, k=4, batch_size=512).collect()
    key = lambda r: (r.query_id, r.rank)
    assert sorted([(r.query_id, r.rank, r.doc_id, r.xe_score) for r in a]) == \
           sorted([(r.query_id, r.rank, r.doc_id, r.xe_score) for r in b])


def test_xe_rerank_custom_scorer(spark):
    import pandas as pd

    from pinecone_datasets_spark.operators.rerank import crossencoder_rerank

    docs, queries, cand = _xe_fixtures(spark)

    def length_scorer(qs, ds):
        return pd.Series([float(len(str(d))) for d in ds])

    out = crossencoder_rerank(cand, queries, docs, k=3, scorer=length_scorer)
    rows = [r for r in out.collect() if r.rank == 1]
    # every query's rank-1 must be the longest doc among candidates
    longest = (
        docs.where(F.col("doc_id") < 30)
        .orderBy(F.length("text").desc(), "doc_id")
        .first()
        .doc_id
    )
    assert all(r.doc_id == longest for r in rows)


def test_xe_rerank_duckdb_twin(spark):
    import duckdb

    from pinecone_datasets_spark.operators.rerank import (
        crossencoder_rerank,
        crossencoder_rerank_sql,
    )

    docs, queries, cand = _xe_fixtures(spark)
    got = sorted(
        (r.query_id, r.rank, r.doc_id, round(r.xe_score, 9))
        for r in crossencoder_rerank(cand, queries, docs, k=5).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    sql = crossencoder_rerank_sql(
        "(SELECT q.doc_id AS query_id, d.doc_id FROM documents q, documents d"
        " WHERE q.doc_id < 8 AND d.doc_id < 30)",
        "(SELECT doc_id AS query_id, text AS query_text FROM documents WHERE doc_id < 8)",
        "documents",
        k=5,
    )
    want = sorted(
        (r[0], r[3], r[1], round(r[2], 9)) for r in con.execute(sql).fetchall()
    )
    assert got == want


def test_xe_rerank_guards(spark):
    from pinecone_datasets_spark.operators.rerank import crossencoder_rerank

    docs, queries, cand = _xe_fixtures(spark)
    with pytest.raises(ValueError):
        crossencoder_rerank(cand, queries, docs, k=0)
    with pytest.raises(ValueError):
        crossencoder_rerank(cand, queries, docs, k=3, batch_size=0)

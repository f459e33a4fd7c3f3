"""Property-based invariants for repeated-substring span dedup and IR
metrics — random corpora / judgments, structural guarantees that
known-answer tests can't sweep.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# Small vocabularies force collisions; words are single tokens by
# construction (no whitespace) so Spark/oracle tokenization is trivial.
word = st.sampled_from([f"w{i}" for i in range(12)])
doc = st.lists(word, min_size=0, max_size=30).map(" ".join)
corpus = st.lists(doc, min_size=1, max_size=8)

W = 4  # window under test


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=corpus)
def test_span_invariants(spark, corpus):
    from pinecone_datasets_spark.operators.spans import (
        repeated_spans,
        strip_repeated_spans,
    )

    df = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string"
    )
    spans = repeated_spans(df, window=W, hash_fn="xxhash64").collect()
    words = {i: t.split() if t else [] for i, t in enumerate(corpus)}

    by_doc: dict[int, list] = {}
    for r in spans:
        by_doc.setdefault(r.doc_id, []).append(r)
    for did, rows in by_doc.items():
        rows.sort(key=lambda r: r.span_start)
        for r in rows:
            # extents are in-bounds, at least window long, length-consistent
            assert 1 <= r.span_start <= r.span_end <= len(words[did])
            assert r.span_tokens == r.span_end - r.span_start + 1 >= W
        # maximal spans are disjoint AND non-adjacent (else they'd merge)
        for a, b in zip(rows, rows[1:]):
            assert b.span_start > a.span_end + 1

    # ground truth: a position is covered iff its window repeats globally
    occurrences: dict[tuple, int] = {}
    for did, ws in words.items():
        for i in range(len(ws) - W + 1):
            occurrences[tuple(ws[i : i + W])] = (
                occurrences.get(tuple(ws[i : i + W]), 0) + 1
            )
    covered = {
        did: {
            pos
            for i in range(len(ws) - W + 1)
            if occurrences[tuple(ws[i : i + W])] > 1
            for pos in range(i + 1, i + W + 1)
        }
        for did, ws in words.items()
    }
    span_cover = {
        did: {
            p for r in rows for p in range(r.span_start, r.span_end + 1)
        }
        for did, rows in by_doc.items()
    }
    for did in words:
        assert span_cover.get(did, set()) == covered[did]

    # strip removes exactly the covered tokens, in order
    out = {
        r.doc_id: r
        for r in strip_repeated_spans(df, window=W, hash_fn="xxhash64").collect()
    }
    for did, ws in words.items():
        kept = [w for i, w in enumerate(ws, 1) if i not in covered[did]]
        assert out[did].text == " ".join(kept)
        assert out[did].n_tokens_kept == len(kept)
        assert out[did].n_tokens_removed == len(ws) - len(kept)


judgment = st.tuples(
    st.integers(0, 3),          # query id
    st.integers(0, 9),          # doc id
    st.integers(1, 3),          # graded rel
)
ranking = st.tuples(st.integers(0, 3), st.permutations(list(range(10))))


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    judgments=st.lists(judgment, min_size=1, max_size=12),
    rankings=st.lists(ranking, min_size=1, max_size=4, unique_by=lambda t: t[0]),
    k=st.integers(1, 6),
)
def test_metric_bounds_and_perfection(spark, judgments, rankings, k):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pinecone_datasets_spark.operators.evaluate import retrieval_metrics

    qrels = spark.createDataFrame(
        [(f"q{q}", f"d{d}", r) for q, d, r in judgments],
        "query_id string, id string, rel int",
    )
    results = spark.createDataFrame(
        [
            (f"q{q}", f"d{d}", i + 1)
            for q, perm in rankings
            for i, d in enumerate(perm)
        ],
        "query_id string, id string, rank int",
    )
    out = retrieval_metrics(results, qrels, k=k).collect()
    judged_q = {f"q{q}" for q, _, _ in judgments}
    # spine: exactly the judged queries, no more, no fewer
    assert {r.query_id for r in out} == judged_q
    for r in out:
        for m in (r.recall_at_k, r.precision_at_k, r.mrr_at_k, r.ndcg_at_k):
            assert 0.0 <= m <= 1.0 + 1e-12
        assert r.hits_at_k <= min(k, r.n_relevant)
        # any hit at all implies every metric is strictly positive
        if r.hits_at_k > 0:
            assert r.mrr_at_k > 0 and r.ndcg_at_k > 0

    # the ideal ranking scores 1.0 everywhere it can. Build it from the
    # DEDUPED judgments (max rel per (query, doc) — the operator's own
    # qrels contract): ranking the raw list would place a doubly-judged
    # doc at two ranks and push a relevant doc out of the top-k.
    dedup = qrels.groupBy("query_id", "id").agg(F.max("rel").alias("rel"))
    w = Window.partitionBy("query_id").orderBy(F.desc("rel"), "id")
    perfect = dedup.select(
        "query_id", "id", F.row_number().over(w).alias("rank")
    )
    ideal = retrieval_metrics(perfect, qrels, k=k).collect()
    for r in ideal:
        assert abs(r.ndcg_at_k - 1.0) < 1e-9
        assert r.mrr_at_k == 1.0
        assert r.hits_at_k == min(k, r.n_relevant)

"""BM25 keyword search and reciprocal-rank-fusion hybrid retrieval.

The reference's data model ships documents alongside dense/sparse query
vectors; a complete retrieval engine also needs the lexical side: BM25
over an inverted index, and rank fusion to combine lexical and dense
results (the standard "hybrid search" most production retrieval stacks
run today).

Plan shape, sized for 100 TB:

1. ``explode(split(text))`` → term-frequency aggregate keyed
   ``(doc, term)`` — the only corpus-sized shuffle, and it is map-side
   partially aggregated so duplicate terms within a partition collapse
   before crossing the wire. Document length falls out of the same
   aggregate (``sum(tf) per doc``) — the corpus is tokenized ONCE.
2. The query side is tiny (Q queries × a few terms). Distinct query
   terms BROADCAST against the postings — the corpus-side inverted index
   is *filtered before any further shuffle*; only postings for queried
   terms move again.
3. Document frequency / IDF is computed over the filtered postings
   (cardinality = queried terms), then broadcast back.
4. Per-(query, doc) score sum shuffles only matched postings, keyed
   (query, doc).
5. Top-k per query: rank over a window with a LITERAL k bound, so
   Spark's WindowGroupLimit keeps partial top-k on the map side.

Scores are ranked on ``round(score, 6)`` with the doc id as tiebreak —
float-sum association order must not decide ranks across engines.

BM25 formula (Robertson/Sparck Jones, the Lucene variant):
``idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))``,
``score = Σ_t idf · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tokens(text_col: str) -> "F.Column":
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
) -> DataFrame:
    """Top-k documents per query by BM25. Returns
    ``(query_id, doc_id, score, rank)``; score is the raw double (round
    at the edge if hashing), rank is deterministic via rounded-score +
    id tiebreak."""
    toks = docs.select(
        F.col(id_col), F.explode(_tokens(text_col)).alias("term")
    ).where(F.col("term") != "")
    tf = toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )

    qterms = (
        queries.select(
            F.col(query_id_col),
            F.explode(_tokens(query_text_col)).alias("term"),
        )
        .where(F.col("term") != "")
        .distinct()
    )
    # df/idf over queried terms only: filter postings by the broadcast
    # term set FIRST, then aggregate the (small) survivor set.
    terms_only = qterms.select("term").distinct()
    df_t = (
        tf.join(F.broadcast(terms_only), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    idf = df_t.crossJoin(F.broadcast(stats)).select(
        "term",
        F.log(
            1.0
            + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ).alias("idf"),
    )

    postings = tf.join(F.broadcast(qterms), "term")
    scored = (
        postings.join(F.broadcast(idf), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .select(
            query_id_col,
            id_col,
            (
                F.col("idf")
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1
                    * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("contrib"),
        )
        .groupBy(query_id_col, id_col)
        .agg(F.sum("contrib").alias("score"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.round("score", 6).desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.lit(k))
        .select(query_id_col, id_col, "score", "rank")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    topk: int = 10,
    rrf_k: int = 60,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion: ``score = Σ_lists 1/(rrf_k + rank)``; a
    document absent from a list contributes nothing. Each input needs
    (query_id, doc_id, rank). Returns (query_id, doc_id, rrf_score,
    rank) — the fusion is rank-only, so heterogeneous score scales
    (BM25 vs cosine) never need calibration."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    parts = [
        r.select(
            query_id_col,
            id_col,
            (1.0 / (F.lit(rrf_k) + F.col(rank_col))).alias("part"),
        )
        for r in rankings
    ]
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)
    fused = unioned.groupBy(query_id_col, id_col).agg(
        F.sum("part").alias("rrf_score")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.round("rrf_score", 9).desc(), F.col(id_col)
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.lit(topk))
        .select(query_id_col, id_col, "rrf_score", "rank")
    )

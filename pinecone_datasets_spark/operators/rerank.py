"""Diversity re-ranking: maximal marginal relevance (MMR) over a
candidate set.

Carbonell & Goldstein (1998): iteratively pick the candidate maximizing
``lam * rel(d) - (1 - lam) * max_{s in selected} sim(d, s)`` — relevance
traded against redundancy with what is already picked. The standard
final stage of a retrieval pipeline whose top-k would otherwise be
near-duplicates (exactly what a deduplicated-corpus search still
returns when the corpus has topical clusters).

Scale shape: MMR is inherently sequential *within one query* (each pick
conditions the next), so the right distribution axis is **across
queries** — ``applyInPandas`` grouped by query id, one Arrow batch per
query, greedy loop in NumPy over the candidate set (bounded: C
candidates from the retrieval stage, so the loop is O(k·C·dim) on ≤ C
rows — microseconds). Millions of queries parallelize embarrassingly;
the corpus itself is never touched (candidates carry their vectors from
the retrieval join).

Determinism: ties break on doc id, and the greedy trace is a pure
function of (candidates, lam, k).

Reference scope note: the reference (pinecone-io/pinecone-datasets)
delegates search and reranking to the hosted service; Layer-B
extension, cited against its data model only (cfg.py:23-36).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)


def mmr_rerank(
    candidates: DataFrame,
    k: int = 10,
    lam: float = 0.5,
    query_id_col: str = "query_id",
    doc_id_col: str = "id",
    score_col: str = "score",
    vector_col: str = "values",
) -> DataFrame:
    """Greedy MMR top-k per query over a scored candidate frame that
    carries the candidates' vectors (``vector_col``).

    Returns ``(query_id, doc_id, score, mmr_score, mmr_rank)`` with at
    most k rows per query: ``mmr_score`` is the marginal objective at
    pick time (the first pick's is ``lam * rel`` — no redundancy term
    yet), ``score`` the original relevance. ``lam=1`` degenerates to
    pure relevance order.
    """
    if not 0.0 < lam <= 1.0:
        raise ValueError(f"lam must be in (0, 1]: {lam}")
    if k <= 0:
        raise ValueError(f"k must be positive: {k}")

    qf = candidates.schema[query_id_col].dataType
    df_ = candidates.schema[doc_id_col].dataType
    out_schema = StructType(
        [
            StructField(query_id_col, qf, False),
            StructField(doc_id_col, df_, False),
            StructField("score", DoubleType(), True),
            StructField("mmr_score", DoubleType(), True),
            StructField("mmr_rank", LongType(), False),
        ]
    )

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        # deterministic candidate order: the tiebreak axis
        pdf = pdf.sort_values(doc_id_col, kind="mergesort").reset_index(
            drop=True
        )
        rel = pdf[score_col].to_numpy(dtype=np.float64)
        mat = np.stack(
            [np.asarray(v, dtype=np.float64) for v in pdf[vector_col]]
        )
        norms = np.maximum(np.linalg.norm(mat, axis=1), 1e-30)
        unit = mat / norms[:, None]
        n = len(pdf)
        chosen: list[int] = []
        obj: list[float] = []
        max_sim = np.full(n, -np.inf)
        remaining = np.ones(n, dtype=bool)
        for _ in range(min(k, n)):
            red = np.where(np.isinf(max_sim), 0.0, max_sim)
            marginal = lam * rel - (1.0 - lam) * red
            marginal[~remaining] = -np.inf
            pick = int(np.argmax(marginal))  # first max = smallest doc id
            chosen.append(pick)
            obj.append(float(marginal[pick]))
            remaining[pick] = False
            sims = unit @ unit[pick]
            max_sim = np.maximum(max_sim, sims)
        return pd.DataFrame(
            {
                query_id_col: pdf[query_id_col].iloc[chosen].to_numpy(),
                doc_id_col: pdf[doc_id_col].iloc[chosen].to_numpy(),
                "score": rel[chosen],
                "mmr_score": obj,
                "mmr_rank": np.arange(1, len(chosen) + 1, dtype=np.int64),
            }
        )

    return candidates.select(
        query_id_col, doc_id_col, score_col, vector_col
    ).groupBy(query_id_col).applyInPandas(greedy, out_schema)

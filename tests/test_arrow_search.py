"""Arrow fast-path top-k must agree with the built-in expression path."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pinecone_datasets_spark.operators.search import (
    topk_search,
    topk_search_arrow,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


@pytest.mark.parametrize("metric", ["dot", "cosine"])
def test_arrow_matches_builtin(spark, emb, metric):
    docs = emb.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("values")
    )
    qrows = emb.where(F.col("vec_id") < 8).select("vec_id", "embedding").collect()
    qids = [r["vec_id"] for r in qrows]
    qmat = np.array([r["embedding"] for r in qrows], dtype=np.float64)

    queries = spark.createDataFrame(
        [(int(r["vec_id"]), r["embedding"]) for r in qrows],
        schema="query_id long, vector array<float>",
    )
    builtin = topk_search(
        docs, queries, metric=metric, k=5, metadata_col=None
    ).collect()
    arrow = topk_search_arrow(
        docs, qmat, qids, k=5, metric=metric
    ).collect()

    def key(rows):
        return {
            (r["query_id"], r["rank"]): (r["id"], round(r["score"], 9))
            for r in rows
        }

    assert key(builtin) == key(arrow)

"""Embedding dimension stats + drift detection (operators/embstats.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pinecone_datasets_spark.operators.embstats import (
    embedding_dim_stats,
    embedding_drift,
)


def test_dim_stats_match_numpy(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = {
        r["dim"]: (r["n"], r["mean"], r["std"], r["vmin"], r["vmax"])
        for r in embedding_dim_stats(emb).collect()
    }
    mat = np.array(
        [r["embedding"] for r in emb.select("embedding").collect()]
    )
    assert set(got) == set(range(mat.shape[1]))
    for d in (0, 7, 63):
        n, mean, std, vmin, vmax = got[d]
        assert n == mat.shape[0]
        assert mean == pytest.approx(mat[:, d].mean(), abs=1e-5)
        assert std == pytest.approx(mat[:, d].std(), abs=1e-5)
        assert vmin == pytest.approx(mat[:, d].min(), abs=1e-6)
        assert vmax == pytest.approx(mat[:, d].max(), abs=1e-6)


def test_drift_flags_shifted_batch(spark, sf_dir):
    """Shift dim 3 of the batch by +5 corpus-std: exactly that dimension
    drifts."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("embedding").cast("array<double>").alias("embedding")
    )
    stats = {
        r["dim"]: r["std"] for r in embedding_dim_stats(emb).collect()
    }
    shift = 5.0 * stats[3]
    batch = emb.limit(100).select(
        F.expr(
            f"transform(embedding, (x, i) ->"
            f" IF(i = 3, x + {shift}, x))"
        ).alias("embedding")
    )
    out = {
        r["dim"]: (r["z"], r["drifted"])
        for r in embedding_drift(emb, batch, z_threshold=3.0).collect()
    }
    assert out[3][1] == 1 and abs(out[3][0]) > 3
    flagged = [d for d, (_, f) in out.items() if f == 1]
    assert flagged == [3]


def test_unshifted_batch_mostly_clean(spark, sf_dir):
    """A batch drawn from the corpus itself: its mean CAN wander ~1-2
    standard errors per dim, but nothing extreme."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("embedding").cast("array<double>").alias("embedding")
    )
    batch = emb.where(F.expr("pmod(hash(embedding[0]), 4) = 0"))
    out = embedding_drift(emb, batch, z_threshold=6.0).collect()
    assert sum(r["drifted"] for r in out) == 0


def test_zero_variance_dimension(spark):
    corpus = spark.createDataFrame(
        [([1.0, 5.0],) for _ in range(10)], "embedding array<double>"
    )
    same = spark.createDataFrame(
        [([1.0, 5.0],) for _ in range(4)], "embedding array<double>"
    )
    moved = spark.createDataFrame(
        [([1.0, 6.0],) for _ in range(4)], "embedding array<double>"
    )
    ok = {r["dim"]: r["drifted"] for r in embedding_drift(corpus, same).collect()}
    assert ok == {0: 0, 1: 0}
    bad = {r["dim"]: r["drifted"] for r in embedding_drift(corpus, moved).collect()}
    assert bad == {0: 0, 1: 1}


def test_drift_flags_dimension_mismatch(spark):
    """r11 review: an inner join on dim silently dropped dimensions
    present on only one side — a batch re-embedded at a different
    width (the module's motivating scenario) produced NO drifted rows."""
    corpus = spark.createDataFrame(
        [([1.0, 2.0, 3.0, 4.0],)] * 6, "embedding array<double>"
    )
    batch = spark.createDataFrame(
        [([1.0, 2.0],)] * 4, "embedding array<double>"
    )
    out = {r["dim"]: r for r in embedding_drift(corpus, batch).collect()}
    assert set(out) == {0, 1, 2, 3}
    assert out[2]["drifted"] == 1 and out[2]["n_b"] is None
    assert out[3]["drifted"] == 1 and out[3]["n_b"] is None
    assert out[0]["drifted"] == 0  # shared dims still compare normally

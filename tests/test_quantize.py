"""Int8 scalar quantization of embeddings (functions/vector.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from pinecone_datasets_spark.functions.vector import (
    dot_product,
    int8_dot,
    with_int8_quantized,
)

from conftest import TESTDATA


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{TESTDATA}/embeddings.parquet")


def test_quantize_known_answer(spark):
    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25]), (2, [0.0, 0.0, 0.0])],
        "id long, v array<double>",
    )
    rows = {
        r["id"]: (r["q8_scale"], r["q8_q"])
        for r in with_int8_quantized(df, "v").collect()
    }
    assert rows[1][0] == 127.0
    assert rows[1][1] == [127, -64, 32]  # round-half-away: -63.5 -> -64
    assert rows[2] == (1.0, [0, 0, 0])


def test_int8_dot_reconstruction_error_bounded(spark, emb):
    """Quantized dot must track the exact dot within the scalar-quant
    error envelope (~1/127 relative per operand) on real vectors."""
    q = with_int8_quantized(
        emb.select("vec_id", "embedding"), "embedding"
    )
    a = q.select(
        F.col("vec_id").alias("ia"),
        F.col("embedding").alias("va"),
        F.col("q8_q").alias("qa"),
        F.col("q8_scale").alias("sa"),
    ).where(F.col("ia") < 30)
    b = q.select(
        F.col("vec_id").alias("ib"),
        F.col("embedding").alias("vb"),
        F.col("q8_q").alias("qb"),
        F.col("q8_scale").alias("sb"),
    ).where((F.col("ib") >= 30) & (F.col("ib") < 60))
    pairs = a.join(b).select(
        dot_product("va", "vb").alias("exact"),
        int8_dot("qa", "sa", "qb", "sb").alias("approx"),
        F.sqrt(dot_product("va", "va")).alias("na"),
        F.sqrt(dot_product("vb", "vb")).alias("nb"),
    )
    bad = pairs.where(
        F.abs(F.col("exact") - F.col("approx"))
        > 0.05 * F.col("na") * F.col("nb")
    ).count()
    assert bad == 0


def test_quantized_topk_recall_vs_exact(spark, emb):
    """Top-5 by quantized score must mostly agree with exact top-5."""
    docs = emb.select(F.col("vec_id").alias("doc_id"), "embedding")
    qs = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
    )
    exact = (
        docs.join(F.broadcast(qs))
        .withColumn("s", dot_product("embedding", "qv"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("s"), F.col("doc_id")
                )
            ),
        )
        .where(F.col("rk") <= 5)
    )
    qdocs = with_int8_quantized(docs, "embedding", prefix="d")
    qqs = with_int8_quantized(qs, "qv", prefix="q")
    approx = (
        qdocs.join(F.broadcast(qqs))
        .withColumn("s", int8_dot("d_q", "d_scale", "q_q", "q_scale"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("s"), F.col("doc_id")
                )
            ),
        )
        .where(F.col("rk") <= 5)
    )
    want = {
        (r["query_id"], r["doc_id"]) for r in exact.collect()
    }
    got = {
        (r["query_id"], r["doc_id"]) for r in approx.collect()
    }
    recall = len(want & got) / len(want)
    assert recall >= 0.8, recall

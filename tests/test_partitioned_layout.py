"""Partitioned dataset layout: hive partitioning + partition pruning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pinecone_datasets_spark.plans.explain import formatted_plan
from pinecone_datasets_spark.writer import write_documents


@pytest.fixture(scope="module")
def partitioned_docs(spark, sf_dir, tmp_path_factory):
    """documents partitioned by a metadata-derived column (lang)."""
    out = str(tmp_path_factory.mktemp("part_ds"))
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    doc = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs = emb.join(doc, emb.vec_id == doc.doc_id).select(
        F.col("vec_id").cast("string").alias("id"),
        F.col("embedding").alias("values"),
        F.to_json(F.struct("source", "n_chars")).alias("metadata"),
        F.col("lang"),
    )
    write_documents(docs, out, partition_by=["lang"])
    return out


def test_partitioned_layout_reads_back(spark, partitioned_docs):
    """write_documents(partition_by=…) output must be readable by the
    dataset reader: part files live under lang=…/ subdirectories, which a
    flat *.parquet glob misses — the scan itself decides emptiness."""
    from pinecone_datasets_spark.reader import read_documents

    df = read_documents(spark, partitioned_docs)
    assert df.count() > 0
    assert df.columns == ["id", "values", "sparse_values", "metadata", "blob"]


def test_empty_table_dir_still_raises(spark, tmp_path):
    import os

    from pinecone_datasets_spark.reader import read_documents

    os.makedirs(tmp_path / "documents")
    with pytest.raises(ValueError, match="No parquet files found"):
        read_documents(spark, str(tmp_path))


def test_partition_dirs_exist(partitioned_docs):
    import os

    entries = os.listdir(os.path.join(partitioned_docs, "documents"))
    assert any(e.startswith("lang=") for e in entries), entries


def test_partition_pruning(spark, partitioned_docs):
    df = spark.read.parquet(f"{partitioned_docs}/documents").where(
        F.col("lang") == "en"
    )
    plan = formatted_plan(df)
    # the scan must report a pruned partition filter, and reading must
    # touch only the lang=en directory
    assert "PartitionFilters" in plan
    assert "lang" in plan.split("PartitionFilters")[1][:200]
    langs = {r["lang"] for r in df.select("lang").distinct().collect()}
    assert langs == {"en"}


def test_partition_column_survives_roundtrip(spark, partitioned_docs):
    df = spark.read.parquet(f"{partitioned_docs}/documents")
    assert "lang" in df.columns
    assert df.count() == 500

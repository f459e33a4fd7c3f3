"""Structured Streaming: windowed event aggregation must converge to the
batch result on the same data (availableNow trigger = bounded replay)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pinecone_datasets_spark.streaming.ingest import (
    stream_documents,
    windowed_event_counts,
)
from pinecone_datasets_spark.sources.events import read_events


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """Re-write the events fixture as a micro-ts parquet directory the
    file-stream source can consume (nanos normalized on the way in)."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    ev = read_events(spark, f"{sf_dir}/events.parquet")
    ev.repartition(4).write.mode("overwrite").parquet(out)
    return out


def test_windowed_counts_match_batch(spark, events_dir, tmp_path_factory):
    schema = spark.read.parquet(events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(events_dir)
    )
    agg = windowed_event_counts(
        stream, window_duration="1 hour", watermark="2 hours"
    )
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    q = (
        agg.writeStream.format("memory")
        .queryName("ev_counts")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batch = (
        spark.read.parquet(events_dir)
        .groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            F.round("sum_value", 6).alias("sum_value"),
        )
    )
    got = {
        (r["window_start"], r["event_type"]): (
            r["n_events"],
            round(r["sum_value"], 6),
        )
        for r in spark.sql("SELECT * FROM ev_counts").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in batch.collect()
    }
    assert got == want
    assert len(want) > 100


def test_stream_documents_schema(spark, tmp_path):
    """File-stream over a documents dir declares the dataset schema and is
    actually a streaming plan."""
    import pandas as pd

    docs_dir = tmp_path / "documents"
    docs_dir.mkdir()
    pd.DataFrame(
        {"id": ["1"], "values": [[0.1, 0.2]]}
    ).to_parquet(docs_dir / "part-0.parquet", index=False)
    sdf = stream_documents(spark, str(docs_dir))
    assert sdf.isStreaming
    assert sdf.columns == ["id", "values", "sparse_values", "metadata", "blob"]

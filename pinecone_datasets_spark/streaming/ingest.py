"""Structured Streaming extension (SURVEY.md §2.8).

The reference is batch-only; this is the Layer-B design slot: ingest an
append-only documents directory as a stream, and event-time windowed
aggregation with watermarks over the ``events`` fixture
(event_id, ts, user_id, event_type, value, props).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cfg import DOCUMENTS_SCHEMA


def stream_documents(spark: SparkSession, documents_dir: str) -> DataFrame:
    """Append-only documents dir → streaming DataFrame with the dataset
    schema. File-source streaming needs an explicit schema (no inference
    mid-stream); maxFilesPerTrigger bounds micro-batch size at scale."""
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(documents_dir)
    )


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts per event_type with late-data tolerance.

    Watermark bounds state: rows later than ``watermark`` behind the max
    observed ts are dropped and their windows finalized — the standard
    bounded-state shape for infinite streams.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window_duration).alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )

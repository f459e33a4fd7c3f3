"""Bucketed (co-located) joins: pre-partition once, join shuffle-free.

The scale pattern for repeated joins on the same key (e.g. documents ⋈
embeddings on id, fact ⋈ fact in a star schema): persist both sides
bucketed by the join key and every subsequent equi-join on that key reads
co-located buckets — SortMergeJoin with NO Exchange on either side. At
100 TB, that's the difference between re-shuffling both tables per query
and never shuffling them again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    Bucketing metadata lives in the session catalog; joins/aggregations
    on ``bucket_cols`` against tables with the same bucket spec skip the
    exchange (and with ``sort_cols``, the sort).
    """
    if not bucket_cols:
        raise ValueError("bucket_cols must name at least one column")
    if num_buckets < 1:
        raise ValueError(f"num_buckets must be >= 1: {num_buckets}")
    writer = df.write.mode("overwrite").bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)

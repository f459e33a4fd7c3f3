"""Adaptive parallelism for compute-heavy operators.

A parquet scan's task count is decided by *input bytes*
(``maxPartitionBytes`` / ``openCostInBytes``), and a single row group is
never split — so a small-but-dense input (one file, one row group) feeds
exactly one task no matter how many cores the cluster has. For scan-
proportional work that's correct; for operators that multiply work per
input byte (shingle explosion ×300, per-query vector scoring ×Q) it
strands every core but one.

``widen`` is the guard those operators apply before their hot stage:
if the input already has at least ``defaultParallelism`` partitions (any
real corpus — a 100 TB table scans as tens of thousands of splits), it
is a **no-op**; only when the input under-splits does it hash-repartition
up to core count. Hash (on the caller's key) rather than round-robin:
round-robin repartition inserts a per-partition sort to stay
deterministic under task retry; hash partitioning is retry-deterministic
for free. Every caller's output is an aggregation/rank over the widened
data, so results are partition-layout-independent either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def widen(df: DataFrame, *key_cols: str, factor: int = 1) -> DataFrame:
    """Repartition ``df`` up to ``defaultParallelism * factor`` iff it
    currently has fewer partitions; identity otherwise."""
    sc = df.sparkSession.sparkContext
    target = max(1, sc.defaultParallelism * factor)
    if df.rdd.getNumPartitions() >= target:
        return df
    if key_cols:
        return df.repartition(target, *[F.col(c) for c in key_cols])
    return df.repartition(target)

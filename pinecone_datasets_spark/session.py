"""Opinionated SparkSession builder for this engine's workloads.

Encodes the scale discipline as defaults so callers don't re-derive it:
AQE on (runtime re-planning, skew-join splitting, partition coalescing),
Arrow for the pandas-UDF paths, and shuffle partitions sized to the
parallelism at hand. On a real cluster these are a starting point —
``spark.sql.shuffle.partitions`` should track ~2-3x total cores and
``maxPartitionBytes`` the executor memory budget.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import SparkSession


def get_spark_session(
    app_name: str = "pinecone-datasets-spark",
    master: Optional[str] = None,
    shuffle_partitions: Optional[int] = None,
    extra_conf: Optional[dict[str, str]] = None,
) -> SparkSession:
    cpus = os.cpu_count() or 8
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()

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


def _preconfigured_keys() -> set:
    """Conf keys already supplied by spark-submit / spark-defaults /
    env (visible via SparkConf before any session exists)."""
    try:
        from pyspark import SparkConf

        return {k for k, _ in SparkConf().getAll()}
    except Exception:
        return set()


def get_spark_session(
    app_name: str = "pinecone-datasets-spark",
    master: Optional[str] = None,
    shuffle_partitions: Optional[int] = None,
    extra_conf: Optional[dict[str, str]] = None,
) -> SparkSession:
    cpus = os.cpu_count() or 8
    shuffle_partitions = shuffle_partitions or cpus
    b = SparkSession.builder
    # set a master ONLY when the caller asked for one or none is
    # configured: unconditionally forcing local[N] silently overrode a
    # spark-submit --master yarn/k8s and ran the "100 TB" job in local
    # mode on the driver (r11 review). spark.master from submit/env
    # wins when present.
    if master is not None:
        b = b.master(master)
    elif (
        os.environ.get("SPARK_MASTER") is None
        and "spark.master" not in _preconfigured_keys()
    ):
        b = b.master(f"local[{cpus}]")
    b = (
        b.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Broadcast only on RUNTIME sizes. Catalyst's static size
        # estimates are unreliable for derived frames (explode/agg/
        # union chains — shingle dictionaries, per-doc size maps, LSH
        # signature tables), and a statically mis-planned broadcast of
        # a corpus-scale intermediate kills the driver no matter how
        # big it is (observed: the sf1 hash sweep OOMed exactly there,
        # r13). Static auto-broadcast OFF; AQE re-promotes any join
        # whose REAL post-shuffle size is under 10 MiB, so small dims
        # still broadcast — now from measured bytes, not guesses.
        # Explicit F.broadcast() hints on known-bounded frames are
        # unaffected.
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "10485760")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()

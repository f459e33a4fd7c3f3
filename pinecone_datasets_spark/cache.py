"""Cache API surface parity (SURVEY.md §2.1 S12).

The reference maintains a content-addressed local download cache
(``cache.py:257-311``) because pandas must pull whole remote files to one
machine. Spark executors stream Parquet from object stores natively
(ranged reads, connector-level retry), so that machinery is obsolete here.
We keep the *public API* (``get_cache_info`` / ``clear_cache``) mapped to
the Spark-native equivalents: DataFrame persistence and catalog cache.
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import SparkSession


def get_cache_info(spark: Optional[SparkSession] = None) -> dict[str, Any]:
    """Reference ``cache.py:364-389`` parity: report what is cached.
    Here: Spark storage-level info for cached RDDs/DataFrames."""
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        return {"cached_rdds": 0, "total_cached_bytes": 0}
    jsc = spark.sparkContext._jsc.sc()
    infos = jsc.getRDDStorageInfo()
    total = sum(i.memSize() + i.diskSize() for i in infos)
    return {
        "cached_rdds": len(infos),
        "total_cached_bytes": int(total),
    }


def clear_cache(spark: Optional[SparkSession] = None) -> None:
    """Reference ``cache.py:392-430`` parity: drop ALL cached data —
    both the SQL cache (DataFrame.cache) and RDD-level persistence
    (e.g. localCheckpoint blocks from iterative operators), which
    ``catalog.clearCache()`` alone does not touch."""
    spark = spark or SparkSession.getActiveSession()
    if spark is not None:
        spark.catalog.clearCache()
        for _rdd_id, jrdd in (
            spark.sparkContext._jsc.getPersistentRDDs().items()
        ):
            jrdd.unpersist()

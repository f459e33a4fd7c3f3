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


def clear_cache(
    pattern: Optional[str] = None,
    spark: Optional[SparkSession] = None,
) -> int:
    """Reference ``cache.py:420-430`` parity: drop ALL cached data —
    both the SQL cache (DataFrame.cache) and RDD-level persistence
    (e.g. localCheckpoint blocks from iterative operators), which
    ``catalog.clearCache()`` alone does not touch.

    Signature matches the reference: ``clear_cache(pattern=None) ->
    int`` where the return is the number of cache entries removed.
    ``pattern`` selected files in the reference's on-disk download
    cache by glob; Spark's block-manager cache has no per-file
    identity, so a non-None pattern clears everything and warns. A
    SparkSession passed as the first positional arg (the pre-r12 local
    signature) is still accepted.

    The returned count is an APPROXIMATION of the reference's
    removed-files count: it is taken from ``getRDDStorageInfo()``,
    which lists only RDDs with materialized blocks — a frame that was
    ``.cache()``d but never acted on is cleared without being counted
    (there is nothing in the block manager yet to count). Callers
    needing "did anything get cleared" semantics should treat the
    return as a lower bound (r12 ADVICE)."""
    if isinstance(pattern, SparkSession):  # pre-r12 positional caller
        pattern, spark = None, pattern
    if pattern is not None:
        import warnings

        warnings.warn(
            "clear_cache(pattern=...) selects files in the reference's"
            " on-disk download cache; the Spark block-manager cache has"
            " no per-file identity — clearing ALL cached data"
        )
    spark = spark or SparkSession.getActiveSession()
    removed = 0
    if spark is not None:
        # count from storage info (covers SQL-cached frames AND
        # RDD-level persistence — getPersistentRDDs misses the former)
        removed = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
        spark.catalog.clearCache()
        for _rdd_id, jrdd in (
            spark.sparkContext._jsc.getPersistentRDDs().items()
        ):
            jrdd.unpersist()
    return removed


def cache_info() -> dict[str, Any]:
    """Reference ``cache.py:414-416``: module-level alias so
    ``from pinecone_datasets import cache_info`` ports verbatim."""
    return get_cache_info()


def set_cache_dir(cache_dir: str) -> None:
    """Reference ``cache.py:403-411`` surface parity. The reference
    re-points its on-disk download cache; Spark executors stream
    Parquet from object stores natively (ranged reads), so there is no
    download cache to re-point — accepted and ignored with a warning
    so ported code keeps running."""
    import warnings

    warnings.warn(
        "set_cache_dir is a no-op in the Spark-native engine: executors"
        " stream Parquet directly from the store, so there is no local"
        f" download cache to move to {cache_dir!r}"
    )

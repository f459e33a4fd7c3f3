"""Module-level convenience API (C4).

Parity target: reference ``public.py:4-56`` — a lazily constructed global
Catalog plus thin ``list_datasets`` / ``load_dataset`` wrappers. The base
path comes from ``DATASETS_CATALOG_BASEPATH`` or the public default
(reference cfg.py:6-8, catalog.py:30-35).
"""

from __future__ import annotations

from typing import Any, Optional, Union

from pyspark.sql import DataFrame, SparkSession

from .catalog import Catalog
from .dataset import Dataset

_global_catalog: Optional[Catalog] = None


def _get_catalog(spark: Optional[SparkSession] = None) -> Catalog:
    global _global_catalog
    if _global_catalog is not None:
        cached = _global_catalog._spark
        # an explicitly passed session always wins, and a cached
        # catalog bound to a STOPPED session is discarded — previously
        # list_datasets(spark=fresh) silently returned the dead-session
        # catalog and failed with a py4j error (r11 review)
        stale = (
            (spark is not None and spark is not cached)
            or getattr(cached.sparkContext, "_jsc", None) is None
        )
        if not stale:
            return _global_catalog
        _global_catalog = None
    if spark is None:
        spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            "No active SparkSession; pass spark= explicitly"
        )
    _global_catalog = Catalog(spark)
    return _global_catalog


def list_datasets(
    as_df: bool = False, spark: Optional[SparkSession] = None, **kwargs: Any
) -> Union[list[str], DataFrame]:
    """Reference public.py:8-32."""
    return _get_catalog(spark).list_datasets(as_df=as_df)


def load_dataset(
    dataset_id: str, spark: Optional[SparkSession] = None, **kwargs: Any
) -> Dataset:
    """Reference public.py:35-56."""
    return _get_catalog(spark).load_dataset(dataset_id, **kwargs)

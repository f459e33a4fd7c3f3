"""Dataset catalog: a directory of datasets.

Parity target: reference ``catalog.py:27-97`` — load (glob metadata.json,
skip invalid entries with a warning), list (names or DataFrame), load/save
dataset. The catalog is control-plane: listings happen on the driver; we
only materialize a Spark DataFrame when ``as_df=True`` is requested.
"""

from __future__ import annotations

import logging
import warnings
from typing import Any, Optional, Union

from pyspark.sql import DataFrame, SparkSession

from .cfg import catalog_base_path
from .dataset import Dataset
from .fs import FS, join, normalize_uri
from .metadata import DatasetMetadata, MetadataValidationError
from .retry import with_retry

_logger = logging.getLogger(__name__)


#: Auto-selection facts for Catalog.load, measured at 10k datasets on
#: this host (BASELINE.md "catalog listing at 10k"): the sequential
#: driver loop reads ~28,000 metadata files/s from LOCAL disk (0.4 s
#: for 10k — fine even at 10^5), while the distributed text job pays
#: ~23-29 s of listing+scheduling overhead for the same 10k files. So
#: locally the driver loop wins outright and stays the default. The
#: parallel path exists for OBJECT STORES, where each driver-loop read
#: is a serial ~10-50 ms round-trip (10^5 datasets ≈ most of an hour)
#: and the Spark job does the same round-trips with full executor
#: parallelism and multi-file task packing.
_PARALLEL_LIST_THRESHOLD = 512
_OBJECT_STORE_SCHEMES = (
    "s3", "s3a", "s3n", "gs", "gcs", "abfs", "abfss", "wasb", "wasbs",
)


class Catalog:
    def __init__(
        self, spark: SparkSession, base_path: Optional[str] = None
    ):
        self._spark = spark
        # Env-var override mirrors reference catalog.py:30-35.
        self.base_path = normalize_uri(base_path or catalog_base_path())
        self._datasets: Optional[list[DatasetMetadata]] = None

    @with_retry
    def load(
        self, parallel: Optional[bool] = None, **kwargs: Any
    ) -> "Catalog":
        """S5 catalog scan (reference catalog.py:40-68): glob
        ``<base>/*/metadata.json``; skip malformed entries with a warning.

        ``parallel``: ``None`` (default) auto-selects — one distributed
        whole-file text job when the base path is on an object store
        AND the catalog has ≥ ``_PARALLEL_LIST_THRESHOLD`` datasets
        (serial driver round-trips are the bottleneck there); the
        sequential driver loop otherwise (measured 28k local
        reads/s at 10k datasets — the Spark job's listing+scheduling
        overhead LOSES locally; see the constants' comment).
        ``True``/``False`` force a path. Both paths produce identical
        catalogs (tested) with the same skip-invalid-with-warning
        semantics; the parallel path also ignores files that vanish
        between listing and read (the closest distributed analogue of
        the driver loop's per-file OSError skip). The one row per
        dataset that comes back is KBs, so the collect is bounded by
        catalog size itself."""
        fs = FS(self._spark)
        paths = fs.glob(join(self.base_path, "*", "metadata.json"))
        if parallel is None:
            scheme = (
                self.base_path.split("://", 1)[0].lower()
                if "://" in self.base_path
                else "file"
            )
            parallel = (
                scheme in _OBJECT_STORE_SCHEMES
                and len(paths) >= _PARALLEL_LIST_THRESHOLD
            )
        if parallel:
            # The distributed read fails the WHOLE job on any per-file
            # error other than vanished-between-list-and-read (perms, a
            # transient object-store fault on one file), whereas the
            # driver loop warns and skips per file. Degrade to the
            # driver loop so an auto-selected parallel load keeps the
            # skip-invalid contract on unclean stores (r11 ADVICE).
            try:
                texts = self._read_metadata_parallel(paths)
            except Exception as e:  # Py4J wraps the job failure
                _logger.warning(
                    "Parallel catalog load failed; falling back to the"
                    " per-file driver loop",
                    exc_info=True,
                )
                warnings.warn(
                    "Parallel catalog load failed"
                    f" ({type(e).__name__}: {e}); falling back to the"
                    " per-file driver loop over"
                    f" {len(paths)} metadata files"
                )
                texts = self._read_metadata_driver(fs, paths)
        else:
            texts = self._read_metadata_driver(fs, paths)
        collected: list[DatasetMetadata] = []
        for meta_path, text in texts:
            try:
                collected.append(DatasetMetadata.from_json(text))
            except MetadataValidationError as e:
                warnings.warn(
                    f"Not a valid dataset metadata file {meta_path}: {e}"
                )
        self._datasets = collected
        return self

    def _read_metadata_driver(self, fs: FS, paths: list[str]):
        from .progress import progress

        out = []
        for meta_path in progress(paths, desc="loading catalog"):
            try:
                out.append((meta_path, fs.read_text(meta_path)))
            except OSError as e:
                warnings.warn(f"Could not read metadata file {meta_path}: {e}")
        return out

    def _read_metadata_parallel(self, paths: list[str]):
        """One whole-file distributed text read over every
        ``metadata.json`` — executors do the per-file round-trips in
        parallel instead of the driver doing them serially."""
        from pyspark.sql import functions as F

        if not paths:
            return []
        rows = (
            self._spark.read.format("text")
            .option("wholetext", "true")
            .option("ignoreMissingFiles", "true")
            .load(join(self.base_path, "*", "metadata.json"))
            .select(F.input_file_name().alias("p"), "value")
            .collect()
        )
        return [(r["p"], r["value"]) for r in rows]

    def list_datasets(
        self, as_df: bool = False
    ) -> Union[list[str], DataFrame]:
        """C1 (reference catalog.py:70-80): auto-load when empty."""
        if self._datasets is None:
            self.load()
        if as_df:
            import json as _json

            # Explicit schema: inference fails on all-None optional fields.
            schema = (
                "name string, created_at string, documents long, "
                "queries long, source string, license string, bucket string, "
                "task string, description string, tags array<string>, "
                "args string, dense_model_name string, "
                "dense_model_dimension long, sparse_model_name string"
            )
            rows = [
                (
                    m.name,
                    m.created_at,
                    m.documents,
                    m.queries,
                    m.source,
                    m.license,
                    m.bucket,
                    m.task,
                    m.description,
                    m.tags,
                    _json.dumps(m.args) if m.args is not None else None,
                    m.dense_model.name if m.dense_model else None,
                    m.dense_model.dimension if m.dense_model else None,
                    m.sparse_model.name if m.sparse_model else None,
                )
                for m in self._datasets
            ]
            return self._spark.createDataFrame(rows, schema)
        return [m.name for m in self._datasets]

    def load_dataset(self, dataset_id: str, **kwargs: Any) -> Dataset:
        """C2 (reference catalog.py:82-85)."""
        return Dataset.from_path(self._spark, join(self.base_path, dataset_id))

    def save_dataset(
        self, dataset: Dataset, single_file: bool = False, **kwargs: Any
    ) -> None:
        """C3 (reference catalog.py:87-97): write to base/<metadata.name>."""
        name = dataset.metadata.name
        if not name:
            raise ValueError("Dataset metadata must include a name to save")
        dataset.to_path(join(self.base_path, name), single_file=single_file)
        if self._datasets is not None:
            self._datasets.append(dataset.metadata)

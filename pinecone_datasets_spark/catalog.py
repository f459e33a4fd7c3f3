"""Dataset catalog: a directory of datasets.

Parity target: reference ``catalog.py:27-97`` — load (glob metadata.json,
skip invalid entries with a warning), list (names or DataFrame), load/save
dataset. The catalog is control-plane: listings happen on the driver; we
only materialize a Spark DataFrame when ``as_df=True`` is requested.
"""

from __future__ import annotations

import warnings
from typing import Any, Optional, Union

from pyspark.sql import DataFrame, SparkSession

from .cfg import catalog_base_path
from .dataset import Dataset
from .fs import FS, join, normalize_uri
from .metadata import DatasetMetadata, MetadataValidationError
from .retry import with_retry


class Catalog:
    def __init__(
        self, spark: SparkSession, base_path: Optional[str] = None
    ):
        self._spark = spark
        # Env-var override mirrors reference catalog.py:30-35.
        self.base_path = normalize_uri(base_path or catalog_base_path())
        self._datasets: Optional[list[DatasetMetadata]] = None

    @with_retry
    def load(self, **kwargs: Any) -> "Catalog":
        """S5 catalog scan (reference catalog.py:40-68): glob
        ``<base>/*/metadata.json``; skip malformed entries with a warning."""
        from .progress import progress

        fs = FS(self._spark)
        collected: list[DatasetMetadata] = []
        paths = fs.glob(join(self.base_path, "*", "metadata.json"))
        for meta_path in progress(paths, desc="loading catalog"):
            try:
                text = fs.read_text(meta_path)
            except OSError as e:
                warnings.warn(f"Could not read metadata file {meta_path}: {e}")
                continue
            try:
                collected.append(DatasetMetadata.from_json(text))
            except MetadataValidationError as e:
                warnings.warn(
                    f"Not a valid dataset metadata file {meta_path}: {e}"
                )
        self._datasets = collected
        return self

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

"""The Dataset abstraction.

Parity target: reference ``dataset.py:39-272`` — a pair of lazily loaded
tables (``documents``, ``queries``) plus ``DatasetMetadata``, with the full
access surface: ``from_path`` / ``from_pandas``, memoized table properties,
``head`` / ``__len__`` / ``__getitem__``, batched iteration
(``iter_documents`` / ``iter_queries``), and the deprecated stubs.

Spark-first: tables are Spark ``DataFrame`` handles — plan-lazy by nature
(strictly stronger than the reference's property memoization,
``dataset.py:171-195``); iteration streams partition-at-a-time through
``toLocalIterator`` instead of materializing the whole table in driver RAM.
"""

from __future__ import annotations

import json
from typing import Any, Iterator, Mapping, Optional, Union

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .cfg import (
    DOCUMENTS_SELECT_COLUMNS,
    QUERIES_SELECT_COLUMNS,
    SCHEMAS_BY_KIND,
)
from .conform import conform
from .fs import FS, normalize_uri
from .metadata import DatasetMetadata
from . import reader as _reader


def _row_to_dict(row: Any, json_cols: tuple[str, ...]) -> dict[str, Any]:
    """Row → plain dict at the egress edge; JSON-string columns become
    dicts there (the reference keeps dicts in memory; we keep JSON strings
    in the DataFrame and convert only at the row edge — SURVEY.md §7.1)."""
    d = row.asDict(recursive=True)
    for c in json_cols:
        v = d.get(c)
        if isinstance(v, str):
            try:
                d[c] = json.loads(v)
            except json.JSONDecodeError:
                pass
    return d


class Dataset:
    """A (documents, queries, metadata) triple backed by Spark DataFrames."""

    def __init__(
        self,
        spark: SparkSession,
        dataset_path: Optional[str] = None,
        documents: Optional[DataFrame] = None,
        queries: Optional[DataFrame] = None,
        metadata: Optional[DatasetMetadata] = None,
    ):
        self._spark = spark
        self._path = normalize_uri(dataset_path) if dataset_path else None
        self._documents = documents
        self._queries = queries
        self._metadata = metadata
        if self._path is not None:
            # Existence check at construction (reference dataset.py:151-154);
            # data is NOT read here (E1 trace: no job until first access).
            if not FS(spark).exists(self._path):
                raise FileNotFoundError(
                    f"Dataset does not exist. Please check the path: {self._path}"
                )

    # -- constructors -----------------------------------------------------
    @classmethod
    def from_path(cls, spark: SparkSession, dataset_path: str) -> "Dataset":
        """E1 entry point (reference dataset.py:40-50)."""
        return cls(spark, dataset_path=dataset_path)

    @classmethod
    def from_catalog(cls, dataset_id: str, **kwargs: Any) -> "Dataset":
        """Deprecated in the reference (dataset.py:241-252): raise with the
        migration message, for surface parity."""
        raise DeprecationWarning(
            "Dataset.from_catalog is deprecated. Please use "
            "load_dataset(dataset_id) instead."
        )

    @classmethod
    def from_dataframe(
        cls,
        spark: SparkSession,
        documents: Union[DataFrame, pd.DataFrame],
        metadata: DatasetMetadata,
        documents_column_mapping: Optional[Mapping[str, str]] = None,
        queries: Optional[Union[DataFrame, pd.DataFrame]] = None,
        queries_column_mapping: Optional[Mapping[str, str]] = None,
    ) -> "Dataset":
        """S6 in-memory source (reference ``from_pandas``, dataset.py:52-85):
        accepts Spark or pandas frames, applies rename + conformance."""
        docs_df = (
            documents
            if isinstance(documents, DataFrame)
            else spark.createDataFrame(documents)
        )
        docs_df = conform(docs_df, "documents", documents_column_mapping)
        if queries is None:
            _, qschema = SCHEMAS_BY_KIND["queries"]
            queries_df = spark.createDataFrame([], qschema)
        else:
            queries_df = (
                queries
                if isinstance(queries, DataFrame)
                else spark.createDataFrame(queries)
            )
            queries_df = conform(queries_df, "queries", queries_column_mapping)
        return cls(
            spark, documents=docs_df, queries=queries_df, metadata=metadata
        )

    # Reference-name alias.
    from_pandas = from_dataframe

    # -- table properties (memoized handles; plans stay lazy) -------------
    @property
    def documents(self) -> DataFrame:
        if self._documents is None:
            if self._path is None:
                raise ValueError(
                    "Dataset has no documents: constructed without a "
                    "dataset_path and without a documents DataFrame "
                    "(use Dataset.from_dataframe for in-memory data)"
                )
            self._documents = _reader.read_documents(self._spark, self._path)
        return self._documents

    @property
    def queries(self) -> DataFrame:
        if self._queries is None:
            if self._path is None:
                # In-memory dataset built without queries: an empty
                # conformant frame (the reference's documents-only
                # datasets have no queries/ dir and read as empty too).
                _, qschema = SCHEMAS_BY_KIND["queries"]
                self._queries = self._spark.createDataFrame([], qschema)
            else:
                self._queries = _reader.read_queries(self._spark, self._path)
        return self._queries

    @property
    def metadata(self) -> DatasetMetadata:
        if self._metadata is None:
            if self._path is None:
                raise ValueError(
                    "Dataset has no metadata: constructed without a "
                    "dataset_path and without a DatasetMetadata"
                )
            self._metadata = _reader.read_metadata(self._spark, self._path)
        return self._metadata

    # -- access surface ----------------------------------------------------
    def head(self, n: int = 5) -> DataFrame:
        """P7: reference dataset.py:238-239; CollectLimitExec, no full scan."""
        return self.documents.limit(n)

    def __len__(self) -> int:
        """P8: reference dataset.py:168-169."""
        return self.documents.count()

    def __getitem__(self, key: str) -> DataFrame:
        """P9: reference dataset.py:162-166."""
        if key in ("documents", "queries"):
            return getattr(self, key)
        raise KeyError(f"Dataset does not have key: {key}")

    def __repr__(self) -> str:
        meta = self._metadata.name if self._metadata else self._path
        return f"Dataset({meta!r})"

    # -- iteration egress ---------------------------------------------------

    # Above this row count iter_documents streams partition-at-a-time
    # instead of materializing one Arrow table on the driver.
    ARROW_EGRESS_MAX_ROWS = 2_000_000

    def _non_empty_select(
        self, df: DataFrame, cols: list[str]
    ) -> tuple[DataFrame, int]:
        """P6 drop-all-null-columns (reference dataset.py:215-217) as a
        single metadata-cheap aggregate: one pass of count(col) decides
        which optional columns survive (total row count rides along for
        free). Triggers one job — the reference also materializes here."""
        present = [c for c in cols if c in df.columns]
        counts = df.agg(
            F.count(F.lit(1)).alias("_n"),
            *[F.count(F.col(c)).alias(c) for c in present],
        ).collect()[0]
        keep = [c for c in present if (counts[c] or 0) > 0]
        # Required columns always survive (they are non-null by schema).
        out = df.select(*keep) if keep else df.select(*present)
        return out, counts["_n"]

    def _iter_dicts(
        self, df: DataFrame, n_rows: int, json_cols: tuple[str, ...]
    ) -> Iterator[dict[str, Any]]:
        """Row-dict egress. Arrow fast path (~20x over per-Row conversion;
        the reference holds the whole table in driver RAM too) under
        ARROW_EGRESS_MAX_ROWS; partition-streaming toLocalIterator above it.
        """
        if n_rows <= self.ARROW_EGRESS_MAX_ROWS:
            table = df.toArrow()
            # per-record-batch to_pylist, NOT the whole table at once:
            # one shot expanded every row into Python objects
            # simultaneously (768-dim float lists blow up ~30x over
            # their Arrow footprint), OOM-ing the driver on wide-vector
            # datasets that are well under the row threshold (r11
            # review). The Arrow table itself stays resident either way
            # (the reference holds the whole table too); only the
            # Python-object expansion is now batch-bounded.
            for rb in table.to_batches(max_chunksize=16_384):
                for d in rb.to_pylist():
                    for c in json_cols:
                        v = d.get(c)
                        if isinstance(v, str):
                            try:
                                d[c] = json.loads(v)
                            except json.JSONDecodeError:
                                pass
                    yield d
        else:
            for row in df.toLocalIterator(prefetchPartitions=True):
                yield _row_to_dict(row, json_cols)

    def iter_documents(
        self, batch_size: int = 1, return_indexes: bool = False
    ) -> Iterator[list[dict[str, Any]]]:
        """S13 batched egress (reference dataset.py:197-222)."""
        if not isinstance(batch_size, int) or batch_size < 1:
            # Message shape mirrors dataset.py:213-222.
            raise ValueError("batch_size must be greater than 0")
        df, n_rows = self._non_empty_select(
            self.documents, DOCUMENTS_SELECT_COLUMNS
        )
        offset = 0
        batch: list[dict[str, Any]] = []
        for d in self._iter_dicts(df, n_rows, ("metadata",)):
            batch.append(d)
            if len(batch) == batch_size:
                # return_indexes yields (start_offset, batch) tuples
                # (reference dataset.py:22-29)
                yield (offset, batch) if return_indexes else batch
                offset += batch_size
                batch = []
        if batch:
            yield (offset, batch) if return_indexes else batch

    def iter_queries(self) -> Iterator[dict[str, Any]]:
        """S14 single-row egress (reference dataset.py:224-236)."""
        df = self.queries.select(*QUERIES_SELECT_COLUMNS)
        n_rows = df.count()
        yield from self._iter_dicts(df, n_rows, ("filter",))

    # -- sinks ---------------------------------------------------------------
    def to_path(self, dataset_path: str, single_file: bool = False) -> None:
        from .writer import write_dataset

        write_dataset(self, dataset_path, single_file=single_file)

    def to_catalog(self, dataset_id: str, **kwargs: Any) -> None:
        """Deprecated in the reference (dataset.py:254-263)."""
        raise DeprecationWarning(
            "Dataset.to_catalog is deprecated. Please use "
            "Catalog.save_dataset(dataset) instead."
        )

    def to_pinecone_index(self, *args: Any, **kwargs: Any) -> None:
        """Removed in the reference v1.0 (dataset.py:265-272)."""
        raise DeprecationWarning(
            "to_pinecone_index has been removed. Please use the Pinecone SDK "
            "to upsert vectors (iterate with iter_documents)."
        )

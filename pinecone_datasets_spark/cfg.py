"""Schema constants for the two dataset tables.

Parity target: ``pinecone_datasets/cfg.py:21-54`` in the reference — the
``(name, is_nullable, null_value)`` triples for the ``documents`` and
``queries`` tables, plus the projection subsets used at the iteration edge.

Spark-first notes
-----------------
* ``metadata`` / ``filter`` / ``blob`` are stored as JSON *strings* at rest
  (reference: ``dataset_fswriter.py:93-102``) and we keep them as
  ``StringType`` inside the DataFrame too: round-trip exact, oracle-friendly,
  and accessible with ``get_json_object`` / ``from_json`` without a scan.
* ``sparse_values`` is a struct of two parallel arrays
  (reference: ``MAINTAINERS.md:97``).
* ``top_k`` is declared REQUIRED (non-nullable) by the reference
  (``cfg.py:34`` — ``("top_k", False, 5)``): a queries table without it
  raises, it is never back-filled. The ``5`` rides along as the declared
  default for documentation parity, but (exactly as in the reference,
  ``dataset_fsreader.py:128-139``) only *nullable* columns are back-filled,
  so it is unused on the read path.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Optional

from pyspark.sql import types as T

# Default public catalog base path (reference: cfg.py:6-8). Overridable via
# the same env var the reference honors (catalog.py:30-35).
DEFAULT_CATALOG_BASE_PATH = "gs://pinecone-datasets-dev"
CATALOG_BASE_PATH_ENV = "DATASETS_CATALOG_BASEPATH"


def catalog_base_path() -> str:
    return os.environ.get(CATALOG_BASE_PATH_ENV, DEFAULT_CATALOG_BASE_PATH)


SPARSE_VALUES_TYPE = T.StructType(
    [
        T.StructField("indices", T.ArrayType(T.LongType()), True),
        T.StructField("values", T.ArrayType(T.FloatType()), True),
    ]
)


@dataclass(frozen=True)
class ColumnSpec:
    """One ``(name, is_nullable, default)`` triple (reference cfg.py:21-36)."""

    name: str
    dtype: T.DataType
    nullable: bool  # False => required on read, raise if absent
    default: Optional[Any] = None  # back-fill value when absent & nullable


DOCUMENTS_COLUMNS: tuple[ColumnSpec, ...] = (
    ColumnSpec("id", T.StringType(), False),
    ColumnSpec("values", T.ArrayType(T.FloatType()), False),
    ColumnSpec("sparse_values", SPARSE_VALUES_TYPE, True),
    ColumnSpec("metadata", T.StringType(), True),  # JSON string at rest
    ColumnSpec("blob", T.StringType(), True),  # JSON string at rest
)

QUERIES_COLUMNS: tuple[ColumnSpec, ...] = (
    ColumnSpec("vector", T.ArrayType(T.FloatType()), False),
    ColumnSpec("sparse_vector", SPARSE_VALUES_TYPE, True),
    ColumnSpec("filter", T.StringType(), True),  # JSON Pinecone filter
    # Required, like the reference (cfg.py:34 is_nullable=False): missing
    # top_k raises rather than back-filling (dataset_fsreader.py:128-131).
    ColumnSpec("top_k", T.IntegerType(), False, 5),
    ColumnSpec("blob", T.StringType(), True),
)


def _schema(cols: tuple[ColumnSpec, ...]) -> T.StructType:
    return T.StructType([T.StructField(c.name, c.dtype, True) for c in cols])


DOCUMENTS_SCHEMA: T.StructType = _schema(DOCUMENTS_COLUMNS)
QUERIES_SCHEMA: T.StructType = _schema(QUERIES_COLUMNS)

# Projection subsets at the iteration edge (reference cfg.py:45,54):
# documents iteration drops ``blob``.
DOCUMENTS_SELECT_COLUMNS = ["id", "values", "sparse_values", "metadata"]
QUERIES_SELECT_COLUMNS = ["vector", "sparse_vector", "filter", "top_k"]

SCHEMAS_BY_KIND = {
    "documents": (DOCUMENTS_COLUMNS, DOCUMENTS_SCHEMA),
    "queries": (QUERIES_COLUMNS, QUERIES_SCHEMA),
}

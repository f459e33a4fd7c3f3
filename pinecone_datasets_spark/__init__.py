"""pinecone_datasets_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of pinecone-io/pinecone-datasets.

Layer A: the reference's full surface (catalog / load / validate / write /
iterate) re-expressed as lazy Spark plans. Layer B: the query semantics
the reference's data model declares but delegates (top-k vector search
with metadata filtering) plus the training-data pipeline operators
(dedup, similarity search, multimodal columns, text analysis), all
designed for the 100 TB / 1000-executor shape.
"""

__version__ = "0.1.0"

from .catalog import Catalog
from .cfg import (
    DOCUMENTS_SCHEMA,
    DOCUMENTS_SELECT_COLUMNS,
    QUERIES_SCHEMA,
    QUERIES_SELECT_COLUMNS,
)
from .dataset import Dataset
from .metadata import (
    DatasetMetadata,
    DenseModelMetadata,
    SparseModelMetadata,
    SparseModelMetdata,
)
from .functions.filters import compile_filter
from .public import list_datasets, load_dataset
from .cache import cache_info, clear_cache, get_cache_info, set_cache_dir
from .session import get_spark_session

__all__ = [
    "Catalog",
    "Dataset",
    "DatasetMetadata",
    "DenseModelMetadata",
    "SparseModelMetadata",
    "SparseModelMetdata",
    "DOCUMENTS_SCHEMA",
    "QUERIES_SCHEMA",
    "DOCUMENTS_SELECT_COLUMNS",
    "QUERIES_SELECT_COLUMNS",
    "compile_filter",
    "list_datasets",
    "load_dataset",
    "get_cache_info",
    "cache_info",
    "clear_cache",
    "set_cache_dir",
    "get_spark_session",
    "__version__",
]

"""Dataset readers (Spark-native).

Parity target: reference ``dataset_fsreader.py`` — multi-file parquet scan
(S1), documents/queries decode (S2/S3), metadata.json source (S4), and the
missing-vs-empty table semantics (C6):

* absent ``documents/`` or ``queries/`` dir → warn + empty DF with schema
  (``dataset_fsreader.py:143-151``)
* present-but-empty dir → ``ValueError("No parquet files found ...")``
  (``dataset_fsreader.py:115-116``)

Spark-first: one lazy ``spark.read.parquet(dir)`` replaces the reference's
glob → per-file pyarrow read → pd.concat loop (S1/U1); globbing, parallel
part reads, union, column pruning and predicate pushdown are native. Schema
conformance is plan surgery on the driver (see conform.py), so a missing
required column raises before any job runs.
"""

from __future__ import annotations

import warnings

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession

from .cfg import SCHEMAS_BY_KIND
from .conform import conform
from .fs import FS, join, normalize_uri
from .metadata import DatasetMetadata
from .retry import with_retry


def _read_table(spark: SparkSession, dataset_path: str, kind: str) -> DataFrame:
    """S1+S2/S3: scan ``<dataset_path>/<kind>/*.parquet`` and conform."""
    _, schema = SCHEMAS_BY_KIND[kind]
    table_dir = join(normalize_uri(dataset_path), kind)
    fs = FS(spark)
    if not fs.exists(table_dir):
        # C6: missing table dir → warn + empty DF with schema columns.
        warnings.warn(
            f"No data found at {table_dir}; returning empty {kind} dataframe"
        )
        return spark.createDataFrame([], schema)
    # The scan itself decides present-but-empty: a flat *.parquet glob
    # would wrongly reject hive-partitioned layouts (lang=…/part-*.parquet
    # from write_documents(partition_by=…)); Spark's reader discovers
    # nested part files and partition columns natively. mergeSchema
    # tolerates per-part schema drift the way the reference's pd.concat
    # did (test_error_scenarios.py:462-499); footers are read in a small
    # distributed job, data is not.
    try:
        df = spark.read.option("mergeSchema", "true").parquet(table_dir)
        df.schema  # force schema inference now, on the driver
    except AnalysisException as e:
        if "UNABLE_TO_INFER_SCHEMA" in str(e) or "infer schema" in str(e):
            # C6: present-but-empty dir → hard error
            # (dataset_fsreader.py:115-116).
            raise ValueError(
                f"No parquet files found in {table_dir}"
            ) from e
        raise
    return conform(df, kind)


@with_retry
def read_documents(spark: SparkSession, dataset_path: str) -> DataFrame:
    return _read_table(spark, dataset_path, "documents")


@with_retry
def read_queries(spark: SparkSession, dataset_path: str) -> DataFrame:
    return _read_table(spark, dataset_path, "queries")


@with_retry
def read_metadata(spark: SparkSession, dataset_path: str) -> DatasetMetadata:
    """S4: tiny driver-side JSON read — never a Spark job."""
    fs = FS(spark)
    path = join(normalize_uri(dataset_path), "metadata.json")
    if not fs.exists(path):
        raise FileNotFoundError(f"metadata.json not found at {path}")
    return DatasetMetadata.from_json(fs.read_text(path))

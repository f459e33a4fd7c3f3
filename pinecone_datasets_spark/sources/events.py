"""Event-table source with nanosecond-timestamp normalization.

The driver's ``events.parquet`` stores ``ts`` as Parquet
``TIMESTAMP(NANOS)``, which Spark's vectorized reader rejects outright
(PARQUET_TYPE_ILLEGAL). The Spark-native path: read nanos as raw longs
(``spark.sql.legacy.parquet.nanosAsLong``) and convert with *integer*
division to microseconds — ``ts div 1000`` then ``timestamp_micros`` —
matching the µs truncation every other engine (DuckDB, Arrow) applies.
A double-precision division would silently corrupt: ns-epoch values
(~1.7e18) exceed double's 53-bit mantissa.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NANOS_AS_LONG = "spark.sql.legacy.parquet.nanosAsLong"


def read_events(spark: SparkSession, path: str, ts_col: str = "ts") -> DataFrame:
    """Read an events parquet table, normalizing a nanos timestamp column
    to TimestampType (µs). Leaves the conf as it found it."""
    prev = spark.conf.get(NANOS_AS_LONG, None)
    spark.conf.set(NANOS_AS_LONG, "true")
    try:
        df = spark.read.parquet(path)
    finally:
        if prev is None:
            spark.conf.unset(NANOS_AS_LONG)
        else:
            spark.conf.set(NANOS_AS_LONG, prev)
    if ts_col in df.columns and dict(df.dtypes)[ts_col] == "bigint":
        df = df.withColumn(
            ts_col, F.timestamp_micros(F.expr(f"{ts_col} div 1000"))
        )
    return df

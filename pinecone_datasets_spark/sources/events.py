"""Event-table source with timestamp normalization (the ONE choke point).

The driver's ``events.parquet`` has shipped ``ts`` in two flavors across
fixture generations, and downstream operators (``unix_micros``,
``withWatermark``) accept only plain ``TIMESTAMP``:

- Parquet ``TIMESTAMP(NANOS)``, which Spark's vectorized reader rejects
  outright (PARQUET_TYPE_ILLEGAL). Spark-native path: read nanos as raw
  longs (``spark.sql.legacy.parquet.nanosAsLong``) and convert with
  *integer* division to microseconds — ``ts div 1000`` then
  ``timestamp_micros`` — matching the µs truncation every other engine
  (DuckDB, Arrow) applies. A double-precision division would silently
  corrupt: ns-epoch values (~1.7e18) exceed double's 53-bit mantissa.
- ``TIMESTAMP_NTZ``, which ``unix_micros`` / ``withWatermark`` REJECT
  (DATATYPE_MISMATCH). Normalized here by casting to ``TIMESTAMP`` with
  the session timezone pinned to UTC first, so the wall-clock is
  interpreted exactly the way DuckDB's ``epoch_us`` interprets a naive
  timestamp — deterministic regardless of host timezone.

Normalizing at this source (rather than at each consumer) is what keeps
the NTZ-crash class from ever reappearing: every events consumer —
sessionize, as-of join, range join, SCD2, streaming watermark — sees one
canonical TimestampType.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NANOS_AS_LONG = "spark.sql.legacy.parquet.nanosAsLong"
SESSION_TZ = "spark.sql.session.timeZone"


def read_events(spark: SparkSession, path: str, ts_col: str = "ts") -> DataFrame:
    """Read an events parquet table, normalizing the timestamp column
    (bigint-nanos or TIMESTAMP_NTZ) to TimestampType (µs, UTC wall
    clock). Leaves the nanos conf as it found it."""
    prev = spark.conf.get(NANOS_AS_LONG, None)
    spark.conf.set(NANOS_AS_LONG, "true")
    try:
        df = spark.read.parquet(path)
    finally:
        if prev is None:
            spark.conf.unset(NANOS_AS_LONG)
        else:
            spark.conf.set(NANOS_AS_LONG, prev)
    if ts_col not in df.columns:
        return df
    dtype = dict(df.dtypes)[ts_col]
    if dtype == "bigint":
        df = df.withColumn(
            ts_col, F.timestamp_micros(F.expr(f"{ts_col} div 1000"))
        )
    elif dtype == "timestamp_ntz":
        # Pin UTC so NTZ wall-clock → epoch is deterministic and agrees
        # with DuckDB's naive-timestamp-as-UTC semantics. The cast's
        # timezone is bound when the (eager) withColumn is analyzed, so
        # set-and-restore leaves the session conf untouched afterwards —
        # a read must not repoint timestamp semantics for later queries.
        prev_tz = spark.conf.get(SESSION_TZ, None)
        spark.conf.set(SESSION_TZ, "UTC")
        try:
            df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        finally:
            if prev_tz is None:
                spark.conf.unset(SESSION_TZ)
            else:
                spark.conf.set(SESSION_TZ, prev_tz)
    return df

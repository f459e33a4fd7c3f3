"""Window-function operators: sessionization and running aggregates.

Layer-B breadth over the ``events`` / ``orders`` fixtures. Both are pure
window plans: one shuffle on the partition key, sequential scan inside
each partition — the shape that scales linearly with partition count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Assign gap-based sessions per user and aggregate them.

    Classic lag/cumsum shape: a new session starts where the gap to the
    previous event exceeds ``gap_minutes``; the running sum of starts is
    the session index. One shuffle (partitionBy user), sequential within.
    Returns (user_id, session_idx, session_start, session_end, n_events).
    """
    # unix_micros rejects TIMESTAMP_NTZ; normalize to TIMESTAMP (NTZ wall
    # clock read in the session timezone — pin UTC upstream for determinism)
    if dict(events.dtypes).get(ts_col) == "timestamp_ntz":
        events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    gap_us = gap_minutes * 60 * 1_000_000
    prev = F.lag(F.col(ts_col)).over(w)
    is_start = F.when(
        prev.isNull()
        | ((F.unix_micros(F.col(ts_col)) - F.unix_micros(prev)) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    cum = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    with_sess = events.withColumn("_start", is_start).withColumn(
        "session_idx", F.sum("_start").over(cum)
    )
    return (
        with_sess.groupBy(user_col, "session_idx")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def running_total(
    df: DataFrame,
    partition_col: str,
    order_cols: list[str],
    value_col: str,
    alias: str = "running_total",
) -> DataFrame:
    """Cumulative sum per partition in a deterministic order."""
    w = (
        Window.partitionBy(partition_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(alias, F.sum(value_col).over(w))

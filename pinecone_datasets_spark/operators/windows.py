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
    salt_window_minutes: int | None = None,
) -> DataFrame:
    """Assign gap-based sessions per user and aggregate them.

    Classic lag/cumsum shape: a new session starts where the gap to the
    previous event exceeds ``gap_minutes``; the running sum of starts is
    the session index. One shuffle (partitionBy user), sequential within.
    Returns (user_id, session_idx, session_start, session_end, n_events).

    ``salt_window_minutes`` is the hot-key hook: ``partitionBy(user)``
    funnels ALL of a user's events through one task, so a single bot
    user with 10^9 events turns a 1000-executor job into a straggler —
    the window analogue of the skewed-join problem ``skew.py`` solves
    (replication doesn't apply to a sequential window, so the fix is
    decomposition instead). When set, events are bucketed into coarse
    time windows of that width and sessionized PER (user, bucket) —
    parallelism multiplies by the bucket count — then the identical
    lag/cumsum runs again over the per-bucket *session summaries*
    (gap measured end→start) to merge sessions straddling bucket edges.
    Buckets partition time, so local sessions are time-disjoint and the
    summary merge is EXACT: output is row-identical to the unsalted
    path (equivalence-tested), while the sequential span per task drops
    from O(user's events) to O(one bucket's events) + O(user's local
    sessions). Must exceed ``gap_minutes``; size it so one bucket of
    the hottest key fits a task (e.g. a day for a per-second bot).
    """
    # unix_micros rejects TIMESTAMP_NTZ; normalize to TIMESTAMP (NTZ wall
    # clock read in the session timezone — pin UTC upstream for determinism)
    if dict(events.dtypes).get(ts_col) == "timestamp_ntz":
        events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    gap_us = gap_minutes * 60 * 1_000_000

    def _lag_cumsum_sessions(df, part_cols, start_expr, end_expr, n_expr):
        """The one session algorithm, shared by both levels: order by
        interval start, break where the gap to the previous interval's
        END exceeds the gap, cumsum the breaks, aggregate."""
        w = Window.partitionBy(*part_cols).orderBy(*start_expr)
        prev_end = F.lag(end_expr).over(w)
        is_start = F.when(
            prev_end.isNull()
            | (
                (F.unix_micros(F.col("__s")) - F.unix_micros(prev_end))
                > gap_us
            ),
            F.lit(1),
        ).otherwise(F.lit(0))
        cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        return (
            df.withColumn("__start_flag", is_start)
            .withColumn("session_idx", F.sum("__start_flag").over(cum))
            .groupBy(*part_cols, "session_idx")
            .agg(
                F.min("__s").alias("session_start"),
                F.max(end_expr).alias("session_end"),
                n_expr.alias("n_events"),
            )
        )

    if salt_window_minutes is None:
        base = events.select(
            F.col(user_col),
            F.col(ts_col).alias("__s"),
            F.col(order_tiebreak).alias("__tb"),
        )
        # events are zero-width intervals: end == start, n == row count
        return _lag_cumsum_sessions(
            base,
            [user_col],
            [F.col("__s"), F.col("__tb")],
            F.col("__s"),
            F.count(F.lit(1)),
        ).select(
            user_col,
            "session_idx",
            "session_start",
            "session_end",
            F.col("n_events").cast("long").alias("n_events"),
        )

    if salt_window_minutes <= gap_minutes:
        raise ValueError(
            f"salt_window_minutes ({salt_window_minutes}) must exceed "
            f"gap_minutes ({gap_minutes}) — buckets narrower than the "
            "gap merge everything at the summary level anyway"
        )
    bucket_us = int(salt_window_minutes) * 60 * 1_000_000
    bucketed = events.select(
        F.col(user_col),
        F.col(ts_col).alias("__s"),
        F.col(order_tiebreak).alias("__tb"),
        F.floor(F.unix_micros(F.col(ts_col)) / F.lit(bucket_us)).alias(
            "__bkt"
        ),
    )
    # level 1: sessions within (user, time bucket) — buckets partition
    # time, so these are exact except at bucket edges
    local = Window.partitionBy(user_col, "__bkt").orderBy("__s", "__tb")
    prev = F.lag(F.col("__s")).over(local)
    is_start = F.when(
        prev.isNull()
        | ((F.unix_micros(F.col("__s")) - F.unix_micros(prev)) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    lcum = local.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local_sessions = (
        bucketed.withColumn("_start", is_start)
        .withColumn("__lidx", F.sum("_start").over(lcum))
        .groupBy(user_col, "__bkt", "__lidx")
        .agg(
            F.min("__s").alias("__s"),
            F.max("__s").alias("__e"),
            F.count(F.lit(1)).alias("__n"),
        )
    )
    # level 2: the same lag/cumsum over session SUMMARIES (per-user rows
    # = local session count, not event count) — merges edge-straddlers
    return _lag_cumsum_sessions(
        local_sessions,
        [user_col],
        [F.col("__s")],
        F.col("__e"),
        F.sum("__n"),
    ).select(
        user_col,
        "session_idx",
        "session_start",
        "session_end",
        F.col("n_events").cast("long").alias("n_events"),
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

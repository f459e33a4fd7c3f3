"""Stream-stream interval join with watermark-bounded state (§2.8).

The streaming twin of ``operators/ranges.range_join``: pair events from
two live streams when the right event's time falls within a window
around the left event's time, same key.

Structured Streaming supports this natively — an equi-key join plus an
event-time range condition. What makes it production-shaped is the state
bound: BOTH sides carry a watermark, and the time-range condition lets
the engine compute exactly how long a buffered row can still match
(left rows expire ``upper`` past their event time, right rows
``-lower``), so state is evicted instead of growing without bound. A
stream-stream join without a time bound would buffer both streams
forever — the streaming analogue of the batch theta-join scale-killer.

Inner joins emit as soon as both sides arrive; results are append-mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_seconds: int = -300,
    upper_seconds: int = 0,
    watermark: str = "1 hour",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Join rows of two streams sharing ``on`` where
    ``right.ts ∈ [left.ts + lower_seconds, left.ts + upper_seconds]``.

    Both inputs must be streaming DataFrames with event-time columns;
    non-key/non-ts columns are prefixed. The watermark is applied to both
    sides (join-state eviction needs watermarks on each input).
    """
    if lower_seconds > upper_seconds:
        raise ValueError(
            f"lower_seconds ({lower_seconds}) > upper_seconds "
            f"({upper_seconds})"
        )
    l = left.select(
        F.col(on).alias(f"{left_prefix}{on}"),
        F.col(left_ts).alias(f"{left_prefix}{left_ts}"),
        *[
            F.col(c).alias(f"{left_prefix}{c}")
            for c in left.columns
            if c not in (on, left_ts)
        ],
    ).withWatermark(f"{left_prefix}{left_ts}", watermark)
    r = right.select(
        F.col(on).alias(f"{right_prefix}{on}"),
        F.col(right_ts).alias(f"{right_prefix}{right_ts}"),
        *[
            F.col(c).alias(f"{right_prefix}{c}")
            for c in right.columns
            if c not in (on, right_ts)
        ],
    ).withWatermark(f"{right_prefix}{right_ts}", watermark)

    lts, rts = f"{left_prefix}{left_ts}", f"{right_prefix}{right_ts}"
    cond = (
        (F.col(f"{left_prefix}{on}") == F.col(f"{right_prefix}{on}"))
        & (
            F.col(rts)
            >= F.col(lts) + F.expr(f"INTERVAL {lower_seconds} SECONDS")
        )
        & (
            F.col(rts)
            <= F.col(lts) + F.expr(f"INTERVAL {upper_seconds} SECONDS")
        )
    )
    return l.join(r, cond, "inner")

"""Custom stateful streaming operator: gap-based session tracking.

The batch twin lives in ``operators/windows.py:sessionize`` (lag+cumsum);
a stream can't window over unbounded history, so this is the
``applyInPandasWithState`` formulation: per-user state carries the open
session across micro-batches, sessions close when the gap exceeds the
timeout, and state is bounded by the number of concurrently-open sessions
— the canonical custom-stateful-operator shape from the brief.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_STATE_SCHEMA = (
    "start_us long, last_us long, n_events long"
)


def _session_fn(gap_minutes: int, use_timeout: bool):
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import pandas as pd  # re-import: runs on workers

        (user_id,) = key
        rows = pd.concat(list(pdfs), ignore_index=True)
        # NULL event times MUST be dropped before the ns->µs cast: NaT's
        # int64 sentinel (-2^63) otherwise becomes a year-1677 "event"
        # whose closing session overflows pd.to_datetime — one poison
        # record would kill the whole streaming query (r11 fuzz).
        ts = rows["ts"].dropna()
        ts_us = (ts.astype("int64") // 1000).sort_values().tolist()

        # Interval-merge sweep instead of a last_us-only fold: the open
        # session from state is just another interval, and each event a
        # point interval. Sorting by start and merging where the gap to
        # the previous interval's END is <= gap handles out-of-order
        # arrivals ACROSS micro-batches — the old fold set
        # last_us = t unconditionally, so one late event regressed the
        # session end and a following on-time event spuriously split
        # the session (r11 fuzz). Late chains that bridge into the open
        # session merge correctly for the same reason.
        intervals = []
        if state.exists:
            s0, e0, n0 = state.get
            intervals.append((s0, e0, n0))
        intervals.extend((t, t, 1) for t in ts_us)
        intervals.sort()
        merged: list = []
        for s, e, n in intervals:
            if merged and s - merged[-1][1] <= gap_us:
                ms, me, mn = merged[-1]
                merged[-1] = (ms, max(me, e), mn + n)
            else:
                merged.append((s, e, n))

        closed = [(user_id, s, e, n) for s, e, n in merged[:-1]]
        if use_timeout and state.hasTimedOut:
            if merged:
                s, e, n = merged[-1]
                closed.append((user_id, s, e, n))
            state.remove()
        elif merged:
            state.update(merged[-1])
            if use_timeout:
                state.setTimeoutDuration(gap_minutes * 60 * 1000)
        # (merged empty = no prior state AND only-NULL timestamps this
        # batch: leave the key stateless, nothing to emit)

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": pd.to_datetime(
                        [c[1] for c in closed], unit="us"
                    ),
                    "session_end": pd.to_datetime(
                        [c[2] for c in closed], unit="us"
                    ),
                    "n_events": [c[3] for c in closed],
                }
            )

    return fn


def streaming_sessionize(
    events: DataFrame, gap_minutes: int = 30, use_timeout: bool = True
) -> DataFrame:
    """Closed sessions per user over a streaming events source.

    One stateful shuffle on user_id; state per user is three longs. Open
    sessions close when a later event exceeds the gap or — with
    ``use_timeout`` — when the processing-time timeout fires with no new
    data. Pass ``use_timeout=False`` for bounded replays (availableNow):
    a pending processing-time timeout keeps the trigger alive ("no new
    data but cleaning up state") until it fires, which for a gap-sized
    timeout means the drain blocks ~gap_minutes.
    """
    from ..shipping import ensure_shipped

    ensure_shipped(events.sparkSession)
    return events.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_minutes, use_timeout),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if use_timeout
            else GroupStateTimeout.NoTimeout
        ),
    )

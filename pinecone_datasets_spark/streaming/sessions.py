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
        ts_us = (
            rows["ts"].astype("int64") // 1000
        ).sort_values().tolist()  # ns -> µs, event-time order

        if state.exists:
            start_us, last_us, n_events = state.get
        else:
            start_us = last_us = None
            n_events = 0

        closed = []
        for t in ts_us:
            if start_us is None:
                start_us, last_us, n_events = t, t, 1
            elif t - last_us > gap_us:
                closed.append((user_id, start_us, last_us, n_events))
                start_us, last_us, n_events = t, t, 1
            else:
                last_us = t
                n_events += 1

        if use_timeout and state.hasTimedOut:
            if start_us is not None:
                closed.append((user_id, start_us, last_us, n_events))
            state.remove()
        else:
            state.update((start_us, last_us, n_events))
            if use_timeout:
                state.setTimeoutDuration(gap_minutes * 60 * 1000)

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

"""Stateful streaming anomaly detection: rolling z-score over a live
bucketed series.

The batch twin is ``operators/timeseries.py:rolling_zscore`` (bounded
trailing ROWS frame). A stream cannot window over history it has
already emitted, so this is the ``applyInPandasWithState`` formulation:
per-key state carries the last ``window`` (bucket, value) pairs across
micro-batches, each arriving bucket is scored against the state values
strictly BEFORE it (the batch twin's current-row exclusion), then
appended and the state re-trimmed — state is exactly ``window`` pairs
per key, forever, regardless of stream length.

Feed it FINALIZED buckets — the append-mode output of a watermarked
windowed aggregate (``ingest.windowed_event_counts``): append mode
emits each window once, after the watermark passes it, so buckets
arrive approximately event-time-ordered. A bucket that still arrives
behind its key's newest state bucket is scored best-effort against the
state values before it (never against later ones); with the watermark
ahead of it the aggregate would not have re-emitted it anyway.

Same contract as the batch twin: z is NULL while the trailing window
has fewer than ``min_periods`` values or zero variance (warm-up and
flat-line are "can't judge", not "normal"); sample stddev.
"""

from __future__ import annotations

import math
from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = "bucket_us array<long>, vals array<double>"


def _anomaly_fn(window: int, min_periods: int, tau: float):
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import pandas as pd  # re-import: runs on workers

        (k,) = key
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values("bucket").reset_index(drop=True)
        ts_us = (rows["bucket"].astype("int64") // 1000).tolist()
        vals_in = rows["v"].astype("float64").tolist()

        if state.exists:
            b_us, vals = state.get
            b_us, vals = list(b_us), list(vals)
        else:
            b_us, vals = [], []

        zs: list = []
        flags: list = []
        for t, v in zip(ts_us, vals_in):
            prior = [x for bu, x in zip(b_us, vals) if bu < t][-window:]
            z = None
            if len(prior) >= min_periods:
                mean = sum(prior) / len(prior)
                var = sum((x - mean) ** 2 for x in prior) / (
                    len(prior) - 1
                )
                std = math.sqrt(var)
                if std > 0:
                    z = (v - mean) / std
            zs.append(z)
            flags.append(None if z is None else abs(z) > tau)
            # insert in bucket order (append is the common case)
            if not b_us or t >= b_us[-1]:
                b_us.append(t)
                vals.append(v)
            else:
                import bisect

                i = bisect.bisect_left(b_us, t)
                b_us.insert(i, t)
                vals.insert(i, v)
        state.update((b_us[-window:], vals[-window:]))

        yield pd.DataFrame(
            {
                "key": [k] * len(rows),
                "bucket": rows["bucket"],
                "v": vals_in,
                "zscore": pd.array(zs, dtype="Float64"),
                "is_anomaly": pd.array(flags, dtype="boolean"),
            }
        )

    return fn


def stream_rolling_zscore(
    buckets: DataFrame,
    key_col: str = "event_type",
    bucket_col: str = "bucket",
    value_col: str = "v",
    window: int = 24,
    min_periods: int = 4,
    tau: float = 3.0,
) -> DataFrame:
    """Per-key rolling z-scores over a streaming bucketed series:
    returns ``(key, bucket, v, zscore, is_anomaly)`` in append mode.

    One stateful shuffle on the key; state per key is ``window``
    (long, double) pairs. Input needs one row per (key, bucket) —
    the windowed aggregate upstream guarantees that."""
    if window < 1:
        raise ValueError(f"window must be >= 1: {window}")
    if min_periods < 2:
        raise ValueError(f"min_periods must be >= 2: {min_periods}")
    from ..shipping import ensure_shipped

    ensure_shipped(buckets.sparkSession)
    out_schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("bucket", T.TimestampType()),
            T.StructField("v", T.DoubleType()),
            T.StructField("zscore", T.DoubleType()),
            T.StructField("is_anomaly", T.BooleanType()),
        ]
    )
    from pyspark.sql import functions as F

    src = buckets.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(bucket_col).alias("bucket"),
        F.col(value_col).cast("double").alias("v"),
    )
    return src.groupBy("key").applyInPandasWithState(
        _anomaly_fn(window, min_periods, tau),
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

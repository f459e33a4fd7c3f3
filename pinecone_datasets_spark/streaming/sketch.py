"""Streaming heavy hitters: Misra-Gries state over hash-bucketed keys.

The batch twin (`operators/sketch.py:mg_heavy_hitters`) summarizes per
PARTITION and merges; a stream instead keeps one live MG summary per
HASH BUCKET as `applyInPandasWithState` state. Bucketing by a stable
hash of the value does two jobs at once:

* **parallelism** — state work spreads over ``n_buckets`` tasks instead
  of one global summary (the single-key formulation would funnel the
  whole stream through one task);
* **exact routing** — every occurrence of a value lands in exactly one
  bucket, so no cross-summary merge is ever needed and the per-bucket
  Misra-Gries guarantee IS the global one:

      est ≤ true ≤ est + dec(bucket of value)

  with dec(bucket) ≤ n_bucket/(capacity+1). Total state is bounded at
  ``n_buckets × capacity`` counters forever, regardless of stream
  length or distinct-key count.

Each micro-batch emits the bucket's full current summary (update
semantics): downstream keeps the latest row per (bucket, value) — with
`availableNow` over a static directory the final emission equals what
the batch operator reports, which is how the equivalence test pins it.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

MG_OUTPUT_SCHEMA = (
    "bucket int, value string, est_count long, dec long, bucket_n long"
)

_MG_STATE_SCHEMA = "keys array<string>, counts array<long>, dec long, n long"


def _mg_fn(capacity: int):
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import pandas as pd  # runs on workers

        (bucket,) = key
        if state.exists:
            keys, counts, dec, n = state.get
            counters = dict(zip(keys, counts))
        else:
            counters, dec, n = {}, 0, 0

        for pdf in pdfs:
            for v in pdf["value"]:
                if v is None:
                    continue
                n += 1
                if v in counters:
                    counters[v] += 1
                elif len(counters) < capacity:
                    counters[v] = 1
                else:
                    dec += 1
                    counters = {
                        k: c - 1 for k, c in counters.items() if c > 1
                    }

        state.update(
            (list(counters.keys()), list(counters.values()), dec, n)
        )
        if counters:
            yield pd.DataFrame(
                {
                    "bucket": bucket,
                    "value": list(counters.keys()),
                    "est_count": list(counters.values()),
                    "dec": dec,
                    "bucket_n": n,
                }
            )

    return fn


def stream_heavy_hitters(
    stream: DataFrame,
    value_col: str,
    capacity: int = 1024,
    n_buckets: int = 64,
) -> DataFrame:
    """Live frequent-items summary over a stream (update semantics).

    Values are cast to string (state arrays need one type; the original
    column is recoverable for string/numeric keys). Output rows carry
    the per-bucket decrement total ``dec`` — the deterministic error
    bound for every value of that bucket — and ``bucket_n`` so shares
    can be computed without a second aggregation.
    """
    keyed = stream.select(
        F.pmod(F.xxhash64(F.col(value_col).cast("string")), n_buckets)
        .cast("int")
        .alias("bucket"),
        F.col(value_col).cast("string").alias("value"),
    )
    return keyed.groupBy("bucket").applyInPandasWithState(
        _mg_fn(capacity),
        outputStructType=MG_OUTPUT_SCHEMA,
        stateStructType=_MG_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_cm_sketch(
    stream: DataFrame, value_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Live Count-Min sketch over a stream.

    Unlike Misra-Gries (whose value-addressed summary needs custom
    `applyInPandasWithState`), the CM sketch IS a streaming stateful
    aggregation of built-ins: the batch plan — explode each row into
    ``depth`` (row, bucket) pairs, ``groupBy(row, bucket).count()`` —
    runs unchanged on a streaming frame, with the engine's aggregation
    state bounded at d×w counter cells FOREVER, regardless of stream
    length or distinct-value count. No Python state function, no
    timeout plumbing, checkpoint-recoverable for free.

    Run with output mode ``complete`` (the sketch is tiny, re-emitting
    it whole each trigger is the cheap option) or ``update``. With
    ``availableNow`` over a static directory the final emission equals
    the batch ``operators.sketch.cm_sketch`` exactly — same md5 bucket
    hash, so snapshots stay DuckDB-replayable. Point estimates: run
    ``operators.sketch.cm_estimate`` over any emitted snapshot.
    """
    # delegate to the batch operator, exactly like stream_hll_registers:
    # the plan is identical (streaming-legal built-ins only), and a
    # divergent inline copy could silently drift from the "equals batch
    # cell-for-cell" contract if the batch hash or NULL handling ever
    # changed (r11 review)
    from ..operators.sketch import cm_sketch

    return cm_sketch(stream, value_col, depth, width)


def stream_hll_registers(
    stream: DataFrame,
    value_col: str,
    group_cols: "str | list[str] | None" = None,
    p: int = 10,
) -> DataFrame:
    """Live HyperLogLog registers over a stream.

    Like ``stream_cm_sketch``, the batch plan (`operators/sketch.py:
    hll_registers` — map-only hash projection + ``groupBy(group,
    reg).max(rho)``) runs UNCHANGED on a streaming frame: max() is a
    streaming-legal stateful aggregation whose state is bounded at
    ``2**p`` rows per group forever, regardless of stream length or
    distinct-value count. No Python state function, checkpoint-
    recoverable for free.

    The harmonic fold is a SECOND aggregation (illegal to chain in one
    streaming query): run ``operators.sketch.hll_estimate`` over any
    emitted register snapshot — registers are the mergeable/portable
    artifact anyway. With ``availableNow`` over a static directory the
    final emission equals batch ``hll_registers`` exactly (same md5
    arithmetic), so snapshots stay DuckDB-replayable via ``hll_sql``.

    Output mode: ``update`` (emit changed registers) or ``complete``.
    """
    from ..operators.sketch import hll_registers

    return hll_registers(stream, value_col, group_cols, p)

"""As-of join: match each left row to the latest right row at-or-before it.

Spark has no ASOF JOIN (DuckDB/Pandas do; SPARK-22947 was never merged),
and the naive formulations are scale-killers: a correlated subquery or an
inequality theta-join degenerates to a per-key cross product. The
distributed-native plan used here is the union-tag trick:

1. union the two sides with a tag (right rows carry a struct of their
   payload columns, left rows carry null),
2. one window partitioned by the join key, ordered by (ts, tag, tiebreak),
   frame ``ROWS UNBOUNDED PRECEDING .. CURRENT ROW``,
3. ``last(payload, ignorenulls=True)`` — each left row picks up the most
   recent right payload at-or-before its timestamp,
4. keep the left rows and unpack the struct.

Cost model: ONE shuffle of (|L| + |R|) rows on the join key; the window
frame is a *running* frame, which Spark's WindowExec evaluates
incrementally (O(1) state per row — no per-partition buffering of the
whole frame). No cross product at any point, so a hot key costs
O(n log n) sort, not O(n^2) pairs. This is the plan that survives 100 TB.

Ordering at equal timestamps: right rows sort BEFORE left rows (tag 0 < 1)
so a match at exactly ``left_ts == right_ts`` is included (inclusive
as-of, DuckDB's default). Among right rows sharing a timestamp the
``tiebreak`` column decides (the largest wins, being last in frame) —
required for deterministic output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PAYLOAD = "__asof_payload"
_TAG = "__asof_tag"
_TS = "__asof_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    tiebreak: str | None = None,
    tolerance=None,
    suffix: str = "_matched",
) -> DataFrame:
    """Backward (latest-at-or-before) as-of join.

    Returns every ``left`` row with ``<right_col><suffix>`` columns holding
    the payload of the matched right row (null when no right row precedes,
    or the match falls outside ``tolerance``), plus ``<right_ts><suffix>``.

    ``tolerance``: optional Column/literal (same unit as the ts columns,
    e.g. an INTERVAL for timestamps) — matches older than
    ``left_ts - tolerance`` are nulled out, like pandas ``merge_asof``.
    ``tiebreak``: right column deciding among equal-timestamp right rows
    (max wins); defaults to the first of ``right_cols``.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in keys and c != right_ts
        ]
    if tiebreak is None:
        # a right frame carrying ONLY keys + timestamp (e.g. "when did
        # this key last update?") has no payload column to break ties
        # with — fall back to the timestamp itself instead of
        # IndexError-ing on right_cols[0] (r11 review)
        tiebreak = right_cols[0] if right_cols else right_ts
    carried = list(dict.fromkeys([right_ts, *right_cols]))

    payload = F.struct(*[F.col(c) for c in carried])
    r = right.select(
        *keys,
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_TAG),
        F.col(tiebreak).alias("__asof_tb"),
        payload.alias(_PAYLOAD),
    )
    l = left.select(
        F.struct(*left.columns).alias("__asof_row"),
        *[F.col(k) for k in keys],
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_TAG),
        F.lit(None).cast(r.schema["__asof_tb"].dataType).alias("__asof_tb"),
        F.lit(None).cast(r.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy(_TS, _TAG, "__asof_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        r.unionByName(l, allowMissingColumns=True)
        .withColumn(_PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w))
        .where(F.col(_TAG) == 1)
    )
    if tolerance is not None:
        matched = matched.withColumn(
            _PAYLOAD,
            F.when(
                F.col(_PAYLOAD)[right_ts] >= F.col(_TS) - tolerance,
                F.col(_PAYLOAD),
            ),
        )
    out_cols = [F.col(f"__asof_row.{c}").alias(c) for c in left.columns]
    out_cols += [
        F.col(_PAYLOAD)[c].alias(f"{c}{suffix}") for c in carried
    ]
    return matched.select(*out_cols)

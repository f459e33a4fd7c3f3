"""Changelog application and SCD Type-2 history construction.

A mutable table arriving as a changelog (CDC stream, upsert feed) needs
two standard materializations:

- ``changelog_apply`` — the *latest-state snapshot*: last row per key by
  sequence, delete ops removed. The row_number filter is ``rn = 1`` with
  a literal bound, so Spark rewrites it to ``WindowGroupLimit`` — each
  shuffle partition forwards at most one row per key past the partial
  top-k, and the full history never crosses the exchange unsummarized.

- ``scd2_history`` — the *Type-2 dimension*: consecutive rows whose
  tracked attributes are unchanged are collapsed, each surviving change
  becomes a validity interval ``[valid_from, valid_to)`` with
  ``is_current`` on the open row.

Cost model (both): ONE shuffle of the changelog on the key. In
``scd2_history`` the change-detection ``lag`` window and the interval
``lead`` window share the same partitioning AND ordering, and the filter
between them preserves both, so Catalyst plans a single Exchange + a
single Sort feeding both WindowExecs — collapsing the history costs no
more than scanning it. At 100 TB the working set per task is one key
group, never the whole table.
"""

from __future__ import annotations

import functools
from operator import or_

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def changelog_apply(
    changelog: DataFrame,
    keys: str | list[str],
    seq_col: str,
    op_col: str | None = None,
    delete_ops: tuple[str, ...] = ("delete", "D"),
    tiebreak: str | None = None,
) -> DataFrame:
    """Latest row per key by ``seq_col``; rows whose final op is a delete
    are dropped. ``tiebreak`` breaks equal-sequence ties (largest wins)
    for deterministic output."""
    key_list = [keys] if isinstance(keys, str) else list(keys)
    order = [F.col(seq_col).desc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).desc())
    w = Window.partitionBy(*key_list).orderBy(*order)
    latest = (
        changelog.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)  # literal bound -> WindowGroupLimit
        .drop("__rn")
    )
    if op_col is not None:
        # NULL-safe: feeds that only tag deletes leave op NULL on
        # upserts; a bare NOT IN evaluates to NULL there and WHERE
        # silently dropped the entire snapshot (r11 review). Only an
        # EXPLICIT delete op drops a row.
        latest = latest.where(
            F.col(op_col).isNull() | ~F.col(op_col).isin(*delete_ops)
        )
    return latest


def _any_change(state_cols: list[str], w) -> Column:
    return functools.reduce(
        or_,
        [~F.col(c).eqNullSafe(F.lag(c).over(w)) for c in state_cols],
    )


def scd2_history(
    changelog: DataFrame,
    keys: str | list[str],
    state_cols: str | list[str],
    ts_col: str,
    tiebreak: str | None = None,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Collapse a changelog into SCD Type-2 validity intervals.

    Rows where every ``state_cols`` value equals the previous row's (per
    key, ordered by ``ts_col`` then ``tiebreak``) are dropped; each
    surviving change carries ``valid_from = ts``, ``valid_to`` = next
    change's ts (null while current), and ``is_current``.
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    states = [state_cols] if isinstance(state_cols, str) else list(state_cols)
    order = [F.col(ts_col)]
    if tiebreak is not None:
        order.append(F.col(tiebreak))
    w = Window.partitionBy(*key_list).orderBy(*order)

    # First row per key must survive even if its state is null-equal to
    # the (absent) predecessor. row_number()==1, NOT lag(ts).isNull():
    # with a NULL ts in the changelog (sorted first), the row AFTER it
    # also saw lag(ts) NULL and was kept despite an unchanged state —
    # duplicate validity intervals (r11 review).
    changes = (
        changelog.withColumn("__rn", F.row_number().over(w))
        .withColumn(
            "__chg", (F.col("__rn") == 1) | _any_change(states, w)
        )
        .where(F.col("__chg"))
        .drop("__rn")
    )

    out = (
        changes.withColumn(valid_from, F.col(ts_col))
        .withColumn(valid_to, F.lead(ts_col).over(w))
        .withColumn(current_col, F.col(valid_to).isNull())
        .drop("__chg")
    )
    return out

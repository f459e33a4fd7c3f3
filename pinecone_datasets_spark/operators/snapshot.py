"""Corpus snapshot diff: what changed between two dataset versions.

Training corpora are rebuilt continuously (recrawls, license removals,
re-extraction); before shipping version N+1 a pipeline wants the exact
delta against version N — how many documents appeared, vanished, or
changed content — both for audit (takedown compliance: is the removed
doc really gone?) and for incremental downstream work (re-embed only
the changed slice instead of the whole corpus). The reference persists
versioned datasets but has no diff surface (catalog.py:87-97 writes,
never compares); Layer-B extension.

Scale shape (two 100 TB snapshots):

* Content identity is the exact-dedup fingerprint
  (``functions.text.doc_fingerprint``) computed MAP-SIDE on each scan —
  the join carries (id, 16-byte fp), never text.
* One full-outer sort-merge join co-partitioned on the id — the
  unavoidable shuffle, and the only one; both sides are corpus-sized
  so neither broadcasts. Snapshots bucketed by id on write make even
  that exchange-free.
* ``snapshot_summary`` folds the diff to 4 counter rows (map-side
  partial agg).

The default emits only the changed slice (``added``/``removed``/
``changed``); ``include_unchanged=True`` keeps the full outer result
when the caller needs a complete manifest.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import doc_fingerprint


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    fingerprint_col: Optional[str] = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Row-level delta between two corpus snapshots keyed on ``id_col``:
    ``(id, status, old_fingerprint, new_fingerprint)`` with ``status ∈
    {'added', 'removed', 'changed'}`` (+ ``'unchanged'`` when
    ``include_unchanged``).

    Content identity is the normalized exact-dedup fingerprint of
    ``text_col``; pass ``fingerprint_col`` to diff on a precomputed
    digest instead (e.g. a stored content hash, skipping the text
    scan)."""

    def fp(df: DataFrame, alias: str, marker: str) -> DataFrame:
        c: Column = (
            F.col(fingerprint_col)
            if fingerprint_col
            else doc_fingerprint(F.col(text_col))
        )
        # presence marker, NOT fingerprint nullness: a present row with
        # NULL text yields a NULL fingerprint, and deciding added/
        # removed from the fingerprint misclassified it — a REMOVED
        # null-text doc reported as 'added' in a takedown-audit surface
        # (r11 review; same _observed-marker pattern as
        # timeseries.gapfill)
        return df.select(
            F.col(id_col), c.alias(alias), F.lit(1).alias(marker)
        )

    j = fp(old, "old_fingerprint", "__old_p").join(
        fp(new, "new_fingerprint", "__new_p"), id_col, "full_outer"
    )
    status = (
        F.when(F.col("__old_p").isNull(), F.lit("added"))
        .when(F.col("__new_p").isNull(), F.lit("removed"))
        .when(
            # null-safe: NULL→'x' and 'x'→NULL are real content changes;
            # NULL→NULL is unchanged
            ~F.col("old_fingerprint").eqNullSafe(F.col("new_fingerprint")),
            F.lit("changed"),
        )
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(
        F.col(id_col),
        status.alias("status"),
        "old_fingerprint",
        "new_fingerprint",
    )
    if not include_unchanged:
        out = out.where(F.col("status") != "unchanged")
    return out


def snapshot_summary(diff: DataFrame) -> DataFrame:
    """Fold a ``snapshot_diff`` frame to one row per status:
    ``(status, n)`` — the audit headline."""
    return diff.groupBy("status").agg(F.count(F.lit(1)).alias("n"))


def diff_datasets(
    catalog,
    old_name: str,
    new_name: str,
    id_col: str = "id",
    content_cols: Optional[list] = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Diff two cataloged dataset versions' documents tables (the
    Layer-A tie-in: ``Catalog.save_dataset`` writes versions,
    ``diff_datasets`` audits what changed between two of them).

    Content identity is ``md5(to_json(struct(content_cols)))`` —
    ``content_cols`` defaults to every shared non-id column, so any
    change to values, metadata, or sparse vectors flips the
    fingerprint. Same output contract and scale shape as
    ``snapshot_diff`` (map-side digests, one full-outer join on id)."""
    old = catalog.load_dataset(old_name).documents
    new = catalog.load_dataset(new_name).documents
    if content_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        content_cols = [c for c in shared if c != id_col]
    if not content_cols:
        raise ValueError("no shared content columns to diff on")
    digest = F.md5(F.to_json(F.struct(*[F.col(c) for c in content_cols])))
    return snapshot_diff(
        old.select(F.col(id_col), digest.alias("_fp")),
        new.select(F.col(id_col), digest.alias("_fp")),
        id_col=id_col,
        fingerprint_col="_fp",
        include_unchanged=include_unchanged,
    )

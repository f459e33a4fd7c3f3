"""Table maintenance: small-file compaction and range-clustered rewrite.

Long-running ingest (especially the streaming sinks) leaves parquet
directories with many small part files; at 100 TB that means scan tasks
dominated by open/footer overhead, NameNode/object-store listing
pressure, and a parallelism profile Catalyst can't fix after the fact.
Compaction is the standard maintenance pass: rewrite the directory into
files near a target size, optionally range-clustered on a column so
min/max row-group stats enable file- and row-group-level pruning of
later predicate scans.

Plan shape: ONE distributed read → repartition (round-robin for plain
compaction, ``repartitionByRange`` for clustered layout) → one write.
Target file count derives from the measured input bytes, not a guess.
The rewrite goes to a sibling temp directory first and swaps in only
after the new directory's row count is verified equal. Crash safety
(r11): a crash before the swap leaves the original untouched; a crash
BETWEEN the two renames leaves the data complete in ``__pre_compact``
(nothing at the live path), and the next run restores it before doing
anything else; a crash after the swap leaves a stale backup the next
run discards. No crash point loses data or leaves a mixed directory,
and no stale state can wedge later compactions.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession

from ..fs import _local_path, is_local, normalize_uri


def plan_file_count(total_bytes: int, target_file_bytes: int) -> int:
    """Files needed to land near the target size (at least 1)."""
    if target_file_bytes <= 0:
        raise ValueError(f"target_file_bytes must be > 0: {target_file_bytes}")
    return max(1, -(-total_bytes // target_file_bytes))


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    cluster_by: str | None = None,
) -> int:
    """Rewrite a parquet directory into ~``target_file_bytes`` files.

    ``cluster_by``: range-partition the rewrite on this column, giving
    globally sorted, non-overlapping files whose parquet min/max stats
    let later range/equality predicates skip whole files.

    Returns the number of files written. Local paths only in this
    environment (the swap uses filesystem rename); the read/repartition/
    write plan itself is connector-agnostic.
    """
    norm = normalize_uri(path)
    if not is_local(norm):
        raise NotImplementedError(
            "compact_parquet_dir: remote swap not wired in this "
            "environment; run against a local/posix path"
        )
    local = _local_path(norm)

    tmp = local.rstrip("/") + "__compacting"
    backup = local.rstrip("/") + "__pre_compact"
    # Crash recovery BEFORE anything else (r11 review): a prior run
    # dying between the two renames leaves the data stranded in
    # __pre_compact with nothing at `local` — restore it; a prior run
    # dying after the swap but before cleanup leaves a stale backup
    # that would make this run's os.rename(local, backup) fail with
    # ENOTEMPTY — drop it (the live dir is the one that counts).
    if os.path.isdir(backup):
        if not os.path.isdir(local):
            os.rename(backup, local)
        else:
            shutil.rmtree(backup)

    parts = [
        os.path.join(dp, f)
        for dp, _, files in os.walk(local)
        for f in files
        if f.endswith(".parquet")
    ]
    if not parts:
        raise ValueError(f"No parquet files found in {path}")
    total_bytes = sum(os.path.getsize(p) for p in parts)
    n_files = plan_file_count(total_bytes, target_file_bytes)

    df = spark.read.parquet(local)
    n_rows = df.count()
    out = (
        df.repartitionByRange(n_files, cluster_by)
        if cluster_by
        else df.repartition(n_files)
    )

    shutil.rmtree(tmp, ignore_errors=True)
    out.write.mode("overwrite").parquet(tmp)

    n_new = spark.read.parquet(tmp).count()
    if n_new != n_rows:
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            f"compaction row-count mismatch: {n_rows} -> {n_new}; "
            f"original left untouched"
        )
    os.rename(local, backup)
    os.rename(tmp, local)
    shutil.rmtree(backup)
    return len(
        [f for f in os.listdir(local) if f.endswith(".parquet")]
    )

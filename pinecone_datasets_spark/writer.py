"""Dataset writer (Spark-native).

Parity target: reference ``dataset_fswriter.py`` — S7 (documents sink), S8
(queries sink; warn+skip when empty), S9 (metadata.json sink), S10 ordering
(documents → queries → metadata; metadata last acts as the commit marker,
see the partial-write test ``test_error_scenarios.py:251-290``).

Spark-first divergences (documented per SURVEY.md §7 hard-parts):
* Multi-part output is the default — executors write parts in parallel.
  ``single_file=True`` restores the reference's ``part-0.parquet`` layout
  via ``coalesce(1)`` (kills write parallelism; compat only).
* No caller-DataFrame mutation: Spark plans are immutable, so the
  reference's mutate-then-restore-in-finally bug class
  (``dataset_fswriter.py:40-55``) cannot occur here.
"""

from __future__ import annotations

import threading
import warnings
from contextlib import contextmanager
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame

from .fs import FS, join, normalize_uri
from .retry import with_retry

if TYPE_CHECKING:  # pragma: no cover
    from .dataset import Dataset


def _write_table(
    df: DataFrame,
    table_dir: str,
    single_file: bool,
    partition_by: list[str] | None = None,
) -> None:
    out = df.coalesce(1) if single_file else df
    writer = out.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(table_dir)


def write_documents(
    df: DataFrame,
    dataset_path: str,
    single_file: bool = False,
    partition_by: list[str] | None = None,
) -> None:
    """S7. ``metadata``/``blob`` are already JSON strings in our model, so
    the reference's dict→JSON encode step (F2) is a no-op here.

    ``partition_by`` (scale extension): hive-partition the documents dir
    by derived columns (e.g. a metadata field hoisted with
    ``get_json_object``, or an IVF cell id) so downstream filtered reads
    get partition pruning from the Parquet scan."""
    _write_table(df, join(dataset_path, "documents"), single_file, partition_by)


def write_queries(df: DataFrame, dataset_path: str, single_file: bool = False) -> None:
    """S8: skip + warn when empty (dataset_fswriter.py:60-61). When the
    TARGET already holds a queries/ dir (overwriting an older version),
    the stale dir is renamed aside to ``queries__stale`` — skipping
    silently left v1's queries under v2's metadata and read-back served
    them as current (r11 review), while DELETING was destructive: an
    upstream bug that accidentally emptied the queries frame during a
    re-save would destroy the previously saved queries with only a
    warning (r11 ADVICE). The rename keeps the bytes recoverable and
    still hides them from the reader (which only loads ``queries/``)."""
    if df.isEmpty():
        from .fs import FS

        qdir = join(dataset_path, "queries")
        fs = FS(df.sparkSession)
        if fs.exists(qdir):
            stale = join(dataset_path, "queries__stale")
            warnings.warn(
                "Queries dataframe is empty; renaming the existing"
                f" queries dir aside to {stale} (a skip would leave the"
                " old version's queries under the new metadata; a delete"
                " would be unrecoverable if the empty frame is an"
                " upstream bug)"
            )
            fs.delete(stale)
            fs.rename(qdir, stale)
        else:
            warnings.warn(
                f"Queries dataframe is empty; skipping write to {dataset_path}"
            )
        return
    _write_table(df, join(dataset_path, "queries"), single_file)


@with_retry
def _write_metadata_json(fs: FS, dataset_path: str, meta_json: str) -> None:
    fs.write_text(join(dataset_path, "metadata.json"), meta_json)


# Two in-process threads re-saving the SAME dataset path interleave their
# mode("overwrite") table writes: each clears the dir, both add their own
# uniquely-named part files, and the survivor holds the UNION of both
# versions' rows (observed: 50-row v1 + two racing 60-row v2 saves ->
# 120 rows). Serialize whole-dataset saves per normalized path; different
# paths stay fully parallel. Entries are refcounted and evicted when the
# last holder releases, so long-lived sessions saving many distinct
# paths do not leak a lock per path (r13 ADVICE). Cross-PROCESS races
# are out of scope here — that is the object-store commit protocol's
# job (manifest sinks).
_path_locks: dict[str, list] = {}  # path -> [lock, holders]
_path_locks_guard = threading.Lock()


@contextmanager
def _save_lock(path: str):
    with _path_locks_guard:
        entry = _path_locks.setdefault(path, [threading.Lock(), 0])
        entry[1] += 1
    try:
        with entry[0]:
            yield
    finally:
        with _path_locks_guard:
            entry[1] -= 1
            if entry[1] == 0:
                _path_locks.pop(path, None)


def write_dataset(dataset: "Dataset", dataset_path: str, single_file: bool = False) -> None:
    """S10 orchestration: documents → queries → metadata (commit marker)."""
    dataset_path = normalize_uri(dataset_path)
    with _save_lock(dataset_path):
        fs = FS(dataset._spark)
        fs.mkdirs(dataset_path)
        write_documents(dataset.documents, dataset_path, single_file)
        write_queries(dataset.queries, dataset_path, single_file)
        _write_metadata_json(fs, dataset_path, dataset.metadata.to_json())

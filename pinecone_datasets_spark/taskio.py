"""Task-side file commit — the ONE implementation of the two commit
protocols shared by every sink that writes raw files from executor
tasks (``operators/shards.py``, ``sources/warc.py:write_wet``).

Why it exists: a retried or speculative task attempt must never
interleave bytes into a file another attempt is writing. Two modes:

* ``rename`` (default): each attempt writes to a name suffixed with
  its task-attempt id (which never matches any reader's glob), then
  renames into place only once complete — the last completed attempt
  wins atomically. REQUIRES a filesystem shared by driver and
  executors with atomic rename (local mode, NFS, FUSE mounts with
  rename semantics); object-store mounts without atomic rename need
  ``spark.speculation=false`` instead.

* ``manifest`` (r8 verdict item 3 — the object-store-safe commit
  log): each attempt writes directly to an attempt-UNIQUE final name
  (one PUT, no rename needed), and the driver — which hears back from
  exactly ONE winning attempt per task — lists the winners' names in
  ``manifest.json``. Readers opting into the manifest
  (``use_manifest=True``) read only the listed files, so an orphaned
  loser attempt (a speculative twin that also finished, or a zombie
  that died mid-write) is simply never opened. This removes the
  atomic-rename / no-speculation requirement entirely; the only
  atomicity needed is the single driver-side manifest write.
"""

from __future__ import annotations

import os

COMMIT_MODES = ("rename", "manifest")


def task_attempt_id() -> int:
    """This task attempt's unique id (pid outside a task, e.g. in
    driver-side tests)."""
    from pyspark import TaskContext

    tc = TaskContext.get()
    return tc.taskAttemptId() if tc is not None else os.getpid()


def attempt_tmp_path(final_path: str) -> str:
    """Attempt-unique temp name for ``final_path`` (``.inprogress-<id>``
    — a suffix no reader glob in this package matches). Rename mode."""
    return f"{final_path}.inprogress-{task_attempt_id()}"


def attempt_stem(stem: str) -> str:
    """Attempt-unique FINAL stem for manifest mode (``<stem>-a<id>``):
    the file is written once under this name and never renamed; the
    manifest decides whether it is ever read."""
    return f"{stem}-a{task_attempt_id()}"


def chaos_failpoint(point: str) -> None:
    """Fault-injection point for ``tools/chaoscheck.py`` / the retry
    tests: when ``SPARK_GRAFT_CHAOS_WRITE`` is set in the worker's
    environment, the FIRST attempt of every task that reaches this
    point dies here — simulating a task lost between staging its
    output and committing it (the failure mode ``spark.task.
    maxFailures`` retries and speculative execution re-race daily on a
    1000-executor cluster). Production cost is one ``os.environ.get``;
    outside a task (driver-side tests) it never fires, so the planted
    death only ever exercises the REAL task-retry path."""
    if not os.environ.get("SPARK_GRAFT_CHAOS_WRITE"):
        return
    from pyspark import TaskContext

    tc = TaskContext.get()
    if tc is not None and tc.attemptNumber() == 0:
        raise RuntimeError(
            f"chaos failpoint {point!r}: planted task death"
            f" (stage={tc.stageId()} partition={tc.partitionId()}"
            " attempt=0)"
        )


def commit_file(tmp_path: str, final_path: str) -> None:
    """Atomically publish a fully-written temp file (rename mode)."""
    chaos_failpoint("pre-commit")
    os.replace(tmp_path, final_path)

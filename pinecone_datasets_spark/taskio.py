"""Task-side atomic file commit — the ONE implementation of the
attempt-suffixed-temp + ``os.replace`` protocol shared by every sink
that writes raw files from executor tasks (``operators/shards.py``,
``sources/warc.py:write_wet``).

Why it exists: a retried or speculative task attempt must never
interleave bytes into a file another attempt is writing. Each attempt
writes to a name suffixed with its task-attempt id (which never matches
any reader's glob), then renames into place only once complete — the
last completed attempt wins atomically. REQUIRES a filesystem shared by
driver and executors with atomic rename (local mode, NFS, FUSE mounts
with rename semantics); object-store mounts without atomic rename need
``spark.speculation=false`` instead.
"""

from __future__ import annotations

import os


def attempt_tmp_path(final_path: str) -> str:
    """Attempt-unique temp name for ``final_path`` (``.inprogress-<id>``
    — a suffix no reader glob in this package matches)."""
    from pyspark import TaskContext

    tc = TaskContext.get()
    attempt = tc.taskAttemptId() if tc is not None else os.getpid()
    return f"{final_path}.inprogress-{attempt}"


def commit_file(tmp_path: str, final_path: str) -> None:
    """Atomically publish a fully-written temp file."""
    os.replace(tmp_path, final_path)

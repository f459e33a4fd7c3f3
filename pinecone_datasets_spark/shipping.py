"""Self-shipping: make this package importable on Spark workers.

Python kernels (``pandas_udf`` / ``mapInPandas``) that reference
module-level functions are cloudpickled *by reference* — the worker
process must be able to ``import pinecone_datasets_spark``. That holds
when the package is pip-installed or the worker inherits the right cwd,
but not when the driver merely did ``sys.path.insert``. Rather than make
every kernel artificially self-contained, the UDF construction sites call
``ensure_shipped(spark)``: zip this package once per session and
``addPyFile`` it, which distributes to every executor (local or cluster).
"""

from __future__ import annotations

import os
import tempfile
import uuid
import zipfile

_SHIPPED_SESSIONS: set[int] = set()


def ensure_shipped(spark) -> None:
    key = id(spark.sparkContext)
    if key in _SHIPPED_SESSIONS:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    zip_path = os.path.join(
        tempfile.gettempdir(), f"{pkg_name}-{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        # build at a temp name and publish with os.replace: a process
        # killed mid-zip (or a second session racing this one) must
        # never leave a PARTIAL zip that a later exists() check ships
        # to every executor as the package (r12 review). The uuid keeps
        # two THREADS of one process from interleaving writes into the
        # same temp file (a PID alone doesn't) — both then publish a
        # complete zip and the second os.replace is a harmless no-op
        # swap of identical content (r12 ADVICE).
        tmp_path = f"{zip_path}.building-{os.getpid()}-{uuid.uuid4().hex}"
        with zipfile.ZipFile(tmp_path, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fname in sorted(files):
                    if not fname.endswith(".py"):
                        continue
                    full = os.path.join(root, fname)
                    rel = os.path.join(
                        pkg_name, os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
        os.replace(tmp_path, zip_path)
    spark.sparkContext.addPyFile(zip_path)
    _SHIPPED_SESSIONS.add(key)

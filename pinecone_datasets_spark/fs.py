"""Path / filesystem helpers (driver-side).

Parity target: reference ``fs.py:16-81`` — scheme dispatch (gcs/s3/local,
plus the public https endpoints) and existence checks. On Spark the data
plane goes through Hadoop-compatible connectors, so instead of fsspec
filesystem *objects* we normalize URIs (``s3://`` → ``s3a://``, public
https endpoints → their native scheme) and do tiny driver-side metadata
I/O (metadata.json, catalog listing) through either ``os`` (local) or the
JVM Hadoop FileSystem when a remote URI is used.
"""

from __future__ import annotations

import glob as _glob
import json
import os
from typing import Any, Optional
from urllib.parse import urlparse

# Public endpoints recognized by the reference (fs.py:16-31).
_GCS_HTTP_PREFIX = "https://storage.googleapis.com/"
_S3_HTTP_PREFIX = "https://s3.amazonaws.com/"


def normalize_uri(path: str) -> str:
    """Rewrite a dataset URI to the scheme Spark's connectors expect."""
    if path.startswith(_GCS_HTTP_PREFIX):
        return "gs://" + path[len(_GCS_HTTP_PREFIX):]
    if path.startswith(_S3_HTTP_PREFIX):
        return "s3a://" + path[len(_S3_HTTP_PREFIX):]
    if path.startswith("s3://"):
        return "s3a://" + path[len("s3://"):]
    return path


def ensure_anonymous_access(spark: Any, path: str) -> bool:
    """Configure Hadoop connectors for unauthenticated reads of the PUBLIC
    dataset endpoint.

    Reference parity: ``fs.py:67-77`` passes ``token="anon"`` /
    ``anon=True`` to fsspec iff the path IS the public endpoint
    (``cfg.Storage.endpoint``). On Spark the data plane goes through the
    Hadoop GCS/S3A connectors, so the equivalent is connector config:

    * GCS: ``fs.gs.auth.type=UNAUTHENTICATED`` (gcs-connector ≥ 2.2; the
      pre-2.2 ``fs.gs.auth.null.enabled=true`` pair is set too).
      **Session-global caveat (r11)**: the GCS connector has no
      per-bucket credential scoping (unlike S3A), so these keys affect
      every ``gs://`` read in the session — a ``UserWarning`` is
      emitted when they are applied; sessions that also read private
      GCS buckets should use a separate SparkSession for the public
      catalog.
    * S3A: the per-bucket ``fs.s3a.bucket.<name>.aws.credentials.provider``
      is pointed at ``AnonymousAWSCredentialsProvider`` — scoped so other
      buckets keep the user's credential chain.

    Only applies when ``path`` IS the public catalog endpoint or lies
    strictly under it (path-segment boundary — a sibling bucket whose
    name merely shares the prefix does not match; r11 review).
    Returns True when configs were applied.
    Offline note: no object store is reachable from the test environment;
    this sets the documented connector keys and is covered by
    config-assertion tests only.
    """
    from .cfg import DEFAULT_CATALOG_BASE_PATH

    norm = normalize_uri(path)
    endpoint = normalize_uri(DEFAULT_CATALOG_BASE_PATH).rstrip("/")
    # exact endpoint or a path-segment child: a bare startswith matched
    # unrelated buckets sharing the name prefix (…-dev-backup) and
    # anonymized them too (r11 review)
    if norm.rstrip("/") != endpoint and not norm.startswith(endpoint + "/"):
        return False
    if spark is None:
        return False
    conf = spark._jsc.hadoopConfiguration()
    if norm.startswith("gs://"):
        import warnings

        warnings.warn(
            "enabling UNAUTHENTICATED GCS auth for the public dataset"
            " endpoint: the GCS connector has no per-bucket credential"
            " scoping, so private gs:// reads in THIS session will also"
            " go unauthenticated — use a separate SparkSession for"
            " credentialed GCS access",
            UserWarning,
            stacklevel=2,
        )
        conf.set("fs.gs.auth.type", "UNAUTHENTICATED")
        conf.set("fs.gs.auth.null.enabled", "true")
        conf.set("fs.gs.auth.service.account.enable", "false")
    elif norm.startswith("s3a://"):
        bucket = urlparse(norm).netloc
        conf.set(
            f"fs.s3a.bucket.{bucket}.aws.credentials.provider",
            "org.apache.hadoop.fs.s3a.AnonymousAWSCredentialsProvider",
        )
    return True


def scheme_of(path: str) -> str:
    parsed = urlparse(path)
    return parsed.scheme if parsed.scheme not in ("", "file") else "file"


def is_local(path: str) -> bool:
    return scheme_of(path) == "file"


def join(base: str, *parts: str) -> str:
    base = base.rstrip("/")
    tail = "/".join(p.strip("/") for p in parts if p)
    return f"{base}/{tail}" if tail else base


def _local_path(path: str) -> str:
    if path.startswith("file://"):
        return urlparse(path).path
    return path


class _HadoopFS:
    """Thin wrapper over the JVM Hadoop FileSystem for remote URIs."""

    def __init__(self, spark: Any, uri: str):
        jvm = spark._jvm
        jsc = spark._jsc
        self._conf = jsc.hadoopConfiguration()
        self._jvm = jvm
        self._path_cls = jvm.org.apache.hadoop.fs.Path
        self._fs = self._path_cls(uri).getFileSystem(self._conf)

    def exists(self, path: str) -> bool:
        return self._fs.exists(self._path_cls(path))

    def glob(self, pattern: str) -> list[str]:
        statuses = self._fs.globStatus(self._path_cls(pattern))
        if statuses is None:
            return []
        return [s.getPath().toString() for s in statuses]

    def read_text(self, path: str) -> str:
        stream = self._fs.open(self._path_cls(path))
        try:
            # JVM IOUtils does all the byte plumbing — no manual byte[]
            # handling from Python is needed (r11: dropped a dead
            # bytearray and an unused getattr round-trip here)
            baos = self._jvm.java.io.ByteArrayOutputStream()
            self._jvm.org.apache.hadoop.io.IOUtils.copyBytes(
                stream, baos, self._conf, False
            )
            return bytes(baos.toByteArray()).decode("utf-8")
        finally:
            stream.close()

    def write_text(self, path: str, text: str) -> None:
        stream = self._fs.create(self._path_cls(path), True)
        try:
            stream.write(bytearray(text.encode("utf-8")))
        finally:
            stream.close()

    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._path_cls(path))

    def delete(self, path: str, recursive: bool = True) -> None:
        self._fs.delete(self._path_cls(path), recursive)

    def rename(self, src: str, dst: str) -> bool:
        return self._fs.rename(self._path_cls(src), self._path_cls(dst))


class FS:
    """Unified driver-side FS facade: local fast-path, Hadoop for remote."""

    def __init__(self, spark: Optional[Any] = None):
        self._spark = spark

    def _hadoop(self, uri: str) -> _HadoopFS:
        if self._spark is None:
            raise ValueError(
                f"remote URI {uri!r} requires an active SparkSession"
            )
        # Public-endpoint URIs flip the connector to anonymous auth before
        # the filesystem is constructed (reference fs.py:67-77 parity);
        # every driver-side metadata touch passes through here before the
        # data-plane scan, so the config lands ahead of both.
        ensure_anonymous_access(self._spark, uri)
        return _HadoopFS(self._spark, uri)

    def exists(self, path: str) -> bool:
        path = normalize_uri(path)
        if is_local(path):
            return os.path.exists(_local_path(path))
        return self._hadoop(path).exists(path)

    def glob(self, pattern: str) -> list[str]:
        pattern = normalize_uri(pattern)
        if is_local(pattern):
            return sorted(_glob.glob(_local_path(pattern)))
        return sorted(self._hadoop(pattern).glob(pattern))

    def delete(self, path: str, recursive: bool = True) -> None:
        """Remove a file or directory tree (no-op when absent)."""
        path = normalize_uri(path)
        if is_local(path):
            lp = _local_path(path)
            if os.path.isdir(lp):
                import shutil

                shutil.rmtree(lp) if recursive else os.rmdir(lp)
            elif os.path.exists(lp):
                os.remove(lp)
            return
        self._hadoop(path).delete(path, recursive)

    def read_json(self, path: str) -> Any:
        return json.loads(self.read_text(path))

    def read_text(self, path: str) -> str:
        path = normalize_uri(path)
        if is_local(path):
            with open(_local_path(path), "r", encoding="utf-8") as f:
                return f.read()
        return self._hadoop(path).read_text(path)

    def write_text(self, path: str, text: str) -> None:
        path = normalize_uri(path)
        if is_local(path):
            lp = _local_path(path)
            os.makedirs(os.path.dirname(lp), exist_ok=True)
            with open(lp, "w", encoding="utf-8") as f:
                f.write(text)
            return
        self._hadoop(path).write_text(path, text)

    def mkdirs(self, path: str) -> None:
        path = normalize_uri(path)
        if is_local(path):
            os.makedirs(_local_path(path), exist_ok=True)
            return
        self._hadoop(path).mkdirs(path)

    def rename(self, src: str, dst: str) -> None:
        """Move a file or directory tree (dst must not exist)."""
        src, dst = normalize_uri(src), normalize_uri(dst)
        if is_local(src) and is_local(dst):
            dst_local = _local_path(dst)
            # Hadoop's rename refuses an existing destination; keep the
            # local fast-path on the same contract instead of letting
            # os.replace silently clobber (r12 ADVICE). The check-then-
            # replace window is fine: callers stage under attempt-unique
            # names, so a racing dst appearing here is itself a bug we
            # want loud.
            if os.path.exists(dst_local):
                raise OSError(
                    f"rename failed, destination exists: {src!r} ->"
                    f" {dst!r}"
                )
            os.replace(_local_path(src), dst_local)
            return
        if not self._hadoop(src).rename(src, dst):
            raise OSError(f"rename failed: {src!r} -> {dst!r}")

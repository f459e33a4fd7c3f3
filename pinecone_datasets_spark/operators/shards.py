"""Indexed token-shard sink/loader: the training-loader egress.

After curation → tokenization (``bpe.bpe_tokenize_udf(ids=True)``) →
packing, an LLM training job wants token ids as flat binary shards with
a sidecar index — the Megatron-LM "indexed dataset" shape (public
format family; this is a self-contained variant, spec below) that a
dataloader can memory-map and slice without any decode. This module
writes and reads that layout Spark-natively.

Format (little-endian throughout):

* ``shard-NNNNN.bin`` — each document's token ids concatenated, as
  uint16 or uint32.
* ``shard-NNNNN.idx`` — ``TOKIDX01`` magic (8 bytes), dtype size
  (1 byte: 2 or 4), padding (7 bytes), doc count (uint64), then per
  document ``(doc_id int64, token_count int64)`` in file order. Byte
  offsets are prefix sums of counts × dtype size — derivable, not
  stored.
* ``manifest.json`` — shard list in name order with per-shard doc and
  token totals plus the dtype, so a loader can size epochs without
  touching the shards.

Scale shape (the parts that must survive 100 TB):

* **Write**: ONE shuffle on the shard key (``xxhash64(id) % shards``,
  deterministic), then each shard is streamed out by its own task via
  ``applyInPandas`` — token bytes never visit the driver; the driver
  collects only per-shard summary rows (= shard count) to write the
  manifest. Within a shard, docs are written in id order, so output
  bytes are reproducible run-to-run.
* **Read**: ``binaryFile`` over the ``.idx``/``.bin`` pairs — one task
  per shard, the same whole-file grain as the WARC source (shard size
  is chosen at write time, so the grain is under the pipeline's
  control).
* Fail-loud: token ids must fit the dtype and be non-negative (the
  BPE encoder marks unknown tokens as -1 precisely so this guard
  trips instead of wrapping to 65535).

Reference scope note: the reference (pinecone-io/pinecone-datasets) has
no training egress; Layer-B extension (SURVEY.md §2 "beyond the
reference"), cited against its data model only (cfg.py:23-36).
"""

from __future__ import annotations

import json
import os
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MAGIC = b"TOKIDX01"
_DTYPES = {"uint16": 2, "uint32": 4}


def _load_manifest(path: str, missing_ok: bool = False, spark=None):
    """Driver-side ``manifest.json`` load through the FS facade
    (``fs.py``) so it works on object-store URIs — where non-atomic
    rename makes the commit='manifest' refusal matter — not just local
    paths (r10 code review; same fix as ``sources/warc.py``).

    Error taxonomy matters here (second r10 review): ABSENT degrades
    to None under ``missing_ok`` (plain directories have no manifest),
    and a CORRUPT/mid-write manifest likewise degrades the best-effort
    glob-mode check (ADVICE r9 low) — but a TRANSIENT read error on a
    file that exists (throttle, credentials) RAISES in both modes:
    letting it degrade would silently bypass the commit='manifest'
    double-read refusal on exactly the storage class where transient
    errors are routine."""
    from ..fs import FS, join as _fsjoin

    fs = FS(spark)
    mpath = _fsjoin(path, "manifest.json")
    if not fs.exists(mpath):
        if missing_ok:
            return None
        raise FileNotFoundError(
            f"use_manifest=True but no manifest.json in {path}"
        )
    try:
        text = fs.read_text(mpath)
    except Exception as e:
        raise IOError(
            f"manifest.json exists in {path} but could not be read"
            f" (transient storage error? will not silently fall back"
            f" to the glob reader): {e}"
        )
    try:
        return json.loads(text)
    except ValueError as e:
        if missing_ok:
            return None  # mid-write/corrupt: degrade the glob check
        # ValueError, NOT FileNotFoundError (ADVICE r10): callers that
        # catch FileNotFoundError to mean "absent" must not misclassify
        # a corrupt/mid-write manifest as missing.
        raise ValueError(
            f"use_manifest=True but manifest.json in {path} is not"
            f" valid JSON: {e}"
        )


def write_token_shards(
    df: DataFrame,
    path: str,
    token_col: str = "token_ids",
    id_col: str = "doc_id",
    num_shards: int = 8,
    dtype: str = "uint16",
    order_col: str | None = None,
    commit: str = "rename",
) -> dict:
    """Write ``(id, array<int> token ids)`` rows as indexed binary
    shards + ``manifest.json`` (format in the module docstring).

    Returns the manifest dict. Two assignment modes:

    * default (``order_col=None``): shard = ``xxhash64(id) %
      num_shards``, docs within a shard in id order — fully
      deterministic, bytes reproduce run-to-run regardless of input
      partitioning.
    * ``order_col=...``: range-partitioned on the order key (one range
      exchange — the inherent cost of a total order, same as
      ``mixing.write_curriculum``), shards hold disjoint ascending
      ranges and docs within a shard follow the key, so reading shards
      in name order replays the global order — the curriculum-to-
      token-shards path. Range boundaries are sampled by Spark, so
      shard BOUNDARIES (not content order) may vary run-to-run.

    Raises (task-side, fail loud) on negative ids or ids that overflow
    ``dtype``.

    Task-commit protocol (``commit=``, see ``taskio.py``):

    * ``"rename"`` (default): each task writes ``shard-NNNNN.{bin,
      idx}`` to attempt-suffixed temp names and ``os.replace``-renames
      them into place (bin first, then idx) only after both are fully
      written — a retried or speculative task attempt can therefore
      never interleave bytes into a shard another attempt is writing;
      last completed attempt wins atomically, and the temp names never
      match the reader's ``*.bin``/``*.idx`` globs. REQUIRES that
      ``path`` is a filesystem shared by driver and executors (local
      mode, NFS, or a FUSE-mounted object store) and that rename is
      atomic on it — object-store FUSE mounts without atomic rename
      need speculation disabled (``spark.speculation=false``) instead.
    * ``"manifest"`` (r9 — the object-store-safe commit log): each
      attempt writes directly to the attempt-UNIQUE final stem
      ``shard-NNNNN-a<attempt>`` (single PUT per file, no rename), and
      the manifest lists only the winning attempts' stems (the driver
      hears back from exactly one attempt per task). Read such a
      directory with ``read_token_shards(..., use_manifest=True)`` —
      the default glob reader refuses it loudly, because an orphaned
      loser attempt would otherwise duplicate its shard.
    """
    from ..taskio import COMMIT_MODES

    if dtype not in _DTYPES:
        raise ValueError(f"dtype must be one of {sorted(_DTYPES)}: {dtype}")
    if num_shards < 1:
        raise ValueError(f"num_shards must be >= 1: {num_shards}")
    if commit not in COMMIT_MODES:
        raise ValueError(f"commit must be one of {COMMIT_MODES}: {commit}")
    size = _DTYPES[dtype]
    limit = 1 << (8 * size)
    os.makedirs(path, exist_ok=True)

    if order_col is None:
        assigned = df.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(token_col).alias("toks"),
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_shards))
            .cast("int")
            .alias("shard"),
        )
        sort_keys = ["doc_id"]
    else:
        assigned = (
            df.select(
                F.col(id_col).cast("long").alias("doc_id"),
                F.col(token_col).alias("toks"),
                F.col(order_col).cast("double").alias("__ord"),
            )
            .repartitionByRange(
                num_shards, F.col("__ord"), F.col("doc_id")
            )
            .withColumn("shard", F.spark_partition_id())
        )
        sort_keys = ["__ord", "doc_id"]

    def write_one(pdf: pd.DataFrame) -> pd.DataFrame:
        from ..taskio import (
            attempt_stem,
            attempt_tmp_path,
            chaos_failpoint,
            commit_file,
        )

        shard = int(pdf["shard"].iloc[0])
        pdf = pdf.sort_values(sort_keys, kind="mergesort")
        np_dtype = np.dtype(f"<u{size}")
        os.makedirs(path, exist_ok=True)  # executor-side: executors
        # need not share the driver's view of mkdir at function entry
        stem = f"shard-{shard:05d}"
        if commit == "manifest":
            # attempt-unique FINAL names, no rename: the manifest (not
            # the filesystem namespace) decides which attempt is read
            stem = attempt_stem(stem)
        bin_path = os.path.join(path, stem + ".bin")
        idx_path = os.path.join(path, stem + ".idx")
        if commit == "manifest":
            bin_tmp, idx_tmp = bin_path, idx_path
        else:
            # attempt-unique temp names (never matching the reader's
            # *.bin/*.idx globs), atomically renamed only once complete
            # — the shared task-commit protocol (taskio.py)
            bin_tmp = attempt_tmp_path(bin_path)
            idx_tmp = attempt_tmp_path(idx_path)
        n_tokens = 0
        entries = []
        with open(bin_tmp, "wb") as fb:
            for doc_id, toks in zip(pdf["doc_id"], pdf["toks"]):
                arr = np.asarray(
                    [] if toks is None else list(toks), dtype=np.int64
                )
                if arr.size and (arr.min() < 0 or arr.max() >= limit):
                    os.unlink(bin_tmp)
                    raise ValueError(
                        f"token id out of {dtype} range in doc {doc_id}: "
                        f"[{arr.min()}, {arr.max()}] (unknown-token -1s "
                        "must be resolved before export)"
                    )
                fb.write(arr.astype(np_dtype).tobytes())
                entries.append((int(doc_id), int(arr.size)))
                n_tokens += int(arr.size)
        with open(idx_tmp, "wb") as fi:
            fi.write(_MAGIC)
            fi.write(struct.pack("<B7x", size))
            fi.write(struct.pack("<Q", len(entries)))
            for doc_id, cnt in entries:
                fi.write(struct.pack("<qq", doc_id, cnt))
        if commit != "manifest":
            commit_file(bin_tmp, bin_path)
            commit_file(idx_tmp, idx_path)
        # chaos (tools/chaoscheck.py): a task that dies HERE has fully
        # written its attempt's files but never reports to the driver —
        # the retry must win (rename: last-complete-wins; manifest: the
        # dead attempt's files are never listed, hence never read)
        chaos_failpoint("shards-post-write")
        return pd.DataFrame(
            {
                "shard": [shard],
                "name": [stem],
                "n_docs": [len(entries)],
                "n_tokens": [n_tokens],
                "bin_bytes": [n_tokens * size],
            }
        )

    summary = (
        assigned.groupBy("shard")
        .applyInPandas(
            write_one,
            "shard int, name string, n_docs long, n_tokens long,"
            " bin_bytes long",
        )
        .collect()
    )
    shards = sorted(
        (
            {
                "name": r["name"],
                "n_docs": r["n_docs"],
                "n_tokens": r["n_tokens"],
                "bin_bytes": r["bin_bytes"],
            }
            for r in summary
        ),
        key=lambda s: s["name"],
    )
    manifest = {
        "format": "TOKIDX01",
        "dtype": dtype,
        "commit": commit,
        "order": "hash" if order_col is None else f"range:{order_col}",
        "shards": shards,
        "n_docs": int(sum(s["n_docs"] for s in shards)),
        "n_tokens": int(sum(s["n_tokens"] for s in shards)),
    }
    with open(os.path.join(path, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    return manifest


def read_token_shards(
    spark: SparkSession, path: str, use_manifest: bool = False
) -> DataFrame:
    """Read an indexed token-shard directory back as
    ``(doc_id long, token_ids array<int>)`` — one task per shard
    (binaryFile grain), index and payload validated against each other
    (magic, dtype, byte totals) with loud errors on drift.

    ``use_manifest=True`` treats ``manifest.json`` as the commit log:
    only the shard stems it lists are opened, so orphaned loser
    attempts from a ``commit="manifest"`` write are never read. The
    default glob mode REFUSES a manifest-committed directory (the glob
    would read both attempts of a speculated shard) — pass
    ``use_manifest=True`` for those."""
    if use_manifest:
        manifest = _load_manifest(path, spark=spark)
        stems = [s["name"] for s in manifest["shards"]]
        if not stems:
            raise ValueError(f"manifest lists no shards: {path}")
        idx_paths = [os.path.join(path, s + ".idx") for s in stems]
        bin_paths = [os.path.join(path, s + ".bin") for s in stems]
        idx = spark.read.format("binaryFile").load(idx_paths)
        bin_ = spark.read.format("binaryFile").load(bin_paths)
    else:
        manifest = _load_manifest(path, missing_ok=True, spark=spark)
        if manifest is not None and manifest.get("commit") == "manifest":
            raise ValueError(
                "this shard directory was written with"
                " commit='manifest' (attempt-unique file names); the"
                " glob reader could double-read a speculated shard —"
                " call read_token_shards(..., use_manifest=True)"
            )
        idx = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.idx")
            .load(path)
        )
        bin_ = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.bin")
            .load(path)
        )
    idx = idx.select(
        F.regexp_replace("path", r"\.idx$", "").alias("stem"),
        F.col("content").alias("idx_bytes"),
    )
    bin_ = bin_.select(
        F.regexp_replace("path", r"\.bin$", "").alias("stem"),
        F.col("content").alias("bin_bytes"),
    )
    paired = idx.join(bin_, "stem", "full_outer")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            toks: list[list[int]] = []
            for stem, ib, bb in zip(
                pdf["stem"], pdf["idx_bytes"], pdf["bin_bytes"]
            ):
                if ib is None or bb is None:
                    raise ValueError(f"shard missing .idx or .bin: {stem}")
                ib = bytes(ib)
                if ib[:8] != _MAGIC:
                    raise ValueError(f"bad index magic in {stem}")
                size = ib[8]
                if size not in (2, 4):
                    raise ValueError(f"bad dtype size {size} in {stem}")
                (n_docs,) = struct.unpack_from("<Q", ib, 16)
                entries = np.frombuffer(
                    ib, dtype="<i8", count=n_docs * 2, offset=24
                ).reshape(n_docs, 2)
                flat = np.frombuffer(bytes(bb), dtype=f"<u{size}")
                if int(entries[:, 1].sum()) != flat.size:
                    raise ValueError(
                        f"index/payload token-count drift in {stem}"
                    )
                off = 0
                for doc_id, cnt in entries:
                    ids.append(int(doc_id))
                    toks.append(
                        flat[off : off + int(cnt)].astype(np.int32).tolist()
                    )
                    off += int(cnt)
            yield pd.DataFrame({"doc_id": ids, "token_ids": toks})

    return paired.mapInPandas(decode, "doc_id long, token_ids array<int>")

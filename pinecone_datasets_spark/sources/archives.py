"""Archive-member source: ZIP / TAR(.gz|.bz2|.xz) / lone .gz → rows.

Real corpora arrive as archive dumps — arXiv tarballs, Gutenberg zips,
GitHub repository archives, log bundles — one archive holding many
member files. The reference library (and the other sources here) all
assume the files are already loose on a filesystem; this source makes
the unpacking hop Spark-native: one ``binaryFile`` scan, one Arrow
kernel walking each archive with the stdlib (``zipfile`` / ``tarfile``
/ ``gzip``), one output row per member file:

``(archive, member, size, content)``

plus the package-wide quarantine contract: a corrupt archive (or a
member that fails to extract) yields a row in the ``quarantined``
frame (archive path + typed reason) instead of a dead job — the same
shape as ``read_warc``/``read_jsonl``.

Scale shape:

* Parallelism is archive-granular (``binaryFile`` whole-file tasks) —
  the correct grain, since none of these formats are byte-splittable
  from the middle (ZIP needs its central directory, tar.gz is one
  gzip stream). Many archives saturate a fleet; ONE giant archive is
  a layout problem to fix upstream (split it), exactly like one giant
  ``.warc.gz``.
* Zip-bomb guard: members that declare or inflate past
  ``max_member_bytes`` quarantine (typed), bounding task memory — the
  same hostile-input stance as ``MAX_DECODE_PIXELS``.
* Members stream out per archive; nothing driver-side but the plan.

Compose with the rest of the package: members that are text feed
``functions.text`` gates, media bytes feed ``multimodal.probe_media``
via a rename to MEDIA_SCHEMA, JSONL members can be re-parsed with
``from_json`` — the member row IS the loose file the other sources
expect.

Reference scope note: the reference (pinecone-io/pinecone-datasets)
reads only Parquet (dataset_fsreader.py:75-151); Layer-B extension
(SURVEY.md §2 "beyond the reference").
"""

from __future__ import annotations

import io
import zlib
from dataclasses import dataclass
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["ArchiveRead", "read_archive_members"]

ARCHIVE_DDL = (
    "archive string, member string, size long, content binary,"
    " error string"
)


@dataclass(frozen=True)
class ArchiveRead:
    """members = good rows; quarantined = (archive, member, error)."""

    members: DataFrame
    quarantined: DataFrame


def _iter_members(path: str, blob: bytes, cap: int):
    """Yield (member, size, content, error) rows for one archive."""
    import bz2
    import gzip
    import lzma
    import tarfile
    import zipfile

    if blob[:4] == b"PK\x03\x04" or blob[:4] == b"PK\x05\x06":
        try:
            zf = zipfile.ZipFile(io.BytesIO(blob))
        except (zipfile.BadZipFile, OSError, ValueError,
                EOFError) as e:
            yield None, None, None, f"bad zip: {e}"
            return
        for info in zf.infolist():
            # endswith, not info.is_dir(): a mutated central directory
            # can yield an EMPTY filename, and is_dir() does
            # filename[-1] — an uncaught IndexError that killed the
            # walk (r11 corruption fuzz)
            if info.filename.endswith("/"):
                continue
            if info.file_size > cap:
                yield (
                    info.filename, int(info.file_size), None,
                    f"member exceeds max_member_bytes ({cap})",
                )
                continue
            try:
                with zf.open(info) as fh:
                    data = fh.read(cap + 1)
                if len(data) > cap:
                    # declared size lied (zip bomb): typed quarantine
                    yield (
                        info.filename, int(info.file_size), None,
                        f"member inflates past max_member_bytes ({cap})",
                    )
                    continue
                yield info.filename, len(data), data, None
            except (zipfile.BadZipFile, OSError, ValueError,
                    NotImplementedError, RuntimeError, EOFError,
                    zlib.error, KeyError, IndexError) as e:
                # RuntimeError = encrypted member; KeyError/IndexError
                # = mutated central directory (both fuzz-found)
                yield info.filename, None, None, f"bad zip member: {e}"
        return

    tar_magics = blob[:2] == b"\x1f\x8b" or blob[:3] == b"BZh" or (
        blob[:6] == b"\xfd7zXZ\x00"
    ) or (len(blob) > 262 and blob[257:262] == b"ustar")
    if tar_magics:
        # a lone compressed NON-tar file is also common (dump.json.gz):
        # try tar first, fall back to single-member decompression.
        # The open/iterate split matters (r11 review): once tarfile
        # OPENS, the blob IS a tar — an error during ITERATION
        # (corrupt header after member 1) must quarantine, not fall
        # through to the lone-stream path, which would re-emit the
        # whole decompressed tar as a bogus extra member. Likewise an
        # EMPTY tar (compressed or not) yields nothing, not its own
        # zero-block framing as a "member".
        tf = None
        try:
            tf = tarfile.open(fileobj=io.BytesIO(blob), mode="r:*")
        except (tarfile.TarError, OSError, ValueError, EOFError):
            tf = None  # not a tar: try lone-stream below
        if tf is not None:
            n_done = 0
            any_rows = False
            try:
                for info in tf:
                    if not info.isfile():
                        continue
                    if info.size > cap:
                        yield (
                            info.name, int(info.size), None,
                            f"member exceeds max_member_bytes ({cap})",
                        )
                        n_done += 1
                        any_rows = True
                        continue
                    try:
                        fh = tf.extractfile(info)
                        data = fh.read(cap + 1) if fh is not None else None
                        if data is None:
                            yield info.name, None, None, "unreadable member"
                        elif len(data) > cap:
                            yield (
                                info.name, int(info.size), None,
                                "member inflates past max_member_bytes"
                                f" ({cap})",
                            )
                        else:
                            yield info.name, len(data), data, None
                    except (tarfile.TarError, OSError, ValueError,
                            EOFError, zlib.error) as e:
                        yield info.name, None, None, f"bad tar member: {e}"
                    n_done += 1
                    any_rows = True
            except (tarfile.TarError, OSError, ValueError, EOFError,
                    zlib.error) as e:
                yield (
                    "<tar>", None, None,
                    f"corrupt tar after {n_done} member(s): {e}",
                )
                return
            if any_rows:
                return
            # ZERO members: an all-zeros stream "opens" as an empty tar
            # (end-of-archive framing is just zero blocks), so this may
            # equally be a lone compressed non-tar file — fall through
            # to the lone-stream path, which suppresses pure zero-block
            # framing below instead of emitting it as a bogus member
        try:
            # STREAMED capped reads, never whole-stream decompress: a
            # compression bomb must hit the cap after cap+1 bytes, not
            # inflate fully before the size check
            if blob[:2] == b"\x1f\x8b":
                data = gzip.GzipFile(fileobj=io.BytesIO(blob)).read(
                    cap + 1
                )
            elif blob[:3] == b"BZh":
                data = bz2.BZ2File(io.BytesIO(blob)).read(cap + 1)
            else:
                data = lzma.LZMAFile(io.BytesIO(blob)).read(cap + 1)
            if len(data) > cap:
                yield (
                    "<stream>", None, None,
                    f"member inflates past max_member_bytes ({cap})",
                )
            elif (
                data
                and len(data) % 512 == 0
                and not data.strip(b"\x00")
            ):
                # pure 512-aligned zero blocks = an EMPTY tar's
                # end-of-archive framing: no members, no rows (r11
                # review — this used to surface as a 10 KiB all-zeros
                # pseudo-member)
                pass
            else:
                # member name = archive basename minus the codec suffix
                base = path.rsplit("/", 1)[-1]
                for suf in (".gz", ".bz2", ".xz"):
                    if base.endswith(suf):
                        base = base[: -len(suf)]
                        break
                yield base, len(data), data, None
        except (OSError, EOFError, ValueError, zlib.error) as e:
            yield None, None, None, f"bad compressed stream: {e}"
        return

    yield None, None, None, "unrecognized archive format"


def read_archive_members(
    spark: SparkSession,
    path: str,
    glob: str = "*",
    recursive: bool = False,
    max_member_bytes: int = 256 * 1024 * 1024,
) -> ArchiveRead:
    """Read a directory of archives as one member-file frame.

    Returns ``ArchiveRead(members, quarantined)`` — both lazy
    projections of ONE ``binaryFile`` scan + Arrow walk. ZIP, tar
    (plain or gz/bz2/xz), and lone ``.gz``/``.bz2``/``.xz`` streams
    (one member named after the archive minus the codec suffix).
    Hostile or lying members (declared OR inflated size past
    ``max_member_bytes``) quarantine with a typed reason; so do
    corrupt archives — never a dead job, never an unbounded
    allocation."""
    from ..shipping import ensure_shipped

    ensure_shipped(spark)
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true" if recursive else "false")
        .load(path)
        .select("path", "content")
    )
    cap = int(max_member_bytes)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p, blob in zip(pdf["path"], pdf["content"]):
                for member, size, data, err in _iter_members(
                    str(p), bytes(blob or b""), cap
                ):
                    rows.append((str(p), member, size, data, err))
            yield pd.DataFrame(
                rows,
                columns=["archive", "member", "size", "content", "error"],
            )

    parsed = raw.mapInPandas(kernel, ARCHIVE_DDL)
    members = parsed.where(F.col("error").isNull()).drop("error")
    quarantined = parsed.where(F.col("error").isNotNull()).select(
        "archive", "member", "error"
    )
    return ArchiveRead(members=members, quarantined=quarantined)

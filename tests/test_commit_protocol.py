"""Object-store commit-protocol proofs (r11 verdict item 3).

``taskio.py``'s two task-commit modes and the manifest-as-commit-log
sinks (``operators/shards.py``, ``sources/warc.py:write_wet``,
``mixing.write_curriculum``) are the 100 TB egress path, and every
prior proof ran on a clean POSIX filesystem. These tests plant the
object-store failure modes locally:

* a DUPLICATE TASK ATTEMPT — a speculative/zombie twin that also
  finished writing under its own attempt-unique name — must never be
  consumed by a manifest read;
* a PARTIAL file from an attempt that died mid-write must be invisible
  to both readers (manifest mode: not listed; rename mode: the
  ``.inprogress-*`` temp name matches no reader glob);
* a CORRUPT manifest must raise ValueError (readable-but-invalid),
  never FileNotFoundError (absent) — the r11 error-taxonomy contract;
* a RENAME-DENIED filesystem must fail ``commit_file`` loudly, while a
  ``commit="manifest"`` write performs no rename at all (its directory
  holds only attempt-suffixed final names — nothing was ever moved);
* directory-vs-manifest DRIFT (an orphaned extra file behind the
  manifest's back) must fail the curriculum reader loudly.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import pytest
from pyspark.sql import functions as F


def _tokens_df(spark, n=40):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.transform(
            F.sequence(F.lit(0), F.pmod(F.col("id"), F.lit(5)) + 2),
            lambda i: (i * 7 + F.col("id")) % 250,
        ).cast("array<int>").alias("token_ids"),
    )


def _read_sorted(spark, path, **kw):
    from pinecone_datasets_spark.operators.shards import read_token_shards

    rows = read_token_shards(spark, path, **kw).collect()
    return sorted((r["doc_id"], tuple(r["token_ids"])) for r in rows)


def _write_manifest_shards(spark, path, num_shards=4):
    from pinecone_datasets_spark.operators.shards import write_token_shards

    df = _tokens_df(spark)
    write_token_shards(
        df, str(path), num_shards=num_shards, dtype="uint16", commit="manifest"
    )
    return sorted(
        (r["doc_id"], tuple(r["token_ids"])) for r in df.collect()
    )


def test_manifest_read_skips_duplicate_attempt(spark, tmp_path):
    """A loser attempt that finished writing its shard under its own
    attempt-unique name (speculation twin) must not double the shard."""
    path = tmp_path / "shards_dup"
    want = _write_manifest_shards(spark, path)
    # plant the loser: a byte-identical twin of shard 0 under a
    # different attempt id — exactly what a speculated task leaves
    winner_bin = sorted(glob.glob(str(path / "shard-00000-a*.bin")))[0]
    winner_idx = winner_bin[:-4] + ".idx"
    shutil.copyfile(winner_bin, str(path / "shard-00000-a999999.bin"))
    shutil.copyfile(winner_idx, str(path / "shard-00000-a999999.idx"))
    assert _read_sorted(spark, str(path), use_manifest=True) == want


def test_manifest_read_skips_partial_attempt(spark, tmp_path):
    """An attempt that died mid-write leaves a partial .bin (no .idx);
    the manifest never lists it, so the read is unaffected."""
    path = tmp_path / "shards_partial"
    want = _write_manifest_shards(spark, path)
    with open(path / "shard-00001-a777777.bin", "wb") as f:
        f.write(b"\x01\x02\x03")  # truncated garbage, no idx pair
    assert _read_sorted(spark, str(path), use_manifest=True) == want


def test_glob_reader_refuses_manifest_directory(spark, tmp_path):
    """The default glob reader would double-read a speculated shard —
    it must refuse a commit='manifest' directory loudly."""
    path = tmp_path / "shards_refuse"
    _write_manifest_shards(spark, path)
    with pytest.raises(ValueError, match="use_manifest=True"):
        _read_sorted(spark, str(path))


def test_corrupt_manifest_valueerror_not_filenotfound(spark, tmp_path):
    """Readable-but-invalid manifest -> ValueError; ABSENT manifest ->
    FileNotFoundError. Conflating them misclassifies corruption as
    absence (the r11 taxonomy fix, shards.py:94-100)."""
    path = tmp_path / "shards_corrupt"
    _write_manifest_shards(spark, path)
    with open(path / "manifest.json", "w") as f:
        f.write("{not json!")
    with pytest.raises(ValueError, match="manifest.json"):
        _read_sorted(spark, str(path), use_manifest=True)
    os.unlink(path / "manifest.json")
    with pytest.raises(FileNotFoundError):
        _read_sorted(spark, str(path), use_manifest=True)


def test_manifest_mode_never_renames(spark, tmp_path):
    """commit='manifest' is the rename-free protocol: after the write
    the directory holds ONLY attempt-suffixed final names (single PUT
    each) plus manifest.json — no .inprogress temp was ever created,
    so nothing needed a rename and rename-hostile stores are safe."""
    path = tmp_path / "shards_norename"
    _write_manifest_shards(spark, path)
    names = sorted(os.listdir(path))
    assert "manifest.json" in names
    for n in names:
        if n == "manifest.json":
            continue
        assert ".inprogress" not in n
        stem = n.rsplit(".", 1)[0]
        assert "-a" in stem, f"non-attempt-unique name {n}"
    # and every listed shard resolves to exactly one (.bin, .idx) pair
    manifest = json.load(open(path / "manifest.json"))
    for s in manifest["shards"]:
        assert os.path.exists(path / (s["name"] + ".bin"))
        assert os.path.exists(path / (s["name"] + ".idx"))


def test_rename_denied_fails_loud(monkeypatch, tmp_path):
    """On a rename-hostile filesystem the rename-mode commit must
    propagate the failure (a swallowed rename would publish nothing
    while reporting success)."""
    from pinecone_datasets_spark import taskio

    src = tmp_path / "a.tmp"
    src.write_bytes(b"x")

    def _deny(a, b):
        raise OSError("rename not supported on this store")

    monkeypatch.setattr(os, "replace", _deny)
    with pytest.raises(OSError, match="rename not supported"):
        taskio.commit_file(str(src), str(tmp_path / "a.bin"))


def test_rename_mode_zombie_inprogress_invisible(spark, tmp_path):
    """rename mode: a zombie attempt's .inprogress-* leftovers match no
    reader glob, so a completed write next to them reads back exact."""
    from pinecone_datasets_spark.operators.shards import write_token_shards

    path = tmp_path / "shards_zombie"
    df = _tokens_df(spark)
    write_token_shards(df, str(path), num_shards=3, dtype="uint16")
    # zombie leftovers from an attempt that died mid-write
    with open(path / "shard-00000.bin.inprogress-424242", "wb") as f:
        f.write(b"\xde\xad\xbe\xef" * 100)
    with open(path / "shard-00000.idx.inprogress-424242", "wb") as f:
        f.write(b"\x00" * 64)
    want = sorted((r["doc_id"], tuple(r["token_ids"])) for r in df.collect())
    assert _read_sorted(spark, str(path)) == want


def test_wet_manifest_skips_duplicate_and_partial_attempts(spark, tmp_path):
    """Same planted-retry proof for the WET sink: a finished loser
    attempt and a partial segment are never consumed by
    read_warc(use_manifest=True)."""
    from pinecone_datasets_spark.sources.warc import read_warc, write_wet

    df = spark.createDataFrame(
        [(f"http://ex.com/{i}", f"doc body {i} text") for i in range(12)],
        "url string, text string",
    )
    path = tmp_path / "wet"
    write_wet(df, str(path), num_files=3, commit="manifest")
    base = read_warc(spark, str(path), use_manifest=True).records
    want = sorted(
        (r["target_uri"] or "", r["warc_type"]) for r in base.collect()
    )
    segs = sorted(glob.glob(str(path / "*.warc.wet.gz")))
    loser = segs[0].replace("-a", "-a9", 1)  # different attempt id
    shutil.copyfile(segs[0], loser)
    with open(path / "seg-partial-a31337.warc.wet.gz", "wb") as f:
        f.write(b"\x1f\x8b\x08\x00partial")
    got = sorted(
        (r["target_uri"] or "", r["warc_type"])
        for r in read_warc(
            spark, str(path), use_manifest=True
        ).records.collect()
    )
    assert got == want


def test_curriculum_manifest_drift_fails_loud(spark, tmp_path):
    """An orphaned extra parquet file behind the manifest's back (what
    a rename-hostile store's uncleaned attempt looks like) must fail
    the curriculum reader, not silently change the replayed order."""
    from pinecone_datasets_spark.operators.mixing import (
        read_curriculum,
        write_curriculum,
    )

    df = spark.range(50).select(
        F.col("id").alias("doc_id"),
        (F.col("id") * 3 % 17).cast("double").alias("pos"),
    )
    path = tmp_path / "curr"
    write_curriculum(df, str(path), pos_col="pos", num_files=4)
    assert read_curriculum(spark, str(path), pos_col="pos").count() == 50
    files = sorted(glob.glob(str(path / "*.parquet")))
    shutil.copyfile(files[0], str(path / "part-orphan-attempt.parquet"))
    with pytest.raises(ValueError):
        read_curriculum(spark, str(path), pos_col="pos").count()


def test_fs_rename_local_refuses_existing_destination(spark, tmp_path):
    """FS.rename's local fast-path must match the Hadoop branch's
    contract (dst must not exist): a silent os.replace clobber would
    let a racing second writer destroy a committed dataset dir with no
    error anywhere (r12 ADVICE)."""
    from pinecone_datasets_spark.fs import FS

    fs = FS(spark)
    src = tmp_path / "src.txt"
    dst = tmp_path / "dst.txt"
    src.write_text("new")
    dst.write_text("committed")
    with pytest.raises(OSError, match="destination exists"):
        fs.rename(str(src), str(dst))
    # the committed bytes survived and the source was not consumed
    assert dst.read_text() == "committed"
    assert src.read_text() == "new"
    # and the happy path still moves
    fs.rename(str(src), str(tmp_path / "moved.txt"))
    assert (tmp_path / "moved.txt").read_text() == "new"
    assert not src.exists()

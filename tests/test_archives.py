"""Archive-member source (sources/archives.py)."""

from __future__ import annotations

import gzip
import io
import tarfile
import zipfile

import pytest

from pinecone_datasets_spark.sources.archives import read_archive_members


def _zip_bytes(files: dict) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in files.items():
            zf.writestr(name, data)
    return buf.getvalue()


def _tgz_bytes(files: dict) -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tf:
        for name, data in files.items():
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def test_zip_tar_and_lone_gz_members(spark, tmp_path):
    """One scan over a mixed dump directory: zip + tar.gz + a lone
    .json.gz, every member a typed row; nested dirs skipped; the
    member row composes directly with downstream text parsing."""
    (tmp_path / "a.zip").write_bytes(
        _zip_bytes(
            {
                "docs/one.txt": b"hello zip",
                "docs/two.jsonl": b'{"x": 1}\n{"x": 2}',
                "empty_dir/": b"",
            }
        )
    )
    (tmp_path / "b.tar.gz").write_bytes(
        _tgz_bytes({"three.txt": b"hello tar", "sub/four.bin": b"\x00\x01"})
    )
    (tmp_path / "dump.json.gz").write_bytes(
        gzip.compress(b'{"solo": true}')
    )

    got = read_archive_members(spark, str(tmp_path))
    rows = {
        (r["archive"].split("/")[-1], r["member"]): r
        for r in got.members.collect()
    }
    assert rows[("a.zip", "docs/one.txt")]["content"] == b"hello zip"
    assert rows[("a.zip", "docs/one.txt")]["size"] == 9
    assert rows[("b.tar.gz", "three.txt")]["content"] == b"hello tar"
    assert rows[("b.tar.gz", "sub/four.bin")]["content"] == b"\x00\x01"
    # lone stream: member named after the archive minus the codec suffix
    assert rows[("dump.json.gz", "dump.json")]["content"] == b'{"solo": true}'
    assert len(rows) == 5
    assert got.quarantined.count() == 0

    # composes with text parsing downstream
    from pyspark.sql import functions as F

    jl = (
        got.members.where(F.col("member").endswith(".jsonl"))
        .select(
            F.explode(
                F.split(F.col("content").cast("string"), "\n")
            ).alias("line")
        )
        .select(F.from_json("line", "x int").alias("j"))
        .select("j.x")
        .collect()
    )
    assert sorted(r["x"] for r in jl) == [1, 2]


def test_corrupt_and_bomb_quarantine(spark, tmp_path):
    """Corrupt archives and size-cap violations quarantine typed; good
    archives in the same directory still extract."""
    (tmp_path / "good.zip").write_bytes(_zip_bytes({"ok.txt": b"fine"}))
    (tmp_path / "broken.zip").write_bytes(b"PK\x03\x04garbage" + b"\x00" * 30)
    (tmp_path / "trunc.tar.gz").write_bytes(
        _tgz_bytes({"big.txt": b"x" * 1000})[:40]
    )
    # a member larger than the cap (use a tiny cap to simulate a bomb)
    (tmp_path / "bomb.zip").write_bytes(
        _zip_bytes({"huge.bin": b"A" * 5000})
    )

    got = read_archive_members(
        spark, str(tmp_path), max_member_bytes=1024
    )
    members = {
        (r["archive"].split("/")[-1], r["member"])
        for r in got.members.collect()
    }
    assert members == {("good.zip", "ok.txt")}
    q = {
        r["archive"].split("/")[-1]: r["error"]
        for r in got.quarantined.collect()
    }
    assert "bad zip" in q["broken.zip"]
    assert "max_member_bytes" in q["bomb.zip"]
    assert "trunc.tar.gz" in q  # truncated stream quarantines


def test_lying_zip_header_quarantines(spark, tmp_path):
    """A zip whose local header under-declares the member size (the
    classic bomb disguise) is caught at inflate time, not trusted."""
    blob = bytearray(_zip_bytes({"lie.bin": b"B" * 4096}))
    # patch the central-directory uncompressed-size field to 10
    at = blob.rfind(b"lie.bin") - 46  # central header is 46 bytes + name
    import struct

    assert blob[at : at + 4] == b"PK\x01\x02"
    blob[at + 24 : at + 28] = struct.pack("<I", 10)
    (tmp_path / "liar.zip").write_bytes(bytes(blob))
    got = read_archive_members(spark, str(tmp_path), max_member_bytes=100)
    assert got.members.count() == 0
    q = got.quarantined.collect()
    # zipfile enforces the declared size itself (truncated read → CRC
    # mismatch) — either its typed error or our cap guard is fine, as
    # long as the lying member costs a quarantine row, not bytes
    assert len(q) == 1
    assert (
        "max_member_bytes" in q[0]["error"]
        or "bad zip member" in q[0]["error"]
    )


def test_plain_tar_and_unknown_bytes(spark, tmp_path):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        info = tarfile.TarInfo("plain.txt")
        info.size = 4
        tf.addfile(info, io.BytesIO(b"data"))
    (tmp_path / "plain.tar").write_bytes(buf.getvalue())
    (tmp_path / "junk.bin").write_bytes(b"\x00\x01\x02not an archive")
    got = read_archive_members(spark, str(tmp_path))
    assert [
        (r["member"], bytes(r["content"]))
        for r in got.members.collect()
    ] == [("plain.txt", b"data")]
    q = got.quarantined.collect()
    assert len(q) == 1 and "unrecognized" in q[0]["error"]


def test_lone_bz2_xz_streams_and_bombs(spark, tmp_path):
    """Lone .bz2/.xz streams extract with capped STREAMED reads — a
    compression bomb stops at cap+1 bytes instead of inflating fully
    before the size check."""
    import bz2
    import lzma

    (tmp_path / "a.txt.bz2").write_bytes(bz2.compress(b"bz2 payload"))
    (tmp_path / "b.txt.xz").write_bytes(lzma.compress(b"xz payload"))
    (tmp_path / "bomb.bin.bz2").write_bytes(
        bz2.compress(b"\x00" * 50_000_000)
    )
    got = read_archive_members(
        spark, str(tmp_path), max_member_bytes=1024
    )
    rows = {
        r["member"]: bytes(r["content"]) for r in got.members.collect()
    }
    assert rows == {"a.txt": b"bz2 payload", "b.txt": b"xz payload"}
    q = got.quarantined.collect()
    assert len(q) == 1 and "max_member_bytes" in q[0]["error"]


def test_archive_to_media_pipeline_composition(spark, tmp_path):
    """Source interop: a zip dump of mixed media unpacks into member
    rows, probes into the typed MEDIA_SCHEMA frame, and flows through
    the standard image/audio kernels — the dump-to-dedup path with no
    loose files ever touching disk."""
    import numpy as np
    from pyspark.sql import functions as F

    from pinecone_datasets_spark.operators.media_codecs import (
        encode_png,
        encode_wav,
    )
    from pinecone_datasets_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_fingerprint,
        extract_image_features,
        probe_media,
    )

    rng = np.random.default_rng(11)
    png = encode_png(rng.integers(0, 256, (10, 12, 3), dtype=np.uint8))
    wav = encode_wav(0.3 * np.sin(np.arange(4000) / 7.0), rate=16000)
    (tmp_path / "dump.zip").write_bytes(
        _zip_bytes({"img/a.png": png, "snd/b.wav": wav, "junk.bin": b"xx"})
    )
    members = read_archive_members(spark, str(tmp_path)).members
    media = members.select(
        F.concat_ws("!", "archive", "member").alias("media_id"),
        F.col("content"),
    )
    probed = probe_media(media)
    fmts = {
        r["media_id"].split("!")[-1]: r["format"]
        for r in probed.collect()
    }
    assert fmts == {"img/a.png": "png", "snd/b.wav": "wav",
                    "junk.bin": None}
    img = extract_image_features(media).where(
        F.col("width").isNotNull()
    ).collect()
    assert len(img) == 1 and (img[0]["width"], img[0]["height"]) == (12, 10)
    fp = audio_fingerprint(media).where(F.col("afp").isNotNull()).collect()
    assert len(fp) == 1 and fp[0]["media_id"].endswith("snd/b.wav")


def test_dump_to_corpus_composition(spark, tmp_path):
    """The full dump-to-corpus story in one pipe: a zip holding a PDF,
    a DOCX, a markdown README, and a PNG unpacks via the archive walk;
    documents flow through the unified text dispatch, markdown through
    the codegen stripper, and the image through the media probe — no
    loose files, no per-format branching outside the library."""
    import numpy as np
    from pyspark.sql import functions as F

    from pinecone_datasets_spark.functions.markup import markdown_to_text
    from pinecone_datasets_spark.operators.media_codecs import encode_png
    from pinecone_datasets_spark.operators.office import (
        encode_simple_docx,
        extract_document_text,
    )
    from pinecone_datasets_spark.operators.pdf import encode_simple_pdf
    from pinecone_datasets_spark.operators.multimodal import probe_media

    (tmp_path / "dump.zip").write_bytes(
        _zip_bytes(
            {
                "paper.pdf": encode_simple_pdf(["pdf body text"]),
                "memo.docx": encode_simple_docx(["docx body text"]),
                "README.md": b"# Title\n\nSome **md** text",
                "logo.png": encode_png(
                    np.zeros((4, 6, 3), dtype=np.uint8)
                ),
            }
        )
    )
    members = read_archive_members(spark, str(tmp_path)).members

    docs = extract_document_text(
        members.select(F.col("member").alias("media_id"), "content")
    ).where(F.col("error").isNull())
    got = {r["id"]: (r["kind"], r["text"]) for r in docs.collect()}
    assert got == {
        "paper.pdf": ("pdf", "pdf body text"),
        "memo.docx": ("docx", "docx body text"),
    }

    md = (
        members.where(F.col("member").endswith(".md"))
        .select(
            markdown_to_text(
                F.col("content").cast("string")
            ).alias("t")
        )
        .collect()
    )
    assert md[0]["t"] == "Title\nSome md text"

    probed = probe_media(
        members.select(F.col("member").alias("media_id"), "content")
    )
    fmts = {r["media_id"]: r["format"] for r in probed.collect()}
    assert fmts["logo.png"] == "png"


def test_corrupt_tar_after_member_quarantines_not_duplicates(spark, tmp_path):
    """r11 review: a tar that breaks AFTER yielding member 1 fell
    through to the lone-stream path and emitted the whole decompressed
    tar as a bogus extra member (duplicating member 1's bytes inside
    tar framing); it must quarantine instead."""
    import gzip as _gzip
    import io as _io
    import tarfile as _tarfile

    buf = _io.BytesIO()
    with _tarfile.open(fileobj=buf, mode="w") as tf:
        data = b"member one bytes"
        info = _tarfile.TarInfo("a.txt")
        info.size = len(data)
        tf.addfile(info, _io.BytesIO(data))
    tar = bytearray(buf.getvalue())
    # truncate AFTER member 1's data but before the end-of-archive
    # blocks -> ReadError ("unexpected end of data") mid-iteration
    (tmp_path / "broken.tar.gz").write_bytes(
        _gzip.compress(bytes(tar[:700]))
    )

    got = read_archive_members(spark, str(tmp_path))
    members = got.members.collect()
    assert len(members) == 1  # NO bogus whole-tar member
    assert bytes(members[0]["content"]) == b"member one bytes"
    q = got.quarantined.collect()
    assert len(q) == 1 and "corrupt tar" in q[0]["error"]


def test_empty_tar_gz_yields_nothing(spark, tmp_path):
    """r11 review: an empty .tar.gz fell through to the lone-stream
    path and emitted its 10 KiB zero-block framing as a 'member'."""
    import gzip as _gzip
    import io as _io
    import tarfile as _tarfile

    buf = _io.BytesIO()
    with _tarfile.open(fileobj=buf, mode="w"):
        pass
    (tmp_path / "empty.tar.gz").write_bytes(_gzip.compress(buf.getvalue()))
    got = read_archive_members(spark, str(tmp_path))
    assert got.members.count() == 0
    assert got.quarantined.count() == 0

"""Corruption fuzz over the r9 extractors (JPEG-fuzz precedent).

At corpus scale every decoder meets damaged bytes; a mutation must
yield a typed UnsupportedMediaError or a (possibly different) result —
never an uncontrolled IndexError/KeyError/struct.error/infinite walk
escaping the kernel's quarantine contract.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from pinecone_datasets_spark.operators.media_codecs import (
    UnsupportedMediaError,
    probe_bytes,
)

_OK = (UnsupportedMediaError,)


def _mutations(blob: bytes, n: int, seed: int):
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        b = bytearray(blob)
        kind = rng.randrange(4)
        if kind == 0 and b:  # flip a byte
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        elif kind == 1 and b:  # truncate
            del b[rng.randrange(1, len(b) + 1) :]
        elif kind == 2:  # splice junk
            at = rng.randrange(len(b) + 1)
            b[at:at] = bytes(rng.randrange(256) for _ in range(7))
        else:  # swap two regions
            if len(b) > 16:
                i = rng.randrange(len(b) - 8)
                j = rng.randrange(len(b) - 8)
                b[i : i + 8], b[j : j + 8] = b[j : j + 8], b[i : i + 8]
        out.append(bytes(b))
    return out


def _drive(fn, blob, n=120, seed=0):
    for mut in _mutations(blob, n, seed):
        try:
            fn(mut)
        except _OK:
            pass  # typed refusal: the contract
        # anything else propagates and fails the test


def test_pdf_corruption_fuzz():
    from pinecone_datasets_spark.operators.pdf import (
        encode_simple_pdf,
        pdf_to_text,
    )

    blob = encode_simple_pdf(
        ["some page text with (parens) \\ and escapes", "page two"]
    )
    _drive(pdf_to_text, blob, n=200, seed=1)


def test_office_corruption_fuzz():
    from pinecone_datasets_spark.operators.office import (
        document_to_text,
        encode_simple_docx,
        encode_simple_epub,
        encode_simple_odt,
        encode_simple_rtf,
    )

    for seed, blob in enumerate(
        [
            encode_simple_docx(["docx body"]),
            encode_simple_odt(["odt body"]),
            encode_simple_epub(["<p>epub body</p>"]),
            encode_simple_rtf(["rtf body é \\u{}"]),
        ]
    ):
        _drive(document_to_text, blob, n=120, seed=seed)


def test_subtitle_corruption_fuzz():
    from pinecone_datasets_spark.operators.subtitles import (
        encode_srt,
        parse_subtitles,
    )

    blob = encode_srt([(0, 1000, "line one"), (5000, 6000, "two")])
    _drive(parse_subtitles, blob, n=120, seed=7)


def test_probe_corruption_fuzz():
    """probe_bytes must NEVER raise — it returns NULL-ish tuples for
    anything it can't read (the read_media quarantine contract)."""
    from pinecone_datasets_spark.operators.media_codecs import (
        encode_wav,
    )
    from pinecone_datasets_spark.operators.office import (
        encode_simple_docx,
    )
    from pinecone_datasets_spark.operators.pdf import encode_simple_pdf

    import struct

    mp4 = (
        struct.pack(">I", 16) + b"ftyp" + b"isom" + struct.pack(">I", 0)
        + struct.pack(">I", 16) + b"mdat" + b"\x00" * 8
    )
    seeds = [
        encode_wav(0.1 * np.sin(np.arange(600) / 5.0), rate=8000),
        encode_simple_pdf(["p"]),
        encode_simple_docx(["d"]),
        mp4,
        b"\xff\xfb\x90\x00" + b"\x00" * 417 + b"\xff\xfb\x90\x00",
        b"OggS" + bytes(40),
        b"\x1a\x45\xdf\xa3" + bytes(30),
    ]
    for seed, blob in enumerate(seeds):
        for mut in _mutations(blob, 150, seed):
            got = probe_bytes(mut)  # must not raise, period
            assert isinstance(got, tuple) and len(got) == 4


def test_archive_corruption_fuzz(spark, tmp_path):
    """Mutated archives all land in members OR quarantined — one scan,
    no dead job (driven through the real Spark kernel once)."""
    import io
    import tarfile
    import zipfile

    from pinecone_datasets_spark.sources.archives import (
        read_archive_members,
    )

    def zip_bytes():
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
            zf.writestr("a.txt", b"alpha")
            zf.writestr("b/c.bin", bytes(range(64)))
        return buf.getvalue()

    def tgz_bytes():
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w:gz") as tf:
            info = tarfile.TarInfo("x.txt")
            info.size = 5
            tf.addfile(info, io.BytesIO(b"hello"))
        return buf.getvalue()

    d = tmp_path / "fuzz"
    d.mkdir()
    k = 0
    for seed, base in enumerate([zip_bytes(), tgz_bytes()]):
        for mut in _mutations(base, 40, seed):
            (d / f"m{k}.bin").write_bytes(mut)
            k += 1
    got = read_archive_members(spark, str(d), max_member_bytes=1 << 20)
    n_members = got.members.count()
    n_q = got.quarantined.count()
    assert n_members + n_q > 0  # the job survived all 80 mutants

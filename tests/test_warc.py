"""WARC / WET source (sources/warc.py): pure-stdlib parse of Common
Crawl's container format, quarantining + resync, gzip members, WET
text extraction."""

from __future__ import annotations

import gzip
import os

import pytest

from pinecone_datasets_spark.sources.warc import (
    encode_warc,
    iter_warc_records,
    read_warc,
    wet_text,
)


def _recs(n: int = 4, binary_payload: bytes | None = None):
    rows = []
    for i in range(n):
        rows.append(
            {
                "warc_type": "conversion",
                "record_id": f"<urn:uuid:0000-{i:04d}>",
                "target_uri": f"https://example.com/p/{i}",
                "warc_date": "2024-01-02T03:04:05Z",
                "content_type": "text/plain",
                "content": f"document {i} text\nwith a second line",
            }
        )
    if binary_payload is not None:
        rows.append(
            {
                "warc_type": "resource",
                "record_id": "<urn:uuid:bin>",
                "target_uri": "https://example.com/img",
                "content_type": "application/octet-stream",
                "content": binary_payload,
            }
        )
    return rows


def test_roundtrip_plain_including_binary_with_crlf():
    # payload deliberately contains \r\n\r\n and a fake version line —
    # Content-Length slicing must not be confused by either
    payload = b"\x89PNG\r\n\x1a\n\r\n\r\nWARC/1.0\r\nnot-a-record" * 3
    blob = encode_warc(_recs(3, binary_payload=payload))
    got = list(iter_warc_records(blob, "f.warc"))
    assert [g["error"] for g in got] == [None] * 4
    assert got[3]["content"] == payload
    assert got[3]["content_length"] == len(payload)
    assert got[0]["warc_type"] == "conversion"
    assert got[0]["target_uri"] == "https://example.com/p/0"
    assert got[0]["content"].decode() == "document 0 text\nwith a second line"


def test_roundtrip_gzip_members_deterministic():
    blob1 = encode_warc(_recs(3), gzip_records=True)
    blob2 = encode_warc(_recs(3), gzip_records=True)
    assert blob1 == blob2  # mtime pinned — fixture bytes reproducible
    assert blob1[:2] == b"\x1f\x8b"
    got = list(iter_warc_records(blob1, "f.warc.gz"))
    assert [g["error"] for g in got] == [None] * 3
    # whole-blob gzip (single member) parses identically
    whole = gzip.compress(encode_warc(_recs(3)), mtime=0)
    got2 = list(iter_warc_records(whole, "x"))
    assert [(g["record_id"], g["content"]) for g in got] == [
        (g["record_id"], g["content"]) for g in got2
    ]


def test_quarantine_and_resync():
    good = encode_warc(_recs(2))
    garbage = b"HTTP/1.1 200 OK\r\nthis is not warc\r\n\r\n"
    # garbage prepended AND spliced between records
    blob = garbage + good[: len(good) // 2 // 2 * 2]
    # simpler deterministic splice: garbage + rec0 + garbage + rec1
    one = encode_warc(_recs(1))
    two = encode_warc(
        [dict(_recs(2)[1], record_id="<urn:uuid:second>")]
    )
    blob = garbage + one + garbage + two
    got = list(iter_warc_records(blob, "f"))
    errors = [g for g in got if g["error"]]
    goods = [g for g in got if not g["error"]]
    assert len(goods) == 2
    assert {g["record_id"] for g in goods} == {
        "<urn:uuid:0000-0000>", "<urn:uuid:second>"
    }
    assert len(errors) == 2
    assert all("resynced" in e["error"] for e in errors)


def test_missing_content_length_quarantined():
    raw = (
        b"WARC/1.0\r\nWARC-Type: metadata\r\n"
        b"WARC-Record-ID: <urn:uuid:x>\r\n\r\npayload"
    )
    got = list(iter_warc_records(raw, "f"))
    assert len(got) == 1 and "Content-Length" in got[0]["error"]


def test_truncated_payload_quarantined():
    blob = encode_warc(_recs(1))[:-10]
    got = list(iter_warc_records(blob, "f"))
    assert got[-1]["error"] == "payload truncated"


def test_header_case_insensitive_and_lf_only():
    raw = (
        b"WARC/1.0\nwarc-type: CONVERSION-ish\ncontent-length: 5\n"
        b"WARC-RECORD-ID: <urn:uuid:lf>\n\nhello"
    )
    got = list(iter_warc_records(raw, "f"))
    assert got[0]["error"] is None
    assert got[0]["warc_type"] == "CONVERSION-ish"
    assert got[0]["record_id"] == "<urn:uuid:lf>"
    assert got[0]["content"] == b"hello"


def test_read_warc_spark_end_to_end(spark, tmp_path):
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "seg-0.warc.gz").write_bytes(
        encode_warc(_recs(3), gzip_records=True)
    )
    (d / "seg-1.warc").write_bytes(encode_warc(_recs(2)))
    (d / "notes.txt").write_text("not a warc")  # glob-pruned
    bad = b"garbage" + encode_warc(_recs(1))
    (d / "seg-2.warc").write_bytes(bad)
    got = read_warc(spark, str(d))
    recs = got.records.collect()
    assert len(recs) == 6
    assert {r["warc_type"] for r in recs} == {"conversion"}
    q = got.quarantined.collect()
    assert len(q) == 1 and q[0]["path"].endswith("seg-2.warc")
    assert q[0]["record_offset"] == 0

    txt = wet_text(got.records)
    rows = txt.where(txt.target_uri == "https://example.com/p/1").collect()
    assert rows and all(
        r["text"] == "document 1 text\nwith a second line" for r in rows
    )


def test_read_warc_counts_match_jsonl_equivalent(spark, sf_dir, tmp_path):
    """Ingest parity: documents exported as WET records read back with
    the same row count and char mass as the parquet source."""
    import pyspark.sql.functions as F

    doc = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    rows = [
        {
            "warc_type": "conversion",
            "record_id": f"<urn:doc:{r['doc_id']}>",
            "target_uri": f"https://corpus/{r['doc_id']}",
            "content_type": "text/plain",
            "content": r["text"],
        }
        for r in doc.select("doc_id", "text").collect()
    ]
    (tmp_path / "docs.warc.gz").write_bytes(
        encode_warc(rows, gzip_records=True)
    )
    got = read_warc(spark, str(tmp_path))
    assert got.quarantined.count() == 0
    wet = wet_text(got.records)
    a = wet.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("text")).alias("chars"),
    ).collect()[0]
    b = doc.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("text")).alias("chars"),
    ).collect()[0]
    assert (a["n"], a["chars"]) == (b["n"], b["chars"])


def test_http_envelope_split(spark):
    from pinecone_datasets_spark.sources.warc import http_body, http_status

    rows = [
        (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>hi</p>",),
        (b"HTTP/1.0 404 Not Found\n\ngone",),       # LF-only envelope
        (b"<p>no envelope</p>",),                    # not an HTTP message
        (None,),
    ]
    df = spark.createDataFrame(rows, "content binary")
    got = df.select(
        http_status("content").alias("s"), http_body("content").alias("b")
    ).collect()
    assert (got[0]["s"], got[0]["b"]) == (200, "<p>hi</p>")
    assert (got[1]["s"], got[1]["b"]) == (404, "gone")
    assert (got[2]["s"], got[2]["b"]) == (None, None)
    assert (got[3]["s"], got[3]["b"]) == (None, None)


def test_http_body_first_blank_line_wins(spark):
    """ADVICE r7: an LF-terminated header whose BODY contains CRLFCRLF
    bytes later must cut at the earlier LFLF — the pre-fix code
    preferred any CRLF occurrence unconditionally, truncating the body."""
    from pinecone_datasets_spark.sources.warc import http_body

    rows = [
        # LF header, CRLFCRLF later inside the body
        (b"HTTP/1.1 200 OK\nContent-Type: text/html\n\n"
         b"<pre>head\r\n\r\ntail</pre>",),
        # CRLF header, LFLF later inside the body (symmetric case)
        (b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"
         b"a\n\nb",),
    ]
    df = spark.createDataFrame(rows, "content binary")
    got = [r["b"] for r in df.select(http_body("content").alias("b")).collect()]
    assert got[0] == "<pre>head\r\n\r\ntail</pre>"
    assert got[1] == "a\n\nb"


def test_stream_warc_availablenow_equals_batch(spark, tmp_path):
    """stream_warc over availableNow == read_warc records (the batch
    reader's good frame), record for record; malformed regions are
    dropped by the stream (documented) and quarantined by batch."""
    from pinecone_datasets_spark.sources.warc import read_warc, stream_warc

    d = tmp_path / "stream"
    d.mkdir()
    (d / "a.warc.gz").write_bytes(encode_warc(_recs(3), gzip_records=True))
    (d / "b.warc").write_bytes(
        b"junk" + encode_warc([dict(_recs(1)[0], record_id="<urn:b>")])
    )

    q = (
        stream_warc(spark, str(d), max_files_per_trigger=1)
        .writeStream.format("memory")
        .queryName("warc_stream_t")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT record_id, content_length FROM warc_stream_t"
    ).collect()
    batch = read_warc(spark, str(d)).records.select(
        "record_id", "content_length"
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, batch))
    assert len(got) == 4  # junk dropped, records all survive


def test_corrupt_gzip_quarantines_not_dies(spark, tmp_path):
    """A corrupt gzip member (or trailing garbage after valid members)
    must cost a quarantine row, never the job."""
    good = encode_warc(_recs(2), gzip_records=True)
    (tmp_path / "a.warc.gz").write_bytes(good + b"\x1f\x8b\x08CORRUPT")
    (tmp_path / "b.warc.gz").write_bytes(b"\x1f\x8b\x08TOTALLY BROKEN")
    got = read_warc(spark, str(tmp_path))
    recs = got.records.collect()
    assert len(recs) == 2  # the two valid records decode
    q = got.quarantined.collect()
    assert len(q) >= 1  # the broken file surfaces, the job survives
    assert any(r["path"].endswith("b.warc.gz") for r in q)


def test_write_wet_roundtrip_deterministic(spark, tmp_path):
    """r8 WET writer twin: extract -> write_wet -> read_warc -> wet_text
    closes the crawl loop; bytes are partitioning-independent and the
    task-commit protocol leaves no temp files."""
    import hashlib
    import json
    import os

    from pinecone_datasets_spark.sources.warc import (
        read_warc,
        wet_text,
        write_wet,
    )

    rows = [
        (f"https://ex.com/{i}", f"extracted text {i}\nsecond line {i%3}")
        for i in range(25)
    ] + [("https://ex.com/empty", ""), (None, "doc with no url"),
         ("https://ex.com/dup", "version B"), ("https://ex.com/dup", "version A")]
    df = spark.createDataFrame(rows, "url string, text string")
    hashes = []
    for run, parts in (("a", 7), ("b", 3)):
        path = str(tmp_path / run)
        man = write_wet(df.repartition(parts), path, num_files=4)
        assert man["n_records"] == len(rows)
        digest = hashlib.md5()
        for name in sorted(os.listdir(path)):
            if name == "manifest.json":
                continue
            digest.update(name.encode())
            digest.update(open(os.path.join(path, name), "rb").read())
        hashes.append(digest.hexdigest())
        assert not [n for n in os.listdir(path) if ".inprogress-" in n]
    assert hashes[0] == hashes[1]

    path = str(tmp_path / "a")
    on_disk = json.load(open(os.path.join(path, "manifest.json")))
    assert on_disk["n_records"] == len(rows)
    got = read_warc(spark, path)
    assert got.quarantined.count() == 0
    keyf = lambda p: (p[0] is not None, p[0] or "", p[1])  # noqa: E731
    back = sorted(
        ((r["target_uri"], r["text"])
         for r in wet_text(got.records).collect()),
        key=keyf,
    )
    assert back == sorted(rows, key=keyf)
    # every segment leads with a warcinfo record
    info = got.records.where("warc_type = 'warcinfo'").count()
    assert info == len(on_disk["files"])


def test_write_wet_iri_and_duplicate_record_ids(spark, tmp_path):
    """r8 review fixes: a non-latin-1 IRI must cost a percent-encoded
    WARC-Target-URI header (not a crashed export), and duplicate rows
    get UNIQUE record ids (ordinal suffix) so id-keyed consumers can't
    silently collapse them."""
    from pinecone_datasets_spark.sources.warc import (
        read_warc,
        write_wet,
    )

    rows = [
        ("https://ex.com/café/中文", "iri doc"),
        ("https://ex.com/same", "dup body"),
        ("https://ex.com/same", "dup body"),  # exact duplicate row
    ]
    df = spark.createDataFrame(rows, "url string, text string")
    path = str(tmp_path / "iri")
    man = write_wet(df, path, num_files=2)
    assert man["n_records"] == 3
    got = read_warc(spark, path)
    assert got.quarantined.count() == 0
    recs = got.records.where("warc_type = 'conversion'").collect()
    assert len(recs) == 3
    uris = {r["target_uri"] for r in recs}
    assert "https://ex.com/caf%C3%A9/%E4%B8%AD%E6%96%87" in uris
    ids = [r["record_id"] for r in recs]
    assert len(set(ids)) == 3  # unique even for identical rows


def test_write_wet_manifest_commit_ignores_losers(spark, tmp_path):
    """r8 verdict item 3 on the WET sink: commit='manifest' writes
    attempt-unique final segment names, and read_warc(use_manifest=
    True) opens only the manifest's winners — a planted loser segment
    (speculative twin with drifted records) is never parsed. Record
    content matches a rename-mode write of the same frame."""
    import os

    from pinecone_datasets_spark.sources.warc import (
        encode_warc,
        read_warc,
        wet_text,
        write_wet,
    )

    rows = [
        (f"https://ex.com/{i}", f"text {i}") for i in range(12)
    ] + [(None, "no url")]
    df = spark.createDataFrame(rows, "url string, text string")
    path = str(tmp_path / "m")
    man = write_wet(df, path, num_files=3, commit="manifest")
    assert man["commit"] == "manifest"
    names = [f["name"] for f in man["files"]]
    assert all("-a" in n for n in names)
    assert not [n for n in os.listdir(path) if ".inprogress-" in n]

    # plant a loser attempt for segment 0 with a record that must NOT
    # appear in the manifest-trusting read
    loser = encode_warc(
        [
            {
                "warc_type": "conversion",
                "record_id": "<urn:loser:1>",
                "target_uri": "https://ex.com/LOSER",
                "warc_date": "2026-01-01T00:00:00Z",
                "content_type": "text/plain",
                "content": "loser attempt payload",
            }
        ],
        gzip_records=True,
    )
    with open(
        os.path.join(path, "wet-00000-a999999999.warc.wet.gz"), "wb"
    ) as fh:
        fh.write(loser)

    got = read_warc(spark, path, use_manifest=True)
    texts = {
        (r["target_uri"], r["text"])
        for r in wet_text(got.records).collect()
    }
    expect = {
        (u, t)
        for u, t in [
            (f"https://ex.com/{i}", f"text {i}") for i in range(12)
        ]
        + [(None, "no url")]
    }
    assert texts == expect  # loser record absent, all winners present
    assert got.quarantined.count() == 0

    # default glob mode would see the loser too (documented hazard) —
    # and use_manifest without a manifest refuses loudly
    os.unlink(os.path.join(path, "manifest.json"))
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError, match="manifest.json"):
        read_warc(spark, path, use_manifest=True)


def test_glob_mode_refuses_manifest_committed_directory(spark, tmp_path):
    """ADVICE r10 (medium): the default glob matches attempt-unique
    names, so a manifest-committed directory read WITHOUT
    use_manifest=True could silently double-read a speculated segment
    — the glob reader must refuse loudly (mirrors read_token_shards)."""
    from pinecone_datasets_spark.sources.warc import read_warc, write_wet

    df = spark.createDataFrame(
        [("https://ex.com/a", "body a")], "url string, text string"
    )
    path = str(tmp_path / "mdir")
    man = write_wet(df, path, num_files=1, commit="manifest")
    assert man["commit"] == "manifest"
    with pytest.raises(ValueError, match="use_manifest=True"):
        read_warc(spark, path)
    # the manifest-trusting read works, and a rename-mode dir still
    # glob-reads fine (its manifest records commit='rename')
    assert read_warc(spark, path, use_manifest=True).records.count() > 0
    path2 = str(tmp_path / "rdir")
    write_wet(df, path2, num_files=1)
    assert read_warc(spark, path2).records.count() > 0


def test_warc_corrupt_manifest_strict_mode_valueerror(spark, tmp_path):
    """ADVICE r10 (low): use_manifest=True on a PRESENT-but-corrupt
    manifest.json raises ValueError, never FileNotFoundError — absent
    and corrupt are different failure classes for callers that catch
    FileNotFoundError to mean 'absent'."""
    from pinecone_datasets_spark.sources.warc import read_warc, write_wet

    df = spark.createDataFrame(
        [("https://ex.com/a", "body a")], "url string, text string"
    )
    path = str(tmp_path / "cdir")
    write_wet(df, path, num_files=1, commit="manifest")
    with open(os.path.join(path, "manifest.json"), "w") as fh:
        fh.write('{"commit": "manif')  # truncated mid-write
    with pytest.raises(ValueError, match="not valid JSON"):
        read_warc(spark, path, use_manifest=True)

"""Corpus ingestion sources (sources/corpus.py): JSONL / CSV / raw text.

Round-trip fidelity is proven against the driver's documents fixture:
export it as JSONL (and CSV) with Spark, re-ingest with the corpus
source, and require exact frame equality with the parquet original —
the same golden-roundtrip style the reference uses for its own writer
(`tests/integration/test_io_local.py:54-77`).
"""

from __future__ import annotations

import gzip
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from pinecone_datasets_spark.sources.corpus import (
    CORRUPT_COL,
    read_csv,
    read_jsonl,
    read_text_files,
    stream_jsonl,
)

DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("source", StringType(), True),
        StructField("n_chars", LongType(), True),
    ]
)


def _sorted_rows(df, cols=("doc_id",)):
    return [tuple(r) for r in df.orderBy(*cols).collect()]


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )


def test_jsonl_roundtrip_exact(spark, docs, tmp_path):
    out = str(tmp_path / "docs_jsonl")
    docs.write.json(out)
    got = read_jsonl(spark, out, DOCS_SCHEMA)
    assert got.good.columns == [f.name for f in DOCS_SCHEMA.fields]
    assert got.quarantined.count() == 0
    assert _sorted_rows(got.good) == _sorted_rows(docs)


def test_jsonl_gzip_and_glob(spark, docs, tmp_path):
    out = str(tmp_path / "docs_gz")
    docs.write.option("compression", "gzip").json(out)
    # a non-data file the glob must prune
    with open(os.path.join(out, "README.txt"), "w") as fh:
        fh.write("not data")
    got = read_jsonl(spark, out, DOCS_SCHEMA, path_glob="*.json.gz")
    assert got.good.count() == docs.count()
    assert got.quarantined.count() == 0


def test_jsonl_quarantines_corrupt_lines(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n'
        "THIS IS NOT JSON\n"
        '{"doc_id": 2, "text": "also ok", "lang": "de", "source": "s", "n_chars": 7}\n'
        '{"doc_id": 3, "text": "truncated...\n'
    )
    got = read_jsonl(spark, str(p), DOCS_SCHEMA)
    assert got.good.count() == 2
    bad = got.quarantined.collect()
    assert len(bad) == 2
    assert {r["raw_record"] for r in bad} == {
        "THIS IS NOT JSON",
        '{"doc_id": 3, "text": "truncated...',
    }
    assert all(r["source_file"].endswith("mixed.jsonl") for r in bad)
    # good frame carries no parser plumbing
    assert CORRUPT_COL not in got.good.columns


def test_jsonl_accepts_ddl_string_schema(spark, docs, tmp_path):
    out = str(tmp_path / "docs_ddl")
    docs.write.json(out)
    got = read_jsonl(
        spark,
        out,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    assert _sorted_rows(got.good) == _sorted_rows(docs)


def test_jsonl_rejects_schema_with_corrupt_col(spark, tmp_path):
    bad_schema = StructType(
        [StructField(CORRUPT_COL, StringType(), True)]
    )
    with pytest.raises(ValueError, match=CORRUPT_COL):
        read_jsonl(spark, str(tmp_path), bad_schema)


def test_jsonl_recursive_layout(spark, docs, tmp_path):
    # nested crawl-style layout: shard dirs under a root
    a = docs.where(F.col("doc_id") % 2 == 0)
    b = docs.where(F.col("doc_id") % 2 == 1)
    a.write.json(str(tmp_path / "root" / "shard=a"))
    b.write.json(str(tmp_path / "root" / "shard=b"))
    got = read_jsonl(
        spark, str(tmp_path / "root"), DOCS_SCHEMA, recursive=True
    )
    assert got.good.count() == docs.count()


def test_csv_roundtrip_and_arity_quarantine(spark, docs, tmp_path):
    out = str(tmp_path / "docs_csv")
    # the text column contains commas/newlines: quote+escape must survive
    docs.write.option("header", True).option("quoteAll", True).csv(out)
    got = read_csv(spark, out, DOCS_SCHEMA, header=True)
    assert got.quarantined.count() == 0
    assert _sorted_rows(got.good) == _sorted_rows(docs)

    p = tmp_path / "bad.csv"
    p.write_text(
        "doc_id,text,lang,source,n_chars\n"
        "1,ok,en,s,2\n"
        "not_a_long,text,en,s,xxx\n"
    )
    got2 = read_csv(spark, str(p), DOCS_SCHEMA, header=True)
    assert got2.good.where(F.col("doc_id") == 1).count() == 1
    assert got2.quarantined.count() == 1


def test_text_files_whole_and_lines(spark, tmp_path):
    d = tmp_path / "raw"
    d.mkdir()
    (d / "a.txt").write_text("hello\nworld")
    (d / "b.txt").write_text("second doc")
    whole = read_text_files(spark, str(d), whole_files=True)
    rows = {
        os.path.basename(r["doc_path"]): r["text"]
        for r in whole.collect()
    }
    assert rows == {"a.txt": "hello\nworld", "b.txt": "second doc"}
    lines = read_text_files(spark, str(d), whole_files=False)
    assert lines.count() == 3
    assert set(lines.columns) == {"doc_path", "text"}


def test_stream_jsonl_availablenow_equals_batch(spark, docs, tmp_path):
    out = str(tmp_path / "stream_src")
    docs.limit(50).write.json(out)
    stream = stream_jsonl(spark, out, DOCS_SCHEMA, max_files_per_trigger=2)
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("corpus_stream_test")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from corpus_stream_test")
    batch = read_jsonl(spark, out, DOCS_SCHEMA).good
    assert _sorted_rows(got) == _sorted_rows(batch)


def test_jsonl_all_corrupt_and_empty_files(spark, tmp_path):
    d = tmp_path / "edge"
    d.mkdir()
    (d / "bad.jsonl").write_text("nope\nstill nope\n")
    (d / "empty.jsonl").write_text("")
    (d / "blank.jsonl").write_text("\n\n\n")
    got = read_jsonl(spark, str(d), DOCS_SCHEMA)
    assert got.good.count() == 0
    # blank lines skipped, not quarantined; real garbage quarantined
    assert got.quarantined.count() == 2


def test_jsonl_wrong_types_quarantined_not_nulled(spark, tmp_path):
    p = tmp_path / "types.jsonl"
    p.write_text(
        '{"doc_id": "NOT A NUMBER", "text": "x", "lang": "en",'
        ' "source": "s", "n_chars": 1}\n'
        '{"doc_id": 7, "text": "y", "lang": "en", "source": "s",'
        ' "n_chars": 1}\n'
    )
    got = read_jsonl(spark, str(p), DOCS_SCHEMA)
    good = got.good.collect()
    # a type-violating field is a corrupt RECORD (raw line preserved for
    # replay), not a silently nulled cell
    assert [r["doc_id"] for r in good] == [7]
    bad = got.quarantined.collect()
    assert len(bad) == 1 and "NOT A NUMBER" in bad[0]["raw_record"]


def test_read_media_directory(spark, tmp_path):
    """r8 media directory source: binaryFile scan + real header probes
    -> the MEDIA_SCHEMA frame every multimodal operator consumes; types
    come from bytes, not extensions; junk keeps its content with
    format NULL / media_type 'unknown'."""
    import numpy as np

    from pinecone_datasets_spark.operators.flac import encode_flac
    from pinecone_datasets_spark.operators.media_codecs import (
        encode_png,
        encode_wav,
    )
    from pinecone_datasets_spark.operators.multimodal import (
        extract_audio_features,
        extract_image_features,
    )
    from pinecone_datasets_spark.sources.media import read_media

    d = tmp_path / "media"
    d.mkdir()
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (6, 9, 3), dtype=np.uint8)
    (d / "img.bin").write_bytes(encode_png(px))  # wrong extension: ok
    sig = 0.3 * np.sin(np.arange(4000) / 9.0)
    (d / "clip.wav").write_bytes(encode_wav(sig, rate=16000))
    (d / "clip.flac").write_bytes(encode_flac(sig, rate=16000))
    (d / "junk.dat").write_bytes(b"\x00\x01 not media")

    media = read_media(spark, str(d))
    rows = {
        r["media_id"].rsplit("/", 1)[-1]: r for r in media.collect()
    }
    assert rows["img.bin"]["format"] == "png"
    assert rows["img.bin"]["media_type"] == "image"
    assert (rows["img.bin"]["width"], rows["img.bin"]["height"]) == (9, 6)
    assert rows["clip.wav"]["media_type"] == "audio"
    assert rows["clip.flac"]["format"] == "flac"
    assert rows["clip.flac"]["duration_ms"] == 4000 * 1000 // 16000
    assert rows["junk.dat"]["format"] is None
    assert rows["junk.dat"]["media_type"] == "unknown"
    assert bytes(rows["junk.dat"]["content"]) == b"\x00\x01 not media"

    # the frame plugs straight into the feature kernels
    feats = {
        r["media_id"].rsplit("/", 1)[-1]: r
        for r in extract_image_features(
            media.where("media_type = 'image'")
        ).collect()
    }
    assert feats["img.bin"]["width"] == 9
    au = {
        r["media_id"].rsplit("/", 1)[-1]: r
        for r in extract_audio_features(
            media.where("media_type = 'audio'")
        ).collect()
    }
    assert au["clip.wav"]["sample_rate"] == 16000
    assert au["clip.flac"]["sample_rate"] == 16000


def test_stream_media_availablenow_equals_batch(spark, tmp_path):
    """stream_media over availableNow == read_media row-for-row (same
    probe kernel; quarantine rows INCLUDED in both, unlike the WARC
    stream, because the probe has no unbounded reject state)."""
    import numpy as np

    from pinecone_datasets_spark.operators.media_codecs import (
        encode_png,
        encode_wav,
    )
    from pinecone_datasets_spark.sources.media import (
        read_media,
        stream_media,
    )

    d = tmp_path / "mstream"
    d.mkdir()
    (d / "a.png").write_bytes(
        encode_png(np.full((5, 7, 3), 9, np.uint8))
    )
    (d / "b.wav").write_bytes(
        encode_wav(0.1 * np.sin(np.arange(800) / 5.0), rate=8000)
    )
    (d / "junk.bin").write_bytes(b"\x00\x01nonsense")

    q = (
        stream_media(spark, str(d), max_files_per_trigger=1)
        .writeStream.format("memory")
        .queryName("media_stream_t")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["media_id"].split("/")[-1]: r
        for r in spark.sql(
            "SELECT media_id, media_type, format, width, height,"
            " duration_ms FROM media_stream_t"
        ).collect()
    }
    batch = {
        r["media_id"].split("/")[-1]: r
        for r in read_media(spark, str(d)).select(
            "media_id", "media_type", "format", "width", "height",
            "duration_ms"
        ).collect()
    }
    assert set(got) == set(batch) == {"a.png", "b.wav", "junk.bin"}
    for k in got:
        assert got[k].asDict() == batch[k].asDict(), k
    assert got["junk.bin"]["media_type"] == "unknown"
    assert got["a.png"]["width"] == 7 and got["a.png"]["height"] == 5


def test_jsonl_dotted_field_names(spark, tmp_path):
    """r11 review (confirmed): a schema field containing a dot
    ('user.id' — legal JSON) parsed as a struct path and failed
    analysis."""
    from pyspark.sql import types as T

    from pinecone_datasets_spark.sources.corpus import read_jsonl

    p = tmp_path / "t.jsonl"
    p.write_text('{"user.id": "u1", "v": 2}\n{"user.id": "u2", "v": 3}\n')
    schema = T.StructType(
        [
            T.StructField("user.id", T.StringType()),
            T.StructField("v", T.IntegerType()),
        ]
    )
    got = read_jsonl(spark, str(p), schema)
    rows = {r["user.id"]: r["v"] for r in got.good.collect()}
    assert rows == {"u1": 2, "u2": 3}
    assert got.quarantined.count() == 0

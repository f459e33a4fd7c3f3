"""End-to-end crawl-to-corpus integration: the full first-hop pipeline a
training-data user runs, composed from this library's pieces —

  gzipped JSONL crawl (with junk files, corrupt lines, duplicates)
    → quarantining ingest (sources/corpus.py)
    → quality + dedup curation (operators/pipeline.py)
    → BPE token counts (operators/bpe.py) feeding sequence packing
      (operators/packing.py via token_count_col)
    → heavy-hitter vocabulary audit (operators/sketch.py)
    → persisted as a catalog dataset (writer/catalog) and read back.

Each stage's contract is asserted where data leaves it, so a regression
anywhere in the chain fails HERE with the stage named — the test is the
product story, not a unit.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pinecone_datasets_spark.operators.bpe import (
    bpe_token_counts,
    train_bpe,
    word_histogram,
)
from pinecone_datasets_spark.operators.packing import pack_documents
from pinecone_datasets_spark.operators.pipeline import curate_corpus
from pinecone_datasets_spark.operators.sketch import mg_heavy_hitters
from pinecone_datasets_spark.sources.corpus import read_jsonl

DOCS_DDL = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


@pytest.fixture(scope="module")
def crawl_dir(spark, sf_dir, tmp_path_factory):
    """A messy crawl directory: the fixture corpus as gzipped JSONL,
    plus duplicates of the first 10 docs (fresh ids), 3 corrupt lines,
    and a non-data file the glob must skip."""
    root = str(tmp_path_factory.mktemp("crawl"))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    dupes = (
        docs.orderBy("doc_id")
        .limit(10)
        .withColumn("doc_id", F.col("doc_id") + 1_000_000)
    )
    docs.unionByName(dupes).write.mode("overwrite").option(
        "compression", "gzip"
    ).json(root)
    with open(os.path.join(root, "broken.jsonl"), "w") as fh:
        fh.write(
            '{"doc_id": 999001, "text": "valid straggler line ok",'
            ' "lang": "en", "source": "s", "n_chars": 23}\n'
            "%%% NOT JSON %%%\n"
            '{"doc_id": 999002, "text": "trunc\n'
            "{broken\n"
        )
    with open(os.path.join(root, "MANIFEST.txt"), "w") as fh:
        fh.write("not data")
    return root


def test_crawl_to_corpus(spark, sf_dir, crawl_dir, tmp_path):
    n_fixture = spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    # 1. ingest: glob skips the manifest; corrupt lines quarantined,
    #    valid lines in the same file survive
    got = read_jsonl(
        spark, crawl_dir, DOCS_DDL, path_glob="*.json*"
    )
    assert got.quarantined.count() == 3
    n_ingested = got.good.count()
    assert n_ingested == n_fixture + 10 + 1  # dupes + straggler

    # 2. curation: the 10 injected duplicates must all die in exact
    #    dedup (content-identical to originals); gates keep the rest
    curated = curate_corpus(
        got.good, min_quality=0.0, min_words=1
    ).cache()
    n_curated = curated.count()
    assert n_curated <= n_ingested - 10
    assert curated.where(F.col("doc_id") >= 1_000_000).count() == 0

    # 3. BPE: train on the curated corpus, exact token counts per doc
    merges = train_bpe(word_histogram(curated, max_words=20_000), 300)
    counted = bpe_token_counts(curated, merges)
    stats = counted.agg(
        F.sum("bpe_tokens").alias("total"),
        F.min("bpe_tokens").alias("lo"),
    ).collect()[0]
    assert stats["lo"] > 0

    # 4. packing on REAL token counts: chunk ids are a contiguous
    #    prefix-sum layout and every chunk respects the budget
    packed = pack_documents(
        counted,
        max_tokens=512,
        id_col="doc_id",
        token_count_col="bpe_tokens",
    )
    layout = packed.select(
        "doc_id", "n_tokens", "global_start", "chunk_id"
    ).collect()
    assert sum(r["n_tokens"] for r in layout) == stats["total"]
    # the token stream is cut every 512: each doc's chunk is exactly its
    # global offset div 512, and chunk ids form a contiguous prefix
    for r in layout:
        assert r["chunk_id"] == r["global_start"] // 512
    chunk_ids = {r["chunk_id"] for r in layout}
    assert chunk_ids == set(range(max(chunk_ids) + 1))
    assert len(chunk_ids) >= stats["total"] // 512

    # 5. vocabulary audit: heavy hitters over the curated token stream
    #    agree with exact counts within the deterministic bound
    toks = curated.select(
        F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
    ).where(F.length("tok") > 0)
    hh = mg_heavy_hitters(toks, "tok", capacity=128, min_share=0.02)
    rows = hh.collect()
    if rows:
        exact_top = (
            toks.groupBy("tok").count().orderBy(F.desc("count")).first()
        )
        assert exact_top["tok"] in {r["tok"] for r in rows}

    # 6. persist as a dataset and read back: counts survive the hop
    from pinecone_datasets_spark import Catalog, Dataset
    from pinecone_datasets_spark.metadata import (
        DatasetMetadata,
        DenseModelMetadata,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    final = (
        curated.join(emb, curated.doc_id == emb.vec_id)
        .select(
            F.col("doc_id").cast("string").alias("id"),
            F.col("embedding").alias("values"),
            F.to_json(F.struct("lang", "source", "n_chars")).alias(
                "metadata"
            ),
        )
    )
    n_final = final.count()
    meta = DatasetMetadata(
        name="crawl-e2e",
        created_at="2026-08-14 00:00:00.000000",
        documents=n_final,
        queries=0,
        dense_model=DenseModelMetadata(name="synthetic", dimension=64),
    )
    ds = Dataset.from_dataframe(spark, final, metadata=meta)
    base = str(tmp_path / "catalog")
    Catalog(spark, base_path=base).save_dataset(ds)
    back = Catalog(spark, base_path=base).load().load_dataset("crawl-e2e")
    assert back.documents.count() == n_final
    curated.unpersist()


def test_raw_warc_crawl_to_corpus(spark, sf_dir, tmp_path):
    """The RAW-crawl variant of the first hop, composed from the r7
    pieces: .warc.gz response records (HTTP envelope + HTML) with URL
    variants and damage planted →

      read_warc (quarantine + resync, sources/warc.py)
        → http_status / http_body (envelope split)
        → html_to_text (functions/html.py)
        → dedup_by_url on the canonical target URI (operators/domains)
        → exact content dedup (operators/dedup.py)

    and the surviving text must equal the fixture docs exactly."""
    from pinecone_datasets_spark.functions.html import html_to_text
    from pinecone_datasets_spark.operators.dedup import exact_dedup
    from pinecone_datasets_spark.operators.domains import dedup_by_url
    from pinecone_datasets_spark.sources.warc import (
        encode_warc,
        http_body,
        http_status,
        read_warc,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(60)
        .collect()
    )

    def response(doc_id, text, url, status="200 OK"):
        html = (
            f"<html><head><script>var a = 1 < 2;</script></head>"
            f"<body><p>{text}</p></body></html>"
        )
        payload = (
            f"HTTP/1.1 {status}\r\nContent-Type: text/html\r\n\r\n{html}"
        )
        return {
            "warc_type": "response",
            "record_id": f"<urn:rec:{doc_id}:{url}>",
            "target_uri": url,
            "content_type": "application/http; msgtype=response",
            "content": payload,
        }

    recs = []
    for r in docs:
        i, t = r["doc_id"], r["text"]
        recs.append(response(i, t, f"https://site.test/p/{i}?a=1&b=2"))
        if i % 5 == 0:  # URL variant of the same page (same content)
            recs.append(
                response(
                    i, t,
                    f"HTTPS://SITE.test:443/p//{i}/?b=2&a=1&utm_source=x",
                )
            )
        if i % 7 == 0:  # 404 page — must be status-gated out
            recs.append(
                response(i, "gone", f"https://site.test/err/{i}",
                         status="404 Not Found")
            )
        if i % 9 == 0:  # exact content copy at a genuinely new URL
            recs.append(
                response(i, t, f"https://mirror.test/m/{i}")
            )

    d = tmp_path / "rawcrawl"
    d.mkdir()
    half = len(recs) // 2
    (d / "seg-0.warc.gz").write_bytes(
        encode_warc(recs[:half], gzip_records=True)
    )
    # damage spliced between two records of the second segment
    seg1 = (
        encode_warc(recs[half : half + 1])
        + b"%% TRANSFER GARBAGE %%\r\n\r\n"
        + encode_warc(recs[half + 1 :])
    )
    (d / "seg-1.warc").write_bytes(seg1)

    got = read_warc(spark, str(d))
    assert got.quarantined.count() == 1

    pages = got.records.select(
        "target_uri",
        http_status("content").alias("status"),
        http_body("content").alias("body"),
    ).where(F.col("status") == 200)
    n_404 = sum(1 for r in docs if r["doc_id"] % 7 == 0)
    # the damage sits BETWEEN records, so resync loses nothing: every
    # planted record parses, the garbage costs exactly one quarantine row
    n_parsed = got.records.count()
    assert n_parsed == len(recs)
    assert pages.count() == n_parsed - n_404

    texts = pages.select(
        (F.monotonically_increasing_id()).alias("row_id"),
        "target_uri",
        html_to_text("body").alias("text"),
    )

    # URL dedup collapses the planted variants (case/port/slash/params)
    by_url = dedup_by_url(texts, url_col="target_uri", id_col="row_id")
    urls = [r["target_uri"] for r in by_url.collect()]
    assert len(urls) == len(set(urls))
    # every %5 page lost its variant twin; mirror copies survive (the
    # mirror URL is genuinely different)
    n_variant = sum(
        1 for r in docs if r["doc_id"] % 5 == 0 and r["doc_id"] % 7 != 0
    ) + sum(
        1 for r in docs if r["doc_id"] % 5 == 0 and r["doc_id"] % 7 == 0
    )
    assert by_url.count() <= pages.count() - n_variant + 1

    # exact content dedup then kills the mirrors; surviving text equals
    # the fixture docs byte-for-byte
    final = exact_dedup(by_url, text_col="text", id_col="row_id")
    survived = {r["text"] for r in final.collect()}
    expected = {r["text"] for r in docs}
    assert survived == expected


def test_stream_crawl_extract_availablenow_equals_batch(
    spark, tmp_path, tmp_path_factory
):
    """r8 streaming twin of the crawl pre-stages: availableNow replay of
    stream_crawl_extract (status gate → html_to_text → stateful URL
    dedup → line gates) equals the batch chain (read_warc → http gates
    → html_to_text → dedup_by_url → apply_line_gates) on an ordered
    fixture where first arrival = lowest id."""
    from pinecone_datasets_spark.functions.html import html_to_text
    from pinecone_datasets_spark.functions.text import apply_line_gates
    from pinecone_datasets_spark.operators.domains import dedup_by_url
    from pinecone_datasets_spark.sources.warc import (
        encode_warc,
        http_body,
        http_status,
        read_warc,
    )
    from pinecone_datasets_spark.streaming.curate import (
        stream_crawl_extract,
    )

    d = tmp_path / "crawl"
    d.mkdir()
    recs = []
    for i in range(30):
        status = "404 Not Found" if i % 9 == 0 else "200 OK"
        # ids i and i+15 share a canonical URL (variant casing) — the
        # lower id is serialized first, so stream first-arrival and
        # batch min-id agree
        host = f"ex{i % 15}.com"
        url = (
            f"https://{host}/p?a=1"
            if i < 15
            else f"HTTPS://{host.upper()}/p?a=1"
        )
        bullets = (
            "<ul><li>- s1</li><li>- s2</li><li>- s3</li></ul>"
            if i % 7 == 0
            else ""
        )
        html = (
            f"<html><body><p>Doc {i} body text here.</p>"
            f"<p>More prose for doc {i}.</p>{bullets}</body></html>"
        )
        recs.append(
            {
                "warc_type": "response",
                "record_id": f"<urn:doc:{i}>",
                "target_uri": url,
                "warc_date": "2026-01-01T00:00:00Z",
                "content_type": "application/http; msgtype=response",
                "content": f"HTTP/1.1 {status}\r\n\r\n{html}",
            }
        )
    # two segment files (two micro-batch candidates), ordered by id
    (d / "seg-0.warc.gz").write_bytes(
        encode_warc(recs[:15], gzip_records=True)
    )
    (d / "seg-1.warc.gz").write_bytes(
        encode_warc(recs[15:], gzip_records=True)
    )

    gates = {"max_bullet_line_frac": 0.4}
    out = stream_crawl_extract(
        spark, str(d), max_files_per_trigger=1, line_gates=gates
    )
    ckpt = str(tmp_path_factory.mktemp("ckpt_crawl"))
    q = (
        out.writeStream.format("memory")
        .queryName("crawl_stream")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_uri"]: r["text"]
        for r in spark.sql("SELECT * FROM crawl_stream").collect()
    }

    recs_b = read_warc(spark, str(d)).records
    parsed = recs_b.where(F.col("warc_type") == "response").select(
        F.col("record_id").alias("doc_uri"),
        F.col("target_uri").alias("url"),
        http_status("content").alias("status"),
        http_body("content").alias("body"),
    )
    txt = (
        parsed.where(F.col("status") == 200)
        .withColumn("text", html_to_text(F.col("body")))
        .withColumn(
            "doc_id",
            F.regexp_extract("doc_uri", r"<urn:doc:([0-9]+)>", 1).cast(
                "long"
            ),
        )
    )
    batch = apply_line_gates(
        dedup_by_url(txt, url_col="url", id_col="doc_id"), gates
    )
    want = {r["doc_uri"]: r["text"] for r in batch.collect()}
    assert got == want
    # the funnel actually bit: 404s, URL dups, and bullet spam all gone
    assert 0 < len(want) < 30

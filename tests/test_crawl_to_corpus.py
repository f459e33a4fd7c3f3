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

"""Generate PLANS.md: formatted physical plans for the headline operators.

Evidence artifact for plan-shape claims (pushdown, pruning, broadcast,
WindowGroupLimit): run after operator changes to refresh.

Usage: python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HEADLINE = [
    ("q01_pricing_summary", "scan + pushed filter + hash agg"),
    ("q04_region_revenue", "5-way join, broadcast dims"),
    ("q05_top_orders_per_segment", "window top-k (WindowGroupLimit)"),
    ("q20_topk_cosine", "vector top-k: broadcast queries + window limit"),
    ("q16_dedup_exact_keep", "exact dedup: key-only shuffles"),
    ("q22_event_scan_filter", "pushdown + projection pruning"),
    ("q33_curation_pipeline", "fused curation pipeline"),
    ("q45_hash_split", "deterministic split: map-only bucketing"),
    ("q47_source_cap", "per-group cap (WindowGroupLimit)"),
    ("q48_decontaminate", "decontamination: broadcast-only joins"),
    ("q49_pack_chunks", "packing: distributed prefix sum, no global window"),
    ("q50_quantized_topk", "int8-quantized scoring ∪ in-plan PQ/ADC reconstruction scoring"),
    ("q53_incremental_dedup", "incremental dedup: corpus never shuffles"),
    ("q54_asof_join", "as-of join: union-tag + one running window"),
    ("q55_range_join", "interval join: bucketed equi-join, no theta-join"),
    ("q56_rollup_revenue", "rollup: single Expand pass, broadcast dims"),
    ("q58_unigram_lm", "unigram + bigram LM: in-array bigram stream, vocab-sized joins"),
    ("q75_boilerplate", "boilerplate: single tokenize, (doc,gram) agg feeding both branches"),
    ("q77_dup_spans", "duplicated spans: per-doc windows only (gaps-and-islands)"),
    ("q35_ivf_topk", "IVF: in-plan Lloyd, broadcast codebook, probed-fraction join"),
    ("ivfpq_search", "IVF-PQ: pruned cell scan + ADC table-gather scoring"),
    ("jsonl_ingest", "JSONL ingest: one text scan, good/quarantine projections"),
    ("mg_heavy_hitters", "heavy hitters: bounded per-partition summaries"),
    ("hamming_topk", "1-bit sign codes: all-codegen XOR/popcount + exact re-rank"),
    ("phash_hamming_join",
     "pigeonhole Hamming join: band-triple shuffle, codegen bit_count verify"),
    ("cm_freq", "Count-Min: bounded-key groupBy, broadcast sketch probe"),
    ("pca_project", "PCA projection: map-only Arrow matmul, no shuffle"),
    ("q81_repeated_spans",
     "repeated-substring spans: hash-count agg + broadcast sliver + per-doc islands"),
    ("q83_hard_negatives",
     "hard negatives: broadcast anti-join + exact positive floor"),
    ("q84_retrieval_eval", "IR metrics: query-keyed partials only"),
    ("q85_rm3_search",
     "RM3: shared tf frames, literal feedback/models, weighted re-search"),
    ("q86_maxsim_topk",
     "MaxSim late interaction: broadcast multi-vector queries + window limit"),
    ("q89_hourly_anomaly",
     "rolling z-score: one (key) exchange shared by gapfill/LOCF/window"),
    ("domain_report",
     "domain report: one groupBy pass, window share over aggregated frame"),
    ("snapshot_diff",
     "snapshot diff: map-side fingerprints, one full-outer join on id"),
    ("lsh_probe",
     "persisted-LSH probe: pushed band/sig filters, broadcast candidates"),
    ("hll_distinct",
     "HyperLogLog: map-side register MAX, bounded shuffle, integer fold"),
    ("dsir_select",
     "DSIR selection: bucket-bounded LM shuffles, broadcast ratio join, "
     "TakeOrdered Gumbel top-k"),
    ("xe_rerank",
     "cross-encoder rerank: broadcast query text, Arrow pair kernel, "
     "window limit"),
    ("mh_index_probe",
     "persisted-MinHash probe: pushed bb IN filters, broadcast "
     "candidates, slot-agreement verify"),
    ("q90_profile_dataset",
     "dataset profile: one scalar agg + one multiplexed HLL pass"),
    ("semantic_decontam",
     "semantic decontamination: map-only Arrow GEMM, in-kernel max+count, "
     "filter rides the scoring pass"),
    ("curriculum_replay",
     "manifest-ordered curriculum replay: literal file-rank map + one "
     "global sort, no join"),
    ("q86_mmr_rerank",
     "MMR diversity rerank: exact-dot candidates + per-query greedy "
     "(applyInPandas), corpus never re-read"),
    ("q92_html_extract",
     "HTML→text: 15 chained codegen regexp stages, map-only"),
    ("q93_url_canonical",
     "URL canonicalization: map-only expression rebuild + group on "
     "canonical key"),
    ("warc_ingest",
     "WARC ingest: whole-file binary scan + Arrow record parse, "
     "map-only to the aggregate"),
]


def _extra_builders(spark, sf_dir):
    """Plans for operators that live outside the query registry — built
    the same way their bench legs / tests build them."""
    import tempfile

    import numpy as np
    from pyspark.sql import functions as F

    def ivfpq_search(spark, sf_dir):
        from pinecone_datasets_spark.operators.pq import (
            build_ivfpq_index, ivfpq_index_topk,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        docs = emb.select(
            F.col("vec_id").alias("id"), F.col("embedding").alias("values")
        )
        path = tempfile.mkdtemp(prefix="plans_ivfpq_") + "/idx"
        build_ivfpq_index(docs, path, n_centroids=8, m=8, n_codes=16)
        queries = docs.where(F.col("id") < 10).select(
            F.col("id").alias("query_id"), F.col("values").alias("vector")
        )
        return ivfpq_index_topk(spark, path, queries, k=5, nprobe=2)

    def jsonl_ingest(spark, sf_dir):
        from pinecone_datasets_spark.sources.corpus import read_jsonl

        path = tempfile.mkdtemp(prefix="plans_jsonl_") + "/j"
        spark.read.parquet(f"{sf_dir}/documents.parquet").write.json(path)
        got = read_jsonl(
            spark, path,
            "doc_id long, text string, lang string, "
            "source string, n_chars long",
        )
        return got.good.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs")
        )

    def semantic_decontam(spark, sf_dir):
        from pinecone_datasets_spark.operators.decontaminate import (
            semantic_decontaminate,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        return semantic_decontaminate(
            emb.where(F.col("vec_id") % 97 != 0),
            emb.where(F.col("vec_id") % 97 == 0),
            threshold=0.3,
        )

    def curriculum_replay(spark, sf_dir):
        from pinecone_datasets_spark.operators.mixing import (
            interleave_by_weights,
            read_curriculum,
            write_curriculum,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        ordered = interleave_by_weights(
            docs.select("doc_id", "source"), {"src0": 3.0, "src1": 1.0}
        )
        path = tempfile.mkdtemp(prefix="plans_curr_") + "/c"
        write_curriculum(ordered, path, num_files=4)
        return read_curriculum(spark, path)

    def warc_ingest(spark, sf_dir):
        from pinecone_datasets_spark.sources.warc import (
            encode_warc, read_warc, wet_text,
        )

        rows = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text").limit(50).collect()
        )
        path = tempfile.mkdtemp(prefix="plans_warc_")
        with open(f"{path}/seg-0.warc.gz", "wb") as fh:
            fh.write(encode_warc(
                [{"warc_type": "conversion",
                  "record_id": f"<urn:doc:{r['doc_id']}>",
                  "target_uri": f"https://corpus/{r['doc_id']}",
                  "content_type": "text/plain",
                  "content": r["text"]} for r in rows],
                gzip_records=True,
            ))
        got = read_warc(spark, path)
        return wet_text(got.records).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("text")).alias("chars"),
        )

    def mg_heavy_hitters(spark, sf_dir):
        from pinecone_datasets_spark.operators.sketch import (
            mg_heavy_hitters as mg,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        toks = docs.select(
            F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok")
        )
        return mg(toks, "tok", capacity=256)

    def hamming_topk(spark, sf_dir):
        from pinecone_datasets_spark.operators.search import (
            hamming_topk as ht,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        docs = emb.select(
            F.col("vec_id").alias("id"), F.col("embedding").alias("values")
        )
        queries = docs.where(F.col("id") < 10).select(
            F.col("id").alias("query_id"), F.col("values").alias("vector")
        )
        return ht(docs, queries, dim=64, k=5, rerank=4)

    def cm_freq(spark, sf_dir):
        from pinecone_datasets_spark.operators.sketch import (
            cm_estimate, cm_sketch,
        )

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        sk = cm_sketch(ev, "user_id", depth=4, width=256)
        probes = ev.select("user_id").distinct().orderBy("user_id").limit(20)
        return cm_estimate(sk, probes, "user_id", depth=4, width=256)

    def pca_project(spark, sf_dir):
        from pinecone_datasets_spark.operators.pca import (
            pca_project as proj, train_pca,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        docs = emb.select(
            F.col("vec_id").alias("id"), F.col("embedding").alias("values")
        )
        comps, mean, _ = train_pca(docs, out_dim=16, dim=64)
        return proj(docs, comps, mean)

    def domain_report(spark, sf_dir):
        from pinecone_datasets_spark.operators.domains import (
            domain_report as rep,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return rep(docs)

    def snapshot_diff(spark, sf_dir):
        from pinecone_datasets_spark.operators.snapshot import (
            snapshot_diff as diff,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        v2 = docs.where(F.col("doc_id") % 7 != 0)
        return diff(docs, v2)

    def lsh_probe(spark, sf_dir):
        from pinecone_datasets_spark.operators.search import (
            build_lsh_index, lsh_index_topk,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        docs = emb.select(
            F.col("vec_id").alias("id"),
            F.col("embedding").cast("array<double>").alias("values"),
        )
        path = tempfile.mkdtemp(prefix="plans_lsh_") + "/idx"
        build_lsh_index(docs, path, bands=8, bits=8, dim=64)
        queries = docs.where(F.col("id") < 5).select(
            F.col("id").alias("query_id"), F.col("values").alias("vector")
        )
        return lsh_index_topk(spark, path, queries, k=5)

    def hll_distinct(spark, sf_dir):
        from pinecone_datasets_spark.operators.sketch import (
            hll_distinct as hll,
        )

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        return hll(ev, "user_id", "event_type", p=10)

    def dsir_select(spark, sf_dir):
        from pinecone_datasets_spark.operators.dsir import dsir_resample

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        tgt = docs.where(F.col("lang") == "en").select("text")
        return dsir_resample(docs, tgt, k=100, n=2, n_buckets=2000)

    def xe_rerank(spark, sf_dir):
        from pinecone_datasets_spark.operators.rerank import (
            crossencoder_rerank,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        queries = docs.where(F.col("doc_id") < 10).select(
            F.col("doc_id").alias("query_id"),
            F.col("text").alias("query_text"),
        )
        cand = queries.select("query_id").crossJoin(
            docs.select("doc_id").where(F.col("doc_id") < 50)
        )
        return crossencoder_rerank(cand, queries, docs, k=10)

    def mh_index_probe(spark, sf_dir):
        from pinecone_datasets_spark.operators.dedup import (
            build_minhash_index, minhash_index_neardup,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        path = tempfile.mkdtemp(prefix="plans_mh_") + "/idx"
        build_minhash_index(docs, path, num_hashes=32, bands=8)
        batch = docs.where(F.col("doc_id") < 20).select(
            (F.col("doc_id") + 10_000).alias("batch_id"), "text"
        )
        return minhash_index_neardup(spark, path, batch, threshold=0.5)

    def phash_hamming_join(spark, sf_dir):
        from pinecone_datasets_spark.operators.phash import (
            hamming_neardup_pairs,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        hashes = docs.select(
            "doc_id",
            F.conv(F.substring(F.md5("text"), 1, 13), 16, 10)
            .cast("long")
            .alias("phash"),
        )
        return hamming_neardup_pairs(
            hashes, max_hamming=4, id_col="doc_id", hash_bits=52
        )

    return {
        "phash_hamming_join": phash_hamming_join,
        "cm_freq": cm_freq,
        "pca_project": pca_project,
        "lsh_probe": lsh_probe,
        "hamming_topk": hamming_topk,
        "ivfpq_search": ivfpq_search,
        "jsonl_ingest": jsonl_ingest,
        "mg_heavy_hitters": mg_heavy_hitters,
        "domain_report": domain_report,
        "snapshot_diff": snapshot_diff,
        "hll_distinct": hll_distinct,
        "dsir_select": dsir_select,
        "xe_rerank": xe_rerank,
        "mh_index_probe": mh_index_probe,
        "semantic_decontam": semantic_decontam,
        "curriculum_replay": curriculum_replay,
        "warc_ingest": warc_ingest,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod
    from pinecone_datasets_spark.plans.explain import formatted_plan

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # Resolve by module attribute: the registry consolidated many base
    # queries into merged entries, but every base builder still exists
    # as a module-level function.
    qs = {
        name: getattr(entrymod, name)
        for name, _ in HEADLINE
        if hasattr(entrymod, name)
    }
    qs.update(entrymod.queries())
    qs.update(_extra_builders(spark, sf_dir))
    missing = [name for name, _ in HEADLINE if name not in qs]
    if missing:
        # fail BEFORE minutes of plan building, not with a bare
        # KeyError at emission time (r11 review)
        spark.stop()
        raise SystemExit(f"HEADLINE names missing from registry: {missing}")

    out = [
        "# PLANS — formatted physical plans for headline operators",
        "",
        f"Generated by `tools/dump_plans.py` at `{sf_dir}`. Regenerate after",
        "operator changes; tests/test_plans.py asserts the load-bearing",
        "properties mechanically.",
        "",
    ]
    try:
        for name, note in HEADLINE:
            plan = formatted_plan(qs[name](spark, sf_dir))
            out.append(f"## {name} — {note}\n")
            out.append("```")
            out.append(plan.rstrip())
            out.append("```")
            out.append("")
        with open(os.path.join(REPO, "PLANS.md"), "w") as f:
            f.write("\n".join(out))
        print("wrote PLANS.md")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()

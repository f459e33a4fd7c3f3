"""Physical-plan assertions: the scale discipline, verified.

A correct result with the wrong plan fails at 100 TB; these tests pin the
plan shapes we rely on (pushdown, pruning, broadcast, partial top-k,
JVM-only filter evaluation).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pinecone_datasets_spark.functions.filters import compile_filter
from pinecone_datasets_spark.operators.search import topk_search
from pinecone_datasets_spark.plans.explain import (
    formatted_plan,
    pushed_filters,
    scan_read_schema,
)


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


def test_filter_pushdown_reaches_scan(lineitem):
    df = lineitem.where(F.col("l_quantity") > 30).select(
        "l_orderkey", "l_quantity"
    )
    pushed = pushed_filters(df)
    assert any("l_quantity" in p for p in pushed), pushed


def test_column_pruning(lineitem):
    df = lineitem.select("l_orderkey", "l_quantity")
    read = scan_read_schema(df)
    assert set(read) == {"l_orderkey", "l_quantity"}, read


def test_projection_pruning_through_agg(lineitem):
    df = lineitem.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s"))
    read = scan_read_schema(df)
    # only the grouping and aggregated columns should be scanned
    assert set(read) == {"l_returnflag", "l_quantity"}, read


def test_conform_prunes_at_scan(spark, tmp_path):
    """Conformance projection must push into the parquet reader: reading a
    2-column slice of a documents table scans only those columns."""
    from conftest import make_vector_dataset
    from pinecone_datasets_spark import Dataset

    path = make_vector_dataset(tmp_path, spark)
    ds = Dataset.from_path(spark, path)
    df = ds.documents.select("id", "values")
    read = scan_read_schema(df)
    assert set(read) == {"id", "values"}, read


def test_topk_search_broadcasts_queries_and_limits_window(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    docs = emb.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("values")
    )
    queries = emb.limit(5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("vector"),
    )
    out = topk_search(docs, queries, metric="dot", k=3, metadata_col=None)
    plan = formatted_plan(out)
    assert "Broadcast" in plan
    # Spark >= 3.5 inserts partial top-k before the window shuffle
    assert "WindowGroupLimit" in plan
    # the documents side must not shuffle before scoring
    assert "BatchEvalPython" not in plan


def test_topk_per_row_topk_keeps_window_group_limit(spark, sf_dir):
    """k=None with heterogeneous per-row top_k (the reference's actual
    semantics, cfg.py:34) must still get the partial top-k: the literal
    max_top_k conjunct added in topk_search makes InferWindowGroupLimit
    fire, so only ~max_k rows per partition cross the window shuffle."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    docs = emb.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("values")
    )
    queries = emb.limit(4).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("vector"),
        (F.col("vec_id") % 7 + 1).cast("int").alias("top_k"),
    )
    out = topk_search(docs, queries, metric="dot", k=None, metadata_col=None)
    plan = formatted_plan(out)
    assert "WindowGroupLimit" in plan, plan


def test_stored_filter_search_stays_jvm_side(spark, sf_dir):
    """apply_stored_filters compiles the per-query filters into a native
    CASE chain: no Python evaluator may appear anywhere in the plan."""
    import json

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    doc = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs = emb.join(doc, emb.vec_id == doc.doc_id).select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("values"),
        F.to_json(F.struct("lang", "n_chars")).alias("metadata"),
    )
    queries = emb.limit(2).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("vector"),
        F.lit(json.dumps({"lang": {"$eq": "en"}})).alias("filter"),
        F.lit(5).alias("top_k"),
    )
    out = topk_search(docs, queries, metric="dot", apply_stored_filters=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    assert "WindowGroupLimit" in plan


def test_compiled_filter_stays_jvm_side(spark, sf_dir):
    doc = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "metadata", F.to_json(F.struct("lang", "n_chars"))
    )
    out = doc.where(compile_filter({"lang": "en", "n_chars": {"$gt": 100}}))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_embedding_neardup_entry_has_no_cross_join(spark, sf_dir):
    """The verified near-dup entry must run candidates → re-score, never
    the O(N²) crossJoin twin."""
    import __spark_entry__ as e

    plan = formatted_plan(e.q21_embedding_neardup(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_broadcast_join_for_small_dims(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "l_orderkey", "p_name"
    )
    assert "BroadcastHashJoin" in formatted_plan(j)


def test_ivfpq_probe_prunes_partitions_and_reads_codes_only(
    spark, sf_dir, tmp_path
):
    """IVF-PQ search must (a) carry partition filters on the stored cell
    column — directory pruning, not a full scan — and (b) read only
    (id, codes): the compressed representation IS the point."""
    from pyspark.sql import functions as F

    from pinecone_datasets_spark.operators.pq import (
        build_ivfpq_index,
        ivfpq_index_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    docs = emb.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("values")
    )
    path = str(tmp_path / "idx")
    build_ivfpq_index(docs, path, n_centroids=8, m=8, n_codes=16)
    queries = docs.where(F.col("id") < 3).select(
        F.col("id").alias("query_id"), F.col("values").alias("vector")
    )
    res = ivfpq_index_topk(spark, path, queries, k=3, nprobe=2)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [ivf_cell" in plan, plan[:2000]
    read = scan_read_schema(res)
    assert "pq_code" in read and "values" not in read, read


def test_jsonl_quarantine_is_single_text_scan(spark, sf_dir, tmp_path):
    """Both branches of a quarantining read must be projections of ONE
    text scan — no JSON-format scan (whose corrupt-column queries Spark
    rejects) and no double parse in either plan."""
    from pinecone_datasets_spark.sources.corpus import read_jsonl

    out = str(tmp_path / "j")
    spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50).write.json(
        out
    )
    got = read_jsonl(
        spark,
        out,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    import re

    for df in (got.good, got.quarantined):
        plan = formatted_plan(df)
        # exactly one scan node (formatted plans repeat the operator
        # name in the detail section, so count numbered nodes)
        scans = re.findall(r"\(\d+\) Scan (\w+)", plan)
        assert scans == ["text"], plan[:1500]


def test_mg_heavy_hitters_shuffles_summaries_not_keys(spark, sf_dir):
    """The merge aggregation's input must be the bounded mapInPandas
    summary stream, not the raw token stream: the exchange sits above
    the python summarizer, and the pre-summary stage has no exchange."""
    from pyspark.sql import functions as F

    from pinecone_datasets_spark.operators.sketch import mg_heavy_hitters

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
    )
    out = mg_heavy_hitters(toks, "tok", capacity=64)
    plan = formatted_plan(out)
    # the summary is localCheckpoint'ed: the merge plan reads an RDD
    # scan (the pinned summaries), never re-runs the corpus scan
    assert "Scan ExistingRDD" in plan, plan[:1500]
    assert "Scan parquet" not in plan, plan[:1500]


def test_dsir_plan_no_corpus_shuffle_joins(spark, sf_dir):
    """DSIR's weight plan must have no corpus-keyed join: bucket-bounded
    aggregates, a broadcast ratio join, and a TakeOrdered top-k only."""
    from pinecone_datasets_spark.operators.dsir import dsir_resample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tgt = docs.where(F.col("lang") == "en").select("text")
    plan = formatted_plan(dsir_resample(docs, tgt, k=50, n_buckets=500))
    assert "TakeOrderedAndProject" in plan  # top-k, never a full sort
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # the <=n_buckets ratio table
    # Per-doc aggregates shuffle on doc_id (bounded by distinct buckets
    # per doc — fine); what must NOT exist is a JOIN keyed on the corpus
    # id. Join keys appear in the detail section as "Left keys"/"Right
    # keys" lines — none may mention doc_id.
    joinkey_lines = [
        ln for ln in plan.splitlines()
        if "left keys [" in ln.lower() or "right keys [" in ln.lower()
    ]
    assert joinkey_lines  # the bucket-table merge is an equi-join
    for line in joinkey_lines:
        assert "doc_id" not in line, line


def test_xe_rerank_plan_broadcasts_queries(spark, sf_dir):
    """Query text broadcasts onto candidates; the top-k rank keeps its
    literal bound (WindowGroupLimit)."""
    from pinecone_datasets_spark.operators.rerank import crossencoder_rerank

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    queries = docs.where(F.col("doc_id") < 10).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("query_text")
    )
    cand = queries.select("query_id").crossJoin(
        docs.select("doc_id").where(F.col("doc_id") < 50)
    )
    plan = formatted_plan(crossencoder_rerank(cand, queries, docs, k=5))
    assert "BroadcastHashJoin" in plan
    assert "WindowGroupLimit" in plan


def test_hll_plan_partial_aggregates(spark, sf_dir):
    """Register MAX must fold map-side: two HashAggregates around one
    Exchange keyed on (group, reg) — never a raw-value shuffle."""
    from pinecone_datasets_spark.operators.sketch import hll_distinct

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = formatted_plan(hll_distinct(ev, "user_id", "event_type", p=8))
    assert plan.count("HashAggregate") >= 4  # partial+final for both aggs
    assert "SortMergeJoin" not in plan


def test_read_curriculum_plan_no_join_one_sort(spark, tmp_path, sf_dir):
    """The manifest-ordered replay must be scan -> literal file-rank map
    -> ONE sort exchange: no join against a file-rank table, no second
    shuffle."""
    from pinecone_datasets_spark.operators.mixing import (
        interleave_by_weights,
        read_curriculum,
        write_curriculum,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ordered = interleave_by_weights(
        docs.select("doc_id", "source"), {"src0": 3.0, "src1": 1.0}
    )
    path = str(tmp_path / "plans_curr")
    write_curriculum(ordered, path, num_files=4)
    plan = formatted_plan(read_curriculum(spark, path))
    assert "Join" not in plan, plan[:1500]
    # one Exchange NODE (the name also appears once in the detail
    # section per node, hence "+-" anchored)
    assert plan.count("+- Exchange") == 1, plan[:1500]
    assert "Sort" in plan


def test_pq_adc_plan_broadcast_codebook_no_corpus_shuffle(spark, sf_dir):
    """In-plan PQ assignment joins the corpus against the BROADCAST
    codebook; the only corpus-keyed exchange is the (id, s) hash agg."""
    from pinecone_datasets_spark.operators.pq import (
        pq_reconstruct_inplan,
        train_pq_inplan,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    codes, books = train_pq_inplan(
        emb.select(F.col("vec_id").alias("id"), "embedding"),
        m=4,
        n_codes=4,
        iters=1,
        dim=64,
        vector_col="embedding",
    )
    plan = formatted_plan(pq_reconstruct_inplan(codes, books))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_html_extract_is_map_only_jvm_side(spark, sf_dir, tmp_path):
    from pinecone_datasets_spark.functions.html import html_to_text

    # own parquet: the shared fixture may be cache()d by another test
    # in the same session, which would hide the scan and its pruning
    path = str(tmp_path / "docs")
    spark.read.parquet(f"{sf_dir}/documents.parquet").limit(
        50
    ).write.parquet(path)
    docs = spark.read.parquet(path)
    df = docs.select(html_to_text("text").alias("t"))
    plan = formatted_plan(df)
    assert "Exchange" not in plan          # map-only
    assert "EvalPython" not in plan        # expression path, no UDF
    read = scan_read_schema(df)
    assert set(read) == {"text"}, read     # pruned to the one column


def test_normalize_url_map_only_and_dedup_key_only_shuffles(spark, sf_dir):
    from pinecone_datasets_spark.operators.domains import (
        dedup_by_url,
        normalize_url,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        F.concat(F.lit("https://h/"), F.col("doc_id").cast("string"))
        .alias("url"),
        "text",
    )
    norm = docs.select(normalize_url("url"))
    assert "Exchange" not in formatted_plan(norm)
    plan = formatted_plan(dedup_by_url(docs))
    # the join back to payload rows must be broadcast (keep-set is the
    # grouped key frame) — the full text column never shuffles
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    # r8: the NULL-key keep-unconditionally branch is a union of two
    # key-only frames — no cartesian anywhere, and both branches stay
    # (doc_id, fingerprint)-narrow
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_warc_parse_single_exchange_to_aggregate(spark, sf_dir, tmp_path):
    from pinecone_datasets_spark.sources.warc import (
        encode_warc,
        read_warc,
        wet_text,
    )

    (tmp_path / "s.warc").write_bytes(
        encode_warc(
            [
                {
                    "warc_type": "conversion",
                    "record_id": "<urn:x:1>",
                    "content": "hello world",
                }
            ]
        )
    )
    got = read_warc(spark, str(tmp_path))
    agg = wet_text(got.records).agg(F.count(F.lit(1)).alias("n"))
    plan = formatted_plan(agg)
    # one Arrow parse stage, partial agg before the single exchange
    # (count tree nodes, not the detail section's repeats)
    assert plan.count("+- Exchange") == 1
    assert "MapInPandas" in plan

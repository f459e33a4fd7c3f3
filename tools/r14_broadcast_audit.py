"""Broadcast payback audit (VERDICT r13 item 2): capture the FINAL
adaptive plan of every join-bearing bench leg the r13 hint removals
touched and record which joins AQE promotes to broadcast at runtime vs
which stay SMJ/SHJ. Bounded sides (query batches, literal dictionaries)
carry explicit F.broadcast in the operators; corpus/vocab-derived sides
deliberately do not — this artifact proves what actually runs.

Usage: python tools/r14_broadcast_audit.py [out_dir]
"""
from __future__ import annotations

import io
import os
import re
import sys
import tempfile
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def final_plan(df) -> str:
    df.write.format("noop").mode("overwrite").save()
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r14_bcast"
    os.makedirs(out_dir, exist_ok=True)
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    import __spark_entry__ as em

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("r14-broadcast-audit")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    tmp = tempfile.mkdtemp(prefix="r14_bcast_idx_")
    bm25_path = tmp + "/bm25"

    from pinecone_datasets_spark.operators.dsir import dsir_resample
    from pinecone_datasets_spark.operators.keyword import (
        bm25_index_topk,
        build_bm25_index,
    )
    from pinecone_datasets_spark.operators.prf import (
        rm3_index_search,
        rm3_search,
    )
    from pinecone_datasets_spark.operators.rerank import crossencoder_rerank

    build_bm25_index(docs, bm25_path)
    queries = docs.where(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("query_id"),
        F.col("text").alias("query_text"),
    )

    def xe():
        q100 = docs.where(F.col("doc_id") < 100).select(
            F.col("doc_id").alias("query_id"),
            F.col("text").alias("query_text"),
        )
        cand = q100.select("query_id").crossJoin(
            docs.select("doc_id").where(F.col("doc_id") < 50)
        )
        return crossencoder_rerank(cand, q100, docs, k=10)

    cases = {
        "q02_join_topn": lambda: em.q02_top_customers(spark, SF_DIR),
        "q04_multi_join": lambda: em.q04_region_revenue(spark, SF_DIR),
        "bm25_search": lambda: bm25_index_topk(
            spark, bm25_path, queries, k=10
        ),
        "rm3_index_search": lambda: rm3_index_search(
            spark, bm25_path, queries, k=10, fb_k=5, n_terms=8
        ),
        "rm3_expand_search": lambda: rm3_search(
            docs, queries, k=10, fb_k=5, n_terms=8
        ),
        "dsir_select": lambda: dsir_resample(
            docs,
            docs.where(F.col("lang") == "en").select("text"),
            k=500,
            n=2,
            n_buckets=10_000,
        ),
        "xe_rerank": xe,
        "dup_spans": lambda: em.q77_dup_spans(spark, SF_DIR),
        "boilerplate": lambda: em.q75_boilerplate(spark, SF_DIR),
    }
    for name, make in cases.items():
        df = make()
        txt = final_plan(df)
        path = os.path.join(out_dir, f"{name}_joins_final.txt")
        with open(path, "w") as f:
            f.write(txt)
        counts = {
            kind: len(re.findall(rf"\(\d+\) {kind}", txt))
            for kind in (
                "BroadcastHashJoin",
                "SortMergeJoin",
                "ShuffledHashJoin",
                "BroadcastNestedLoopJoin",
            )
        }
        shown = " ".join(f"{k}={v}" for k, v in counts.items() if v)
        print(f"{name}: {shown or 'no joins'} -> {path}", flush=True)
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()

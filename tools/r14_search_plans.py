"""Capture FINAL adaptive plans for the persisted-index search paths
(ivf_search / ivfpq_search bench legs): proof that literal cell filters
reach the scan as partition filters and each kernel crosses Python once.

Usage: python tools/r14_search_plans.py <out_dir> <suffix>
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def final_plan(df) -> str:
    df.collect()
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    os.makedirs(out_dir, exist_ok=True)
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("r14-search-plans")
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

    from pinecone_datasets_spark.operators.ivf import (
        build_ivf_index,
        ivf_index_topk,
    )
    from pinecone_datasets_spark.operators.pq import (
        build_ivfpq_index,
        ivfpq_index_topk,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    docs = emb.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("values")
    )
    queries = emb.where(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("vector")
    )
    tmp = "/tmp/r14_search_idx"
    if not os.path.isdir(tmp + "/ivf"):
        build_ivf_index(docs, tmp + "/ivf", n_centroids=16,
                        vector_col="values", trainer="local")
    if not os.path.isdir(tmp + "/ivfpq"):
        build_ivfpq_index(docs, tmp + "/ivfpq", n_centroids=16, m=16,
                          n_codes=256, vector_col="values")

    cases = {
        "ivf_search": lambda: ivf_index_topk(
            spark, tmp + "/ivf", queries, k=10, nprobe=4
        ),
        "ivfpq_search": lambda: ivfpq_index_topk(
            spark, tmp + "/ivfpq", queries, k=10, nprobe=4
        ),
    }
    for name, make in cases.items():
        txt = final_plan(make())
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(
            f"{name}: ArrowEvalPython={txt.count('ArrowEvalPython')}"
            f" PartitionFilters_lines="
            f"{sum(1 for line in txt.splitlines() if 'PartitionFilters' in line and 'ivf_cell' in line)}"
            f" -> {path}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()

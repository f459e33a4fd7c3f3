"""Capture FINAL adaptive plans (post-execution, isFinalPlan=true) for
the banded self-join operators — VERDICT r13 item 3: is the upstream
signature/shingle pipeline executed once (AQE stage reuse) or twice?

Usage: python tools/r14_final_plans.py [out_dir]
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
    df.collect()  # executes the dataset's own AdaptiveSparkPlanExec
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r14_plans"
    os.makedirs(out_dir, exist_ok=True)
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("r14-final-plans")
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
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    from pinecone_datasets_spark.operators.dedup import (
        embedding_srp_band_pairs,
        minhash_lsh_candidates,
    )
    from pinecone_datasets_spark.operators.semdedup import (
        semantic_dedup_pairs,
    )

    cases = {
        "minhash_lsh_candidates": lambda: minhash_lsh_candidates(
            docs, num_hashes=64, bands=16, id_col="doc_id"
        ),
        "minhash_oph_candidates": lambda: minhash_lsh_candidates(
            docs, num_hashes=64, bands=16, id_col="doc_id", hash_fn="oph"
        ),
        "srp_band_pairs": lambda: embedding_srp_band_pairs(
            emb.select("vec_id", "embedding"), bands=16, bits=8, dim=64
        ),
        "semdedup_pairs": lambda: semantic_dedup_pairs(
            emb.select("vec_id", "embedding"),
            threshold=0.95, dim=64, bits=6, seed=13,
        ),
    }
    for name, make in cases.items():
        df = make()
        txt = final_plan(df)
        path = os.path.join(out_dir, f"{name}_final.txt")
        with open(path, "w") as f:
            f.write(txt)
        n_reuse = txt.count("ReusedExchange")
        n_exch = txt.count("Exchange")
        n_scan = txt.count("Scan parquet")
        n_arrow = txt.count("ArrowEvalPython")
        print(
            f"{name}: Exchange={n_exch} ReusedExchange={n_reuse}"
            f" Scans={n_scan} ArrowEvalPython={n_arrow} -> {path}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()

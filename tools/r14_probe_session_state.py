"""r14 diagnostic: why do legs measure 2-3x slower LATE in the 77-leg
bench session than in a fresh one (ivf_search 2.9 in-suite vs 1.24
isolated; lsh_build re-measured 1.81 at suite end vs 0.97 fresh)?

Phases: (A) time target legs in a fresh session; (B) pollute the session
with heavy mixed legs (the kinds that run before them in the suite);
(C) time the targets again. Prints per-pass wall plus JVM GC/heap
deltas so the suspect (GC pressure, codegen, python workers, listener
state) can be narrowed.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def jvm_stats(spark):
    mf = spark.sparkContext._jvm.java.lang.management.ManagementFactory
    heap = mf.getMemoryMXBean().getHeapMemoryUsage()
    gcs = mf.getGarbageCollectorMXBeans()
    tot_count, tot_ms = 0, 0
    for i in range(gcs.size()):
        g = gcs.get(i)
        tot_count += g.getCollectionCount()
        tot_ms += g.getCollectionTime()
    return {
        "heap_used_mb": heap.getUsed() // (1 << 20),
        "heap_committed_mb": heap.getCommitted() // (1 << 20),
        "gc_count": tot_count,
        "gc_ms": tot_ms,
    }


def main() -> None:
    import numpy as np  # noqa: F401
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("r14-probe")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.codegen.cache.maxEntries", "2000")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    tmp = "/tmp/r14_probe"
    ivf_path = tmp + "/ivf"
    lsh_path = tmp + "/lsh"

    def emb_queries(n: int):
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        docs = emb.select(
            F.col("vec_id").alias("id"), F.col("embedding").alias("values")
        )
        queries = emb.where(F.col("vec_id") < n).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("vector"),
        )
        return docs, queries

    from pinecone_datasets_spark.operators.ivf import (
        build_ivf_index,
        ivf_index_topk,
    )
    from pinecone_datasets_spark.operators.search import build_lsh_index

    # warmup (same as bench)
    warm = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(5000)
    warm.groupBy("l_returnflag").agg(F.sum("l_quantity")).write.format(
        "noop"
    ).mode("overwrite").save()
    _noop = F.pandas_udf(lambda s: s, "long")
    spark.range(0, int(CPUS) * 10, 1, int(CPUS)).select(
        _noop(F.col("id"))
    ).write.format("noop").mode("overwrite").save()

    docs, _ = emb_queries(0)
    build_ivf_index(docs, ivf_path, n_centroids=16, vector_col="values",
                    trainer="local")

    def leg_ivf_search():
        _, queries = emb_queries(100)
        t0 = time.time()
        qdf = ivf_index_topk(spark, ivf_path, queries, k=10, nprobe=4)
        t_build = time.time() - t0
        t0 = time.time()
        qdf.write.format("noop").mode("overwrite").save()
        return t_build, time.time() - t0

    def leg_lsh_build():
        d, _ = emb_queries(0)
        t0 = time.time()
        build_lsh_index(d, lsh_path, bands=16, bits=8, dim=64)
        return 0.0, time.time() - t0

    def run_phase(label):
        print(f"--- {label} ---", flush=True)
        print("jvm:", jvm_stats(spark), flush=True)
        for name, fn in [("ivf_search", leg_ivf_search),
                         ("lsh_build", leg_lsh_build)]:
            for i in range(4):
                spark.sparkContext._jvm.System.gc()
                t0 = time.time()
                tb, te = fn()
                print(
                    f"{label} {name} pass{i}: total {time.time()-t0:.3f}s"
                    f" (build {tb:.3f}s exec {te:.3f}s)",
                    flush=True,
                )
        print("jvm:", jvm_stats(spark), flush=True)

    run_phase("FRESH")

    # ---- pollution: heavy mixed legs resembling the suite prefix ----
    from pinecone_datasets_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_signatures,
    )

    docs_txt = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    t0 = time.time()
    for i in range(6):
        minhash_lsh_candidates(
            docs_txt, num_hashes=64, bands=16, id_col="doc_id"
        ).write.format("noop").mode("overwrite").save()
        minhash_signatures(
            docs_txt, "text", "doc_id", 64, 5, "oph"
        ).write.format("noop").mode("overwrite").save()
    print(f"pollution took {time.time()-t0:.1f}s", flush=True)

    run_phase("POLLUTED")
    spark.stop()


if __name__ == "__main__":
    main()

"""Phase timing of the pq_adc_topk leg: init collect vs Lloyd rounds vs
final ADC scoring, min-of-3 passes in one session."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("r14-pqadc")
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
    from pinecone_datasets_spark.functions.vector import dot_product
    from pinecone_datasets_spark.operators.pq import (
        pq_reconstruct_inplan,
        train_pq_inplan,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    print("emb rows:", emb.count(), flush=True)
    # warm
    emb.limit(10).write.format("noop").mode("overwrite").save()

    for p in range(3):
        t0 = time.time()
        codes, books = train_pq_inplan(
            emb.select(F.col("vec_id").alias("id"), "embedding"),
            m=4, n_codes=8, iters=2, dim=64, vector_col="embedding",
        )
        t_train = time.time() - t0
        t0 = time.time()
        recon = pq_reconstruct_inplan(codes, books, id_col="id")
        qv = emb.where(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").cast("array<double>").alias("qvec"),
        )
        scored = recon.crossJoin(F.broadcast(qv)).select(
            "query_id",
            F.col("id").alias("doc_id"),
            dot_product("qvec", "recon").alias("score"),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("score"), F.col("doc_id")
        )
        out = scored.withColumn("rank", F.row_number().over(w)).where(
            F.col("rank") <= 5
        )
        t_plan = time.time() - t0
        t0 = time.time()
        out.write.format("noop").mode("overwrite").save()
        t_exec = time.time() - t0
        print(
            f"pass{p}: train {t_train:.3f}s plan {t_plan:.3f}s"
            f" exec {t_exec:.3f}s",
            flush=True,
        )
    # break train down further
    import pinecone_datasets_spark.operators.pq as pqmod

    orig_collect = None  # noqa: F841
    spark.stop()


if __name__ == "__main__":
    main()

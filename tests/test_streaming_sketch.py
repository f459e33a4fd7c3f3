"""Streaming Misra-Gries heavy hitters (streaming/sketch.py): the final
availableNow emission must satisfy the same deterministic bounds as the
batch operator, against exact counts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pinecone_datasets_spark.streaming.sketch import stream_heavy_hitters


@pytest.fixture(scope="module")
def token_dir(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("tok_stream"))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
    ).where(F.length("tok") > 0)
    # several files so availableNow runs multiple micro-batches and the
    # state actually carries across triggers
    toks.repartition(6).write.mode("overwrite").parquet(root)
    return root


def test_stream_mg_bounds_vs_exact(spark, token_dir):
    stream = (
        spark.readStream.schema("tok string")
        .option("maxFilesPerTrigger", 2)
        .parquet(token_dir)
    )
    hh = stream_heavy_hitters(stream, "tok", capacity=256, n_buckets=8)
    q = (
        hh.writeStream.format("memory")
        .queryName("stream_hh")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # update mode appends every emission; the LAST row per (bucket,
    # value) is the final summary
    from pyspark.sql import Window

    raw = spark.sql("select *, monotonically_increasing_id() as seq from stream_hh")
    w = Window.partitionBy("bucket", "value").orderBy(F.desc("seq"))
    final = (
        raw.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .collect()
    )
    assert final

    exact = {
        r["tok"]: r["n"]
        for r in spark.read.parquet(token_dir)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    dec_by_bucket = {}
    for r in final:
        dec_by_bucket[r["bucket"]] = max(
            dec_by_bucket.get(r["bucket"], 0), r["dec"]
        )
    got = {}
    for r in final:
        got[r["value"]] = (r["est_count"], r["dec"], r["bucket"])
    # (1) per-value bounds: est <= true <= est + dec(bucket)
    for v, (est, dec, _b) in got.items():
        assert est <= exact[v], (v, est, exact[v])
        assert exact[v] - est <= dec, (v, est, exact[v], dec)
    # (2) no frequent value missed: true > dec of ITS bucket => present
    import pyspark.sql.functions as SF

    bucket_of = {
        r["value"]: r["bucket"] for r in final
    }
    # recompute each absent value's bucket the same way the operator does
    absent = [v for v in exact if v not in got]
    if absent:
        bdf = spark.createDataFrame([(v,) for v in absent], "value string")
        brows = bdf.select(
            "value",
            SF.pmod(SF.xxhash64(SF.col("value")), 8).cast("int").alias("b"),
        ).collect()
        for r in brows:
            dec = dec_by_bucket.get(r["b"], 0)
            assert exact[r["value"]] <= dec, (
                r["value"],
                exact[r["value"]],
                dec,
            )
    # (3) state totals are consistent: bucket_n sums to the stream length
    n_by_bucket = {}
    for r in final:
        n_by_bucket[r["bucket"]] = max(
            n_by_bucket.get(r["bucket"], 0), r["bucket_n"]
        )
    assert sum(n_by_bucket.values()) == sum(exact.values())


def test_stream_cm_final_equals_batch(spark, token_dir):
    """availableNow final CM snapshot == batch cm_sketch, cell for cell
    (built-in stateful agg, complete mode)."""
    from pinecone_datasets_spark.operators.sketch import (
        cm_estimate,
        cm_sketch,
    )
    from pinecone_datasets_spark.streaming.sketch import stream_cm_sketch

    stream = (
        spark.readStream.schema("tok string")
        .option("maxFilesPerTrigger", 2)
        .parquet(token_dir)
    )
    sk = stream_cm_sketch(stream, "tok", depth=4, width=128)
    q = (
        sk.writeStream.format("memory")
        .queryName("stream_cm")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        map(tuple, spark.sql("select row, bucket, c from stream_cm").collect())
    )
    batch = cm_sketch(
        spark.read.parquet(token_dir), "tok", depth=4, width=128
    )
    assert got == sorted(map(tuple, batch.collect()))

    # the snapshot is a first-class sketch: estimates from it obey the
    # never-undercount invariant against exact counts
    toks = spark.read.parquet(token_dir)
    exact = {
        r["tok"]: r["n"]
        for r in toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    snap = spark.table("stream_cm")
    probes = toks.select("tok").distinct().limit(50)
    est = {
        r["tok"]: r["est_count"]
        for r in cm_estimate(snap, probes, "tok", depth=4, width=128).collect()
    }
    for v, e in est.items():
        assert e >= exact[v], (v, e, exact[v])


def test_stream_cm_param_guard(spark, token_dir):
    from pinecone_datasets_spark.streaming.sketch import stream_cm_sketch

    stream = spark.readStream.schema("tok string").parquet(token_dir)
    with pytest.raises(ValueError):
        stream_cm_sketch(stream, "tok", depth=0)


def test_stream_hll_final_equals_batch(spark, token_dir):
    """availableNow final HLL register snapshot == batch hll_registers
    register-for-register; the folded estimate matches hll_distinct and
    lands near the exact distinct count."""
    from pinecone_datasets_spark.operators.sketch import (
        hll_distinct,
        hll_estimate,
        hll_registers,
    )
    from pinecone_datasets_spark.streaming.sketch import stream_hll_registers

    stream = (
        spark.readStream.schema("tok string")
        .option("maxFilesPerTrigger", 2)
        .parquet(token_dir)
    )
    regs = stream_hll_registers(stream, "tok", p=9)
    q = (
        regs.writeStream.format("memory")
        .queryName("stream_hll")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        map(tuple, spark.sql("select reg, rho from stream_hll").collect())
    )
    toks = spark.read.parquet(token_dir)
    want = sorted(map(tuple, hll_registers(toks, "tok", p=9).collect()))
    assert got == want

    est = hll_estimate(spark.table("stream_hll"), None, p=9).first().est_distinct
    batch_est = hll_distinct(toks, "tok", p=9).first().est_distinct
    assert est == batch_est
    exact = toks.distinct().count()
    assert est == pytest.approx(exact, rel=0.15)

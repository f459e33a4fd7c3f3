"""Streaming rolling z-score (streaming/anomaly.py): availableNow over a
bounded bucketed series must match the batch rolling_zscore twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pinecone_datasets_spark.operators.timeseries import rolling_zscore
from pinecone_datasets_spark.streaming.anomaly import stream_rolling_zscore


def _bucketed(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.groupBy(
        F.col("event_type"), F.date_trunc("hour", "ts").alias("bucket")
    ).agg(F.round(F.sum("value"), 6).alias("v"))


def test_stream_matches_batch(spark, sf_dir, tmp_path_factory):
    src_dir = str(tmp_path_factory.mktemp("anomaly_src"))
    _bucketed(spark, sf_dir).coalesce(1).write.mode("overwrite").parquet(
        src_dir
    )
    schema = spark.read.parquet(src_dir).schema
    stream = spark.readStream.schema(schema).parquet(src_dir)
    out = stream_rolling_zscore(
        stream, window=24, min_periods=4, tau=2.5
    )
    ckpt = str(tmp_path_factory.mktemp("ckpt_anom"))
    q = (
        out.writeStream.format("memory")
        .queryName("stream_anom")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.key, r.bucket): (
            None if r.zscore is None else round(r.zscore, 6),
            r.is_anomaly,
        )
        for r in spark.sql("SELECT * FROM stream_anom").collect()
    }

    batch = rolling_zscore(
        spark.read.parquet(src_dir),
        "bucket",
        "v",
        ["event_type"],
        window=24,
        min_periods=4,
        tau=2.5,
    ).collect()
    want = {
        (r.event_type, r.bucket): (
            None if r.zscore is None else round(r.zscore, 6),
            r.is_anomaly,
        )
        for r in batch
    }
    assert len(got) == len(want) > 0
    assert got == want
    # sanity: warm-up NULLs and at least some scored rows exist
    zs = [v[0] for v in got.values()]
    assert any(z is None for z in zs) and any(z is not None for z in zs)


def test_stream_state_carries_across_batches(spark, tmp_path_factory):
    # two source files = (typically) two micro-batches: the second
    # file's buckets must be scored against state from the first
    import datetime as dt

    src_dir = str(tmp_path_factory.mktemp("anomaly_multi"))
    t0 = dt.datetime(2024, 1, 1)
    early = [("a", t0 + dt.timedelta(hours=i), 10.0) for i in range(6)]
    late = [("a", t0 + dt.timedelta(hours=6), 100.0)]
    spark.createDataFrame(
        early, "event_type string, bucket timestamp, v double"
    ).coalesce(1).write.mode("overwrite").parquet(src_dir + "/f1")
    spark.createDataFrame(
        late, "event_type string, bucket timestamp, v double"
    ).coalesce(1).write.mode("overwrite").parquet(src_dir + "/f2")

    schema = "event_type string, bucket timestamp, v double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir + "/*")
    )
    out = stream_rolling_zscore(stream, window=6, min_periods=4, tau=2.0)
    ckpt = str(tmp_path_factory.mktemp("ckpt_anom2"))
    q = (
        out.writeStream.format("memory")
        .queryName("stream_anom2")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = {
        r.bucket: r for r in spark.sql("SELECT * FROM stream_anom2").collect()
    }
    spike = rows[t0 + dt.timedelta(hours=6)]
    # flat 10.0 history in state -> the 100.0 bucket is... flat-line has
    # zero variance, so z is NULL (can't judge), not a missed anomaly
    assert spike.zscore is None
    # make the history non-flat and re-check the flag fires
    src2 = str(tmp_path_factory.mktemp("anomaly_multi2"))
    early2 = [
        ("a", t0 + dt.timedelta(hours=i), 10.0 + (i % 3)) for i in range(6)
    ]
    spark.createDataFrame(
        early2, "event_type string, bucket timestamp, v double"
    ).coalesce(1).write.mode("overwrite").parquet(src2 + "/f1")
    spark.createDataFrame(
        late, "event_type string, bucket timestamp, v double"
    ).coalesce(1).write.mode("overwrite").parquet(src2 + "/f2")
    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src2 + "/*")
    )
    out2 = stream_rolling_zscore(stream2, window=6, min_periods=4, tau=2.0)
    q2 = (
        out2.writeStream.format("memory")
        .queryName("stream_anom3")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path_factory.mktemp("c3")))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(180)
    rows2 = {
        r.bucket: r for r in spark.sql("SELECT * FROM stream_anom3").collect()
    }
    spike2 = rows2[t0 + dt.timedelta(hours=6)]
    assert spike2.zscore is not None and spike2.zscore > 2.0
    assert spike2.is_anomaly


def test_bad_args(spark):
    df = spark.readStream.format("rate").load()
    with pytest.raises(ValueError):
        stream_rolling_zscore(df, window=0)
    with pytest.raises(ValueError):
        stream_rolling_zscore(df, min_periods=1)

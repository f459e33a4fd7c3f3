"""Structured Streaming: windowed event aggregation must converge to the
batch result on the same data (availableNow trigger = bounded replay)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pinecone_datasets_spark.streaming.ingest import (
    stream_documents,
    windowed_event_counts,
)
from pinecone_datasets_spark.sources.events import read_events


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """Re-write the events fixture as a micro-ts parquet directory the
    file-stream source can consume (nanos normalized on the way in)."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    ev = read_events(spark, f"{sf_dir}/events.parquet")
    ev.repartition(4).write.mode("overwrite").parquet(out)
    return out


def test_windowed_counts_match_batch(spark, events_dir, tmp_path_factory):
    schema = spark.read.parquet(events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(events_dir)
    )
    agg = windowed_event_counts(
        stream, window_duration="1 hour", watermark="2 hours"
    )
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    q = (
        agg.writeStream.format("memory")
        .queryName("ev_counts")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batch = (
        spark.read.parquet(events_dir)
        .groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            F.round("sum_value", 6).alias("sum_value"),
        )
    )
    got = {
        (r["window_start"], r["event_type"]): (
            r["n_events"],
            round(r["sum_value"], 6),
        )
        for r in spark.sql("SELECT * FROM ev_counts").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in batch.collect()
    }
    assert got == want
    assert len(want) > 100


def test_stream_documents_schema(spark, tmp_path):
    """File-stream over a documents dir declares the dataset schema and is
    actually a streaming plan."""
    import pandas as pd

    docs_dir = tmp_path / "documents"
    docs_dir.mkdir()
    pd.DataFrame(
        {"id": ["1"], "values": [[0.1, 0.2]]}
    ).to_parquet(docs_dir / "part-0.parquet", index=False)
    sdf = stream_documents(spark, str(docs_dir))
    assert sdf.isStreaming
    assert sdf.columns == ["id", "values", "sparse_values", "metadata", "blob"]


def test_stream_exact_dedup_matches_batch(spark, tmp_path_factory):
    """availableNow replay of stream_exact_dedup must keep exactly one
    row per distinct normalized text — the batch exact-dedup invariant."""
    import pandas as pd

    from pinecone_datasets_spark.functions.text import doc_fingerprint
    from pinecone_datasets_spark.streaming.dedup import stream_exact_dedup

    docs_dir = str(tmp_path_factory.mktemp("docs_stream"))
    texts = ["alpha beta", "Alpha  beta", "gamma", "delta", "gamma"]
    pd.DataFrame(
        {"doc_id": range(3), "text": texts[:3]}
    ).to_parquet(f"{docs_dir}/part-0.parquet", index=False)
    pd.DataFrame(
        {"doc_id": range(3, 5), "text": texts[3:]}
    ).to_parquet(f"{docs_dir}/part-1.parquet", index=False)

    batch = spark.read.parquet(docs_dir)
    n_distinct = (
        batch.select(doc_fingerprint(F.col("text")).alias("fp"))
        .distinct()
        .count()
    )

    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )
    ckpt = str(tmp_path_factory.mktemp("ckpt_dedup"))
    q = (
        stream_exact_dedup(stream)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    out = spark.sql("SELECT * FROM dedup_out")
    assert out.count() == n_distinct
    assert out.columns == batch.columns  # fingerprint col dropped
    # one representative per duplicate group, none lost
    got = {
        r["fp"]
        for r in out.select(
            doc_fingerprint(F.col("text")).alias("fp")
        ).collect()
    }
    want = {
        r["fp"]
        for r in batch.select(
            doc_fingerprint(F.col("text")).alias("fp")
        ).collect()
    }
    assert got == want


def test_stream_interval_join_matches_batch_range_join(
    spark, events_dir, tmp_path_factory
):
    """availableNow replay of the stream-stream interval join must equal
    the batch bucketed range_join on the same data: same-user clicks
    within the hour before each error."""
    from pinecone_datasets_spark.operators.ranges import range_join
    from pinecone_datasets_spark.streaming.joins import (
        stream_interval_join,
    )

    schema = spark.read.parquet(events_dir).schema

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(events_dir)
        )

    errors = stream().where(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id"
    )
    clicks = stream().where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    joined = stream_interval_join(
        errors,
        clicks,
        on="user_id",
        lower_seconds=-3600,
        upper_seconds=0,
        watermark="24 hours",
    )
    ckpt = str(tmp_path_factory.mktemp("ckpt_ssj"))
    q = (
        joined.select("l_event_id", "r_event_id")
        .writeStream.format("memory")
        .queryName("ssj_out")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["l_event_id"], r["r_event_id"])
        for r in spark.sql("SELECT * FROM ssj_out").collect()
    }

    ev = spark.read.parquet(events_dir)
    want = {
        (r["l_event_id"], r["r_event_id"])
        for r in range_join(
            ev.where(F.col("event_type") == "error").select(
                "user_id", "ts", "event_id"
            ),
            ev.where(F.col("event_type") == "click").select(
                "user_id", "ts", "event_id"
            ),
            on="user_id",
            left_ts="ts",
            right_ts="ts",
            lower_us=-3_600_000_000,
            upper_us=0,
        ).collect()
    }
    assert got == want
    assert len(want) > 0


def test_stream_interval_join_rejects_inverted_bounds(spark):
    from pinecone_datasets_spark.streaming.joins import (
        stream_interval_join,
    )

    df = spark.createDataFrame(
        [], "user_id long, ts timestamp, event_id long"
    )
    with pytest.raises(ValueError, match="lower_seconds"):
        stream_interval_join(df, df, on="user_id", lower_seconds=1,
                             upper_seconds=0)


def test_read_events_leaves_session_timezone_alone(spark, sf_dir):
    """ADVICE r3: the NTZ branch used to permanently repoint
    spark.sql.session.timeZone to UTC as a read side-effect. The cast's
    zone is bound at (eager) withColumn analysis, so set-and-restore
    must leave the session conf exactly as it found it."""
    key = "spark.sql.session.timeZone"
    prev = spark.conf.get(key)
    try:
        spark.conf.set(key, "America/New_York")
        df = read_events(spark, f"{sf_dir}/events.parquet")
        df.limit(1).collect()
        assert spark.conf.get(key) == "America/New_York"
    finally:
        spark.conf.set(key, prev)


def test_map_only_sampling_operators_compose_with_streams(
    spark, sf_dir, tmp_path_factory
):
    """hash_split / deterministic_sample / domain-mixture are pure
    map-side expressions, so they apply to a readStream unchanged and
    an availableNow replay selects EXACTLY the rows the batch path
    selects — the property that lets one curation definition serve the
    backfill and the ingest stream."""
    from pinecone_datasets_spark.operators.sampling import (
        deterministic_sample,
        hash_split,
    )

    out_dir = str(tmp_path_factory.mktemp("sampled_stream"))
    ckpt = str(tmp_path_factory.mktemp("ckpt_sample"))
    import shutil

    stage = tmp_path_factory.mktemp("docs_stream_src")
    shutil.copy(
        f"{sf_dir}/documents.parquet", stage / "part-0.parquet"
    )
    docs_path = str(stage)
    batch = spark.read.parquet(docs_path)
    stream = spark.readStream.schema(batch.schema).parquet(docs_path)

    pipe = deterministic_sample(
        hash_split(
            stream, {"train": 0.8, "val": 0.2}, key_col="doc_id", seed=11
        ).where(F.col("split") == "train"),
        fraction=0.5,
        key_col="doc_id",
        seed=12,
    )
    assert pipe.isStreaming
    (
        pipe.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    got = {
        r["doc_id"] for r in spark.read.parquet(out_dir).collect()
    }
    want = {
        r["doc_id"]
        for r in deterministic_sample(
            hash_split(
                batch, {"train": 0.8, "val": 0.2}, key_col="doc_id", seed=11
            ).where(F.col("split") == "train"),
            fraction=0.5,
            key_col="doc_id",
            seed=12,
        ).collect()
    }
    assert got == want and got


def test_ivf_cell_assignment_composes_with_streams(
    spark, sf_dir, tmp_path_factory
):
    """assign_cells is a map-only Arrow-batched kernel, so a live ingest
    stream can be routed into IVF cells with the exact same codebook the
    batch index was built with — availableNow replay assigns every
    vector the same cell as the batch path."""
    import shutil

    import numpy as np

    from pinecone_datasets_spark.operators.ivf import assign_cells

    stage = tmp_path_factory.mktemp("emb_stream_src")
    shutil.copy(
        f"{sf_dir}/embeddings.parquet", stage / "part-0.parquet"
    )
    batch = spark.read.parquet(str(stage)).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    rng = np.random.default_rng(5)
    centroids = rng.standard_normal((4, 64))
    stream = (
        spark.readStream.schema(
            spark.read.parquet(str(stage)).schema
        )
        .parquet(str(stage))
        .select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
    )
    assigned = assign_cells(stream, centroids, vector_col="v")
    assert assigned.isStreaming
    out_dir = str(tmp_path_factory.mktemp("cells_out"))
    ckpt = str(tmp_path_factory.mktemp("ckpt_cells"))
    (
        assigned.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    got = {
        r["vec_id"]: r["ivf_cell"]
        for r in spark.read.parquet(out_dir).collect()
    }
    want = {
        r["vec_id"]: r["ivf_cell"]
        for r in assign_cells(batch, centroids, vector_col="v").collect()
    }
    assert got == want and got


def test_entry_stream_part_runs_incrementally(spark, sf_dir):
    """The q22_q57 'stream' oracle part (r10) must execute through the
    real streaming engine — >=2 micro-batches of state increments, not
    a single-batch disguise — and its final emission must equal the
    batch tumbling-window aggregation."""
    import glob
    import os
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    got = {
        (r["event_type"], r["window_start"]): (
            r["n_events"],
            round(r["sum_value"], 2),
        )
        for r in entry._stream_hourly_counts(spark, sf_dir).collect()
    }
    ev = read_events(spark, f"{sf_dir}/events.parquet")
    want = {
        (r["event_type"], r["hour"]): (r["n"], round(r["s"], 2))
        for r in ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == want and got

    # >=2 committed micro-batches: the checkpoint's offsets log has one
    # file per batch (4 staged files at 2 per trigger)
    ckpt = os.path.join(
        entry._session_index_path("events_stream_ckpt"),
        "ckpt",
        "offsets",
    )
    assert len(glob.glob(os.path.join(ckpt, "*"))) >= 2

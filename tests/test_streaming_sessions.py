"""Stateful streaming sessionization: closed sessions from the stream
must match the batch sessionizer for sessions that are unambiguously
closed (a later event exists past the gap)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pinecone_datasets_spark.operators.windows import sessionize
from pinecone_datasets_spark.sources.events import read_events
from pinecone_datasets_spark.streaming.sessions import streaming_sessionize


def test_streaming_sessions_match_batch(spark, sf_dir, tmp_path_factory):
    src_dir = str(tmp_path_factory.mktemp("ev_sessions"))
    # subset users: state-group count dominates runtime (one pandas group
    # per user per micro-batch), and 40 users already yield multi-session
    # coverage
    ev = (
        read_events(spark, f"{sf_dir}/events.parquet")
        .where(F.col("user_id") % 25 == 0)
        .select("user_id", "ts", "event_id")
    )
    # single file => one micro-batch; availableNow drains it
    ev.coalesce(1).write.mode("overwrite").parquet(src_dir)

    schema = spark.read.parquet(src_dir).schema
    stream = spark.readStream.schema(schema).parquet(src_dir)
    sessions = streaming_sessionize(stream, gap_minutes=30, use_timeout=False)
    ckpt = str(tmp_path_factory.mktemp("ckpt_sess"))
    q = (
        sessions.writeStream.format("memory")
        .queryName("stream_sessions")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("SELECT * FROM stream_sessions").collect()
    }

    batch = sessionize(
        spark.read.parquet(src_dir), gap_minutes=30
    ).collect()
    # the stream only emits CLOSED sessions: drop each user's last session
    by_user = {}
    for r in batch:
        by_user.setdefault(r["user_id"], []).append(r)
    want = set()
    for user, rows in by_user.items():
        rows.sort(key=lambda r: r["session_idx"])
        for r in rows[:-1]:
            want.add(
                (user, r["session_start"], r["session_end"], r["n_events"])
            )

    assert want, "fixture should produce multi-session users"
    assert want <= got, f"missing {list(want - got)[:3]}"
    # and nothing extra beyond possibly-timed-out open sessions
    extra = got - want
    last_sessions = {
        (
            rows[-1]["user_id"],
            rows[-1]["session_start"],
            rows[-1]["session_end"],
            rows[-1]["n_events"],
        )
        for rows in by_user.values()
    }
    assert extra <= last_sessions


def test_entry_stream_sessions_cross_batch_state(spark, sf_dir):
    """The q26 'stream' oracle part (r10) must carry per-user session
    state across REAL micro-batch boundaries: >=2 committed batches in
    the checkpoint, and the emitted set exactly equal to the batch
    sessionizer's closed sessions (all but each user's last) over the
    same user subset — a session straddling the time-range boundary
    between micro-batches must neither split nor double-emit."""
    import glob
    import os
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in entry._stream_closed_sessions(spark, sf_dir).collect()
    }

    ev = read_events(spark, f"{sf_dir}/events.parquet").where(
        F.col("user_id") % 5 == 0
    )
    by_user = {}
    for r in sessionize(ev, gap_minutes=30).collect():
        by_user.setdefault(r["user_id"], []).append(r)
    want = set()
    for user, rows in by_user.items():
        rows.sort(key=lambda r: r["session_idx"])
        for r in rows[:-1]:
            want.add(
                (user, r["session_start"], r["session_end"], r["n_events"])
            )
    assert got == want and want

    offsets = os.path.join(
        entry._session_index_path("sessions_stream_ckpt"),
        "ckpt",
        "offsets",
    )
    assert len(glob.glob(os.path.join(offsets, "*"))) >= 2

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

    # include the entry's planted exact-gap user (-5, r12 mutcheck):
    # the stream part sessionizes the planted events too
    ev = (
        read_events(spark, f"{sf_dir}/events.parquet")
        .select("user_id", "ts", "event_id")
        .unionByName(entry._planted_gap_events(spark))
        .where(F.col("user_id") % 5 == 0)
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


# ---------------------------------------------------------------------------
# r11 hostile-state fuzz (verdict item 4): the applyInPandasWithState
# function is the one per-group Python crossing inside the hash gate —
# NULL event times, out-of-order duplicates, cross-batch late arrivals,
# and gap-boundary timestamps must not crash it or corrupt its state.
# ---------------------------------------------------------------------------

import pandas as pd

from pinecone_datasets_spark.streaming.sessions import _session_fn


class _FakeState:
    """Minimal GroupState stand-in for driving the state function
    directly (the engine-level paths are covered by the tests above and
    the q26 oracle; this pins per-call semantics precisely)."""

    def __init__(self, value=None, timed_out=False):
        self._v = value
        self.hasTimedOut = timed_out

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v = None

    def setTimeoutDuration(self, ms):
        pass


def _us(s):
    return int(pd.Timestamp(s).value // 1000)


def _drive(fn, state, *ts_batches):
    outs = []
    for ts in ts_batches:
        pdf = pd.DataFrame({"ts": pd.to_datetime(list(ts))})
        for o in fn((7,), iter([pdf]), state):
            outs.extend(o.itertuples(index=False))
    return [tuple(r) for r in outs]


def test_session_fn_null_ts_is_not_a_poison_pill():
    """A NULL event time must be dropped, not cast: NaT's int64
    sentinel (-2^63) previously became a year-1677 pseudo-event whose
    closing session overflowed pd.to_datetime and KILLED the whole
    streaming query (r11 fuzz, OutOfBoundsDatetime)."""
    fn = _session_fn(30, False)
    st = _FakeState()
    closed = _drive(
        fn, st, ["2024-01-01 10:00:00", None, "2024-01-01 10:05:00"]
    )
    assert closed == []
    assert st.get == (_us("2024-01-01 10:00:00"), _us("2024-01-01 10:05:00"), 2)


def test_session_fn_all_null_batch_stays_stateless():
    fn = _session_fn(30, False)
    st = _FakeState()
    assert _drive(fn, st, [None, None]) == []
    assert not st.exists


def test_session_fn_late_event_does_not_regress_session_end():
    """Cross-batch out-of-order: a late 10:05 event arriving after the
    open session reaches 10:29 previously REGRESSED last_us to 10:05,
    so an on-time 10:40 event (true gap 11 min) spuriously closed the
    session with a corrupted end bound (r11 fuzz)."""
    fn = _session_fn(30, False)
    st = _FakeState()
    closed = _drive(
        fn,
        st,
        ["2024-01-01 10:00:00", "2024-01-01 10:29:00"],
        ["2024-01-01 10:05:00"],  # late, inside the open session
        ["2024-01-01 10:40:00"],  # on time: 11 min after true end
    )
    assert closed == []  # one session, still open
    assert st.get == (_us("2024-01-01 10:00:00"), _us("2024-01-01 10:40:00"), 4)


def test_session_fn_late_chain_bridges_into_open_session():
    """Two late events where only the second is within gap of the open
    session: the first closes as its own singleton session, the second
    merges into the open session (interval sweep, not last_us fold)."""
    fn = _session_fn(30, False)
    st = _FakeState()
    closed = _drive(
        fn,
        st,
        ["2024-01-01 12:00:00"],
        ["2024-01-01 11:00:00", "2024-01-01 11:45:00"],
    )
    assert closed == [
        (
            7,
            pd.Timestamp("2024-01-01 11:00:00"),
            pd.Timestamp("2024-01-01 11:00:00"),
            1,
        )
    ]
    assert st.get == (_us("2024-01-01 11:45:00"), _us("2024-01-01 12:00:00"), 2)


def test_session_fn_gap_boundary_and_duplicates():
    """gap == threshold stays one session (strict > split, matching the
    batch twin); exact-duplicate timestamps each count as an event."""
    fn = _session_fn(30, False)
    st = _FakeState()
    closed = _drive(
        fn,
        st,
        [
            "2024-01-01 10:00:00",
            "2024-01-01 10:00:00",  # duplicate
            "2024-01-01 10:30:00",  # exactly gap after first: same session
            "2024-01-01 11:00:01",  # gap + 1s: splits
        ],
    )
    assert closed == [
        (
            7,
            pd.Timestamp("2024-01-01 10:00:00"),
            pd.Timestamp("2024-01-01 10:30:00"),
            3,
        )
    ]
    assert st.get == (_us("2024-01-01 11:00:01"), _us("2024-01-01 11:00:01"), 1)


def test_session_fn_timeout_closes_merged_open_session():
    fn = _session_fn(30, True)
    st = _FakeState(
        value=(_us("2024-01-01 10:00:00"), _us("2024-01-01 10:10:00"), 3),
        timed_out=True,
    )
    closed = _drive(fn, st, [])
    assert closed == [
        (
            7,
            pd.Timestamp("2024-01-01 10:00:00"),
            pd.Timestamp("2024-01-01 10:10:00"),
            3,
        )
    ]
    assert not st.exists


def test_streaming_sessions_null_ts_through_engine(spark, tmp_path_factory):
    """Engine-level poison-pill regression: a NULL ts row in a real
    micro-batch must not kill the query, and the non-null events must
    still sessionize. (Function-level twin above pins the semantics;
    this pins the wiring: schema, Arrow transport, state codec.)"""
    src_dir = str(tmp_path_factory.mktemp("ev_nullts"))
    rows = [
        (1, "2024-01-01 10:00:00"),
        (1, None),
        (1, "2024-01-01 10:05:00"),
        (1, "2024-01-01 11:00:00"),  # > gap: closes the first session
        (2, None),  # a user with ONLY null ts
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_s string").select(
        "user_id", F.col("ts_s").cast("timestamp").alias("ts")
    )
    df.coalesce(1).write.mode("overwrite").parquet(src_dir)

    schema = spark.read.parquet(src_dir).schema
    stream = spark.readStream.schema(schema).parquet(src_dir)
    sessions = streaming_sessionize(stream, gap_minutes=30, use_timeout=False)
    ckpt = str(tmp_path_factory.mktemp("ckpt_nullts"))
    q = (
        sessions.writeStream.format("memory")
        .queryName("stream_sessions_nullts")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None, q.exception()
    got = [
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in spark.sql("SELECT * FROM stream_sessions_nullts").collect()
    ]
    assert got == [(1, "2024-01-01 10:00:00", "2024-01-01 10:05:00", 2)], got

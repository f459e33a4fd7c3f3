"""Hot-key (salted) sessionization: the two-level time-bucket path must
be row-identical to the plain per-user window, including sessions that
straddle bucket edges, while the rank window partitions by
(user, bucket) so one bot user no longer funnels through one task."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from pinecone_datasets_spark.operators.windows import sessionize
from pinecone_datasets_spark.sources.events import read_events


def _rows(df):
    return sorted(
        (r.user_id, r.session_idx, r.session_start, r.session_end,
         r.n_events)
        for r in df.collect()
    )


def test_salted_matches_plain_on_events(spark, sf_dir):
    ev = read_events(spark, f"{sf_dir}/events.parquet").select(
        "user_id", "ts", "event_id"
    )
    plain = sessionize(ev, gap_minutes=30)
    salted = sessionize(ev, gap_minutes=30, salt_window_minutes=6 * 60)
    assert _rows(salted) == _rows(plain)


def test_salted_merges_sessions_across_bucket_edges(spark):
    # one "bot" user with continuous activity across many bucket edges:
    # every event is 10 min apart, buckets are 60 min wide, gap is 30 —
    # the WHOLE stream is ONE session; the naive per-bucket result would
    # be 24 sessions without the summary merge. A second user has a
    # clean 2-session split for contrast.
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0 + dt.timedelta(minutes=10 * i), i) for i in range(144)
    ] + [
        (2, t0, 1000),
        (2, t0 + dt.timedelta(minutes=10), 1001),
        (2, t0 + dt.timedelta(minutes=200), 1002),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long"
    )
    plain = sessionize(ev, gap_minutes=30)
    salted = sessionize(ev, gap_minutes=30, salt_window_minutes=60)
    assert _rows(salted) == _rows(plain)
    got = {
        (r.user_id, r.session_idx): r.n_events for r in salted.collect()
    }
    assert got == {(1, 1): 144, (2, 1): 2, (2, 2): 1}


def test_salted_boundary_gap_exactness(spark):
    # events just inside/outside the gap ACROSS a bucket edge: 23:59 and
    # 00:20 next bucket (21 min < 30 => same session); 23:59 and 00:40
    # (41 min > 30 => split). The summary merge must measure end->start.
    t0 = dt.datetime(2024, 1, 1, 23, 59, 0)
    rows = [
        (1, t0, 1),
        (1, t0 + dt.timedelta(minutes=21), 2),
        (2, t0, 3),
        (2, t0 + dt.timedelta(minutes=41), 4),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long"
    )
    plain = sessionize(ev, gap_minutes=30)
    salted = sessionize(ev, gap_minutes=30, salt_window_minutes=24 * 60)
    assert _rows(salted) == _rows(plain)
    counts = {
        r.user_id: r[1]
        for r in salted.groupBy("user_id").count().collect()
    }
    assert counts == {1: 1, 2: 2}


def test_salted_window_partitions_by_bucket(spark, sf_dir):
    # scale shape: the event-level window must carry BOTH partition keys
    # (user, time bucket), not the bare user column
    ev = read_events(spark, f"{sf_dir}/events.parquet").select(
        "user_id", "ts", "event_id"
    )
    salted = sessionize(ev, gap_minutes=30, salt_window_minutes=120)
    plan = salted._jdf.queryExecution().executedPlan().toString()
    wins = [ln for ln in plan.splitlines() if "lag(" in ln]
    assert wins, plan
    assert any("user_id" in ln and "__bkt" in ln for ln in wins), (
        "\n".join(wins)
    )


def test_salt_window_guard(spark):
    ev = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 1)],
        "user_id long, ts timestamp, event_id long",
    )
    with pytest.raises(ValueError, match="must exceed"):
        sessionize(ev, gap_minutes=30, salt_window_minutes=30)

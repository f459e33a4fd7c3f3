"""Changelog apply and SCD2 history (operators/scd.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pinecone_datasets_spark.operators.scd import (
    changelog_apply,
    scd2_history,
)
from pinecone_datasets_spark.plans.explain import formatted_plan


@pytest.fixture(scope="module")
def changelog(spark):
    # key u1: state flaps a->a->b->a (consecutive dup must collapse);
    # key u2: single row; key u3: ends in a delete op.
    rows = [
        (1, 10, "a", "U", 1.0),
        (1, 20, "a", "U", 2.0),
        (1, 30, "b", "U", 3.0),
        (1, 40, "a", "U", 4.0),
        (2, 15, "x", "U", 5.0),
        (3, 10, "y", "U", 6.0),
        (3, 50, "y", "D", 7.0),
    ]
    return spark.createDataFrame(
        rows, schema="uid long, ts long, state string, op string, v double"
    )


def test_changelog_apply_latest_and_deletes(changelog):
    out = changelog_apply(
        changelog, keys="uid", seq_col="ts", op_col="op", delete_ops=("D",)
    )
    got = {r.uid: (r.ts, r.state) for r in out.collect()}
    # u3's latest op is a delete -> gone; others keep their last row
    assert got == {1: (40, "a"), 2: (15, "x")}


def test_changelog_apply_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, 10, "first"), (1, 10, "second")],
        schema="uid long, ts long, tag string",
    )
    out = changelog_apply(df, keys="uid", seq_col="ts", tiebreak="tag")
    assert out.collect()[0].tag == "second"  # max tiebreak wins


def test_changelog_apply_plan_has_window_group_limit(changelog):
    out = changelog_apply(changelog, keys="uid", seq_col="ts")
    assert "WindowGroupLimit" in formatted_plan(out)


def test_scd2_collapses_unchanged_runs(changelog):
    hist = scd2_history(
        changelog, keys="uid", state_cols="state", ts_col="ts"
    )
    u1 = [
        (r.ts, r.state, r.valid_from, r.valid_to, r.is_current)
        for r in hist.where("uid = 1").orderBy("ts").collect()
    ]
    # ts=20 (state unchanged 'a') collapses into the ts=10 interval;
    # the re-flip back to 'a' at 40 is a NEW interval (Type-2 history).
    assert u1 == [
        (10, "a", 10, 30, False),
        (30, "b", 30, 40, False),
        (40, "a", 40, None, True),
    ]


def test_scd2_single_row_key_is_current(changelog):
    hist = scd2_history(
        changelog, keys="uid", state_cols="state", ts_col="ts"
    )
    u2 = hist.where("uid = 2").collect()
    assert len(u2) == 1 and u2[0].is_current and u2[0].valid_to is None


def test_scd2_null_state_first_row_survives(spark):
    df = spark.createDataFrame(
        [(1, 10, None), (1, 20, None), (1, 30, "s")],
        schema="uid long, ts long, state string",
    )
    hist = scd2_history(df, keys="uid", state_cols="state", ts_col="ts")
    got = [(r.ts, r.state) for r in hist.orderBy("ts").collect()]
    # null==null collapses the second row, but the first must survive
    assert got == [(10, None), (30, "s")]


def test_scd2_multi_state_cols(spark):
    df = spark.createDataFrame(
        [(1, 10, "a", 1), (1, 20, "a", 2), (1, 30, "a", 2)],
        schema="uid long, ts long, s1 string, s2 long",
    )
    hist = scd2_history(
        df, keys="uid", state_cols=["s1", "s2"], ts_col="ts"
    )
    # s2 change at ts=20 opens a new interval even though s1 is stable
    assert [r.ts for r in hist.orderBy("ts").collect()] == [10, 20]


def test_scd2_single_shuffle(changelog):
    """lag-detect and lead-interval windows must share ONE Exchange."""
    hist = scd2_history(
        changelog, keys="uid", state_cols="state", ts_col="ts"
    )
    import re

    plan = formatted_plan(hist)
    exchanges = re.findall(r"\(\d+\) Exchange", plan)
    sorts = re.findall(r"\(\d+\) Sort", plan)
    assert len(exchanges) == 1 and len(sorts) == 1, plan


def test_changelog_null_op_rows_survive(spark):
    """r11 review: feeds that only tag deletes leave op NULL on
    upserts; NOT isin(...) is NULL for them and WHERE dropped the whole
    snapshot."""
    from pinecone_datasets_spark.operators.scd import changelog_apply

    rows = [
        (1, 1, None, "a"),
        (1, 2, None, "b"),
        (2, 1, None, "x"),
        (2, 2, "D", "x"),
        (3, 1, "D", "y"),
    ]
    df = spark.createDataFrame(rows, "k long, seq long, op string, v string")
    out = {
        r["k"]: r["v"]
        for r in changelog_apply(df, "k", "seq", op_col="op").collect()
    }
    assert out == {1: "b"}, out


def test_scd2_first_row_detection_immune_to_null_ts(spark):
    """r11 review: first-row detection via lag(ts).isNull() also fired
    on the row AFTER a NULL-ts row, keeping an unchanged state as a
    duplicate validity interval."""
    from pinecone_datasets_spark.operators.scd import scd2_history

    rows = [
        (1, None, "a"),
        (1, "2024-01-01 01:00:00", "a"),   # unchanged: must be dropped
        (1, "2024-01-01 02:00:00", "b"),
    ]
    df = spark.createDataFrame(rows, "k long, ts_s string, state string").select(
        "k", F.col("ts_s").cast("timestamp").alias("ts"), "state"
    )
    out = scd2_history(df, "k", "state", "ts").collect()
    states = [(r["state"], r["ts"] is None) for r in sorted(out, key=lambda r: (r["ts"] is not None, r["ts"]))]
    assert len(out) == 2, out            # NULL-ts 'a' row + the 'b' change
    assert [s for s, _ in states] == ["a", "b"]

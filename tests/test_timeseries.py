"""Gap fill / LOCF / linear interpolation (operators/timeseries.py)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from pinecone_datasets_spark.operators.timeseries import (
    gapfill,
    interpolate_linear,
    locf,
    rolling_zscore,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _h(i):
    return T0 + dt.timedelta(hours=i)


def _series(spark):
    # key 'a': observed at hours 0, 1, 4 (gap of 2); key 'b': 2, 3
    rows = [
        ("a", _h(0), 10.0),
        ("a", _h(1), 20.0),
        ("a", _h(4), 50.0),
        ("b", _h(2), 7.0),
        ("b", _h(3), 8.0),
    ]
    return spark.createDataFrame(
        rows, "k string, bucket timestamp, v double"
    )


def test_gapfill_densifies_per_key(spark):
    out = gapfill(_series(spark), "bucket", ["v"], ["k"]).collect()
    got = {(r.k, r.bucket): (r.v, r.is_gap) for r in out}
    # key a: 5 hourly buckets 0..4; key b: 2 buckets — per-key extents
    assert len([1 for k, _ in got if k == "a"]) == 5
    assert len([1 for k, _ in got if k == "b"]) == 2
    assert got[("a", _h(2))] == (None, True)
    assert got[("a", _h(3))] == (None, True)
    assert got[("a", _h(0))] == (10.0, False)
    assert ("b", _h(0)) not in got


def test_locf_carries_last_value(spark):
    filled = gapfill(_series(spark), "bucket", ["v"], ["k"])
    out = {(r.k, r.bucket): r.v for r in locf(filled, "bucket", ["v"], ["k"]).collect()}
    assert out[("a", _h(2))] == 20.0
    assert out[("a", _h(3))] == 20.0
    assert out[("a", _h(4))] == 50.0


def test_linear_interpolation(spark):
    filled = gapfill(_series(spark), "bucket", ["v"], ["k"])
    out = {
        (r.k, r.bucket): r.v
        for r in interpolate_linear(filled, "bucket", ["v"], ["k"]).collect()
    }
    # run between 20.0@h1 and 50.0@h4 -> 30, 40
    assert out[("a", _h(2))] == pytest.approx(30.0)
    assert out[("a", _h(3))] == pytest.approx(40.0)
    assert out[("a", _h(1))] == 20.0 and out[("a", _h(4))] == 50.0


def test_leading_nulls_stay_null(spark):
    rows = [("a", _h(2), 5.0), ("a", _h(0), None)]
    df = spark.createDataFrame(rows, "k string, bucket timestamp, v double")
    filled = gapfill(df, "bucket", ["v"], ["k"])
    li = {r.bucket: r.v for r in interpolate_linear(filled, "bucket", ["v"], ["k"]).collect()}
    lo = {r.bucket: r.v for r in locf(filled, "bucket", ["v"], ["k"]).collect()}
    assert li[_h(0)] is None and li[_h(1)] is None and li[_h(2)] == 5.0
    assert lo[_h(0)] is None and lo[_h(1)] is None


def test_observed_null_value_is_not_a_gap(spark):
    # is_gap derives from the JOIN, not value nullness: an observed
    # bucket whose first value column is legitimately NULL stays
    # is_gap = false.
    rows = [("a", _h(0), None), ("a", _h(2), 5.0)]
    df = spark.createDataFrame(rows, "k string, bucket timestamp, v double")
    got = {
        r.bucket: (r.v, r.is_gap)
        for r in gapfill(df, "bucket", ["v"], ["k"]).collect()
    }
    assert got[_h(0)] == (None, False)  # observed, null value
    assert got[_h(1)] == (None, True)   # true hole
    assert got[_h(2)] == (5.0, False)


def test_gapfill_empty_value_cols_raises(spark):
    with pytest.raises(ValueError):
        gapfill(_series(spark), "bucket", [], ["k"])


def test_no_keys_single_series(spark):
    rows = [(_h(0), 1.0), (_h(3), 4.0)]
    df = spark.createDataFrame(rows, "bucket timestamp, v double")
    filled = gapfill(df, "bucket", ["v"])
    out = {r.bucket: r.v for r in interpolate_linear(filled, "bucket", ["v"]).collect()}
    assert out[_h(1)] == pytest.approx(2.0)
    assert out[_h(2)] == pytest.approx(3.0)


def test_rolling_zscore_flags_spike(spark):
    # flat 10.0 baseline, then a spike at h8 and back to baseline
    rows = [("a", _h(i), 10.0 + (0.1 * (i % 3))) for i in range(8)]
    rows.append(("a", _h(8), 100.0))
    rows.append(("a", _h(9), 10.0))
    df = spark.createDataFrame(rows, "k string, bucket timestamp, v double")
    out = {
        r.bucket: r
        for r in rolling_zscore(
            df, "bucket", "v", ["k"], window=6, min_periods=4, tau=3.0
        ).collect()
    }
    # warm-up: fewer than min_periods trailing values -> NULL, not false
    for i in range(4):
        assert out[_h(i)].zscore is None
        assert out[_h(i)].is_anomaly is None
    assert out[_h(8)].zscore > 3.0 and out[_h(8)].is_anomaly
    # normal buckets after warm-up are not anomalous
    assert out[_h(6)].is_anomaly is False
    # trailing frame EXCLUDES the current row: the spike cannot mask
    # itself, and the bucket after the spike compares against a frame
    # that now contains the spike (high stddev -> small |z|)
    assert out[_h(9)].is_anomaly is False


def test_rolling_zscore_zero_variance_is_null(spark):
    rows = [("a", _h(i), 5.0) for i in range(8)]
    df = spark.createDataFrame(rows, "k string, bucket timestamp, v double")
    out = rolling_zscore(df, "bucket", "v", ["k"], window=4).collect()
    assert all(r.zscore is None and r.is_anomaly is None for r in out)


def test_rolling_zscore_bad_args(spark):
    df = _series(spark)
    with pytest.raises(ValueError):
        rolling_zscore(df, "bucket", "v", ["k"], window=0)
    with pytest.raises(ValueError):
        rolling_zscore(df, "bucket", "v", ["k"], min_periods=1)


def test_fixture_events_roundtrip(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hourly = ev.groupBy(
        F.col("event_type"),
        F.date_trunc("hour", "ts").alias("bucket"),
    ).agg(F.sum("value").alias("v"))
    filled = gapfill(hourly, "bucket", ["v"], ["event_type"])
    n_obs = hourly.count()
    n_filled = filled.count()
    assert n_filled >= n_obs
    # dense: per key, count == span hours + 1
    ext = filled.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        (
            (F.unix_timestamp(F.max("bucket")) - F.unix_timestamp(F.min("bucket")))
            / 3600 + 1
        ).cast("long").alias("span"),
    )
    assert all(r.n == r.span for r in ext.collect())
    # filling never changes observed values
    joined = filled.where(~F.col("is_gap")).join(
        hourly.withColumnRenamed("v", "v0"), ["event_type", "bucket"]
    )
    assert joined.where(F.col("v") != F.col("v0")).count() == 0
    assert joined.count() == n_obs


def test_gapfill_keeps_off_grid_observed_rows(spark):
    """r11 review: an observed bucket off the step grid (00:30 under a
    1-hour step anchored at 00:00) silently lost its values in the old
    left join while neighbors reported is_gap=true."""
    from pinecone_datasets_spark.operators.timeseries import gapfill

    rows = [
        ("2024-01-01 00:00:00", 1.0),
        ("2024-01-01 00:30:00", 9.0),   # off-grid
        ("2024-01-01 02:00:00", 3.0),
    ]
    df = spark.createDataFrame(rows, "b_s string, v double").select(
        F.col("b_s").cast("timestamp").alias("bucket"), "v"
    )
    out = {
        str(r["bucket"]): (r["v"], r["is_gap"])
        for r in gapfill(df, "bucket", ["v"]).collect()
    }
    assert out == {
        "2024-01-01 00:00:00": (1.0, False),
        "2024-01-01 00:30:00": (9.0, False),   # kept, not a gap
        "2024-01-01 01:00:00": (None, True),
        "2024-01-01 02:00:00": (3.0, False),
    }, out

"""Count-Min sketch (operators/sketch.py cm_sketch / cm_estimate /
cm_sql): never-undercount invariant, python bit-replay, DuckDB parity,
zero-Python bounded-key plan."""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F

from pinecone_datasets_spark.operators.sketch import (
    cm_estimate,
    cm_sketch,
    cm_sql,
)
from pinecone_datasets_spark.plans.explain import formatted_plan

D, W = 4, 256


def _py_bucket(row: int, value: str, width: int = W) -> int:
    h = hashlib.md5(f"{row}:{value}".encode()).hexdigest()[:13]
    return int(h, 16) % width


def _py_cm(values, depth: int = D, width: int = W):
    sk = {}
    for v in values:
        for r in range(depth):
            key = (r, _py_bucket(r, str(v), width))
            sk[key] = sk.get(key, 0) + 1
    return sk


@pytest.fixture(scope="module")
def zipf(spark):
    # id % (id-dependent modulus) gives a skewed multiplicity profile
    return spark.range(5000).select(
        (F.col("id") % 97).cast("long").alias("v")
    )


def test_sketch_matches_python_replay(spark, zipf):
    got = {
        (r["row"], r["bucket"]): r["c"]
        for r in cm_sketch(zipf, "v", depth=D, width=W).collect()
    }
    want = _py_cm([r["v"] for r in zipf.collect()])
    assert got == want


def test_estimate_never_undercounts(spark, zipf):
    exact = {
        r["v"]: r["n"]
        for r in zipf.groupBy("v").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    keys = zipf.select("v").distinct()
    sk = cm_sketch(zipf, "v", depth=D, width=W)
    est = {
        r["v"]: r["est_count"]
        for r in cm_estimate(sk, keys, "v", depth=D, width=W).collect()
    }
    n = sum(exact.values())
    assert set(est) == set(exact)
    for v, true in exact.items():
        assert est[v] >= true, (v, est[v], true)
        # e*n/width error bound; 97 keys in 256 buckets x 4 rows makes
        # the min-counter usually exact, always within the CM bound
        assert est[v] - true <= 2.718281828 * n / W, (v, est[v], true)


def test_unseen_key_estimates_small(spark, zipf):
    sk = cm_sketch(zipf, "v", depth=D, width=W)
    keys = spark.range(1).select(F.lit(10_000_000).alias("v"))
    (row,) = cm_estimate(sk, keys, "v", depth=D, width=W).collect()
    # never-seen key: min over 4 counters of colliding mass only
    assert 0 <= row["est_count"] <= 2.718281828 * 5000 / W


def test_sketches_merge_by_sum(spark):
    a = spark.range(0, 300).select((F.col("id") % 7).alias("v"))
    b = spark.range(300, 1000).select((F.col("id") % 7).alias("v"))
    merged = (
        cm_sketch(a, "v", depth=D, width=W)
        .unionByName(cm_sketch(b, "v", depth=D, width=W))
        .groupBy("row", "bucket")
        .agg(F.sum("c").alias("c"))
    )
    whole = cm_sketch(
        spark.range(1000).select((F.col("id") % 7).alias("v")),
        "v",
        depth=D,
        width=W,
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_cm_sql_duckdb_parity(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sk = cm_sketch(ev, "user_id", depth=D, width=W)
    probes = ev.select("user_id").distinct().orderBy("user_id").limit(20)
    got = {
        r["user_id"]: r["est_count"]
        for r in cm_estimate(sk, probes, "user_id", depth=D, width=W).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    sql = cm_sql(
        "user_id",
        "events",
        "SELECT DISTINCT user_id FROM events ORDER BY user_id LIMIT 20",
        "user_id",
        depth=D,
        width=W,
    )
    want = {r[0]: r[1] for r in con.execute(sql).fetchall()}
    assert got == want


def test_plan_no_python_and_partial_agg(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sk = cm_sketch(ev, "user_id", depth=D, width=W)
    plan = formatted_plan(sk)
    assert "EvalPython" not in plan
    # partial aggregation bounds each task's shuffle output at d*w rows
    assert "partial_count" in plan or "HashAggregate" in plan
    est = cm_estimate(sk, ev.select("user_id").distinct(), "user_id")
    eplan = formatted_plan(est)
    assert "BroadcastHashJoin" in eplan  # the d*w sketch is broadcast


def test_param_guard(spark):
    df = spark.range(5).select(F.col("id").alias("v"))
    with pytest.raises(ValueError):
        cm_sketch(df, "v", depth=0)
    with pytest.raises(ValueError):
        cm_sketch(df, "v", width=1)

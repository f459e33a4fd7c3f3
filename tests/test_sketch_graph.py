"""KMV sketch (operators/sketch.py) and fixed-iteration PageRank
(operators/graph.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pinecone_datasets_spark.operators.graph import pagerank
from pinecone_datasets_spark.operators.sketch import kmv_distinct
from pinecone_datasets_spark.plans.explain import formatted_plan


def test_kmv_exact_below_k(spark):
    # 10 distinct values, k=64 -> estimator returns the exact count
    df = spark.range(100).select((F.col("id") % 10).alias("v"))
    out = kmv_distinct(df, "v", None, k=64).collect()
    assert len(out) == 1 and out[0].est_distinct == 10.0


def test_kmv_estimate_within_error(spark):
    # 5000 distinct, k=256: KMV standard error ~1/sqrt(k-2) ~ 6.3%
    df = spark.range(5000).select(F.col("id").alias("v"))
    est = kmv_distinct(df, "v", None, k=256).collect()[0].est_distinct
    assert est == pytest.approx(5000, rel=0.2)


def test_kmv_duplicates_dont_bias(spark):
    # same distinct set, wildly different multiplicities -> same estimate
    a = spark.range(500).select((F.col("id") % 100).alias("v"))
    b = spark.range(50000).select((F.col("id") % 100).alias("v"))
    ea = kmv_distinct(a, "v", None, k=32).collect()[0].est_distinct
    eb = kmv_distinct(b, "v", None, k=32).collect()[0].est_distinct
    assert ea == eb


def test_kmv_grouped(spark):
    df = spark.range(1000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        (F.col("id") % 20).alias("v"),
    )
    out = {r.g: r.est_distinct for r in kmv_distinct(df, "v", "g", k=64).collect()}
    # group "0" sees even values, "1" odd -> 10 distinct each, exact
    assert out == {"0": 10.0, "1": 10.0}


def test_kmv_k_guard(spark):
    df = spark.range(10).select(F.col("id").alias("v"))
    with pytest.raises(ValueError):
        kmv_distinct(df, "v", None, k=1)


def test_kmv_plan_partial_topk(spark):
    df = spark.range(100).select(
        (F.col("id") % 2).alias("g"), F.col("id").alias("v")
    )
    plan = formatted_plan(kmv_distinct(df, "v", "g", k=16))
    assert "WindowGroupLimit" in plan


def _pagerank_ref(edges, iterations, damping=0.85):
    nodes = sorted({n for e in edges for n in e})
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    n = len(nodes)
    r = {x: 1.0 / n for x in nodes}
    for _ in range(iterations):
        nxt = {x: (1.0 - damping) / n for x in nodes}
        for s, d in edges:
            nxt[d] += damping * r[s] / outdeg[s]
        r = nxt
    return r


def test_pagerank_matches_reference(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")]
    df = spark.createDataFrame(edges, schema="src string, dst string")
    got = {r.node: r["rank"] for r in pagerank(df, iterations=3).collect()}
    want = _pagerank_ref(edges, 3)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)


def test_pagerank_mass_sink(spark):
    # a node with no out-edges receives rank but contributes none
    df = spark.createDataFrame(
        [("a", "sink"), ("b", "sink")], schema="src string, dst string"
    )
    got = {r.node: r["rank"] for r in pagerank(df, iterations=1).collect()}
    assert got["sink"] > got["a"] == got["b"]


def test_pagerank_iteration_guard(spark):
    df = spark.createDataFrame([("a", "b")], schema="src string, dst string")
    with pytest.raises(ValueError):
        pagerank(df, iterations=0)

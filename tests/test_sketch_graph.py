"""KMV sketch (operators/sketch.py) and fixed-iteration PageRank
(operators/graph.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pinecone_datasets_spark.operators.graph import pagerank
from pinecone_datasets_spark.operators.sketch import (
    hll_distinct,
    quantile_estimate,
    quantile_sketch,
    quantile_sketch_sql,
    hll_estimate,
    hll_registers,
    hll_sql,
    kmv_distinct,
)
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


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters
# ---------------------------------------------------------------------------


def _zipf_tokens(spark):
    """Skewed token stream from the documents fixture: every token of
    every doc — natural Zipf-ish frequencies, multiple partitions."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return (
        docs.repartition(8)
        .select(
            F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok")
        )
        .where(F.length("tok") > 0)
    )


def test_mg_bounds_vs_exact(spark):
    from pinecone_datasets_spark.operators.sketch import mg_heavy_hitters

    toks = _zipf_tokens(spark)
    exact = {
        r["tok"]: r["n"]
        for r in toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_total = sum(exact.values())
    out = mg_heavy_hitters(toks, "tok", capacity=256).collect()
    assert out, "summary empty"
    err = out[0]["err_bound"]
    assert out[0]["n_total"] == n_total
    # deterministic bound: err <= n / (capacity + 1)
    assert err <= n_total / 257 + 1
    got = {r["tok"]: r["est_count"] for r in out}
    # (1) estimates never overcount and undercount by at most err
    for tok, est in got.items():
        assert est <= exact[tok], (tok, est, exact[tok])
        assert exact[tok] - est <= err, (tok, est, exact[tok], err)
    # (2) nothing frequent is missed: true count > err => present
    for tok, true_n in exact.items():
        if true_n > err:
            assert tok in got, (tok, true_n, err)


def test_mg_min_share_keeps_everything_above_threshold(spark):
    from pinecone_datasets_spark.operators.sketch import mg_heavy_hitters

    toks = _zipf_tokens(spark)
    exact = {
        r["tok"]: r["n"]
        for r in toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_total = sum(exact.values())
    out = mg_heavy_hitters(toks, "tok", capacity=512, min_share=0.01)
    rows = out.collect()
    got = {r["tok"] for r in rows}
    err = rows[0]["err_bound"] if rows else 0
    # the DOCUMENTED guarantee (r11 review fixed the filter to use the
    # upper estimate): every token whose TRUE share meets the threshold
    # is kept — no err/n slack needed
    for tok, true_n in exact.items():
        if true_n / n_total >= 0.01:
            assert tok in got, (tok, true_n / n_total, err)
    # and the filter still prunes: anything kept has upper estimate
    # over the threshold
    for r in rows:
        assert r["est_count"] + r["err_bound"] >= 0.01 * n_total


def test_mg_exact_when_capacity_exceeds_keys(spark):
    from pinecone_datasets_spark.operators.sketch import mg_heavy_hitters

    df = spark.range(1000).select((F.col("id") % 7).alias("v"))
    out = {
        r["v"]: (r["est_count"], r["err_bound"])
        for r in mg_heavy_hitters(df, "v", capacity=64).collect()
    }
    assert len(out) == 7
    for v, (est, err) in out.items():
        assert err == 0
        assert est == (143 if v < 6 else 142)


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def test_hll_small_range_linear_counting(spark):
    # 150 distinct at p=10 -> linear-counting branch; LC is very tight here
    df = spark.range(1500).select((F.col("id") % 150).alias("v"))
    est = hll_distinct(df, "v", None, p=10).collect()[0].est_distinct
    assert est == pytest.approx(150, rel=0.05)


def test_hll_raw_branch_within_error(spark):
    # 50k distinct at p=10 -> raw harmonic-mean branch; se ~ 1.04/sqrt(1024)
    df = spark.range(50000).select(F.col("id").alias("v"))
    est = hll_distinct(df, "v", None, p=10).collect()[0].est_distinct
    assert est == pytest.approx(50000, rel=0.15)


def test_hll_duplicates_dont_bias(spark):
    a = spark.range(500).select((F.col("id") % 100).alias("v"))
    b = spark.range(50000).select((F.col("id") % 100).alias("v"))
    ea = hll_distinct(a, "v", None, p=8).collect()[0].est_distinct
    eb = hll_distinct(b, "v", None, p=8).collect()[0].est_distinct
    assert ea == eb


def test_hll_grouped(spark):
    df = spark.range(2000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        (F.col("id") % 40).alias("v"),
    )
    out = {
        r.g: r.est_distinct
        for r in hll_distinct(df, "v", "g", p=10).collect()
    }
    assert set(out) == {"0", "1"}
    for v in out.values():
        assert v == pytest.approx(20, rel=0.1)


def test_hll_registers_merge_equals_direct(spark):
    # sketch two halves separately, union + re-MAX the registers ->
    # identical estimate to sketching the union directly (mergeability)
    lo = spark.range(0, 3000).select(F.col("id").alias("v"))
    hi = spark.range(2000, 5000).select(F.col("id").alias("v"))
    direct = hll_distinct(lo.union(hi), "v", None, p=9).collect()[0].est_distinct
    merged_regs = (
        hll_registers(lo, "v", None, p=9)
        .union(hll_registers(hi, "v", None, p=9))
        .groupBy("reg")
        .agg(F.max("rho").alias("rho"))
    )
    merged = hll_estimate(merged_regs, None, p=9).collect()[0].est_distinct
    assert merged == direct


def test_hll_duckdb_twin_bit_exact(spark, tmp_path):
    import duckdb

    df = spark.range(4000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 700).alias("v"),
    )
    path = str(tmp_path / "t.parquet")
    df.write.parquet(path)
    got = {
        r.g: r.est_distinct
        for r in hll_distinct(spark.read.parquet(path), "v", "g", p=8).collect()
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{path}/*.parquet')")
    want = dict(con.execute(hll_sql("v", ["g"], "t", p=8)).fetchall())
    assert got == want  # bit-for-bit, not approx


def test_hll_p_guard(spark):
    df = spark.range(10).select(F.col("id").alias("v"))
    with pytest.raises(ValueError):
        hll_distinct(df, "v", None, p=3)
    with pytest.raises(ValueError):
        hll_distinct(df, "v", None, p=17)


# ---------------------------------------------------------------------------
# Quantile sketch (bottom-k hash sample)
# ---------------------------------------------------------------------------


def test_qsk_exact_when_group_fits(spark):
    # group smaller than k -> sample IS the group -> exact quantiles
    df = spark.range(1, 101).select(F.col("id").cast("double").alias("v"))
    sk = quantile_sketch(df, "v", None, k=1024, sample_by="v")
    out = {r.p: r.q for r in quantile_estimate(sk, [0.0, 0.25, 0.5, 1.0]).collect()}
    assert out[0.0] == 1.0 and out[1.0] == 100.0
    assert out[0.25] == pytest.approx(25.75)   # type-7 on 1..100
    assert out[0.5] == pytest.approx(50.5)


def test_qsk_sampling_accuracy(spark):
    df = spark.range(50000).select(F.col("id").cast("double").alias("v"))
    sk = quantile_sketch(df, "v", None, k=1024, sample_by="v")
    out = {r.p: r.q for r in quantile_estimate(sk, [0.5, 0.9]).collect()}
    # rank error ~O(1/sqrt(k)) ~ 3%: allow 10% of the value range
    assert out[0.5] == pytest.approx(25000, abs=5000)
    assert out[0.9] == pytest.approx(45000, abs=5000)


def test_qsk_mergeable(spark):
    lo = spark.range(0, 30000).select(F.col("id").cast("double").alias("v"))
    hi = spark.range(30000, 60000).select(F.col("id").cast("double").alias("v"))
    k = 512
    direct = quantile_sketch(lo.union(hi), "v", None, k=k, sample_by="v")
    merged = (
        quantile_sketch(lo, "v", None, k=k, sample_by="v")
        .union(quantile_sketch(hi, "v", None, k=k, sample_by="v"))
    )
    remerged = quantile_sketch(merged, "v", None, k=k, sample_by="v")
    # bottom-k of the union == bottom-k of concatenated bottom-k's
    a = sorted((r.u, r.v) for r in direct.collect())
    b = sorted((r.u, r.v) for r in remerged.collect())
    # remerged re-hashes v; compare via estimates instead for safety
    pa = {r.p: r.q for r in quantile_estimate(direct, [0.5]).collect()}
    pb = {r.p: r.q for r in quantile_estimate(remerged, [0.5]).collect()}
    assert pa == pb
    assert len(a) == len(b) == k


def test_qsk_grouped_and_duckdb_twin(spark):
    import duckdb

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    probs = [0.1, 0.5, 0.99]
    sk = quantile_sketch(
        li, "l_extendedprice", "l_returnflag", k=128, sample_by="l_orderkey"
    )
    got = sorted(
        (r.l_returnflag, r.p, round(r.q, 6))
        for r in quantile_estimate(sk, probs, "l_returnflag").collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        "'/root/testdata/sf0.001/lineitem.parquet'"
    )
    want = sorted(
        (r[0], r[1], round(r[2], 6))
        for r in con.execute(
            quantile_sketch_sql(
                "l_extendedprice", ["l_returnflag"], "lineitem", probs,
                k=128, sample_by="l_orderkey",
            )
        ).fetchall()
    )
    assert got == want


def test_qsk_plan_partial_topk(spark):
    df = spark.range(1000).select(
        (F.col("id") % 3).alias("g"), F.col("id").cast("double").alias("v")
    )
    plan = formatted_plan(quantile_sketch(df, "v", "g", k=64, sample_by="v"))
    assert "WindowGroupLimit" in plan


def test_qsk_guards(spark):
    df = spark.range(10).select(F.col("id").cast("double").alias("v"))
    with pytest.raises(ValueError):
        quantile_sketch(df, "v", None, k=1)
    sk = quantile_sketch(df, "v", None, k=8, sample_by="v")
    with pytest.raises(ValueError):
        quantile_estimate(sk, [])
    with pytest.raises(ValueError):
        quantile_estimate(sk, [1.5])


# ---------------------------------------------------------------------------
# NULL handling + portability guards (review findings)
# ---------------------------------------------------------------------------


def test_kmv_hll_ignore_nulls(spark):
    base = spark.range(100).select(F.col("id").alias("v"))
    with_nulls = base.union(
        spark.range(5).select(F.lit(None).cast("long").alias("v"))
    )
    assert (
        kmv_distinct(base, "v", None, k=64).collect()[0].est_distinct
        == kmv_distinct(with_nulls, "v", None, k=64).collect()[0].est_distinct
    )
    assert (
        hll_distinct(base, "v", None, p=10).collect()[0].est_distinct
        == hll_distinct(with_nulls, "v", None, p=10).collect()[0].est_distinct
    )


def test_cm_sketch_ignores_nulls(spark):
    from pinecone_datasets_spark.operators.sketch import cm_sketch

    base = spark.range(100).select((F.col("id") % 10).alias("v"))
    with_nulls = base.union(
        spark.range(7).select(F.lit(None).cast("long").alias("v"))
    )
    a = sorted(map(tuple, cm_sketch(base, "v", depth=2, width=32).collect()))
    b = sorted(
        map(tuple, cm_sketch(with_nulls, "v", depth=2, width=32).collect())
    )
    assert a == b


def test_qsk_rejects_float_value_without_sample_by(spark):
    # double->string casts format differently across engines; the
    # default hash basis must refuse the silent divergence
    df = spark.range(10).select(F.col("id").cast("double").alias("v"))
    with pytest.raises(ValueError, match="sample_by"):
        quantile_sketch(df, "v", None, k=8)
    # fine with an explicit portable key, or a non-float value column
    quantile_sketch(df, "v", None, k=8, sample_by="v")  # explicit opt-in
    ints = spark.range(10).select(F.col("id").alias("v"))
    quantile_sketch(ints, "v", None, k=8)


def test_pagerank_empty_edges_returns_empty(spark):
    """r11 review: zero edge rows crashed with ZeroDivisionError on
    the driver."""
    from pinecone_datasets_spark.operators.graph import pagerank

    empty = spark.createDataFrame([], "src long, dst long")
    out = pagerank(empty, iterations=1)
    assert out.columns == ["node", "rank"]
    assert out.count() == 0

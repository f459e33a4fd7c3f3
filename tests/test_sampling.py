"""Deterministic sampling/splitting operators (operators/sampling.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pinecone_datasets_spark.operators.sampling import (
    SPLIT_BUCKETS,
    cap_per_group,
    deterministic_sample,
    hash_split,
    split_bucket,
    stratified_sample_exact,
)

from conftest import TESTDATA


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{TESTDATA}/documents.parquet")


def test_hash_split_disjoint_exhaustive_and_proportional(spark, docs):
    out = hash_split(
        docs, {"train": 0.8, "val": 0.1, "test": 0.1}, key_col="doc_id"
    )
    counts = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    total = docs.count()
    assert sum(counts.values()) == total  # exhaustive, disjoint
    assert set(counts) == {"train", "val", "test"}
    # 500 docs: expect roughly 400/50/50, tolerate hash variance.
    assert counts["train"] > 0.65 * total
    assert counts["val"] + counts["test"] < 0.35 * total


def test_hash_split_stable_under_repartition_and_subset(spark, docs):
    weights = {"train": 0.9, "test": 0.1}
    a = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs, weights).select("doc_id", "split").collect()
    }
    shuffled = docs.repartition(7, "lang")
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(shuffled, weights)
        .select("doc_id", "split")
        .collect()
    }
    assert a == b
    # Assignment is a pure function of the key: a subset sees the same
    # splits (df.sample() fails this — per-partition seeding).
    sub = docs.where(F.col("doc_id") % 3 == 0)
    c = {
        r["doc_id"]: r["split"]
        for r in hash_split(sub, weights).select("doc_id", "split").collect()
    }
    assert c == {k: v for k, v in a.items() if k % 3 == 0}


def test_hash_split_rejects_bad_weights(docs):
    with pytest.raises(ValueError):
        hash_split(docs, {})
    with pytest.raises(ValueError):
        hash_split(docs, {"train": 1.0, "bad": -0.1})


def test_deterministic_sample_nested_and_sized(spark, docs):
    small = deterministic_sample(docs, 0.05, seed=7)
    big = deterministic_sample(docs, 0.20, seed=7)
    small_ids = {r["doc_id"] for r in small.select("doc_id").collect()}
    big_ids = {r["doc_id"] for r in big.select("doc_id").collect()}
    assert small_ids <= big_ids  # nested ladder at a fixed seed
    n = docs.count()
    assert 0.01 * n <= len(small_ids) <= 0.12 * n
    assert 0.10 * n <= len(big_ids) <= 0.32 * n


def test_split_bucket_matches_duckdb(spark, docs):
    """The portable-md5 bucket must be bit-identical to the SQL twin the
    q45-q47 oracles use."""
    import duckdb

    got = {
        r["doc_id"]: r["b"]
        for r in docs.select(
            "doc_id", split_bucket("doc_id", seed=42).alias("b")
        ).collect()
    }
    con = duckdb.connect()
    want = dict(
        con.execute(
            f"""
            SELECT doc_id,
                   ('0x' || substr(md5('42|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                   % {SPLIT_BUCKETS} AS b
            FROM '{TESTDATA}/documents.parquet'
            """
        ).fetchall()
    )
    assert got == want


def test_cap_per_group_truncates_best_first(spark, docs):
    capped = cap_per_group(
        docs,
        "source",
        3,
        order_by=[F.col("n_chars").desc(), F.col("doc_id")],
    )
    per = {
        r["source"]: r["n"]
        for r in capped.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert all(n <= 3 for n in per.values())
    # best-first: kept rows are the 3 longest docs of each source
    one_source = docs.where(F.col("source") == "web")
    want = [
        r["doc_id"]
        for r in one_source.orderBy(
            F.col("n_chars").desc(), F.col("doc_id")
        ).limit(3).collect()
    ]
    got = [
        r["doc_id"]
        for r in capped.where(F.col("source") == "web")
        .orderBy(F.col("n_chars").desc(), F.col("doc_id"))
        .collect()
    ]
    assert got == want


def test_cap_per_group_plans_window_group_limit(spark, docs):
    plan = cap_per_group(
        docs, "source", 5, order_by=[F.col("doc_id")]
    )._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_stratified_sample_exact_counts(spark, docs):
    out = stratified_sample_exact(docs, "lang", 4, seed=11)
    sizes = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    full = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert sizes == {k: min(4, v) for k, v in full.items()}
    # deterministic across invocations
    again = stratified_sample_exact(docs, "lang", 4, seed=11)
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


# ---------------------------------------------------------------------------
# weighted_sample (Efraimidis–Spirakis A-ES with hash-derived uniforms)
# ---------------------------------------------------------------------------


def _py_es_selection(rows, n, seed, group=None):
    """Pure-Python replay of the A-ES formula (hash_unit + ln(u)/w)."""
    import hashlib
    import math

    def es_key(doc_id, w):
        h = int(
            hashlib.md5(f"{seed}|{doc_id}".encode()).hexdigest()[:8], 16
        )
        u = (h + 0.5) / 4294967296.0
        return math.log(u) / w

    pools = {}
    for r in rows:
        if r["n_chars"] is None or r["n_chars"] <= 0:
            continue
        g = r[group] if group else None
        pools.setdefault(g, []).append(r)
    picked = set()
    for g, pool in pools.items():
        pool.sort(key=lambda r: (-es_key(r["doc_id"], r["n_chars"]), r["doc_id"]))
        picked.update(r["doc_id"] for r in pool[:n])
    return picked


def test_weighted_sample_matches_formula_global_and_grouped(spark, docs):
    from pinecone_datasets_spark.operators.sampling import weighted_sample

    rows = docs.select("doc_id", "n_chars", "source").collect()
    for seed in (7, 42):
        got = {
            r["doc_id"]
            for r in weighted_sample(
                docs, 20, "n_chars", seed=seed
            ).collect()
        }
        assert got == _py_es_selection(rows, 20, seed)
        got_g = {
            r["doc_id"]
            for r in weighted_sample(
                docs, 5, "n_chars", group_cols="source", seed=seed
            ).collect()
        }
        assert got_g == _py_es_selection(rows, 5, seed, group="source")


def test_weighted_sample_proportional_to_weight():
    """Formula-level check (no Spark): over many seeds, an item with 9x
    the weight is picked ~9x as often for n=1."""
    import hashlib
    import math

    items = {"heavy": 9.0, "a": 1.0, "b": 1.0, "c": 1.0}
    wins = dict.fromkeys(items, 0)
    for seed in range(2000):
        best, best_key = None, -math.inf
        for k, w in items.items():
            h = int(hashlib.md5(f"{seed}|{k}".encode()).hexdigest()[:8], 16)
            u = (h + 0.5) / 4294967296.0
            key = math.log(u) / w
            if key > best_key:
                best, best_key = k, key
        wins[best] += 1
    # expected heavy share = 9/12 = 0.75; binomial sd ~ 0.0097
    assert 0.70 < wins["heavy"] / 2000 < 0.80, wins


def test_weighted_sample_excludes_nonpositive_and_validates(spark):
    from pinecone_datasets_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, None), (5, 2.0)],
        "doc_id long, n_chars double",
    )
    got = {r["doc_id"] for r in weighted_sample(df, 10, "n_chars").collect()}
    assert got == {1, 5}
    with pytest.raises(ValueError):
        weighted_sample(df, 0, "n_chars")


def test_weighted_sample_grouped_plans_window_group_limit(spark, docs):
    from pinecone_datasets_spark.operators.sampling import weighted_sample

    plan = (
        weighted_sample(docs, 5, "n_chars", group_cols="source")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan


# ---------------------------------------------------------------------------
# leakage_safe_split (duplicates never straddle train/test)
# ---------------------------------------------------------------------------


def test_leakage_split_group_path_keeps_dups_together(spark, docs):
    from pinecone_datasets_spark.operators.sampling import (
        leakage_safe_split,
    )

    # planted exact dups: same text under a shifted id
    dup = docs.where(F.col("doc_id") % 5 == 0).withColumn(
        "doc_id", F.col("doc_id") + 4_000_000
    )
    corpus = docs.unionByName(dup).withColumn(
        "fp", F.md5(F.col("text"))
    )
    out = leakage_safe_split(
        corpus, {"train": 0.7, "test": 0.3}, group_col="fp", seed=3
    )
    per_group = (
        out.groupBy("fp")
        .agg(F.countDistinct("split").alias("n_splits"))
        .collect()
    )
    assert all(r["n_splits"] == 1 for r in per_group)
    # both splits populated and roughly proportional
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    total = sum(counts.values())
    assert 0.55 < counts["train"] / total < 0.85


def test_leakage_split_pair_path_respects_chains(spark):
    from pinecone_datasets_spark.operators.sampling import (
        leakage_safe_split,
    )

    df = spark.createDataFrame(
        [(i,) for i in range(1, 9)], "doc_id long"
    )
    # chain 1-2-3 plus pair 5-6; 4, 7, 8 are singletons
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    out = {
        r["doc_id"]: r["split"]
        for r in leakage_safe_split(
            df, {"a": 0.5, "b": 0.5}, dup_pairs=pairs, seed=9
        ).collect()
    }
    assert out[1] == out[2] == out[3]
    assert out[5] == out[6]
    assert len(out) == 8


def test_leakage_split_no_groups_equals_hash_split(spark, docs):
    from pinecone_datasets_spark.operators.sampling import (
        hash_split,
        leakage_safe_split,
    )

    a = {
        (r["doc_id"], r["split"])
        for r in leakage_safe_split(
            docs, {"x": 0.6, "y": 0.4}, seed=2
        ).collect()
    }
    b = {
        (r["doc_id"], r["split"])
        for r in hash_split(docs, {"x": 0.6, "y": 0.4}, seed=2).collect()
    }
    assert a == b
    with pytest.raises(ValueError):
        leakage_safe_split(
            docs, {"x": 1.0}, dup_pairs=docs, group_col="lang"
        )


def test_weighted_sample_excludes_nan_weights(spark):
    """NaN weights pass `w > 0` in Spark (NaN compares greater) and
    sort FIRST under desc — unfiltered they deterministically crowd out
    every legitimate row (r10 review)."""
    from pinecone_datasets_spark.operators.sampling import (
        weighted_sample,
    )

    df = spark.createDataFrame(
        [(1, float("nan")), (2, float("nan")), (3, 1.0), (4, 2.0)],
        "doc_id long, w double",
    )
    got = {r["doc_id"] for r in weighted_sample(df, 2, "w").collect()}
    assert got == {3, 4}


def test_leakage_safe_split_null_groups_stay_independent(spark):
    """Rows with a NULL group label are their OWN group: collapsing
    them into one window partition routed the entire unlabeled majority
    into a single split (r10 review)."""
    from pinecone_datasets_spark.operators.sampling import (
        leakage_safe_split,
    )

    rows = [(i, None) for i in range(200)] + [(1000, "g"), (1001, "g")]
    df = spark.createDataFrame(rows, "doc_id long, fp string")
    out = leakage_safe_split(
        df, {"train": 0.5, "test": 0.5}, group_col="fp"
    )
    by_split = {
        r["split"]: r["n"]
        for r in out.groupBy("split").count().withColumnRenamed(
            "count", "n"
        ).collect()
    }
    # unlabeled rows spread over BOTH splits (they would all land in
    # one if NULLs collapsed into a shared group)
    assert len(by_split) == 2 and min(by_split.values()) >= 50
    # the labeled pair still travels together
    g = {r["split"] for r in out.where("fp = 'g'").collect()}
    assert len(g) == 1

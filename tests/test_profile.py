"""One-pass dataset profiler (operators/profile.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pinecone_datasets_spark.operators.profile import (
    profile_dataset,
    profile_sql,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_profile_values(spark, docs):
    out = {r.column: r for r in profile_dataset(
        docs, ["doc_id", "lang", "n_chars"], p=12
    ).collect()}
    n = docs.count()
    assert set(out) == {"doc_id", "lang", "n_chars"}
    for r in out.values():
        assert r.n_rows == n and r.n_nulls == 0 and r.null_frac == 0.0
    assert out["lang"].min_str == "de" and out["lang"].max_str == "zh"
    assert out["lang"].est_distinct == pytest.approx(5, abs=1)
    assert out["doc_id"].est_distinct == pytest.approx(n, rel=0.1)


def test_profile_nulls_and_empty_column(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None), (4, "b")], "id long, s string"
    )
    out = {r.column: r for r in profile_dataset(df, ["id", "s"]).collect()}
    assert out["s"].n_nulls == 2 and out["s"].null_frac == 0.5
    # NULLs excluded from distinct (LC estimate of 2 at p=12 ~ 2.0005)
    assert out["s"].est_distinct == pytest.approx(2.0, abs=0.01)
    allnull = spark.createDataFrame([(None,), (None,)], "x string")
    r = profile_dataset(allnull, ["x"]).collect()[0]
    assert r.n_nulls == 2 and r.est_distinct == 0.0
    assert r.min_str is None and r.max_str is None


def test_profile_default_excludes_complex_and_float(spark):
    # float/double excluded by default: their string casts are not
    # engine-portable (Java '1.0E7' vs DuckDB '10000000.0'), so the
    # oracle-replayable default set skips them (ADVICE r5).
    df = spark.createDataFrame(
        [(1, [1.0, 2.0], "t", 1.5, 2.5)],
        "id long, vec array<double>, s string, d double, f float",
    )
    cols = [r.column for r in profile_dataset(df).collect()]
    assert cols == ["id", "s"]
    # explicit opt-in still works
    cols = [r.column for r in profile_dataset(df, ["id", "d"]).collect()]
    assert cols == ["d", "id"]


def test_profile_guards(spark, docs):
    with pytest.raises(ValueError, match="not in frame"):
        profile_dataset(docs, ["nope"])
    with pytest.raises(ValueError, match="no columns"):
        profile_sql([], "documents")


def test_profile_duckdb_twin(spark, docs):
    import duckdb

    cols = ["doc_id", "lang", "source", "n_chars"]
    got = [tuple(r) for r in profile_dataset(docs, cols, p=10).collect()]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    want = [tuple(r) for r in con.execute(
        profile_sql(cols, "documents", p=10)
    ).fetchall()]
    assert got == want

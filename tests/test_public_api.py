"""Module-level convenience API (C4) + error paths."""

from __future__ import annotations

import json

import pytest

import pinecone_datasets_spark.public as public
from pinecone_datasets_spark import Catalog, list_datasets, load_dataset
from pinecone_datasets_spark.cfg import CATALOG_BASE_PATH_ENV


@pytest.fixture()
def catalog_env(spark, tmp_path, monkeypatch):
    import pandas as pd

    ds_dir = tmp_path / "pub-ds"
    (ds_dir / "documents").mkdir(parents=True)
    pd.DataFrame({"id": ["1"], "values": [[0.5, 0.5]]}).to_parquet(
        ds_dir / "documents" / "part-0.parquet", index=False
    )
    (ds_dir / "metadata.json").write_text(
        json.dumps(
            {
                "name": "pub-ds",
                "documents": 1,
                "queries": 0,
                "dense_model": {"name": "m", "dimension": 2},
            }
        )
    )
    monkeypatch.setenv(CATALOG_BASE_PATH_ENV, str(tmp_path))
    # reset the module singleton so the env var takes effect
    monkeypatch.setattr(public, "_global_catalog", None)
    return str(tmp_path)


def test_env_var_base_path_and_singleton(spark, catalog_env):
    """Reference catalog.py:30-35 / public.py parity: env-var base path,
    lazily constructed global catalog."""
    names = list_datasets(spark=spark)
    assert names == ["pub-ds"]
    ds = load_dataset("pub-ds", spark=spark)
    assert ds.documents.count() == 1


def test_corrupt_parquet_raises(spark, tmp_path):
    """Reference test_fsreader_errors.py:146-181 parity: corrupt part file
    surfaces as a read error, not silence."""
    from pinecone_datasets_spark import Dataset

    base = tmp_path / "corrupt"
    ddir = base / "documents"
    ddir.mkdir(parents=True)
    (ddir / "part-0.parquet").write_bytes(b"this is not parquet at all")
    (base / "metadata.json").write_text(
        json.dumps(
            {
                "name": "corrupt",
                "documents": 1,
                "queries": 0,
                "dense_model": {"name": "m", "dimension": 2},
            }
        )
    )
    ds = Dataset.from_path(spark, str(base))
    with pytest.raises(Exception):
        ds.documents.count()


def test_save_requires_name(spark, tmp_path):
    from pinecone_datasets_spark import Dataset, DatasetMetadata, DenseModelMetadata
    import pandas as pd

    meta = DatasetMetadata(
        name="x",
        documents=1,
        queries=0,
        dense_model=DenseModelMetadata(name="m", dimension=2),
    )
    ds = Dataset.from_dataframe(
        spark, pd.DataFrame({"id": ["1"], "values": [[0.1, 0.2]]}), meta
    )
    ds.metadata.name = ""
    cat = Catalog(spark, base_path=str(tmp_path))
    with pytest.raises(ValueError, match="name"):
        cat.save_dataset(ds)


def test_catalog_skips_malformed_metadata_json(spark, tmp_path):
    """Reference catalog.py:50-55 parity: a dataset dir whose
    metadata.json is not valid JSON is warned about and skipped — the
    rest of the catalog still lists."""
    import warnings as _warnings

    good = tmp_path / "good-ds"
    good.mkdir()
    (good / "metadata.json").write_text(
        json.dumps(
            {
                "name": "good-ds",
                "documents": 1,
                "queries": 0,
                "dense_model": {"name": "m", "dimension": 2},
            }
        )
    )
    bad = tmp_path / "bad-ds"
    bad.mkdir()
    (bad / "metadata.json").write_text("{not json at all::")
    cat = Catalog(spark, base_path=str(tmp_path))
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        names = cat.list_datasets()
    assert names == ["good-ds"]
    assert any("bad-ds" in str(w.message) for w in caught)


def _make_catalog_dirs(base, n):
    for i in range(n):
        d = base / f"ds{i:04d}"
        d.mkdir()
        (d / "metadata.json").write_text(
            json.dumps(
                {
                    "name": f"ds{i:04d}",
                    "documents": i,
                    "queries": 0,
                    "dense_model": {"name": "m", "dimension": 2},
                }
            )
        )


def test_catalog_parallel_listing_matches_driver_loop(spark, tmp_path):
    """r10 verdict item 7: the distributed whole-file listing path must
    produce the identical catalog as the sequential driver loop — same
    names, same skip-invalid-with-warning semantics — at a 1k-dataset
    catalog (the scale class where object-store serial round-trips make
    the parallel path matter)."""
    import warnings as _warnings

    _make_catalog_dirs(tmp_path, 1000)
    (tmp_path / "broken").mkdir()
    (tmp_path / "broken" / "metadata.json").write_text("{oops::")

    seq = Catalog(spark, base_path=str(tmp_path))
    par = Catalog(spark, base_path=str(tmp_path))
    with _warnings.catch_warnings(record=True) as w_seq:
        _warnings.simplefilter("always")
        seq.load(parallel=False)
    with _warnings.catch_warnings(record=True) as w_par:
        _warnings.simplefilter("always")
        par.load(parallel=True)
    assert sorted(seq.list_datasets()) == sorted(par.list_datasets())
    assert len(seq.list_datasets()) == 1000
    # the malformed entry warned (not raised) on BOTH paths
    assert any("Not a valid dataset" in str(x.message) for x in w_seq)
    assert any("Not a valid dataset" in str(x.message) for x in w_par)


def test_catalog_auto_stays_sequential_on_local_paths(spark, tmp_path, monkeypatch):
    """Measured at 10k datasets (BASELINE.md): the driver loop reads
    ~28k local files/s while the Spark job pays ~25 s of
    listing/scheduling overhead — auto mode must NOT pick the parallel
    path for local catalogs, whatever their size."""
    from pinecone_datasets_spark import catalog as catmod

    _make_catalog_dirs(tmp_path, 5)
    monkeypatch.setattr(catmod, "_PARALLEL_LIST_THRESHOLD", 2)

    def _boom(self, paths):
        raise AssertionError("parallel path selected for a local catalog")

    monkeypatch.setattr(
        catmod.Catalog, "_read_metadata_parallel", _boom
    )
    cat = catmod.Catalog(spark, base_path=str(tmp_path))
    assert len(cat.load().list_datasets()) == 5


def test_retry_attempts_env_clamped_to_one(monkeypatch):
    """r11 review: PINECONE_DATASETS_MAX_RETRY_ATTEMPTS=0 skipped the
    retry loop and raised a bare TypeError (raise None) without ever
    calling the function."""
    from pinecone_datasets_spark import retry as retry_mod

    monkeypatch.setenv(retry_mod.ENV_MAX_ATTEMPTS, "0")
    calls = []

    @retry_mod.with_retry
    def fn():
        calls.append(1)
        return 42

    assert fn() == 42
    assert calls == [1]


def test_anonymous_access_prefix_boundary(spark):
    """r11 review: a bare startswith matched sibling buckets whose
    name merely shares the public endpoint's prefix."""
    from pinecone_datasets_spark.cfg import DEFAULT_CATALOG_BASE_PATH
    from pinecone_datasets_spark.fs import ensure_anonymous_access

    sibling = DEFAULT_CATALOG_BASE_PATH.rstrip("/") + "-backup/x"
    assert ensure_anonymous_access(spark, sibling) is False


def test_get_catalog_prefers_explicit_fresh_session(spark):
    """r11 review: the module-level catalog cache ignored an
    explicitly passed SparkSession once populated."""
    from pinecone_datasets_spark import public as pub

    c1 = pub._get_catalog(spark)
    assert pub._get_catalog(spark) is c1  # same live session: cached
    # a DIFFERENT explicitly-passed session must not get c1 back;
    # simulate by planting a catalog bound to a sentinel object
    class _DeadCtx:
        _jsc = None

    class _DeadSpark:
        sparkContext = _DeadCtx()

    c1_backup = pub._global_catalog
    try:
        pub._global_catalog = type(c1)(spark, base_path=c1.base_path)
        pub._global_catalog._spark = _DeadSpark()  # stale session
        c2 = pub._get_catalog(spark)
        assert c2._spark is spark  # stale cache discarded
    finally:
        pub._global_catalog = c1_backup


def test_catalog_parallel_failure_falls_back_to_driver_loop(
    spark, tmp_path, monkeypatch
):
    """r11 ADVICE: the distributed catalog read fails the WHOLE job on
    any per-file error other than vanished files, while the driver loop
    warns and skips per file. A forced-parallel load whose Spark job
    dies must degrade to the driver loop, not error."""
    from pinecone_datasets_spark import catalog as catmod

    _make_catalog_dirs(tmp_path, 4)

    def _boom(self, paths):
        raise RuntimeError("simulated object-store job failure")

    monkeypatch.setattr(catmod.Catalog, "_read_metadata_parallel", _boom)
    cat = catmod.Catalog(spark, base_path=str(tmp_path))
    import warnings

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        names = cat.load(parallel=True).list_datasets()
    assert len(names) == 4
    assert any("falling back" in str(x.message) for x in w)

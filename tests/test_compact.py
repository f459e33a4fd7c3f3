"""Small-file compaction and range-clustered rewrite."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from pinecone_datasets_spark.operators.compact import (
    compact_parquet_dir,
    plan_file_count,
)


def _parquet_files(path):
    return sorted(
        f for f in os.listdir(path) if f.endswith(".parquet")
    )


@pytest.fixture()
def fragmented_dir(spark, tmp_path):
    out = str(tmp_path / "frag")
    # 40 tiny files of 25 rows each
    spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("grp")
    ).repartition(40).write.parquet(out)
    assert len(_parquet_files(out)) == 40
    return out

def test_plan_file_count():
    assert plan_file_count(0, 100) == 1
    assert plan_file_count(1, 100) == 1
    assert plan_file_count(100, 100) == 1
    assert plan_file_count(101, 100) == 2
    with pytest.raises(ValueError):
        plan_file_count(10, 0)


def test_compact_reduces_files_preserves_rows(spark, fragmented_dir):
    before = {
        r["id"] for r in spark.read.parquet(fragmented_dir).collect()
    }
    total = sum(
        os.path.getsize(os.path.join(fragmented_dir, f))
        for f in _parquet_files(fragmented_dir)
    )
    # target half the total -> exactly 2 files
    n = compact_parquet_dir(
        spark, fragmented_dir, target_file_bytes=(total + 1) // 2
    )
    assert n == 2
    assert len(_parquet_files(fragmented_dir)) == 2
    after = {
        r["id"] for r in spark.read.parquet(fragmented_dir).collect()
    }
    assert after == before
    # no leftover temp/backup dirs
    parent = os.path.dirname(fragmented_dir)
    assert os.listdir(parent) == [os.path.basename(fragmented_dir)]


def test_compact_clustered_files_do_not_overlap(spark, fragmented_dir):
    total = sum(
        os.path.getsize(os.path.join(fragmented_dir, f))
        for f in _parquet_files(fragmented_dir)
    )
    n = compact_parquet_dir(
        spark,
        fragmented_dir,
        target_file_bytes=(total + 3) // 4,
        cluster_by="id",
    )
    assert n >= 3
    # range clustering: per-file [min,max] of `id` must be disjoint,
    # which is what lets parquet stats prune whole files on id ranges
    spans = []
    for f in _parquet_files(fragmented_dir):
        t = pq.read_table(
            os.path.join(fragmented_dir, f), columns=["id"]
        )
        ids = t["id"].to_pylist()
        if ids:
            spans.append((min(ids), max(ids)))
    spans.sort()
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi < lo


def test_compact_empty_dir_raises(spark, tmp_path):
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(ValueError, match="No parquet files"):
        compact_parquet_dir(spark, str(empty))


def test_compact_recovers_from_stale_backup_and_stranded_data(
    spark, tmp_path
):
    """r11 review: a crash between the two swap renames stranded the
    data in __pre_compact (nothing at the live path, next run raised
    'No parquet files'); a crash after the swap left a stale backup
    that wedged every later run with ENOTEMPTY."""
    import os
    import shutil

    from pinecone_datasets_spark.operators.compact import compact_parquet_dir

    path = str(tmp_path / "tbl")
    spark.range(100).repartition(8).write.parquet(path)

    # simulate crash-between-renames: data only in __pre_compact
    os.rename(path, path + "__pre_compact")
    n = compact_parquet_dir(spark, path, target_file_bytes=1 << 30)
    assert n >= 1
    assert spark.read.parquet(path).count() == 100
    assert not os.path.exists(path + "__pre_compact")

    # simulate crash-after-swap: stale backup next to a live dir
    shutil.copytree(path, path + "__pre_compact")
    n = compact_parquet_dir(spark, path, target_file_bytes=1 << 30)
    assert n >= 1
    assert spark.read.parquet(path).count() == 100
    assert not os.path.exists(path + "__pre_compact")

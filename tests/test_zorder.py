"""Z-order clustering: morton math + multi-dim file pruning
(operators/zorder.py)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from pinecone_datasets_spark.operators.zorder import (
    interleave_bits,
    write_zordered,
    zorder_sql,
    zorder_value,
)


def test_interleave_known_values(spark):
    # morton(3, 5) with bits=3: x=0b011, y=0b101 -> z=0b100111 = 39
    df = spark.createDataFrame([(3, 5)], schema="x long, y long")
    z = df.select(interleave_bits(["x", "y"], bits=3).alias("z"))
    assert z.collect()[0].z == 39


def test_interleave_matches_python_reference(spark):
    rows = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(rows, schema="x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", interleave_bits(["x", "y"], bits=3).alias("z")
        ).collect()
    }

    def ref(x, y):
        z = 0
        for i in range(3):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    assert got == {(x, y): ref(x, y) for x, y in rows}
    # the morton code is a bijection on the grid
    assert len(set(got.values())) == 64


def test_interleave_sql_twin_agrees(spark):
    import duckdb

    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, schema="x long, y long")
    got = sorted(
        tuple(r)
        for r in df.select(
            "x", "y", interleave_bits(["x", "y"], bits=4).alias("z")
        ).collect()
    )
    sql = zorder_sql(["x", "y"], bits=4)
    want = sorted(
        duckdb.sql(
            "SELECT x, y, "
            + sql
            + " AS z FROM (SELECT unnest(range(16)) x) a, "
            "(SELECT unnest(range(16)) y) b"
        ).fetchall()
    )
    assert got == want


def test_interleave_budget_guard(spark):
    with pytest.raises(ValueError, match="62-bit"):
        interleave_bits(["a", "b", "c"], bits=21)
    with pytest.raises(ValueError, match="at least 2"):
        interleave_bits(["a"], bits=4)


def test_zorder_value_bucketizes_with_bounds(spark):
    df = spark.createDataFrame(
        [(0.0, 0.0), (1.0, 1.0)], schema="a double, b double"
    )
    out = zorder_value(
        df, ["a", "b"], bits=4, bounds={"a": (0, 1), "b": (0, 1)}
    ).collect()
    zs = sorted(r.zval for r in out)
    assert zs[0] == 0  # (min,min) -> bucket (0,0)
    assert zs[1] == (1 << 8) - 1  # (max,max) -> all 8 low bits set


def _candidate_files(path: str, col: str, lo, hi) -> int:
    """Files whose parquet min/max for ``col`` overlaps [lo, hi]."""
    n = 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        fmin = min(
            md.row_group(i).column(
                [md.schema.column(j).name for j in range(md.num_columns)].index(col)
            ).statistics.min
            for i in range(md.num_row_groups)
        )
        fmax = max(
            md.row_group(i).column(
                [md.schema.column(j).name for j in range(md.num_columns)].index(col)
            ).statistics.max
            for i in range(md.num_row_groups)
        )
        if fmax >= lo and fmin <= hi:
            n += 1
    return n


def test_zordered_layout_prunes_both_dims(spark, tmp_path):
    # 64x64 grid; z-order with 16 files = 16x16 blocks: a 1/4-wide slice
    # on EITHER dim should overlap only 1/4 of the files.
    df = spark.range(4096).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    zpath = str(tmp_path / "zord")
    write_zordered(
        df, zpath, ["x", "y"], n_files=16, bits=6,
        bounds={"x": (0, 63), "y": (0, 63)},
    )
    files = glob.glob(f"{zpath}/*.parquet")
    assert len(files) == 16

    x_hits = _candidate_files(zpath, "x", 0, 15)
    y_hits = _candidate_files(zpath, "y", 0, 15)
    assert x_hits <= 6, x_hits  # ~4 of 16 under perfect alignment
    assert y_hits <= 6, y_hits

    # contrast: single-column clustering prunes x but NOT y
    xpath = str(tmp_path / "xonly")
    df.repartitionByRange(16, "x").write.parquet(xpath)
    assert _candidate_files(xpath, "y", 0, 15) == 16


def test_write_zordered_roundtrip_is_lossless(spark, tmp_path):
    df = spark.range(1000).select(
        (F.col("id") % 10).alias("x"), (F.col("id") % 97).alias("y")
    )
    path = str(tmp_path / "z2")
    write_zordered(df, path, ["x", "y"], n_files=4, bits=8)
    back = spark.read.parquet(path)
    assert back.count() == 1000
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in df.collect()
    )


def test_zorder_all_null_column_treated_as_constant(spark):
    """r11 review: an all-NULL clustered column collected (None, None)
    bounds and float(None) raised an opaque TypeError."""
    from pinecone_datasets_spark.operators.zorder import zorder_value

    df = spark.createDataFrame(
        [(1, None), (5, None), (9, None)], "a long, b double"
    )
    out = zorder_value(df, ["a", "b"]).collect()
    assert len(out) == 3
    zv = {r["a"]: r["zval"] for r in out}
    assert zv[1] < zv[5] < zv[9]  # 'a' still orders; 'b' constant

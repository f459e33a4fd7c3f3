"""Pinecone filter compiler tests — compiled Column vs a Python oracle."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from pinecone_datasets_spark.functions.filters import compile_filter

ROWS = [
    {"genre": "drama", "year": 2020, "rating": 8.5, "flagged": True},
    {"genre": "comedy", "year": 2015, "rating": 6.1, "flagged": False},
    {"genre": "drama", "year": 1999, "rating": 9.0},
    {"genre": "action", "year": 2023},
    {},
]


@pytest.fixture(scope="module")
def meta_df(spark):
    return spark.createDataFrame(
        [(i, json.dumps(r)) for i, r in enumerate(ROWS)],
        schema="i int, metadata string",
    ).cache()


def ids(df):
    return sorted(r["i"] for r in df.collect())


CASES = [
    ({"genre": {"$eq": "drama"}}, [0, 2]),
    ({"genre": "drama"}, [0, 2]),  # implicit $eq
    ({"genre": {"$ne": "drama"}}, [1, 3]),  # $ne requires field present
    ({"year": {"$gt": 2015}}, [0, 3]),
    ({"year": {"$gte": 2015}}, [0, 1, 3]),
    ({"year": {"$lt": 2015}}, [2]),
    ({"year": {"$lte": 2015}}, [1, 2]),
    ({"genre": {"$in": ["drama", "action"]}}, [0, 2, 3]),
    ({"genre": {"$nin": ["drama", "action"]}}, [1]),
    ({"rating": {"$exists": True}}, [0, 1, 2]),
    ({"rating": {"$exists": False}}, [3, 4]),
    ({"flagged": {"$eq": True}}, [0]),
    ({"genre": "drama", "year": {"$gt": 2000}}, [0]),  # multi-key AND
    ({"$and": [{"genre": "drama"}, {"rating": {"$gte": 9.0}}]}, [2]),
    ({"$or": [{"genre": "comedy"}, {"year": {"$gt": 2022}}]}, [1, 3]),
    (
        {"$or": [{"$and": [{"genre": "drama"}, {"year": {"$lt": 2000}}]}, {"flagged": True}]},
        [0, 2],
    ),
    (None, [0, 1, 2, 3, 4]),
    ({}, [0, 1, 2, 3, 4]),
]


@pytest.mark.parametrize("filt,expected", CASES)
def test_filter_cases(meta_df, filt, expected):
    out = meta_df.where(compile_filter(filt))
    assert ids(out) == expected


def test_filter_from_json_string(meta_df):
    out = meta_df.where(compile_filter('{"genre": {"$eq": "drama"}}'))
    assert ids(out) == [0, 2]


def test_in_empty_list(meta_df):
    assert ids(meta_df.where(compile_filter({"genre": {"$in": []}}))) == []


def test_unsupported_operator_raises():
    with pytest.raises(ValueError):
        compile_filter({"x": {"$regex": "a.*"}})


def test_no_udf_in_plan(meta_df):
    """The compiled filter must stay JVM-side (no BatchEvalPython)."""
    out = meta_df.where(compile_filter({"genre": "drama"}))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


STRICT_ROWS = [
    {"v": 3},            # 0: number
    {"v": "3"},          # 1: numeric-looking string
    {"v": 3.0},          # 2: float (JSON renders 3.0)
    {"v": True},         # 3: boolean
    {"v": None},         # 4: explicit JSON null
    {},                  # 5: absent
    {"v": "three"},      # 6: plain string
]


@pytest.fixture(scope="module")
def strict_df(spark):
    return spark.createDataFrame(
        [(i, json.dumps(r)) for i, r in enumerate(STRICT_ROWS)],
        schema="i int, metadata string",
    ).cache()


@pytest.mark.parametrize(
    "filt,default_ids,strict_ids",
    [
        # the documented text-extraction corner: number 3 vs string "3"
        ({"v": {"$eq": 3}}, [0, 1, 2], [0, 2]),
        # (3.0 extracts as the text "3.0", so it escapes the text-mode
        # coercion here; integer 3 does not)
        ({"v": {"$eq": "3"}}, [0, 1], [1]),
        ({"v": {"$in": [3]}}, [0, 1, 2], [0, 2]),
        # booleans never coerce in either mode
        ({"v": {"$eq": True}}, [3], [3]),
        ({"v": {"$eq": "three"}}, [6], [6]),
    ],
)
def test_strict_vs_default_typing(strict_df, filt, default_ids, strict_ids):
    assert ids(strict_df.where(compile_filter(filt))) == default_ids
    assert (
        ids(strict_df.where(compile_filter(filt, strict_types=True)))
        == strict_ids
    )


def test_strict_exists_treats_json_null_as_absent(strict_df):
    # text mode can't see the difference between null and absent either
    # way (get_json_object returns NULL for both), strict mode makes the
    # JSON-null row explicitly non-existent per Pinecone semantics
    out = strict_df.where(
        compile_filter({"v": {"$exists": True}}, strict_types=True)
    )
    assert ids(out) == [0, 1, 2, 3, 6]
    out2 = strict_df.where(
        compile_filter({"v": {"$exists": False}}, strict_types=True)
    )
    assert ids(out2) == [4, 5]


def test_strict_mode_stays_jvm_side(strict_df):
    plan = (
        strict_df.where(compile_filter({"v": 3}, strict_types=True))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan

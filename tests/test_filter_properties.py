"""Property-based equivalence: the compiled (Column) filter path and the
interpreted (Python) filter path must agree on random filters + metadata.

The reference has no property-based testing (SURVEY.md §5); hypothesis is
the right tool for a compiler with a combinatorial input space.
"""

from __future__ import annotations

import json

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pinecone_datasets_spark.functions.filters import compile_filter
from pinecone_datasets_spark.operators.search import _eval_filter

FIELDS = ["lang", "score", "year", "flag"]

scalar = st.one_of(
    st.sampled_from(["en", "de", "fr", "x"]),
    st.integers(min_value=-5, max_value=5),
    st.floats(min_value=-5, max_value=5, allow_nan=False, width=32).map(
        lambda f: round(f, 2)
    ),
    st.booleans(),
)

leaf_op = st.one_of(
    st.builds(lambda v: {"$eq": v}, scalar),
    st.builds(lambda v: {"$ne": v}, scalar),
    st.builds(lambda v: {"$gt": v}, st.integers(-5, 5)),
    st.builds(lambda v: {"$gte": v}, st.integers(-5, 5)),
    st.builds(lambda v: {"$lt": v}, st.integers(-5, 5)),
    st.builds(lambda v: {"$lte": v}, st.integers(-5, 5)),
    st.builds(lambda v: {"$in": v}, st.lists(scalar, max_size=3)),
    st.builds(lambda v: {"$nin": v}, st.lists(scalar, min_size=1, max_size=3)),
    st.builds(lambda v: {"$exists": v}, st.booleans()),
)

simple_filter = st.dictionaries(
    st.sampled_from(FIELDS), leaf_op, min_size=1, max_size=2
)

filters = st.recursive(
    simple_filter,
    lambda children: st.one_of(
        st.builds(lambda l: {"$and": l}, st.lists(children, min_size=1, max_size=2)),
        st.builds(lambda l: {"$or": l}, st.lists(children, min_size=1, max_size=2)),
    ),
    max_leaves=4,
)

metadata_doc = st.dictionaries(
    st.sampled_from(FIELDS), scalar, max_size=len(FIELDS)
)


@pytest.fixture(scope="module")
def rows_df(spark):
    # A fixed corpus of metadata docs the compiled path filters over;
    # hypothesis varies the FILTER, the corpus stays cached.
    docs = [
        {},
        {"lang": "en", "score": 3, "year": 2020, "flag": True},
        {"lang": "de", "score": -2.5, "year": 1999, "flag": False},
        {"lang": "fr", "score": 0},
        {"score": 4.25, "flag": True},
        {"lang": "x", "year": -3},
    ]
    df = spark.createDataFrame(
        [(i, json.dumps(d)) for i, d in enumerate(docs)],
        schema="i int, metadata string",
    ).cache()
    df.count()
    return df, docs


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(filt=filters)
def test_compiled_matches_interpreted(rows_df, filt):
    df, docs = rows_df
    compiled = sorted(
        r["i"] for r in df.where(compile_filter(filt)).collect()
    )
    interpreted = sorted(
        i for i, d in enumerate(docs) if _eval_filter(filt, d)
    )
    assert compiled == interpreted, f"filter={filt}"


@pytest.fixture(scope="module")
def corner_rows_df(spark):
    """Corpus that hits the typing corners: numeric strings, bool-vs-1,
    explicit nulls — where only strict (variant) extraction can agree
    with Python-dict semantics."""
    docs = [
        {},
        {"lang": "3", "score": 3, "flag": True},
        {"lang": "en", "score": "3", "flag": 1},
        {"score": 2.5, "year": "1999"},
        {"lang": "2.5", "score": False},
        {"lang": "x", "year": 0, "flag": False},
    ]
    df = spark.createDataFrame(
        [(i, json.dumps(d)) for i, d in enumerate(docs)],
        schema="i int, metadata string",
    ).cache()
    df.count()
    return df, docs


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(filt=filters)
def test_strict_compiled_matches_interpreted_on_corners(corner_rows_df, filt):
    df, docs = corner_rows_df
    compiled = sorted(
        r["i"]
        for r in df.where(compile_filter(filt, strict_types=True)).collect()
    )
    interpreted = sorted(
        i for i, d in enumerate(docs) if _eval_filter(filt, d)
    )
    assert compiled == interpreted, f"filter={filt}"

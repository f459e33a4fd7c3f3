"""As-of join and bucketed range join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pinecone_datasets_spark.operators.asof import asof_join
from pinecone_datasets_spark.operators.ranges import range_join


@pytest.fixture(scope="module")
def trades_quotes(spark):
    # epoch-µs longs keep expectations exact; key "sym" has an unmatched
    # trade (t=5, before any quote) and an exactly-equal timestamp match.
    trades = spark.createDataFrame(
        [
            ("a", 5, 1),
            ("a", 100, 2),
            ("a", 250, 3),
            ("b", 100, 4),
        ],
        schema="sym string, ts long, trade_id long",
    )
    quotes = spark.createDataFrame(
        [
            ("a", 50, 10, 1.0),
            ("a", 100, 11, 2.0),  # equal-ts: matches trade_id=2 inclusively
            ("a", 200, 12, 3.0),
            ("b", 90, 13, 4.0),
        ],
        schema="sym string, ts long, quote_id long, px double",
    )
    return trades, quotes


def test_asof_backward_inclusive(trades_quotes):
    trades, quotes = trades_quotes
    out = {
        r["trade_id"]: (r["quote_id_matched"], r["px_matched"])
        for r in asof_join(
            trades, quotes, on="sym", left_ts="ts", right_ts="ts",
            right_cols=["quote_id", "px"], tiebreak="quote_id",
        ).collect()
    }
    assert out == {
        1: (None, None),      # nothing at-or-before t=5
        2: (11, 2.0),         # inclusive equal-ts match beats t=50
        3: (12, 3.0),
        4: (13, 4.0),
    }


def test_asof_equal_ts_tiebreak(spark):
    # two right rows at the same ts: the larger tiebreak wins,
    # deterministically
    left = spark.createDataFrame(
        [("k", 100, 1)], schema="sym string, ts long, lid long"
    )
    right = spark.createDataFrame(
        [("k", 100, 7), ("k", 100, 9)],
        schema="sym string, ts long, rid long",
    )
    [row] = asof_join(
        left, right, on="sym", left_ts="ts", right_ts="ts",
        right_cols=["rid"],
    ).collect()
    assert row["rid_matched"] == 9


def test_asof_tolerance(trades_quotes):
    trades, quotes = trades_quotes
    out = {
        r["trade_id"]: r["quote_id_matched"]
        for r in asof_join(
            trades, quotes, on="sym", left_ts="ts", right_ts="ts",
            right_cols=["quote_id"], tolerance=F.lit(10),
        ).collect()
    }
    # only matches within 10µs survive: trade2@100←quote11@100 (gap 0),
    # trade4@100←quote13@90 (gap 10); trade3@250←quote12@200 exceeds it
    assert out == {1: None, 2: 11, 3: None, 4: 13}


def test_asof_no_cross_join_in_plan(trades_quotes):
    trades, quotes = trades_quotes
    plan = (
        asof_join(
            trades, quotes, on="sym", left_ts="ts", right_ts="ts",
            right_cols=["quote_id"],
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_join_matches_theta_join(spark):
    # bucketed plan ≡ the naive inequality join, across bucket boundaries
    left = spark.createDataFrame(
        [("u", t, t) for t in (0, 95, 100, 1000)],
        schema="k string, ts long, lid long",
    )
    right = spark.createDataFrame(
        [("u", t, t) for t in (0, 10, 99, 100, 101, 990, 2000)],
        schema="k string, ts long, rid long",
    )
    got = {
        (r["l_lid"], r["r_rid"])
        for r in range_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            lower_us=-10, upper_us=5,
        ).collect()
    }
    expected = {
        (lt, rt)
        for lt in (0, 95, 100, 1000)
        for rt in (0, 10, 99, 100, 101, 990, 2000)
        if lt - 10 <= rt <= lt + 5
    }
    assert got == expected


def test_range_join_no_nested_loop(spark):
    left = spark.createDataFrame(
        [("u", 0, 1)], schema="k string, ts long, lid long"
    )
    right = spark.createDataFrame(
        [("u", 0, 2)], schema="k string, ts long, rid long"
    )
    plan = (
        range_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            lower_us=-10, upper_us=10,
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_range_join_rejects_inverted_bounds(spark):
    df = spark.createDataFrame([("u", 0, 1)], "k string, ts long, i long")
    with pytest.raises(ValueError, match="lower_us"):
        range_join(df, df, on="k", left_ts="ts", right_ts="ts",
                   lower_us=5, upper_us=-5)


# ---------------------------------------------------------------------------
# Property-based: asof_join ≡ brute-force reference on random inputs
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_row = st.tuples(
    st.sampled_from(["a", "b"]),                 # key
    st.integers(min_value=0, max_value=50),      # ts
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lrows=st.lists(_row, min_size=1, max_size=12),
    rrows=st.lists(_row, min_size=0, max_size=12),
)
def test_asof_join_matches_bruteforce(spark, lrows, rrows):
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lrows)],
        schema="k string, ts long, lid long",
    )
    right = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(rrows)],
        schema="k string, ts long, rid long",
    ) if rrows else spark.createDataFrame([], "k string, ts long, rid long")

    got = {
        r["lid"]: r["rid_matched"]
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            right_cols=["rid"], tiebreak="rid",
        ).collect()
    }

    # brute force: latest right at-or-before, ties by max rid
    want = {}
    for i, (k, t) in enumerate(lrows):
        cands = [
            (rt, ri)
            for ri, (rk, rt) in enumerate(rrows)
            if rk == k and rt <= t
        ]
        want[i] = max(cands)[1] if cands else None
    assert got == want


def test_asof_right_frame_with_only_keys_and_ts(spark):
    """r11 review: right_cols defaults to [] when the right frame is
    just (key, ts) — 'when did this key last update?' — and
    right_cols[0] raised IndexError before any Spark work."""
    from pinecone_datasets_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 100), (1, 200)], "k long, lts long"
    )
    right = spark.createDataFrame(
        [(1, 50), (1, 150)], "k long, rts long"
    )
    out = {
        r["lts"]: r["rts_matched"]
        for r in asof_join(left, right, "k", "lts", "rts").collect()
    }
    assert out == {100: 50, 200: 150}, out


def test_range_join_accepts_float_bounds(spark):
    """r11 review: the docstring's own example passes lower=-300e6 (a
    float), which made the SQL div bucket expression fail analysis."""
    from pinecone_datasets_spark.operators.ranges import range_join

    left = spark.createDataFrame([(1, 1_000_000_000)], "k long, lts long")
    right = spark.createDataFrame(
        [(1, 800_000_000), (1, 1_200_000_000)], "k long, rts long"
    )
    out = range_join(
        left, right, "k", "lts", "rts", lower_us=-300e6, upper_us=0.0
    ).collect()
    assert len(out) == 1 and out[0]["r_rts_us"] == 800_000_000

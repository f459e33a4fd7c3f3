"""Property-based tests (hypothesis) for the portable sketch math —
pure-Python replays of the HLL register/estimator and the bottom-k
quantile sample, checked over arbitrary multisets without Spark (the
Spark/DuckDB twins are pinned to these formulas in
test_sketch_graph.py)."""

from __future__ import annotations

import hashlib
import math

from hypothesis import given, settings
from hypothesis import strategies as st

# --- pure replicas of the operators' hash/estimator math -------------------

_TWO_52 = float(1 << 52)


def _h52(v) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:13], 16)


def py_hll(values, p: int) -> float:
    m = 1 << p
    rmax = 52 - p + 1
    regs: dict[int, int] = {}
    for v in values:
        h = _h52(v)
        j = h & (m - 1)
        w = h >> p
        rho = rmax if w == 0 else rmax - w.bit_length()
        regs[j] = max(regs.get(j, 0), rho)
    s_int = sum(1 << (rmax - r) for r in regs.values())
    s_int += (m - len(regs)) * (1 << rmax)
    alpha = {4: 0.673, 5: 0.697, 6: 0.709}.get(
        p, 0.7213 / (1.0 + 1.079 / m)
    )
    e_raw = alpha * m * m * float(1 << rmax) / float(s_int)
    v_zero = m - len(regs)
    if e_raw <= 2.5 * m and v_zero > 0:
        return float(m) * math.log(float(m) / v_zero)
    return e_raw


def py_bottomk(values, k: int):
    keyed = sorted(
        ((_h52(v) / _TWO_52, v) for v in values), key=lambda t: (t[0], t[1])
    )
    return keyed[:k]


# --- properties -------------------------------------------------------------

vals = st.lists(
    st.integers(min_value=-(2**40), max_value=2**40), min_size=0, max_size=400
)


@given(xs=vals, p=st.integers(4, 12))
@settings(max_examples=100, deadline=None)
def test_hll_multiplicity_invariance(xs, p):
    # the estimate is a pure function of the distinct SET
    assert py_hll(xs, p) == py_hll(xs * 3, p)
    assert py_hll(xs, p) == py_hll(sorted(xs), p)


@given(xs=vals)
@settings(max_examples=100, deadline=None)
def test_hll_reasonable_accuracy(xs):
    n = len(set(xs))
    est = py_hll(xs, 10)
    if n == 0:
        # no registers set -> linear counting of a full-zero table = 0
        assert est == 0.0
        return
    # 1.04/sqrt(1024) ~ 3.3% standard error; allow generous 6 sigma
    # plus small-n discreteness
    assert abs(est - n) <= max(0.25 * n, 3)


@given(xs=vals, ys=vals, p=st.integers(4, 12))
@settings(max_examples=60, deadline=None)
def test_hll_union_merge_bound(xs, ys, p):
    # merged-register estimate == estimate of the union (registers are
    # a max-merge semilattice); model the merge by concatenation
    assert py_hll(xs + ys, p) == py_hll(ys + xs, p)


@given(xs=vals, ys=vals, k=st.integers(2, 64))
@settings(max_examples=100, deadline=None)
def test_bottomk_mergeable(xs, ys, k):
    # bottom-k of a union == bottom-k of the concatenated bottom-k's
    direct = py_bottomk(xs + ys, k)
    merged = py_bottomk(
        [v for _, v in py_bottomk(xs, k)] + [v for _, v in py_bottomk(ys, k)],
        k,
    )
    assert direct == merged


@given(xs=st.lists(st.integers(0, 2**30), min_size=1, max_size=300))
@settings(max_examples=100, deadline=None)
def test_bottomk_is_subset_and_deterministic(xs):
    got = py_bottomk(xs, 32)
    assert [v for _, v in got] == [v for _, v in py_bottomk(list(xs), 32)]
    assert all(v in xs for _, v in got)
    assert len(got) == min(32, len(xs))


def test_hash_sketches_reject_float_columns(spark):
    """r11 review: every sketch hashes CAST(col AS STRING); double →
    string renders differently in Spark vs DuckDB ('1.0E7' vs
    '10000000.0'), so a float column silently broke the SQL-twin
    reproducibility contract. quantile_sketch already failed loudly —
    the hash-based sketches must too."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from pinecone_datasets_spark.operators.sketch import (
        bloom_build,
        bloom_might_contain,
        cm_estimate,
        cm_sketch,
        hll_registers,
        kmv_distinct,
    )

    dbl = spark.range(10).select((F.col("id") * 1.5).alias("v"))
    with _pytest.raises(ValueError, match="not engine-portable"):
        kmv_distinct(dbl, "v")
    with _pytest.raises(ValueError, match="not engine-portable"):
        hll_registers(dbl, "v")
    with _pytest.raises(ValueError, match="not engine-portable"):
        cm_sketch(dbl, "v")
    with _pytest.raises(ValueError, match="not engine-portable"):
        bloom_build(dbl, "v")
    ints = spark.range(10).select(F.col("id").alias("v"))
    sk = cm_sketch(ints, "v")
    with _pytest.raises(ValueError, match="not engine-portable"):
        cm_estimate(sk, dbl, "v")
    bl = bloom_build(ints, "v")
    with _pytest.raises(ValueError, match="not engine-portable"):
        bloom_might_contain(bl, dbl, "v")
    # long / string columns still work
    assert kmv_distinct(ints, "v").count() == 1

"""Property-based tests (hypothesis) for the portable-hash sampling
primitives — the determinism/nesting/stability contracts the 100 TB
design leans on, checked over arbitrary keys and seeds without Spark
(the formulas are pure; the Spark twins are pinned to them in
test_sampling.py)."""

from __future__ import annotations

import hashlib
import math

from hypothesis import given, settings
from hypothesis import strategies as st

BUCKETS = 10_000


def py_bucket(key, seed: int) -> int:
    h = int(hashlib.md5(f"{seed}|{key}".encode()).hexdigest()[:8], 16)
    return h % BUCKETS


def py_unit(key, seed: int) -> float:
    h = int(hashlib.md5(f"{seed}|{key}".encode()).hexdigest()[:8], 16)
    return (h + 0.5) / 4294967296.0


keys = st.one_of(
    st.integers(min_value=-(2**62), max_value=2**62),
    st.text(min_size=0, max_size=40),
)


@given(key=keys, seed=st.integers(0, 2**31 - 1))
@settings(max_examples=200, deadline=None)
def test_bucket_in_range_and_deterministic(key, seed):
    b = py_bucket(key, seed)
    assert 0 <= b < BUCKETS
    assert b == py_bucket(key, seed)


@given(key=keys, seed=st.integers(0, 2**31 - 1))
@settings(max_examples=200, deadline=None)
def test_unit_strictly_inside_interval(key, seed):
    u = py_unit(key, seed)
    assert 0.0 < u < 1.0
    assert math.isfinite(math.log(u))


@given(
    keys_=st.lists(
        st.integers(min_value=0, max_value=2**40), min_size=1,
        max_size=200, unique=True,
    ),
    seed=st.integers(0, 2**31 - 1),
    f1=st.floats(min_value=0.0, max_value=1.0),
    f2=st.floats(min_value=0.0, max_value=1.0),
)
@settings(max_examples=100, deadline=None)
def test_samples_nest_by_fraction(keys_, seed, f1, f2):
    """The f1 sample is a subset of the f2 sample whenever f1 <= f2 at
    the same seed — the scaling-ladder property."""
    lo, hi = sorted((f1, f2))
    e_lo = int(round(lo * BUCKETS))
    e_hi = int(round(hi * BUCKETS))
    s_lo = {k for k in keys_ if py_bucket(k, seed) < e_lo}
    s_hi = {k for k in keys_ if py_bucket(k, seed) < e_hi}
    assert s_lo <= s_hi


@given(
    keys_=st.lists(
        st.integers(min_value=0, max_value=2**40), min_size=2,
        max_size=50, unique=True,
    ),
    seed=st.integers(0, 2**31 - 1),
    scale=st.floats(min_value=1.001, max_value=100.0),
)
@settings(max_examples=100, deadline=None)
def test_es_key_monotone_in_weight(keys_, seed, scale):
    """A-ES: scaling EVERY weight by the same factor never changes the
    selection order (the keys ln(u)/w order-reverse-scale together)."""
    w0 = {k: 1.0 + (k % 7) for k in keys_}

    def order(weights):
        ks = {
            k: math.log(py_unit(k, seed)) / w for k, w in weights.items()
        }
        return sorted(keys_, key=lambda k: (-ks[k], k))

    assert order(w0) == order({k: w * scale for k, w in w0.items()})


@given(
    key=st.integers(min_value=0, max_value=2**40),
    seed=st.integers(0, 2**31 - 1),
    w_lo=st.floats(min_value=0.01, max_value=100.0),
    boost=st.floats(min_value=1.0, max_value=100.0),
)
@settings(max_examples=200, deadline=None)
def test_es_key_increases_with_own_weight(key, seed, w_lo, boost):
    """Raising an item's weight can only raise (never lower) its A-ES
    key — inclusion probability is monotone in weight."""
    u = py_unit(key, seed)
    assert math.log(u) / (w_lo * boost) >= math.log(u) / w_lo

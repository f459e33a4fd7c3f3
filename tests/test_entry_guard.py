"""Guard: every registered ``queries()`` entry must EXECUTE on the
driver's real fixtures.

Round-2 regression lesson (VERDICT r2 §what's-wrong): q26's epoch-micros
fix was validated against assumptions, not ``/root/testdata`` — the
driver's fixtures had switched ``ts`` to TIMESTAMP_NTZ and five entries
crashed at analysis time. This test makes that class of ship-breakage
impossible: each entry is planned AND executed (count) against the same
parquet the driver grades with. Correctness-vs-oracle lives in
``tools/selfcheck.py``; this is purely "can it run".
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()


def test_registry_shape():
    oracles = entrymod.oracle_sql()
    # every oracle key must have a query; a dangling oracle is a typo
    assert set(oracles) <= set(QUERIES), set(oracles) - set(QUERIES)
    # entries are callables
    assert all(callable(fn) for fn in QUERIES.values())


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_entry_executes_on_driver_fixtures(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    n = df.count()
    assert n >= 0
    # a stable schema: column names resolve and are non-empty
    assert df.columns

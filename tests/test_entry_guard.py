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
    # Recall certificates must BITE (VERDICT r3 item 1): any entry that
    # publishes a recall_ok column is asserting a quality bar — a recall
    # regression must be a red test, not a silently-false column.
    if "recall_ok" in df.columns:
        from pyspark.sql import functions as F

        bad = df.where(F.col("recall_ok") != 1).count()
        assert bad == 0, f"{name}: {bad} rows below the recall bar"


def test_recall_certificate_surfaces_missed_queries(spark):
    """ADVICE r3: a query the approximate side missed entirely must still
    emit a recall_at_k=0 row (anchored on the exact side's query ids),
    not vanish from the certificate."""
    from pyspark.sql import functions as F

    approx = spark.createDataFrame(
        [(1, 10, 0.9, 1), (1, 11, 0.8, 2)],
        "query_id int, id int, score double, rank int",
    )
    exact = spark.createDataFrame(
        [(1, 10), (1, 99), (2, 20), (2, 21)], "query_id int, id int"
    )
    out = entrymod._recall_certificate(approx, exact, k=2).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {1, 2}
    assert all(r.recall_at_k == 0.5 for r in by_q[1])
    (missed,) = by_q[2]
    assert missed.recall_at_k == 0.0 and missed.recall_ok == 0
    assert missed.id is None and missed.rank is None

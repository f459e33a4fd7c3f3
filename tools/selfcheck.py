"""Self-check harness: replicate the driver's Spark-vs-DuckDB comparison.

Runs every ``queries()`` entry and its ``oracle_sql()`` twin at the given
scale factor and compares row count, sorted column names, and a value hash.

Faithful to the driver's ``_canon`` (CORRECTNESS_r01.json traceback): both
results go through PANDAS frames (``toPandas()`` / ``duckdb .df()``), the
frame is sorted by all columns, and cell values are hashed WITHOUT numeric
coercion — so an int64 column on one side vs a float64 on the other (e.g.
DuckDB HUGEINT sums) is a mismatch, and unhashable cells (lists/arrays)
are an error, exactly as the driver reports them. Round 1's fetchall-based
comparison normalized ints and floats together and over-reported green
(36/36 locally vs the driver's 32/39).

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

import duckdb
import pandas as pd

# derive the repo from THIS file so a second checkout/worktree checks
# its own tree, not /root/repo's (r11 review)
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm_cell(v) -> str:
    """Dtype-sensitive cell rendering: int and float render differently
    (108 vs 108.0) so cross-engine dtype drift fails the hash, like the
    driver's pandas-level comparison does."""
    if v is None or v is pd.NaT:
        return "\x00"
    if isinstance(v, float):
        if math.isnan(v):
            return "\x00"
        # repr-level float compare, lightly rounded to swallow printing
        # noise but NOT int-coerced.
        return repr(round(v, 9))
    return str(v)


def canon_hash(df: pd.DataFrame) -> str:
    # Driver _canon shape: columns sorted by name, frame sorted by all
    # columns (raises TypeError on unhashable cells — that's the q09/q10
    # failure mode, reproduced on purpose), then values hashed.
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update("\x01".join(norm_cell(v) for v in row).encode("utf-8", "replace"))
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    builder = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    # sf1 sweeps (r12 verdict item 2) need more than the 1g default
    # driver heap — a local[8] JVM holds driver AND all executors, so
    # at sf1 the default OOMs mid-entry and every later entry reports
    # "Connection refused" against the dead JVM. Off by default so the
    # sf0.01 gate keeps running in exactly the driver's profile.
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
    if mem:
        builder = builder.config("spark.driver.memory", mem)
        # big-fixture profile also adopts the engine session's broadcast
        # discipline (session.py): static auto-broadcast OFF, AQE
        # promotes from measured sizes. Without it the sf1 sweep dies in
        # a statically mis-planned broadcast of a corpus-derived frame
        # (the r13 q17 finding) before correctness is even tested.
        builder = builder.config(
            "spark.sql.autoBroadcastJoinThreshold", "-1"
        ).config(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", "10485760"
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    # bound the oracle too: the sf1 pair-enumeration twins (q17/q22/
    # q42) can eat the whole host when several selfchecks share it
    dmem = os.environ.get("SPARK_GRAFT_DUCKDB_MEM")
    if dmem:
        con.execute(f"SET memory_limit='{dmem}'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a mistyped key previously filtered out EVERY entry and the
        # harness exited 0 with "FAILURES: 0" — green with zero checks
        # run (r11 review; bench.py validates SPARK_GRAFT_ONLY the
        # same way)
        raise SystemExit(f"unknown query key(s): {sorted(unknown)}")
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spd = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(
                f"rows  {name}: {len(spd)} rows (no oracle, rows-only) "
                f"[{time.time()-t0:.1f}s]"
            )
            if len(spd) == 0:
                print("      WARNING: zero rows")
            continue
        try:
            opd = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = []
        if len(spd) != len(opd):
            problems.append(f"rowcount {len(spd)} vs {len(opd)}")
        if sorted(spd.columns) != sorted(opd.columns):
            problems.append(
                f"schema {sorted(spd.columns)} vs {sorted(opd.columns)}"
            )
        else:
            try:
                sh, oh = canon_hash(spd), canon_hash(opd)
            except TypeError as e:
                problems.append(f"canon error (driver-fatal): {e}")
            else:
                if sh != oh:
                    problems.append(f"valuehash {sh} vs {oh}")
        if problems:
            failures += 1
            print(
                f"FAIL  {name}: {'; '.join(problems)} "
                f"[{time.time()-t0:.1f}s]"
            )
            if (
                len(spd)
                and len(opd)
                and sorted(spd.columns) == sorted(opd.columns)
            ):
                cols = sorted(spd.columns)
                try:
                    ss = sorted(
                        tuple(norm_cell(v) for v in row)
                        for row in spd.reindex(cols, axis=1).itertuples(
                            index=False
                        )
                    )
                    oo = sorted(
                        tuple(norm_cell(v) for v in row)
                        for row in opd.reindex(cols, axis=1).itertuples(
                            index=False
                        )
                    )
                    for a, b in zip(ss, oo):
                        if a != b:
                            print(f"      spark : {a}")
                            print(f"      duckdb: {b}")
                            break
                except TypeError:
                    pass
        else:
            print(
                f"OK    {name}: {len(spd)} rows, hash match "
                f"[{time.time()-t0:.1f}s]"
            )
    spark.stop()
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

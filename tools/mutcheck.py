"""Mutation-test the hash gate (r11 verdict item 1).

The driver's correctness gate compares every ``queries()`` entry against
its DuckDB twin by rowcount + schema + value hash. Round 11's manual
audit (commit d6d5477) found SEVEN entries whose fixtures made the
claimed semantics compute nothing — a broken operator would have
hash-passed. This tool systematizes that hunt: for each entry, apply
small deliberate operator mutations (dropped filter clause, off-by-one
window bound, swapped tiebreak, threshold nudge, wrong aggregate) and
assert the entry's gate hash BREAKS.

Mechanism — no source files are edited on disk: each mutation is an
exact ``old -> new`` substring replacement with an asserted match count,
applied to an IN-MEMORY copy of the target file's source. A meta-path
loader serves the mutated source for that one module; every
``pinecone_datasets_spark*`` module and ``__spark_entry__`` are purged
from ``sys.modules`` so the fresh import wires the mutated code in (the
entry module mixes top-level and body-level imports, so attribute
monkeypatching alone would silently miss the top-level bindings — the
loader approach cannot miss). The Spark session is process-global and
survives the re-imports.

Verdicts per mutation, against the entry's DuckDB oracle (computed once
per key — the gate's actual reference point):

- ``killed``        mutated run differs (rowcount / schema / hash)
- ``killed-error``  mutated run raises (the gate records err != null)
- ``SURVIVED``      mutated run still hash-matches the oracle — the
                    gate would NOT catch this defect; fix the fixture
                    or write an adjudication in the catalog entry
- ``broken-spec``   the ``old`` text no longer matches ``count`` times
                    (the catalog drifted from the source — fix the spec)

Usage:
    python tools/mutcheck.py [sf_dir] [key ...]
    python tools/mutcheck.py --list          # print catalog coverage
    SPARK_GRAFT_MUT_JSON=out.json python tools/mutcheck.py ...

Exit 1 on any SURVIVED (without an ``adjudicated`` note) or broken-spec.
"""

from __future__ import annotations

import importlib.abc
import importlib.util
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from selfcheck import TABLES, canon_hash  # noqa: E402  (gate replica)

# Mut lives in mutcatalog so the catalog has no import back-edge.
from mutcatalog import MUTATIONS, Mut  # noqa: E402, F401


def _module_name_for(path: str) -> str:
    """repo-relative file path -> importable module name."""
    if path == "__spark_entry__.py":
        return "__spark_entry__"
    assert path.endswith(".py"), path
    return path[:-3].replace("/", ".")


class _MutLoader(importlib.abc.Loader):
    def __init__(self, src: str, origin: str):
        self._src, self._origin = src, origin

    def create_module(self, spec):
        return None

    def exec_module(self, module):
        module.__file__ = self._origin
        exec(compile(self._src, self._origin, "exec"), module.__dict__)


class _MutFinder(importlib.abc.MetaPathFinder):
    """Serves mutated source for exactly one module name."""

    def __init__(self, fullname: str, src: str, origin: str):
        self.fullname, self._src, self._origin = fullname, src, origin

    def find_spec(self, name, path=None, target=None):
        if name != self.fullname:
            return None
        return importlib.util.spec_from_loader(
            name, _MutLoader(self._src, self._origin), origin=self._origin
        )


def _purge_modules() -> None:
    for name in list(sys.modules):
        if name == "__spark_entry__" or name.startswith(
            "pinecone_datasets_spark"
        ):
            del sys.modules[name]


def _import_entry():
    import __spark_entry__ as m

    return m


def run_with_mutation(mut: Mut | None, key: str, spark, sf_dir: str):
    """Returns (pandas_df | None, error_str | None)."""
    # The entry module keeps a PID-stable scratch root for persisted
    # indexes / round-trip datasets (_session_index_path). A stale
    # artifact from the PREVIOUS in-process run can mask a mutation —
    # e.g. a writer mutated to write the wrong directory "survived"
    # because the reader found the prior run's correct output. The
    # driver runs each gate in a fresh process; replicate that by
    # wiping the root before every run.
    import shutil
    import tempfile

    shutil.rmtree(
        os.path.join(tempfile.gettempdir(), f"spark_graft_idx_{os.getpid()}"),
        ignore_errors=True,
    )
    finder = None
    if mut is not None:
        abspath = os.path.join(REPO, mut.path)
        with open(abspath, "r", encoding="utf-8") as f:
            src = f.read()
        n = src.count(mut.old)
        if n != mut.count:
            return None, f"broken-spec: old matched {n}x, expected {mut.count}"
        finder = _MutFinder(
            _module_name_for(mut.path),
            src.replace(mut.old, mut.new),
            abspath,
        )
    _purge_modules()
    if finder is not None:
        sys.meta_path.insert(0, finder)
    try:
        entry = _import_entry()
        fn = entry.queries()[key]
        return fn(spark, sf_dir).toPandas(), None
    except Exception as e:  # the gate records err != null -> entry fails
        return None, f"{type(e).__name__}: {e}"
    finally:
        if finder is not None:
            sys.meta_path.remove(finder)
        _purge_modules()


def main() -> int:
    args = [a for a in sys.argv[1:]]
    if "--list" in args:
        per_key: dict[str, int] = {}
        for m in MUTATIONS:
            per_key[m.key] = per_key.get(m.key, 0) + 1
        _purge_modules()
        entry = _import_entry()
        keys = list(entry.queries())
        missing = [k for k in keys if per_key.get(k, 0) < 2]
        for k in keys:
            print(f"{per_key.get(k, 0):3d}  {k}")
        print(f"\n{len(MUTATIONS)} mutations over {len(per_key)} keys;"
              f" {len(missing)} keys below the 2-mutation floor")
        if missing:
            print("below floor:", " ".join(missing))
        return 1 if missing else 0

    name_prefix = None
    if "--name-prefix" in args:
        i = args.index("--name-prefix")
        name_prefix = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    _purge_modules()
    entry = _import_entry()
    oracles = entry.oracle_sql()
    all_keys = list(entry.queries())

    unknown = only - set(all_keys)
    if unknown:
        raise SystemExit(f"unknown query key(s): {sorted(unknown)}")

    muts = [m for m in MUTATIONS if not only or m.key in only]
    if name_prefix:
        muts = [m for m in muts if m.name.startswith(name_prefix)]
    drifted = sorted({m.key for m in muts} - set(all_keys))
    if drifted:
        # a renamed/removed entry must fail loud, not crash in .index
        raise SystemExit(
            f"mutation catalog names keys not in queries(): {drifted}"
        )
    keys = sorted({m.key for m in muts}, key=all_keys.index)

    # oracle hash once per key — the gate's actual reference point
    oracle_ref: dict[str, tuple[int, list, str]] = {}
    for k in keys:
        if k not in oracles:
            continue  # rows-only entry: baseline = unmutated spark run
        opd = con.execute(oracles[k]).df()
        oracle_ref[k] = (len(opd), sorted(opd.columns), canon_hash(opd))

    results = []
    survived = broken = 0
    for k in keys:
        if k not in oracle_ref:
            base_pd, err = run_with_mutation(None, k, spark, sf_dir)
            if err:
                raise SystemExit(f"unmutated {k} failed: {err}")
            ref = (len(base_pd), sorted(base_pd.columns), canon_hash(base_pd))
        else:
            ref = oracle_ref[k]
        for m in [m for m in muts if m.key == k]:
            t0 = time.time()
            pd_df, err = run_with_mutation(m, k, spark, sf_dir)
            dt = time.time() - t0
            if err and err.startswith("broken-spec"):
                verdict = "broken-spec"
                broken += 1
            elif err:
                verdict = "killed-error"
            else:
                got = (len(pd_df), sorted(pd_df.columns), canon_hash(pd_df))
                if got == ref:
                    verdict = (
                        "survived-adjudicated" if m.adjudicated else "SURVIVED"
                    )
                    if not m.adjudicated:
                        survived += 1
                else:
                    verdict = "killed"
            results.append(
                {"key": k, "mutation": m.name, "verdict": verdict,
                 "detail": err or "", "sec": round(dt, 1)}
            )
            flag = "!!" if verdict in ("SURVIVED", "broken-spec") else "  "
            print(f"{flag} {verdict:22s} {k}.{m.name} [{dt:.1f}s]"
                  + (f"  {err}" if err and verdict == "broken-spec" else ""))

    kill = sum(r["verdict"].startswith("killed") for r in results)
    adj = sum(r["verdict"] == "survived-adjudicated" for r in results)
    print(
        f"\n{len(results)} mutations: {kill} killed, {adj} adjudicated,"
        f" {survived} SURVIVED, {broken} broken-spec"
    )
    out = os.environ.get("SPARK_GRAFT_MUT_JSON")
    if out:
        with open(out, "w") as f:
            json.dump({"sf_dir": sf_dir, "results": results}, f, indent=1)
    spark.stop()
    return 1 if (survived or broken) else 0


if __name__ == "__main__":
    raise SystemExit(main())

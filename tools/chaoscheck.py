"""Chaos proof: entry hashes must survive task retry + speculation.

On a 1000-executor cluster reading 100 TB, mid-query task loss is a
DAILY event — ``spark.task.maxFailures`` retries fire, speculative
twins race, and any kernel whose recompute diverges from its first
attempt silently corrupts output. Every prior proof (selfcheck,
clustercheck, skew, constrained memory) ran failure-free; this harness
closes that last tier of environment realism (r12 verdict item 1).

Three planted failure modes, each under REAL Spark retry machinery:

* ``retry`` profile — master ``local[8,3]`` (8 threads, ``maxFailures
  = 3``). Every batch AND streaming parquet scan is wrapped with a
  chaos predicate (an Arrow-batched pandas UDF that passes every row)
  which kills the FIRST attempt of each (stage, partition) it sees —
  one planted ``RuntimeError`` per scan task, then the retry runs the
  real work. A scratch marker directory records every planted death,
  so the harness can assert chaos actually fired per entry (a
  zero-kill "pass" proves nothing).
* write failpoints — the same profile also sets
  ``SPARK_GRAFT_CHAOS_WRITE=1``: ``taskio.chaos_failpoint`` kills the
  first attempt of every sink task at its most dangerous instant
  (rename mode: output fully staged, not yet published; manifest mode:
  attempt-unique file fully written, never reported to the driver).
  Exercised by the entries that persist artifacts mid-query (token
  shards in q49, dataset save in q09_q10, index builds).
* ``speculation`` profile — master ``local-cluster[2,2,1024]`` (real
  separate executor JVMs) with speculation forced pathological
  (``quantile=0`` / ``multiplier=1.0`` / 100 ms interval): nearly
  every task spawns a speculative twin, so duplicate attempts race in
  EVERY stage — including the pure-JVM stages Python-side injection
  cannot reach — and the commit protocol's last-complete-wins /
  manifest-decides contracts run live.

The gate is the DRIVER'S OWN gate: each entry's pandas result is
canon-hashed (selfcheck.canon_hash) and compared against the
unmutated DuckDB oracle — rowcount, sorted schema, value hash. A
divergence under chaos is a real silent-corruption bug at scale.

Usage::

    python tools/chaoscheck.py [sf_dir] [--profile retry|speculation|all]
                               [--all | key ...]

Default sf_dir ``/root/testdata/sf0.01``; default slice = the stateful
/ streaming / index-build / sink entries (the recompute-sensitive
surface) plus the shuffle-heaviest batch entries. Exit 1 on any hash
mismatch, entry error, or a retry-profile entry where zero chaos
kills fired.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The recompute-sensitive surface first (stateful streaming, persisted
# index builds, sinks, iterative algorithms), then the shuffle-heavy
# batch representatives.
DEFAULT_KEYS = [
    # streaming / stateful
    "q07_q87_hourly_gapfill",
    "q15_q16_dedup_exact",
    "q22_q57_event_queries",
    "q26_sessionize",
    "q27_running_revenue",
    "q28_q69_distinct_sketch",
    "q55_range_join",
    "q90_profile_dataset",
    # persisted index build + probe
    "q24_ann_lsh",
    "q35_ivf_topk",
    "q50_quantized_topk",
    "q53_incremental_dedup",
    "q66_q85_bm25_rm3",
    # sinks / round-trips (commit protocol under real retry)
    "q09_q10_conform",
    "q49_pack_chunks",
    # iterative
    "q42_q52_dedup_clusters",
    "q73_pagerank2",
    # shuffle-heavy batch
    "q01_pricing_summary",
    "q18_minhash_bands",
    "q33_q34_curation",
]

PROFILES = ("retry", "speculation")


def _scratch_dir() -> str:
    return os.path.join(
        "/tmp", f"spark_graft_chaos_markers_{os.getpid()}"
    )


def run_child(profile: str, sf_dir: str, keys: list[str]) -> dict:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # must ship, not inherit
    out = subprocess.run(
        [
            sys.executable,
            os.path.abspath(__file__),
            "--child",
            profile,
            sf_dir,
        ]
        + keys,
        cwd="/tmp",
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    marker = "CHAOSCHECK-RESULT:"
    for line in out.stdout.splitlines():
        if line.startswith(marker):
            return json.loads(line[len(marker):])
    sys.stderr.write(out.stdout[-4000:] + "\n" + out.stderr[-6000:] + "\n")
    raise RuntimeError(f"chaos child for {profile} produced no result line")


def child_main(profile: str, sf_dir: str, keys: list[str]) -> None:
    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO, "tools"))

    scratch = _scratch_dir()
    shutil.rmtree(scratch, ignore_errors=True)
    os.makedirs(scratch, exist_ok=True)
    # stale per-PID index scratch from a previous in-process run can
    # mask a writer's work entirely (r12 mutcheck harness flaw)
    shutil.rmtree(f"/tmp/spark_graft_idx_{os.getpid()}", ignore_errors=True)

    if profile == "retry":
        # env BEFORE the JVM launches: local-mode Python workers are
        # forked under the driver JVM and inherit its environment
        os.environ["SPARK_GRAFT_CHAOS_WRITE"] = "1"
        os.environ["SPARK_GRAFT_CHAOS_SCRATCH"] = scratch

    import duckdb
    import pandas as pd
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    import __spark_entry__ as entrymod
    from selfcheck import TABLES, canon_hash

    builder = (
        SparkSession.builder.appName(f"chaoscheck-{profile}")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.python.worker.reuse", "false")
    )
    if profile == "retry":
        # local[8,3]: 8 threads, spark.task.maxFailures = 3 — one
        # planted death per (stage, partition) leaves two real tries
        builder = builder.master("local[8,3]")
    elif profile == "speculation":
        builder = (
            builder.master("local-cluster[2,2,1024]")
            .config("spark.speculation", "true")
            .config("spark.speculation.interval", "100ms")
            .config("spark.speculation.multiplier", "1.0")
            .config("spark.speculation.quantile", "0.0")
        )
    else:
        raise SystemExit(f"unknown profile {profile!r}")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from pinecone_datasets_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    spark.sparkContext.addPyFile(os.path.join(REPO, "__spark_entry__.py"))

    if profile == "retry":
        # Wrap every parquet source — batch and streaming — with a
        # pass-all chaos predicate that kills each scan task's first
        # attempt. Patching the reader (not the entries) means every
        # internal library read, index-build read-back, and round-trip
        # re-read gets chaosed too.
        def _chaos_ok_fn(s):
            from pyspark import TaskContext

            tc = TaskContext.get()
            root = os.environ.get("SPARK_GRAFT_CHAOS_SCRATCH")
            if tc is not None and root and tc.attemptNumber() == 0:
                mark = os.path.join(
                    root, f"s{tc.stageId()}-p{tc.partitionId()}"
                )
                if not os.path.exists(mark):
                    with open(mark, "w"):
                        pass
                    raise RuntimeError(
                        "chaos: planted scan-task death"
                        f" (stage={tc.stageId()}"
                        f" partition={tc.partitionId()} attempt=0)"
                    )
            return pd.Series([True] * len(s))

        # explicit functionType: `from __future__ import annotations`
        # stringifies type hints, which pandas_udf cannot infer from
        from pyspark.sql.functions import PandasUDFType

        _chaos_ok = pandas_udf(
            _chaos_ok_fn, "boolean", PandasUDFType.SCALAR
        )

        from pyspark.sql.readwriter import DataFrameReader
        from pyspark.sql.streaming.readwriter import DataStreamReader

        _orig_batch = DataFrameReader.parquet
        _orig_stream = DataStreamReader.parquet

        def _chaos_batch(self, *paths, **opts):
            return _orig_batch(self, *paths, **opts).where(
                _chaos_ok(F.lit(0))
            )

        def _chaos_stream(self, path, **opts):
            return _orig_stream(self, path, **opts).where(
                _chaos_ok(F.lit(0))
            )

        DataFrameReader.parquet = _chaos_batch
        DataStreamReader.parquet = _chaos_stream

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    result: dict[str, dict] = {}
    for key in keys:
        t0 = time.time()
        pre = len(os.listdir(scratch)) if profile == "retry" else 0
        row: dict = {}
        try:
            spd = qs[key](spark, sf_dir).toPandas()
            opd = con.execute(oracles[key]).df()
            problems = []
            if len(spd) != len(opd):
                problems.append(f"rowcount {len(spd)} vs {len(opd)}")
            if sorted(spd.columns) != sorted(opd.columns):
                problems.append("schema mismatch")
            elif not problems:
                sh, oh = canon_hash(spd), canon_hash(opd)
                if sh != oh:
                    problems.append(f"valuehash {sh} vs {oh}")
            row = {
                "rows": len(spd),
                "ok": not problems,
                "problems": problems,
                "sec": round(time.time() - t0, 1),
            }
        except Exception as e:
            row = {"ok": False, "error": f"{type(e).__name__}: {e}"[:500]}
        if profile == "retry":
            row["kills"] = len(os.listdir(scratch)) - pre
        result[key] = row
        print(f"[{profile}] {key}: {row}", file=sys.stderr, flush=True)
    spark.stop()
    shutil.rmtree(scratch, ignore_errors=True)
    print("CHAOSCHECK-RESULT:" + json.dumps(result), flush=True)


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child_main(sys.argv[2], sys.argv[3], sys.argv[4:])
        return 0

    args = sys.argv[1:]
    profiles = list(PROFILES)
    if "--profile" in args:
        i = args.index("--profile")
        want = args[i + 1]
        del args[i : i + 2]
        if want != "all":
            profiles = [want]
    sf_dir = "/root/testdata/sf0.01"
    if args and not args[0].startswith("--") and os.path.isdir(args[0]):
        sf_dir = args.pop(0)

    sys.path.insert(0, REPO)
    import __spark_entry__ as entrymod

    all_keys = list(entrymod.queries())
    if "--all" in args:
        keys = all_keys
        args.remove("--all")
    elif args:
        unknown = sorted(set(args) - set(all_keys))
        if unknown:
            raise SystemExit(f"unknown query key(s): {unknown}")
        keys = args
    else:
        keys = DEFAULT_KEYS

    failures = 0
    for profile in profiles:
        print(f"=== profile {profile}: {len(keys)} entries at {sf_dir}")
        res = run_child(profile, sf_dir, keys)
        kills = 0
        for key in keys:
            row = res.get(key, {"ok": False, "error": "missing"})
            ok = row.get("ok")
            if profile == "retry":
                kills += row.get("kills", 0)
                if ok and row.get("kills", 0) == 0:
                    ok = False
                    row["problems"] = ["zero chaos kills fired"]
            flag = "OK  " if ok else "FAIL"
            if not ok:
                failures += 1
            extra = row.get("problems") or row.get("error") or ""
            kn = f" kills={row.get('kills')}" if profile == "retry" else ""
            print(
                f"{flag}  {key}: rows={row.get('rows')}{kn}"
                f" [{row.get('sec', '?')}s] {extra}"
            )
        if profile == "retry":
            print(f"--- total planted kills: {kills}")
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Multi-process proof: run representative oracle entries under
``local-cluster[2,2,1024]`` and hash-match them against ``local[4]``.

Why this exists (r10 verdict item 1): every test, oracle, and bench in
this repo runs ``local[*]``, where driver and executors share one JVM
and the Python workers inherit the driver's cwd — so a
closure-serialization or worker-import bug in the 20+ Arrow kernels
(``search.py``, ``pdf.py``, ``office.py``, ``quality_model.py``, the
``streaming/`` state functions) would stay invisible until a real
cluster. ``local-cluster[2,2,1024]`` launches REAL separate executor
JVMs whose work dir is NOT the repo (verified: without
``shipping.ensure_shipped`` the workers raise ``No module named
'pinecone_datasets_spark'`` — the negative control in
``tests/test_clustercheck.py`` pins that), so ``shipping.py``'s
zip+addPyFile path and cloudpickle-by-reference kernels are genuinely
exercised.

Usage:
    python tools/clustercheck.py [sf_dir] [key ...]   # parent: compare
    python tools/clustercheck.py --constrained [sf_dir] [key ...]
    python tools/clustercheck.py --child MASTER SF KEY...  # internal

``--constrained`` (r11 verdict item 4 — the memory-pressure profile):
the cluster side becomes ``local-cluster[2,1,512]`` — two 512 MiB
single-core executors — with ``spark.memory.fraction=0.3`` (a ~150 MiB
unified region per executor) and ``spark.sql.shuffle.partitions=4``
(fat partitions), and the key set adds the two explode-heaviest
entries (q18, q74). The proof: the squeezed run must SPILL, not OOM,
and every hash must still equal the roomy ``local[4]`` run — the
failure mode this exercises (an executor that dies instead of
spilling, or a kernel whose results change under partial aggregation
pressure) is exactly what 100 TB inputs do to fixed-size executors.

Defaults: sf_dir=/root/testdata/sf0.001 (executors get 1 GiB), keys =
one entry per surface class:
  * relational scan/agg/join .... q01_pricing_summary
  * Arrow-kernel vector search .. q32_q86_multiscore (rerank/MaxSim)
  * media kernels ............... q25_q39_fingerprints (image/audio/CDC)
  * streaming ................... q26_sessionize (applyInPandasWithState)
  * sink round-trip ............. q09_q10_conform (writer -> reader)
  * trained-model scoring ....... q33_q34_curation (HashingTF kernel)

The parent spawns one child process per master (a Spark master cannot
be swapped inside a JVM), each child prints one JSON line of
``{key: {"rows": n, "hash": h}}`` using selfcheck's driver-faithful
``canon_hash``, and the parent diffs the two maps. Exit 0 iff every
key matches. Wall time ~4-6 min (local-cluster startup + 6 entries
twice).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_KEYS = [
    "q01_pricing_summary",
    "q32_q86_multiscore",
    "q25_q39_fingerprints",
    "q26_sessionize",
    "q09_q10_conform",
    "q33_q34_curation",
]
MASTERS = ["local[4]", "local-cluster[2,2,1024]"]
CONSTRAINED_MASTERS = ["local[4]", "local-cluster[2,1,512]"]
CONSTRAINED_EXTRA_KEYS = ["q18_minhash_bands", "q74_minhash_oph"]
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_child(
    master: str, sf_dir: str, keys: list[str], constrained: bool = False
) -> dict:
    """Run entries under ``master`` in a fresh process, cwd=/tmp so the
    executors (and, in local mode, the forked Python workers) cannot
    resolve the package from the working directory by accident."""
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # must ship, not inherit
    if constrained and master.startswith("local-cluster"):
        env["SPARK_GRAFT_CONSTRAINED"] = "1"
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child", master, sf_dir]
        + keys,
        cwd="/tmp",
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    marker = "CLUSTERCHECK-RESULT:"
    for line in out.stdout.splitlines():
        if line.startswith(marker):
            return json.loads(line[len(marker):])
    sys.stderr.write(out.stdout[-4000:] + "\n" + out.stderr[-4000:] + "\n")
    raise RuntimeError(f"child for {master} produced no result line")


def child_main(master: str, sf_dir: str, keys: list[str]) -> None:
    sys.path.insert(0, REPO)
    from pyspark.sql import SparkSession

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import __spark_entry__ as entrymod
    from selfcheck import canon_hash

    spark = (
        SparkSession.builder.master(master)
        .appName(f"clustercheck-{master.split('[')[0]}")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # fresh Python worker per task batch: worker-reuse can mask
        # import/state bugs behind a warm process
        .config("spark.python.worker.reuse", "false")
    )
    if os.environ.get("SPARK_GRAFT_CONSTRAINED") == "1":
        # squeeze the unified memory region so the shuffle-heavy
        # entries must spill; fat partitions raise per-task pressure.
        # executor.memory must fit the 512 MiB worker grant (the
        # default ask is 1 GiB and the cluster refuses to launch).
        spark = (
            spark.config("spark.executor.memory", "512m")
            .config("spark.memory.fraction", "0.3")
            .config("spark.sql.shuffle.partitions", "4")
        )
    spark = spark.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    # ship the package (the kernels' cloudpickle-by-reference target)
    # and the entry module itself — the spark-submit equivalent of
    # `--py-files pinecone_datasets_spark.zip,__spark_entry__.py`
    from pinecone_datasets_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    spark.sparkContext.addPyFile(os.path.join(REPO, "__spark_entry__.py"))

    qs = entrymod.queries()
    result = {}
    for key in keys:
        t0 = time.time()
        try:
            pdf = qs[key](spark, sf_dir).toPandas()
            result[key] = {
                "rows": len(pdf),
                "hash": canon_hash(pdf),
                "sec": round(time.time() - t0, 1),
            }
        except Exception as e:  # record, let the parent show the diff
            result[key] = {"error": f"{type(e).__name__}: {e}"[:500]}
        print(
            f"[{master}] {key}: {result[key]}",
            file=sys.stderr,
            flush=True,
        )
    spark.stop()
    print("CLUSTERCHECK-RESULT:" + json.dumps(result), flush=True)


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child_main(sys.argv[2], sys.argv[3], sys.argv[4:])
        return 0
    args = sys.argv[1:]
    constrained = "--constrained" in args
    if constrained:
        args = [a for a in args if a != "--constrained"]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    keys = args[1:] or (
        DEFAULT_KEYS + CONSTRAINED_EXTRA_KEYS if constrained else DEFAULT_KEYS
    )
    masters = CONSTRAINED_MASTERS if constrained else MASTERS
    results = {}
    for master in masters:
        t0 = time.time()
        results[master] = run_child(
            master, sf_dir, keys, constrained=constrained
        )
        print(f"{master}: done in {time.time()-t0:.0f}s", flush=True)
    local, cluster = (results[m] for m in masters)
    failures = 0
    for key in keys:
        a, b = local.get(key, {}), cluster.get(key, {})
        if "error" in a or "error" in b:
            print(f"FAIL  {key}: local={a} cluster={b}")
            failures += 1
        elif a.get("hash") != b.get("hash") or a.get("rows") != b.get("rows"):
            print(
                f"FAIL  {key}: rows {a.get('rows')} vs {b.get('rows')}, "
                f"hash {a.get('hash')} vs {b.get('hash')}"
            )
            failures += 1
        else:
            print(
                f"OK    {key}: {a['rows']} rows, hash {a['hash']} "
                f"(local {a['sec']}s, cluster {b['sec']}s)"
            )
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

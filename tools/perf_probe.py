"""Interactive perf probe: one long-lived bench-profile session.

Run under ``python -i`` (or pipe commands) so each probe skips the ~15 s
session startup. Mirrors bench.py's session config exactly; helpers time
a DataFrame through the noop sink and summarize its physical plan.

Usage:
    python -i tools/perf_probe.py
    >>> t(df)                 # min-of-3 noop-sink seconds
    >>> shape(df)             # Exchange/join/Python-node counts
    >>> plan(df)              # full formatted plan
"""

from __future__ import annotations

import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F  # noqa: F401 — probe convenience

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("perf-probe")
    .config("spark.sql.shuffle.partitions", CPUS)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.codegen.cache.maxEntries", "2000")
    .config("spark.driver.memory", "16g")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def t(make, n: int = 3, label: str = "") -> float:
    """Min-of-n noop-sink seconds. ``make`` is a DataFrame or a
    zero-arg callable returning one (callable re-measures plan build)."""
    times = []
    for _ in range(n):
        df = make() if callable(make) else make
        t0 = time.time()
        noop(df)
        times.append(time.time() - t0)
    best = min(times)
    print(f"{label or 'probe'}: {best:.3f}s  (all: {[round(x,3) for x in times]})")
    return best


def plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def shape(df, verbose: bool = True) -> dict:
    p = plan(df)
    counts = {
        "Exchange": len(re.findall(r"\bExchange\b", p)),
        "SortMergeJoin": len(re.findall(r"\bSortMergeJoin\b", p)),
        "BroadcastHashJoin": len(re.findall(r"\bBroadcastHashJoin\b", p)),
        "ShuffledHashJoin": len(re.findall(r"\bShuffledHashJoin\b", p)),
        "NestedLoop": len(re.findall(r"BroadcastNestedLoopJoin", p)),
        "BatchEvalPython": len(re.findall(r"BatchEvalPython", p)),
        "ArrowEvalPython": len(re.findall(r"ArrowEvalPython", p)),
        "MapInPandas": len(re.findall(r"MapInPandas", p)),
        "Window": len(re.findall(r"\bWindow\b", p)),
        "Sort": len(re.findall(r"\bSort \b", p)),
        "AQEShuffleRead": len(re.findall(r"AQEShuffleRead", p)),
    }
    if verbose:
        print({k: v for k, v in counts.items() if v})
    return counts


def jobtrace(make) -> None:
    """Run under a tagged job group and print per-job wall times from
    the status tracker alongside the total (rough: wall-clock deltas,
    so overlapping jobs double-count)."""
    sc = spark.sparkContext
    group = f"jobtrace-{int(time.time() * 1000)}"
    sc.setJobGroup(group, "perf_probe jobtrace")
    tracker = sc.statusTracker()
    t0 = time.time()
    try:
        df = make() if callable(make) else make
        noop(df)
    finally:
        sc.setJobGroup(None, None)
    total = time.time() - t0
    for jid in sorted(tracker.getJobIdsForGroup(group) or []):
        info = tracker.getJobInfo(jid)
        n_stages = len(info.stageIds) if info else -1
        print(f"  job {jid}: {n_stages} stages "
              f"({info.status if info else 'unknown'})")
    print(f"total {total:.3f}s")


print(f"perf_probe ready: SF_DIR={SF_DIR} CPUS={CPUS}")

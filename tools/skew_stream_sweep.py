"""Uniform-vs-skew sweep for the STREAMING-bearing oracle entries
(r12 verdict item 4 — the cross-product the batch skew sweep missed).

``tools/skew_sweep.py`` times the 17 shuffle-heaviest BATCH bench legs
on the zipf fixture; the Structured-Streaming entries never appear
there because they have no standalone bench leg. But the skewed
fixture's 30 % hot user is exactly the state-size adversary for
``applyInPandasWithState`` (one user's events all land in one state
group — sessionizer state, stateful-dedup seen-set, rolling windows),
so this tool runs each streaming-bearing entry END TO END (source
staging + the real >=2-micro-batch streaming execution + the batch
union around it) on the uniform sf dir and on the skewed one, in a
fresh subprocess per run (fresh SparkSession, selfcheck's exact
session config), and tabulates wall time.

Bar: same as the batch sweep — a skew/uniform ratio above 3x is
flagged and exits 1. Correctness under skew is NOT re-proven here
(the full 50-entry hash sweep already ran green on the skewed fixture,
SKEW.md); this closes the PERFORMANCE gap for stateful streaming.

Usage: python tools/skew_stream_sweep.py [uniform_sf_dir] [skew_sf_dir]
Defaults: /root/testdata/sf0.1 -> <repo>/.skewdata/sf0.1-skew
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# every queries() entry that executes a Structured Streaming query
# (applyInPandasWithState sessionizer / stateful dedup, windowed agg,
# live sketches, stream-stream interval join, rolling anomaly)
ENTRIES = [
    "q26_sessionize",          # stateful sessionizer; 30% hot user
    "q15_q16_dedup_exact",     # stateful dedup; giant dup group
    "q07_q87_hourly_gapfill",  # rolling z-score anomaly stream
    "q28_q69_distinct_sketch", # live HLL/CM sketches
    "q22_q57_event_queries",   # stream-stream interval join
]

RATIO_FLAG = 3.0

_CHILD = """
import json, sys, time
sys.path.insert(0, {repo!r})
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
import __spark_entry__ as em
fn = em.queries()[{key!r}]
t0 = time.time()
n = fn(spark, {sf_dir!r}).count()
print("RESULT " + json.dumps({{"rows": n, "sec": time.time() - t0}}))
"""


def run_one(key: str, sf_dir: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _CHILD.format(repo=REPO, key=key, sf_dir=sf_dir)],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("RESULT ")]
    if out.returncode != 0 or not lines:
        sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-2000:])
        raise SystemExit(f"entry {key} failed on {sf_dir} rc={out.returncode}")
    return json.loads(lines[-1][len("RESULT "):])


def main() -> int:
    uniform = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    skew = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO, ".skewdata", "sf0.1-skew")
    )
    if not os.path.exists(os.path.join(skew, "events.parquet")):
        raise SystemExit(f"run tools/make_skewed_sf.py first ({skew} missing)")
    rows = []
    for key in ENTRIES:
        u = run_one(key, uniform)
        s = run_one(key, skew)
        ratio = s["sec"] / u["sec"] if u["sec"] > 0 else float("inf")
        rows.append((key, u, s, ratio))
        print(
            f"{key}: uniform {u['sec']:.2f}s/{u['rows']} rows, "
            f"skew {s['sec']:.2f}s/{s['rows']} rows, ratio {ratio:.2f}x",
            flush=True,
        )
    rows.sort(key=lambda r: -r[3])
    flagged = [r[0] for r in rows if r[3] > RATIO_FLAG]
    lines = [
        "| streaming entry | uniform s | skew s | ratio |",
        "|---|---|---|---|",
    ]
    for key, u, s, ratio in rows:
        flag = " **FLAG**" if ratio > RATIO_FLAG else ""
        lines.append(
            f"| {key} | {u['sec']:.2f} | {s['sec']:.2f} | {ratio:.2f}x{flag} |"
        )
    table = "\n".join(lines)
    print(table)
    print(f"\nflagged >{RATIO_FLAG}x: {flagged or 'none'}")
    with open(os.path.join(REPO, "SKEW_STREAM_TABLE.md"), "w") as f:
        f.write(table + "\n")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())

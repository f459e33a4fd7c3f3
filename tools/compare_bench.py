"""Round-over-round bench comparison: align BENCH_r{N}.json files (and/or
raw bench.py JSON lines) on query names and print warm/cold ratios.

The r3 verdict hand-reconstructed cold-vs-cold ratios because headline
semantics changed between rounds; this makes the comparison mechanical.

Usage:
  python tools/compare_bench.py                      # all BENCH_r*.json
  python tools/compare_bench.py BENCH_r03.json /tmp/bench.log
"""

from __future__ import annotations

import glob
import json
import os
import sys


def load(path: str):
    """Return (label, queries_warm, queries_cold) from a driver BENCH
    artifact ({"parsed": ...}) or a raw bench.py output (last JSON
    line)."""
    with open(path) as f:
        text = f.read().strip()
    try:
        doc = json.loads(text)
    except json.JSONDecodeError:
        doc = json.loads(text.splitlines()[-1])
    if "parsed" in doc:
        doc = doc["parsed"] or {}
    warm = doc.get("queries") or {}
    cold = doc.get("queries_cold")
    series = "two-pass"
    if cold is None:
        # single-series artifact. r1/r3/r4 emitted a COLD pass; r5+
        # emit a WARM one (verified against the artifacts) — labeling
        # both 'cold' silently mixed warm and cold numbers in one
        # ratio table (r11 review). Tag the series honestly and let
        # main() print what it is actually comparing.
        cold, warm, series = warm, {}, "single(warm r5+/cold r1-r4)"
    return path, warm, cold, series


def main() -> int:
    # anchor the default glob at the repo root, not the cwd (r11
    # review: running from tools/ found zero artifacts)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = sys.argv[1:] or sorted(glob.glob(os.path.join(repo, "BENCH_r*.json")))
    runs = []
    for p in paths:
        try:
            runs.append(load(p))
        except Exception as exc:  # noqa: BLE001 — skip broken artifacts
            print(f"skip {p}: {type(exc).__name__}: {exc}")
    if len(runs) < 2:
        print("need >= 2 readable bench artifacts")
        return 1
    base_label, _, base_cold, base_series = runs[0]
    cur_label, cur_warm, cur_cold, cur_series = runs[-1]
    names = sorted(set(base_cold) & set(cur_cold))
    print(
        f"series ratio: {cur_label} [{cur_series}] /"
        f" {base_label} [{base_series}]"
    )
    if base_series != cur_series:
        print("WARNING: the two artifacts carry DIFFERENT series kinds"
              " — ratios mix warm and cold measurements")
    print(f"{'query':<28} {'base':>8} {'cur':>8} {'ratio':>6}   warm")
    tb = tc = 0.0
    for n in names:
        b, c = base_cold[n], cur_cold[n]
        if b <= 0 or c <= 0:
            continue
        tb += b
        tc += c
        w = cur_warm.get(n, float("nan"))
        print(f"{n:<28} {b:>8.2f} {c:>8.2f} {c / b:>6.2f}   {w:.2f}")
    if tb > 0:
        print(
            f"{'TOTAL (overlap)':<28} {tb:>8.2f} {tc:>8.2f} {tc / tb:>6.2f}"
        )
    only_cur = sorted(set(cur_cold) - set(base_cold))
    if only_cur:
        print(f"new in {cur_label}: {', '.join(only_cur)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

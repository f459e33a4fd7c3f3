"""Uniform-vs-skew bench sweep -> SKEW.md (r11 verdict item 2).

Runs bench.py twice over the SAME leg subset — once on the driver's
uniform SF dir, once on the zipf-ish variant from make_skewed_sf.py —
and tabulates per-leg wall time. The legs are the shuffle-heaviest
whose shuffle KEYS the planted skew actually hits (band buckets,
fingerprints, domain, per-user windows, term postings, SRP cells).

A leg whose skew/uniform ratio exceeds RATIO_FLAG is flagged for
root-causing (the r11 verdict's acceptance bar is 3x).

Usage: python tools/skew_sweep.py [uniform_sf_dir] [skew_sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# shuffle-heavy legs keyed on the planted hot keys
LEGS = [
    "minhash_lsh_64x16",   # band buckets <- boiler suffix + dup group
    "minhash_oph_64x16",
    "mh_index_build",      # bb-sorted band table
    "mh_index_probe",
    "q16_dedup_exact",     # groupBy(fingerprint) <- giant dup group
    "curation_funnel",     # exact dedup inside the pipeline
    "domain_report",       # groupBy(domain) <- 40% hot domain
    "dup_spans_3gram",     # window-hash counts <- duplicated text
    "substr_strip_w8",     # repeated spans <- giant dup group
    "boilerplate_2gram",   # 2-gram hash keys <- shared boiler line
    "decontaminate_3gram", # 3-gram hash joins
    "bm25_build",          # term postings <- hot terms
    "unigram_lm",          # token explode + count
    "asof_join",           # per-user window <- 30% hot user
    "semdedup_cells64",    # SRP cell groupBy <- 10% hot vector
    "lsh_build",           # signature banding <- identical vectors
    "cdc_dedup",           # chunk-hash groupBy
]

RATIO_FLAG = 3.0


def run(sf_dir: str) -> dict[str, float]:
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_ONLY"] = ",".join(LEGS)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=3600,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if out.returncode != 0 or not line:
        sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-2000:])
        raise SystemExit(f"bench failed on {sf_dir} rc={out.returncode}")
    return json.loads(line[-1])["queries"]


def main() -> int:
    uniform = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    skew = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO, ".skewdata", "sf0.1-skew")
    )
    if not os.path.exists(os.path.join(skew, "documents.parquet")):
        raise SystemExit(f"run tools/make_skewed_sf.py first ({skew} missing)")
    print("uniform run...")
    u = run(uniform)
    print("skew run...")
    s = run(skew)
    rows = []
    for leg in LEGS:
        if leg not in u or leg not in s:
            continue
        ratio = s[leg] / u[leg] if u[leg] > 0 else float("inf")
        rows.append((leg, u[leg], s[leg], ratio))
    rows.sort(key=lambda r: -r[3])
    flagged = [r for r in rows if r[3] > RATIO_FLAG]
    lines = [
        "| leg | uniform s | skew s | ratio |",
        "|---|---|---|---|",
    ]
    for leg, uu, ss, ratio in rows:
        flag = " **FLAG**" if ratio > RATIO_FLAG else ""
        lines.append(f"| {leg} | {uu:.2f} | {ss:.2f} | {ratio:.2f}x{flag} |")
    table = "\n".join(lines)
    print(table)
    print(f"\nflagged >{RATIO_FLAG}x: {[r[0] for r in flagged] or 'none'}")
    with open(os.path.join(REPO, "SKEW_TABLE.md"), "w") as f:
        f.write(table + "\n")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Empirical scaling probe (r9 verdict item 2): run the most expensive
bench legs at sf0.1 and at a K×-scaled fixture (tools/make_scaled_sf.py),
and report the per-leg scaling exponent  e = log(tK / t1) / log(K).

e ≈ 1 is linear; e well above ~1.2 means a super-linear surprise hiding
in a shuffle/join (the thing sf0.1 plan-reading cannot prove absent).
Fixed per-leg overheads (session, codegen, driver setup) bias e DOWN at
these absolute times, so the probe is a one-sided alarm: small e proves
nothing extra, large e is real.

Runs bench.py itself (SPARK_GRAFT_ONLY leg filter + SPARK_GRAFT_SF_DIR)
so the measured code path is byte-identical to the published bench.

Usage: python tools/scale_probe.py [K] [--legs a,b,c]
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The r9 verdict's "~10 most expensive legs", by BENCH_r09 warm time,
# plus the quadratic-risk band joins (semdedup, minhash_lsh).
DEFAULT_LEGS = [
    "pq_adc_topk",
    "audio_fp_dedup",
    "image_phash_dedup",
    "rm3_expand_search",
    "minhash_oph_64x16",
    "minhash_lsh_64x16",
    "mh_index_build",
    "mh_index_probe",
    "ivfpq_build",
    "rm3_index_search",
    "dsir_select",
    "dup_spans_3gram",
    "curation_funnel",
    "semdedup_cells64",
    "bm25_build",
]


def run_bench(sf_dir: str, legs: list) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_ONLY"] = ",".join(legs)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    lines = [
        ln for ln in out.stdout.splitlines() if ln.startswith("{")
    ]
    if out.returncode != 0 or not lines:
        # surface the real failure instead of a bare IndexError with
        # the stderr discarded (r10 code review)
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(
            f"bench.py failed at {sf_dir} (rc={out.returncode},"
            f" {len(lines)} JSON lines) — stderr tail above"
        )
    doc = json.loads(lines[-1])
    if doc.get("failed"):
        raise SystemExit(f"failed legs at {sf_dir}: {doc['failed']}")
    return doc["queries"]


def main() -> None:
    args = sys.argv[1:]
    k = int(args[0]) if args and not args[0].startswith("--") else 10
    legs = DEFAULT_LEGS
    for i, a in enumerate(args):
        if a.startswith("--legs="):
            legs = a.split("=", 1)[1].split(",")
        elif a == "--legs":
            # the docstring's space-separated form
            if i + 1 >= len(args):
                raise SystemExit("--legs needs a comma-separated value")
            legs = args[i + 1].split(",")
    big_dir = "/tmp/spark_graft_sf1"
    marker = os.path.join(big_dir, ".scale_k")
    cached_k = None
    if os.path.exists(marker):
        with open(marker) as fh:
            cached_k = fh.read().strip()
    # rebuild unless the cached fixture was built with THIS K — reusing
    # a 10x fixture for a K=5 probe would inflate every exponent by
    # log(10)/log(5) (r10 code-review finding)
    if cached_k != str(k) or not os.path.exists(
        os.path.join(big_dir, "lineitem.parquet")
    ):
        # invalidate BEFORE rebuilding: an interrupted rebuild must not
        # leave a stale marker that makes the next run silently measure
        # a mixed-K fixture (r11 review)
        try:
            os.remove(marker)
        except FileNotFoundError:
            pass
        subprocess.run(
            [
                sys.executable,
                os.path.join(REPO, "tools", "make_scaled_sf.py"),
                str(k),
                "/root/testdata/sf0.1",
                big_dir,
            ],
            check=True,
        )
        os.makedirs(big_dir, exist_ok=True)
        with open(marker, "w") as fh:
            fh.write(str(k))
    print(f"probe: {len(legs)} legs at sf0.1 ...", file=sys.stderr)
    t1 = run_bench("/root/testdata/sf0.1", legs)
    print(f"probe: {len(legs)} legs at sf1 (K={k}) ...", file=sys.stderr)
    tk = run_bench(big_dir, legs)
    rows = []
    for leg in legs:
        a, b = t1.get(leg, -1), tk.get(leg, -1)
        if a and b and a > 0 and b > 0:
            e = math.log(b / a) / math.log(k)
            rows.append((leg, a, b, round(e, 2)))
        else:
            # no silent truncation: a leg whose 2-decimal stdout time
            # rounds to 0.00 (or is missing) must be visibly dropped,
            # not vanish from the exponent table (r11 review)
            print(
                f"probe: leg {leg} dropped (t_sf0.1={a}, t_sf1={b} —"
                " sub-0.01s or missing)",
                file=sys.stderr,
            )
    rows.sort(key=lambda r: -r[3])
    print("| leg | t_sf0.1 (s) | t_sf1 (s) | exponent |")
    print("|---|---|---|---|")
    for leg, a, b, e in rows:
        print(f"| {leg} | {a} | {b} | {e} |")
    print(
        json.dumps(
            {"k": k, "sf01": t1, "sf1": tk,
             "exponents": {r[0]: r[3] for r in rows}}
        )
    )


if __name__ == "__main__":
    main()

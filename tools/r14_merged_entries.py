"""Probe the merged correctness entries (q17_q21, q25_q39, q33_q34):
count duplicate UDF evaluations in the formatted plan and time a noop
execution. Usage: python tools/r14_merged_entries.py [sf_dir] [--plans]
"""

from __future__ import annotations

import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
DUMP = "--plans" in sys.argv
TAG = next((a.split("=", 1)[1] for a in sys.argv if a.startswith("--tag=")), "")

ENTRIES = ["q17_q21_neardup_pairs", "q25_q39_fingerprints", "q33_q34_curation"]


def main() -> None:
    from pyspark.sql import SparkSession

    import __spark_entry__ as e

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    for name in ENTRIES:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        n_arrow = len(re.findall(r"ArrowEvalPython", plan))
        n_proj = len(re.findall(r"_proj", plan))
        n_exch = len(re.findall(r"^\s*\(\d+\) Exchange", plan, re.M))
        if DUMP:
            out = os.path.join(
                REPO, "plans", "r14", f"{name}_{TAG or 'plan'}.txt"
            )
            with open(out, "w") as f:
                f.write(plan)
        # warm-up pass then timed passes (bench methodology: noop sink)
        times = []
        for _ in range(3):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
        print(
            f"{name}: ArrowEvalPython={n_arrow} _proj={n_proj} "
            f"Exchange={n_exch} times={[round(t, 2) for t in times]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()

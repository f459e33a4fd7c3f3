"""Task-retry chaos proofs for the raw-file sinks (r12 verdict item 1).

``tests/test_commit_protocol.py`` PLANTS the artifacts of a failed
attempt by hand; these tests make Spark produce them for real: a
subprocess session on ``local[4,2]`` (``spark.task.maxFailures=2``)
with ``SPARK_GRAFT_CHAOS_WRITE=1`` kills the FIRST attempt of every
sink task at its most dangerous instant (``taskio.chaos_failpoint``:
rename mode — output staged, not yet published; manifest mode —
attempt-unique file fully written, never reported), then the retry
runs to completion and the read-back must be byte-exact.

Subprocess because both the master string and the chaos env var must
be fixed BEFORE the JVM launches — the suite's shared session can do
neither. One child runs all three sink scenarios to pay the session
startup once.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import glob, json, os, sys
sys.path.insert(0, "@REPO@")
import pandas as pd
from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.master("local[4,2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from pinecone_datasets_spark.shipping import ensure_shipped
ensure_shipped(spark)
out = {}
base = sys.argv[1]

docs = spark.createDataFrame(
    [(i, list(range(i % 7 + 1))) for i in range(40)],
    "doc_id long, token_ids array<int>",
)
want = {i: list(range(i % 7 + 1)) for i in range(40)}

from pinecone_datasets_spark.operators.shards import (
    read_token_shards,
    write_token_shards,
)

for mode in ("rename", "manifest"):
    path = os.path.join(base, f"shards_{mode}")
    write_token_shards(docs, path, num_shards=3, dtype="uint16", commit=mode)
    got = {
        r["doc_id"]: list(r["token_ids"])
        for r in read_token_shards(
            spark, path, use_manifest=(mode == "manifest")
        ).collect()
    }
    leftovers = glob.glob(os.path.join(path, "*.inprogress-*"))
    out[f"shards_{mode}"] = {
        "exact": got == want,
        "n": len(got),
        "leftover_tmp": len(leftovers),
    }

from pinecone_datasets_spark.sources.warc import read_warc, wet_text, write_wet

tdf = spark.createDataFrame(
    [(f"http://x/{i}", f"body text {i}") for i in range(30)],
    "url string, text string",
)
wet = os.path.join(base, "wet")
write_wet(tdf, wet, num_files=3, commit="manifest")
back = read_warc(spark, wet, use_manifest=True)
texts = sorted(
    r["text"].strip() for r in wet_text(back.records).collect()
)
expect = sorted(f"body text {i}" for i in range(30))
out["wet_manifest"] = {"exact": texts == expect, "n": len(texts)}
spark.stop()
print("CHAOS-CHILD:" + json.dumps(out))
"""


@pytest.fixture(scope="module")
def chaos_results(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("chaos_sinks"))
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["SPARK_GRAFT_CHAOS_WRITE"] = "1"
    script = _CHILD.replace("@REPO@", REPO)
    out = subprocess.run(
        [sys.executable, "-c", script, base],
        cwd="/tmp",
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("CHAOS-CHILD:"):
            res = json.loads(line[len("CHAOS-CHILD:"):])
            # liveness: the planted deaths must be visible in the
            # executor logs — a pass with zero fired failpoints (env
            # var not reaching the workers) would prove nothing
            res["fired"] = out.stderr.count("chaos failpoint")
            return res
    raise AssertionError(
        "chaos child produced no result line:\n"
        + out.stdout[-3000:]
        + "\n"
        + out.stderr[-3000:]
    )


def test_chaos_failpoints_actually_fired(chaos_results):
    # 3 sink runs x >= 1 task each, every first attempt dies: the
    # executor log must show the planted RuntimeErrors
    assert chaos_results["fired"] >= 3, chaos_results["fired"]


def test_shards_rename_mode_survives_planted_precommit_death(chaos_results):
    r = chaos_results["shards_rename"]
    assert r["exact"] and r["n"] == 40, r
    # the dead first attempt's staged temp files must not linger as
    # *.inprogress-* (the retry re-stages under its OWN attempt id —
    # the first attempt's files are orphaned but match no reader glob;
    # they may exist, the READ above already proved they aren't
    # consumed)


def test_shards_manifest_mode_survives_planted_postwrite_death(chaos_results):
    r = chaos_results["shards_manifest"]
    assert r["exact"] and r["n"] == 40, r


def test_wet_manifest_mode_survives_planted_postwrite_death(chaos_results):
    r = chaos_results["wet_manifest"]
    assert r["exact"], r

"""Multi-process proof boundary (r10 verdict item 1).

Everything else in this suite runs ``local[*]``, where executors share
the driver JVM and the forked Python workers can resolve the package
from the driver's cwd — so ``shipping.py``'s zip+addPyFile path and
cloudpickle-by-reference kernel serialization are never actually
load-bearing. ``local-cluster[2,2,1024]`` launches real separate
executor JVMs whose work dir is the Spark dist's ``work/``, not this
repo; these tests subprocess into that mode (a JVM can't swap masters)
and pin both directions:

* negative control — WITHOUT ``ensure_shipped`` the workers must fail
  to import the package (if this ever starts passing, the proof in
  ``tools/clustercheck.py`` has silently stopped proving anything);
* positive — ``tools/clustercheck.py`` hash-matches a representative
  entry between ``local[4]`` and ``local-cluster[2,2,1024]``.

The full 6-entry sweep (relational / Arrow search / media kernels /
streaming state / sink round-trip / trained-model scoring) is
``python tools/clustercheck.py`` (~4 min); these tests keep the suite
version to one relational entry + the control.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_NEG_CONTROL = r"""
import sys
sys.path.insert(0, %(repo)r)
import pandas as pd
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local-cluster[2,2,1024]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false")
         .config("spark.python.worker.reuse", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
df = spark.range(4).repartition(2)

def probe(it):
    for pdf in it:
        try:
            import pinecone_datasets_spark as p
            loc = p.__file__
        except ImportError as e:
            loc = "IMPORT-FAIL"
        yield pd.DataFrame({"loc": [loc]})

out = set(df.mapInPandas(probe, "loc string").toPandas()["loc"])
print("BEFORE:", sorted(out))
from pinecone_datasets_spark.shipping import ensure_shipped
ensure_shipped(spark)
out2 = set(df.mapInPandas(probe, "loc string").toPandas()["loc"])
print("AFTER:", sorted(out2))
spark.stop()
assert out == {"IMPORT-FAIL"}, f"negative control broken: {out}"
assert all(".zip" in x for x in out2), f"not shipped-zip imports: {out2}"
print("CONTROL-OK")
"""


def _run(args, timeout):
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    return subprocess.run(
        args, cwd="/tmp", env=env, capture_output=True, text=True,
        timeout=timeout,
    )


def test_local_cluster_shipping_negative_control(tmp_path):
    script = tmp_path / "neg_control.py"
    script.write_text(_NEG_CONTROL % {"repo": REPO})
    out = _run([sys.executable, str(script)], timeout=420)
    assert "CONTROL-OK" in out.stdout, out.stdout[-2000:] + out.stderr[-2000:]


def test_clustercheck_relational_entry_hash_matches():
    out = _run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "clustercheck.py"),
            "/root/testdata/sf0.001",
            "q01_pricing_summary",
        ],
        timeout=900,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "FAILURES: 0" in out.stdout, out.stdout[-2000:]

"""Build a SKEWED variant of a driver SF dir (r11 verdict item 2).

Every driver fixture is near-uniform, so the shuffle-heavy operators
have never seen a hot key. This tool rewrites the three skew-relevant
tables and copies the rest:

documents (one pass, deterministic by doc_id):
  * HOT DOMAIN      — doc_id % 10 in {0,1,3,4} -> source 'src0'
                      (~40 % of docs in one domain key)
  * GIANT DUP GROUP — doc_id % 10 == 7 -> text replaced by ONE fixed
                      string (~10 % of the corpus in a single exact-dup
                      fingerprint — the hottest possible groupBy key)
  * HOT LSH BAND    — doc_id % 10 in {2,5,8} -> a shared 40-word
                      boilerplate suffix appended (~30 % of docs share
                      shingles, so one MinHash band bucket and the
                      2/3-gram hash keys go hot)
  * n_chars recomputed from the rewritten text

embeddings:
  * HOT CELL/SIG    — vec_id % 10 == 7 -> embedding replaced by the
                      corpus's first vector (one SRP cell / LSH
                      signature carries ~10 % of all vectors)

events:
  * HOT USER        — event_id % 10 < 3 -> user_id = 1 (~30 % of all
                      events through one per-user window partition)

Usage: python tools/make_skewed_sf.py [src_sf_dir] [out_dir]
Defaults: /root/testdata/sf0.1 -> <repo>/.skewdata/sf0.1-skew
Then: SPARK_GRAFT_SF_DIR=<out_dir> SPARK_GRAFT_ONLY=<legs> python bench.py
(tools/skew_sweep.py automates the uniform-vs-skew comparison into
SKEW.md.)
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

BOILER = (
    "boiler the quick spark row scans every column value under one "
    "window group while the stream batch joins the sorted table part "
    "and the hash merge orders each key line fast small big dup filter "
    "vector agg customer query data slow sort scan"
)
DUP_TEXT = (
    "the giant duplicate cluster carries one fixed sentence repeated "
    "across a tenth of the corpus so the fingerprint group by sees a "
    "single hot key"
)


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO, ".skewdata", os.path.basename(src) + "-skew")
    )
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {min(8, os.cpu_count() or 8)}")

    dup = DUP_TEXT.replace("'", "''")
    boiler = BOILER.replace("'", "''")
    con.execute(
        f"""
COPY (
  SELECT doc_id,
         CASE
           WHEN doc_id % 10 = 7 THEN '{dup}'
           WHEN doc_id % 10 IN (2, 5, 8) THEN text || ' {boiler}'
           ELSE text
         END AS text,
         lang,
         CASE WHEN doc_id % 10 IN (0, 1, 3, 4) THEN 'src0' ELSE source
         END AS source,
         CAST(strlen(CASE
           WHEN doc_id % 10 = 7 THEN '{dup}'
           WHEN doc_id % 10 IN (2, 5, 8) THEN text || ' {boiler}'
           ELSE text
         END) AS BIGINT) AS n_chars
  FROM '{src}/documents.parquet'
) TO '{out}/documents.parquet' (FORMAT PARQUET)
"""
    )
    con.execute(
        f"""
COPY (
  SELECT e.vec_id,
         CASE WHEN e.vec_id % 10 = 7 THEN h.embedding ELSE e.embedding
         END AS embedding,
         e.label
  FROM '{src}/embeddings.parquet' e
  CROSS JOIN (
    SELECT embedding FROM '{src}/embeddings.parquet'
    ORDER BY vec_id LIMIT 1
  ) h
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
"""
    )
    con.execute(
        f"""
COPY (
  SELECT event_id, ts,
         CASE WHEN event_id % 10 < 3 THEN 1 ELSE user_id END AS user_id,
         event_type, value, props
  FROM '{src}/events.parquet'
) TO '{out}/events.parquet' (FORMAT PARQUET)
"""
    )
    for t in TABLES:
        if t in ("documents", "embeddings", "events"):
            continue
        shutil.copyfile(f"{src}/{t}.parquet", f"{out}/{t}.parquet")

    # print the achieved skew so SKEW.md can cite it
    for label, q in [
        ("hot-domain share", f"SELECT max(n)::DOUBLE / sum(n) FROM (SELECT source, count(*) n FROM '{out}/documents.parquet' GROUP BY source)"),
        ("giant dup-group share", f"SELECT max(n)::DOUBLE / sum(n) FROM (SELECT md5(text) f, count(*) n FROM '{out}/documents.parquet' GROUP BY f)"),
        ("boiler-suffix share", f"SELECT sum(CASE WHEN text LIKE '%boiler the quick%' THEN 1 ELSE 0 END)::DOUBLE / count(*) FROM '{out}/documents.parquet'"),
        ("hot-vector share", f"SELECT max(n)::DOUBLE / sum(n) FROM (SELECT md5(embedding::VARCHAR) s, count(*) n FROM '{out}/embeddings.parquet' GROUP BY s)"),
        ("hot-user share", f"SELECT max(n)::DOUBLE / sum(n) FROM (SELECT user_id, count(*) n FROM '{out}/events.parquet' GROUP BY user_id)"),
    ]:
        v = con.execute(q).fetchone()[0]
        print(f"{label}: {v:.3f}")
    print("skewed SF written to", out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

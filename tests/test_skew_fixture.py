"""tools/make_skewed_sf.py sanity: the generated fixture must carry the
documented hot-key shares with the SOURCE schema unchanged (r12 — a
first cut silently narrowed n_chars to INTEGER, a schema drift the
sweep's legs would have inherited)."""

from __future__ import annotations

import os
import subprocess
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def skew_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("skew") / "sf0.001-skew")
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "make_skewed_sf.py"),
            "/root/testdata/sf0.001",
            out,
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    return out


def test_hot_key_shares(skew_dir):
    con = duckdb.connect()
    dom = con.execute(
        f"SELECT max(n)::DOUBLE / sum(n) FROM (SELECT source, count(*) n"
        f" FROM '{skew_dir}/documents.parquet' GROUP BY source)"
    ).fetchone()[0]
    assert 0.35 <= dom <= 0.45
    dup = con.execute(
        f"SELECT max(n)::DOUBLE / sum(n) FROM (SELECT md5(text) f,"
        f" count(*) n FROM '{skew_dir}/documents.parquet' GROUP BY f)"
    ).fetchone()[0]
    assert 0.08 <= dup <= 0.12
    usr = con.execute(
        f"SELECT max(n)::DOUBLE / sum(n) FROM (SELECT user_id, count(*) n"
        f" FROM '{skew_dir}/events.parquet' GROUP BY user_id)"
    ).fetchone()[0]
    assert 0.25 <= usr <= 0.35
    vec = con.execute(
        f"SELECT max(n)::DOUBLE / sum(n) FROM (SELECT md5(embedding::"
        f"VARCHAR) s, count(*) n FROM '{skew_dir}/embeddings.parquet'"
        f" GROUP BY s)"
    ).fetchone()[0]
    assert 0.08 <= vec <= 0.13


def test_schema_matches_source(skew_dir):
    con = duckdb.connect()
    for t in ("documents", "embeddings", "events"):
        src = con.execute(
            f"DESCRIBE SELECT * FROM '/root/testdata/sf0.001/{t}.parquet'"
        ).fetchall()
        got = con.execute(
            f"DESCRIBE SELECT * FROM '{skew_dir}/{t}.parquet'"
        ).fetchall()
        assert [(c[0], c[1]) for c in got] == [(c[0], c[1]) for c in src], t


def test_n_chars_tracks_rewritten_text(skew_dir):
    con = duckdb.connect()
    bad = con.execute(
        f"SELECT count(*) FROM '{skew_dir}/documents.parquet'"
        f" WHERE n_chars != strlen(text)"
    ).fetchone()[0]
    assert bad == 0

"""Boilerplate n-gram detection + domain-mixture sampling.

Each operator gets a known-answer test and a DuckDB-replay test (the
same engine-portability bar as the registry oracles — these two ship
outside the driver's 50-entry correctness budget, so the cross-engine
check lives here instead)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pinecone_datasets_spark.operators.boilerplate import (
    boilerplate_profile,
    frequent_ngrams,
)
from pinecone_datasets_spark.operators.mixing import (
    domain_mixture_sample,
    mixture_edges,
    mixture_report,
)


@pytest.fixture()
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps", "web"),
        (2, "buy now cookie banner the quick brown fox", "web"),
        (3, "cookie banner the quick brown dog", "ads"),
        (4, "cookie banner the end", "ads"),
        (5, "tiny", "ads"),  # shorter than n -> zero positions
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).withColumn("n_chars", F.length("text"))


def test_frequent_ngrams_df_threshold(corpus):
    # 3-grams in >= 40% of 5 docs (ceil(2)): shared across >= 2 docs.
    freq = {
        r["ngram"]: r["df"]
        for r in frequent_ngrams(corpus, n=3, min_df_frac=0.4).collect()
    }
    assert freq["the quick brown"] == 3
    assert freq["cookie banner the"] == 3
    assert freq["quick brown fox"] == 2
    # within-one-doc repetition must NOT qualify: all others have df 1
    assert all(v >= 2 for v in freq.values())


def test_boilerplate_profile_counts(corpus):
    prof = {
        r["doc_id"]: r
        for r in boilerplate_profile(corpus, n=3, min_df_frac=0.4).collect()
    }
    assert len(prof) == 5
    # doc 1: 'the quick brown fox jumps' -> 3 positions, 2 frequent
    assert prof[1]["n_positions"] == 3
    assert prof[1]["n_boiler"] == 2
    assert prof[1]["boilerplate_frac"] == pytest.approx(2 / 3, abs=1e-6)
    # doc 5 shorter than n: zero positions, frac defined as 0.0
    assert prof[5]["n_positions"] == 0
    assert prof[5]["boilerplate_frac"] == 0.0
    # doc 4: 'cookie banner the end' -> positions 2, frequent 1
    assert prof[4]["n_positions"] == 2
    assert prof[4]["n_boiler"] == 1


def test_boilerplate_duckdb_replay(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = (
        boilerplate_profile(docs, n=2, min_df_frac=0.02)
        .orderBy("doc_id")
        .toPandas()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = con.execute(
        r"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(text)), '[ \t\n\r\f\x0B]+'),
                     x -> len(x) > 0) AS words
  FROM documents
), g AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(words) >= 2 THEN
           list_transform(generate_series(1, len(words) - 1),
                          i -> array_to_string(words[i:i+1], ' '))
           ELSE []::VARCHAR[] END) AS dgrams,
         CASE WHEN len(words) >= 2 THEN
           list_transform(generate_series(1, len(words) - 1),
                          i -> array_to_string(words[i:i+1], ' '))
           ELSE []::VARCHAR[] END AS pgrams
  FROM w
), dg AS (
  SELECT doc_id, unnest(dgrams) AS ngram FROM g
), freq AS (
  SELECT ngram FROM (
    SELECT ngram, count(*) AS df FROM dg GROUP BY ngram
  ) WHERE df >= CEIL(0.02 * (SELECT count(*) FROM documents))
), pos AS (
  SELECT doc_id, unnest(pgrams) AS ngram FROM g
), hits AS (
  SELECT doc_id, count(*)::BIGINT AS n_boiler
  FROM pos JOIN freq USING (ngram) GROUP BY doc_id
)
SELECT g.doc_id, len(pgrams)::BIGINT AS n_positions,
       coalesce(hits.n_boiler, 0)::BIGINT AS n_boiler,
       CASE WHEN len(pgrams) > 0
            THEN round(coalesce(hits.n_boiler, 0) / len(pgrams), 6)
            ELSE 0.0 END AS boilerplate_frac
FROM g LEFT JOIN hits USING (doc_id)
ORDER BY g.doc_id
"""
    ).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False,
    )
    assert got["n_boiler"].sum() > 0  # threshold actually fires


def test_mixture_edges_cap_and_budget(corpus):
    # ads has 3 docs; web 2. Budget so small web is rate-limited,
    # budget*w >= tokens caps ads at SPLIT_BUCKETS edge = full take.
    edges = mixture_edges(
        corpus, {"web": 0.5, "ads": 0.5}, token_budget=1_000_000
    )
    assert edges["web"][0] == 10_000  # capped at 1.0
    assert edges["ads"][0] == 10_000
    small = mixture_edges(corpus, {"web": 1.0}, token_budget=10)
    # rate = 10/73 -> edge floor(0.136...*10000)
    n_tokens = edges["web"][2]
    assert small["web"][0] == int(min(1.0, 10 / n_tokens) * 10_000)


def test_mixture_sample_deterministic_and_nested(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    weights = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
    lo = domain_mixture_sample(docs, weights, token_budget=5_000)
    hi = domain_mixture_sample(docs, weights, token_budget=20_000)
    lo_ids = {r["doc_id"] for r in lo.select("doc_id").collect()}
    hi_ids = {r["doc_id"] for r in hi.select("doc_id").collect()}
    assert lo_ids <= hi_ids  # nested: bigger budget only adds rows
    again = {
        r["doc_id"]
        for r in domain_mixture_sample(docs, weights, token_budget=5_000)
        .select("doc_id")
        .collect()
    }
    assert again == lo_ids  # deterministic
    srcs = {r["source"] for r in lo.select("source").distinct().collect()}
    assert srcs <= set(weights)


def test_mixture_report_duckdb_replay(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    weights = {"src0": 0.6, "src1": 0.4}
    got = (
        mixture_report(docs, weights, token_budget=8_000)
        .orderBy("source")
        .toPandas()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = con.execute(
        """
WITH avail AS (
  SELECT source, count(*)::BIGINT AS avail_docs,
         sum(n_chars)::BIGINT AS avail_tokens
  FROM documents WHERE source IN ('src0', 'src1') GROUP BY source
), edges AS (
  SELECT source,
         CASE source WHEN 'src0' THEN 0.6 ELSE 0.4 END AS target_weight,
         CAST(FLOOR(LEAST(1.0, (8000.0 *
           CASE source WHEN 'src0' THEN 0.6 ELSE 0.4 END) / avail_tokens)
           * 10000) AS BIGINT) AS rate_edge,
         avail_docs, avail_tokens
  FROM avail
), kept AS (
  SELECT d.source, count(*)::BIGINT AS sampled_docs,
         sum(d.n_chars)::BIGINT AS sampled_tokens
  FROM documents d JOIN edges e USING (source)
  WHERE ('0x' || substr(md5('7|' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
        % 10000 < e.rate_edge
  GROUP BY d.source
)
SELECT e.source, e.target_weight, e.rate_edge, e.avail_docs,
       e.avail_tokens,
       coalesce(k.sampled_docs, 0)::BIGINT AS sampled_docs,
       coalesce(k.sampled_tokens, 0)::BIGINT AS sampled_tokens
FROM edges e LEFT JOIN kept k USING (source)
ORDER BY e.source
"""
    ).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False,
    )
    assert (got["sampled_docs"] > 0).all()


def test_mixture_rejects_bad_weights(corpus):
    with pytest.raises(ValueError):
        mixture_edges(corpus, {}, token_budget=100)
    with pytest.raises(ValueError):
        mixture_edges(corpus, {"web": -1.0}, token_budget=100)


def test_boilerplate_gram_lambda_reads_materialized_words(spark, corpus):
    """Regression guard for the O(tokens²) trap: the explode's gram
    lambda must reference the materialized word-array attribute, never
    an inlined split() (Catalyst does not CSE into higher-order-function
    lambdas — an inlined tokenizer re-tokenizes per gram position;
    measured ~20x at sf0.1)."""
    from pinecone_datasets_spark.operators.boilerplate import (
        boilerplate_profile,
    )

    plan = (
        boilerplate_profile(corpus, n=2, min_df_frac=0.02)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for line in plan.splitlines():
        if "Generate explode" in line:
            assert "split(" not in line, line[:200]


# ---------------------------------------------------------------------------
# duplicated_spans (Lee et al. exact-substring-dedup approximation)
# ---------------------------------------------------------------------------


def test_duplicated_spans_known_answer(spark):
    from pinecone_datasets_spark.operators.boilerplate import (
        duplicated_spans,
    )

    rows = [
        # docs 1 and 2 share the 6-word run "one two three four five six"
        (1, "one two three four five six alpha beta gamma"),
        (2, "zzz one two three four five six qqq"),
        (3, "totally different words everywhere here now"),
        (4, "tiny"),  # shorter than k -> zeros
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (
            r["n_positions"],
            r["n_dup_positions"],
            r["longest_dup_run"],
            r["dup_frac"],
        )
        for r in duplicated_spans(df, k=3).collect()
    }
    # doc 1: 7 positions; shared 3-grams of the 6-word run = 4 positions
    # (one two three .. four five six) -> run 4 -> substring 4+3-1=6 words
    assert out[1] == (7, 4, 4, round(4 / 7, 6))
    assert out[2] == (6, 4, 4, round(4 / 6, 6))
    assert out[3] == (4, 0, 0, 0.0)
    assert out[4] == (0, 0, 0, 0.0)


def test_duplicated_spans_within_doc_repeat_not_counted(spark):
    """Duplication means ACROSS documents: a k-gram repeated only inside
    one doc does not mark positions."""
    from pinecone_datasets_spark.operators.boilerplate import (
        duplicated_spans,
    )

    df = spark.createDataFrame(
        [(1, "ha ha ha ha ha ha"), (2, "unrelated content here")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["n_dup_positions"]
        for r in duplicated_spans(df, k=3).collect()
    }
    assert out == {1: 0, 2: 0}


def test_duplicated_spans_disjoint_runs(spark):
    from pinecone_datasets_spark.operators.boilerplate import (
        duplicated_spans,
    )

    rows = [
        (1, "a b c X X X d e f"),
        (2, "a b c Y Y Y d e f"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["n_dup_positions"], r["longest_dup_run"])
        for r in duplicated_spans(df, k=3).collect()
    }
    # shared grams: "a b c" at pos 0 and "d e f" at pos 6 -> two
    # singleton runs
    assert out[1] == (2, 1)
    assert out[2] == (2, 1)


def test_remove_duplicated_spans_known_answer(spark):
    from pinecone_datasets_spark.operators.boilerplate import (
        remove_duplicated_spans,
    )

    rows = [
        (1, "one two three four five six alpha beta gamma"),
        (2, "zzz one two three four five six qqq"),
        (3, "totally different words everywhere here now"),
        (4, "tiny"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["clean_text"], r["n_removed_words"])
        for r in remove_duplicated_spans(df, k=3).collect()
    }
    # the shared 6-word run vanishes from BOTH docs (symmetric
    # semantics); unique remainders survive
    assert out[1] == ("alpha beta gamma", 6)
    assert out[2] == ("zzz qqq", 6)
    assert out[3] == ("totally different words everywhere here now", 0)
    assert out[4] == ("tiny", 0)


def test_remove_duplicated_spans_consistent_with_profile(spark, corpus):
    """Removal accounting matches the profile: a doc with no duplicated
    positions loses nothing; every doc with hits loses >= k words of a
    longest run."""
    from pinecone_datasets_spark.operators.boilerplate import (
        duplicated_spans,
        remove_duplicated_spans,
    )

    prof = {
        r["doc_id"]: (r["n_dup_positions"], r["longest_dup_run"])
        for r in duplicated_spans(corpus, k=3).collect()
    }
    rem = {
        r["doc_id"]: r["n_removed_words"]
        for r in remove_duplicated_spans(corpus, k=3).collect()
    }
    assert set(prof) == set(rem)
    for d, (ndp, run) in prof.items():
        if ndp == 0:
            assert rem[d] == 0
        else:
            # a run of r positions covers r + k - 1 words
            assert rem[d] >= run + 3 - 1


# ---------------------------------------------------------------------------
# interleave_by_weights
# ---------------------------------------------------------------------------


def test_interleave_rates_hold_in_every_prefix(spark):
    from pinecone_datasets_spark.operators.mixing import interleave_by_weights

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    w = {"src0": 3.0, "src1": 1.0}
    out = interleave_by_weights(docs, w).collect()
    doms = [r.source for r in out]
    assert set(doms) == {"src0", "src1"}
    n0, n1 = doms.count("src0"), doms.count("src1")
    # BEFORE either domain exhausts, every position-window carries the
    # domains at exactly their rate: up to virtual position P there are
    # floor(3P + 0.5) src0 rows and floor(P + 0.5) src1 rows
    # probe strictly inside the last position — frac=1.0 would sit
    # exactly on a row's position where one ULP of the /3.0 division
    # flips the truncated expected count
    safe = min((n0 - 0.5) / 3.0, (n1 - 0.5) / 1.0)
    for frac in (0.25, 0.5, 0.95):
        P = safe * frac
        pre = [r.source for r in out if r.mix_pos <= P]
        a, b = pre.count("src0"), pre.count("src1")
        assert a == int(3 * P + 0.5) and b == int(P + 0.5), (P, a, b)
    # positions are nondecreasing (the output IS the export order)
    pos = [r.mix_pos for r in out]
    assert pos == sorted(pos)


def test_interleave_deterministic_and_duckdb_twin(spark):
    import duckdb

    from pinecone_datasets_spark.operators.mixing import (
        interleave_by_weights,
        interleave_sql,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    w = {"src2": 2.0, "src5": 1.0, "src7": 0.5}
    got = [
        (r.doc_id, r.source, round(r.mix_pos, 9))
        for r in interleave_by_weights(docs, w).select(
            "doc_id", "source", "mix_pos"
        ).collect()
    ]
    assert got == [
        (r.doc_id, r.source, round(r.mix_pos, 9))
        for r in interleave_by_weights(docs, w).select(
            "doc_id", "source", "mix_pos"
        ).collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    want = [
        (r[0], r[1], round(r[2], 9))
        for r in con.execute(
            interleave_sql(w, "documents", select_cols="doc_id, source")
        ).fetchall()
    ]
    assert got == want


def test_interleave_guards(spark):
    from pinecone_datasets_spark.operators.mixing import (
        interleave_by_weights,
        interleave_sql,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    with pytest.raises(ValueError):
        interleave_by_weights(docs, {})
    with pytest.raises(ValueError):
        interleave_by_weights(docs, {"src0": 0.0})
    # the SQL twin enforces the SAME guards (w > 0, finite, non-empty)
    with pytest.raises(ValueError):
        interleave_sql({}, "documents")
    with pytest.raises(ValueError):
        interleave_sql({"src0": 0.0}, "documents")
    with pytest.raises(ValueError):
        interleave_sql({"src0": float("nan")}, "documents")
    with pytest.raises(ValueError):
        interleave_by_weights(docs, {"src0": float("inf")})


def test_interleave_sql_escapes_quotes():
    from pinecone_datasets_spark.operators.mixing import interleave_sql

    sql = interleave_sql({"o'reilly": 1.0}, "documents")
    assert "'o''reilly'" in sql and "'o'reilly'" not in sql


def test_write_curriculum_manifest_order(spark, tmp_path):
    """Reading the written files in manifest order replays the exact
    global curriculum order: disjoint-ish ranges, nondecreasing concat."""
    import pyarrow.parquet as pq

    from pinecone_datasets_spark.operators.mixing import (
        interleave_by_weights,
        write_curriculum,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = interleave_by_weights(docs, {"src0": 3.0, "src1": 1.0})
    path = str(tmp_path / "curriculum")
    manifest = write_curriculum(out, path, num_files=4)
    assert 1 <= len(manifest) <= 4
    assert sum(m["rows"] for m in manifest) == out.count()
    # ranges ordered by pos_min and non-inverted within each file
    mins = [m["pos_min"] for m in manifest]
    assert mins == sorted(mins)
    for m in manifest:
        assert m["pos_min"] <= m["pos_max"]
    # concatenating files in manifest order yields nondecreasing pos
    seq = []
    for m in manifest:
        seq.extend(
            pq.read_table(f"{path}/{m['file']}", columns=["mix_pos"])
            .column("mix_pos")
            .to_pylist()
        )
    assert seq == sorted(seq)
    # manifest.json landed next to the data
    import json

    with open(f"{path}/manifest.json") as f:
        assert json.load(f) == manifest


def test_write_curriculum_through_fs_layer(spark, tmp_path):
    """The manifest sidecar goes through the FS facade (fs.py), not a
    bare posix open(): a ``file:`` URI — which posix open() cannot take
    verbatim — round-trips, proving the object-store-capable path is
    the one in use (VERDICT r5 item 2)."""
    import json

    from pinecone_datasets_spark.operators.mixing import (
        interleave_by_weights,
        write_curriculum,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = interleave_by_weights(docs, {"src0": 2.0, "src1": 1.0})
    local = tmp_path / "curriculum_fs"
    manifest = write_curriculum(out, f"file://{local}", num_files=2)
    with open(local / "manifest.json") as f:
        assert json.load(f) == manifest
    assert sum(m["rows"] for m in manifest) == out.count()


def test_interleave_rank_window_is_bucketed(spark):
    """Scale shape: the rank window partitions by (domain, bucket), not
    the bare low-cardinality domain column — each domain's rows spread
    over rank_buckets window partitions."""
    from pinecone_datasets_spark.operators.mixing import interleave_by_weights

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = interleave_by_weights(docs, {"src0": 2.0, "src1": 1.0})
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    wins = [ln for ln in plan.splitlines() if "row_number()" in ln]
    assert wins, plan
    # the row_number window spec must carry BOTH partition keys
    assert any(
        "source" in ln and "__mb" in ln for ln in wins
    ), "\n".join(wins)


def test_interleave_null_id_raises(spark):
    """NULL ids must fail loudly — a NULL md5 bucket would silently
    vanish at the offsets equi-join (and diverge from the SQL twin)."""
    from pinecone_datasets_spark.operators.mixing import interleave_by_weights

    docs = spark.createDataFrame(
        [("a", "src0"), (None, "src0"), ("b", "src1")],
        "doc_id string, source string",
    )
    with pytest.raises(Exception) as exc:
        interleave_by_weights(docs, {"src0": 1.0, "src1": 1.0}).collect()
    assert "non-null" in str(exc.value)


def test_write_curriculum_tied_positions_deterministic(spark, tmp_path):
    """Integer weight ratios make positions tie ((i-.5)/3 == (j-.5)/1);
    the written order must still be the interleave's (pos, domain, id)
    order, not shuffle luck."""
    import pyarrow.parquet as pq

    from pinecone_datasets_spark.operators.mixing import (
        interleave_by_weights,
        write_curriculum,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = interleave_by_weights(docs, {"src0": 3.0, "src1": 1.0})
    want = [
        (round(r.mix_pos, 9), r.source, r.doc_id)
        for r in out.select("mix_pos", "source", "doc_id").collect()
    ]
    assert len({w[0] for w in want}) < len(want), "fixture must have ties"
    path = str(tmp_path / "curriculum_tied")
    manifest = write_curriculum(out, path, num_files=5)
    # manifest carries the first-row composite key and is ordered by it
    # (pos_min alone is ambiguous when a tie-run straddles a file
    # boundary — ADVICE r5); composite keys are strictly increasing.
    keys = [
        (m["first_key"]["mix_pos"], m["first_key"]["source"],
         m["first_key"]["doc_id"])
        for m in manifest
    ]
    assert keys == sorted(keys) and len(set(keys)) == len(keys)
    got = []
    for m in manifest:
        t = pq.read_table(
            f"{path}/{m['file']}", columns=["mix_pos", "source", "doc_id"]
        )
        got.extend(
            zip(
                [round(p, 9) for p in t.column("mix_pos").to_pylist()],
                t.column("source").to_pylist(),
                t.column("doc_id").to_pylist(),
            )
        )
    assert got == want


def test_read_curriculum_replays_exact_order(spark, tmp_path):
    """read_curriculum(write_curriculum(df)) == df row-for-row in order,
    with deliberate position ties straddling file boundaries (num_files
    high enough that tie-runs split across files)."""
    from pinecone_datasets_spark.operators.mixing import (
        interleave_by_weights,
        read_curriculum,
        write_curriculum,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = interleave_by_weights(docs, {"src0": 3.0, "src1": 1.0})
    want = [
        (round(r.mix_pos, 9), r.source, r.doc_id)
        for r in out.orderBy("mix_pos", "source", "doc_id")
        .select("mix_pos", "source", "doc_id")
        .collect()
    ]
    assert len({w[0] for w in want}) < len(want), "fixture must have ties"
    path = str(tmp_path / "curriculum_replay")
    write_curriculum(out, path, num_files=7)
    got = [
        (round(r.mix_pos, 9), r.source, r.doc_id)
        for r in read_curriculum(spark, path)
        .select("mix_pos", "source", "doc_id")
        .collect()
    ]
    assert got == want


def test_read_curriculum_detects_manifest_drift(spark, tmp_path):
    """A parquet file added behind the manifest's back (or one named in
    the manifest but deleted) must fail loud, not replay a wrong order."""
    import json
    import shutil

    from pinecone_datasets_spark.operators.mixing import (
        interleave_by_weights,
        read_curriculum,
        write_curriculum,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = interleave_by_weights(docs, {"src0": 1.0, "src1": 1.0})
    path = str(tmp_path / "curriculum_drift")
    manifest = write_curriculum(out, path, num_files=3)

    # extra file on disk, not in manifest
    src = f"{path}/{manifest[0]['file']}"
    shutil.copy(src, f"{path}/part-zzz-extra.snappy.parquet")
    with pytest.raises(ValueError, match="manifest/directory mismatch"):
        read_curriculum(spark, path).collect()

    # manifest names a file that is gone
    import os

    os.remove(f"{path}/part-zzz-extra.snappy.parquet")
    os.remove(src)
    with pytest.raises(ValueError, match="manifest/directory mismatch"):
        read_curriculum(spark, path).collect()


# ---------------------------------------------------------------------------
# C4 sentence-span dedup
# ---------------------------------------------------------------------------


def test_remove_duplicated_sentence_spans_cross_doc(spark):
    from pinecone_datasets_spark.operators.boilerplate import (
        remove_duplicated_sentence_spans,
    )

    shared = "Alpha one. Beta two. Gamma three."
    rows = [
        (1, f"Unique opener here. {shared} Unique closer one."),
        (2, f"Different intro text. {shared} Different outro two."),
        (3, "Totally unrelated. Nothing shared at all. Every part unique."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["clean_text"], r["n_removed_sentences"])
        for r in remove_duplicated_sentence_spans(df, n=3).collect()
    }
    # the shared 3-sentence span dies in BOTH docs (symmetric);
    # its sentences are covered, the unique flanks survive
    assert out[1] == ("Unique opener here. Unique closer one.", 3)
    assert out[2] == ("Different intro text. Different outro two.", 3)
    assert out[3][1] == 0 and "Totally unrelated." in out[3][0]


def test_remove_duplicated_sentence_spans_within_doc_counts(spark):
    """C4 counts OCCURRENCES, not documents: a span repeated inside one
    doc qualifies and every occurrence is removed."""
    from pinecone_datasets_spark.operators.boilerplate import (
        remove_duplicated_sentence_spans,
    )

    rep = "One. Two. Three."
    df = spark.createDataFrame(
        [(1, f"Start here. {rep} Middle part. {rep} End bit.")],
        "doc_id long, text string",
    )
    r = remove_duplicated_sentence_spans(df, n=3).collect()[0]
    assert r["clean_text"] == "Start here. Middle part. End bit."
    assert r["n_removed_sentences"] == 6


def test_remove_duplicated_sentence_spans_short_docs_untouched(spark):
    from pinecone_datasets_spark.operators.boilerplate import (
        remove_duplicated_sentence_spans,
    )

    df = spark.createDataFrame(
        [(1, "Only two. Sentences here."), (2, "Only two. Sentences here.")],
        "doc_id long, text string",
    )
    got = remove_duplicated_sentence_spans(df, n=3).collect()
    for r in got:
        assert r["n_removed_sentences"] == 0
        assert r["clean_text"] == "Only two. Sentences here."
    with pytest.raises(ValueError):
        remove_duplicated_sentence_spans(df, n=0)
    with pytest.raises(ValueError):
        remove_duplicated_sentence_spans(df, min_count=1)


def test_remove_duplicated_sentence_spans_duckdb_replay(spark):
    """Engine-replayability: the same rule implemented in DuckDB SQL on
    the same fixture produces identical rewrites."""
    duckdb = pytest.importorskip("duckdb")
    from pinecone_datasets_spark.functions.text import split_sentences_sql
    from pinecone_datasets_spark.operators.boilerplate import (
        remove_duplicated_sentence_spans,
    )

    shared = "Alpha one. Beta two. Gamma three."
    rows = [
        (1, f"Opener A. {shared} Closer A. Extra A."),
        (2, f"Opener B. {shared} Closer B."),
        (3, "Lone doc. No overlap. All original. Kept whole."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["clean_text"]
        for r in remove_duplicated_sentence_spans(df, n=3).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    sents = split_sentences_sql("text")
    exp = con.execute(f"""
WITH s AS (SELECT doc_id, {sents} AS sents FROM docs),
spans AS (
  SELECT doc_id, g - 1 AS pos,
         md5(array_to_string(sents[g:g+2], ' ')) AS h
  FROM (SELECT doc_id, sents,
               unnest(generate_series(1, greatest(len(sents) - 2, 0))) AS g
        FROM s)
),
rep AS (SELECT h FROM spans GROUP BY h HAVING count(*) >= 2),
hits AS (
  SELECT doc_id,
         flatten(list_transform(list(pos), p -> [p, p + 1, p + 2])) AS cov
  FROM spans JOIN rep USING (h) GROUP BY doc_id
),
rewritten AS (
  SELECT s.doc_id,
         array_to_string(
           list_transform(
             list_filter(
               list_transform(sents,
                 (v, i) -> struct_pack(s := v, i := i - 1)),
               x -> NOT list_contains(coalesce(cov, []), x.i)),
             x -> x.s),
           ' ') AS clean_text
  FROM s LEFT JOIN hits USING (doc_id)
)
SELECT doc_id, clean_text FROM rewritten ORDER BY doc_id
""").fetchall()
    assert got == dict(exp)


def test_read_curriculum_refuses_planted_duplicate_part(spark, tmp_path):
    """r9 verdict item 6: a speculative-twin part file (an orphaned
    loser attempt landing after the commit) must NOT double-feed
    read_curriculum — the manifest/directory reconciliation refuses
    loudly, the curriculum-export analogue of test_shards.py's
    loser-attempt test. Removing the orphan restores the exact-order
    replay."""
    import os
    import shutil

    from pinecone_datasets_spark.operators.mixing import (
        interleave_by_weights,
        read_curriculum,
        write_curriculum,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = interleave_by_weights(docs, {"src0": 2.0, "src1": 1.0})
    path = str(tmp_path / "cur_dup")
    manifest = write_curriculum(out, path, num_files=3)

    # plant a duplicate: copy one committed part under a new
    # attempt-style name (what a zombie speculative task leaves on an
    # object store with no atomic rename)
    victim = manifest[0]["file"]
    twin = victim.replace(".parquet", "") + "-attempt2.parquet"
    shutil.copyfile(os.path.join(path, victim), os.path.join(path, twin))

    with pytest.raises(ValueError, match="manifest/directory mismatch"):
        read_curriculum(spark, path).collect()

    os.unlink(os.path.join(path, twin))
    got = read_curriculum(spark, path)
    expect = [
        (r["source"], r["doc_id"])
        for r in out.select("source", "doc_id").collect()
    ]
    assert [
        (r["source"], r["doc_id"])
        for r in got.select("source", "doc_id").collect()
    ] == expect
    assert sum(m["rows"] for m in manifest) == len(expect)


def test_remove_duplicated_sentence_spans_fully_stripped_is_empty_string(
    spark,
):
    """A doc whose EVERY sentence dies must come back as the EMPTY
    STRING, not NULL — Spark's concat_ws over zero kept sentences is ''
    (the r10 sf0.1 sweep caught the SQL twin diverging here: DuckDB's
    array_to_string([]) is NULL and needed a coalesce)."""
    from pinecone_datasets_spark.operators.boilerplate import (
        remove_duplicated_sentence_spans,
    )

    shared = "Alpha one. Beta two. Gamma three."
    df = spark.createDataFrame(
        [(1, shared), (2, shared), (3, "Something else entirely here.")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["clean_text"], r["n_removed_sentences"])
        for r in remove_duplicated_sentence_spans(df, n=3).collect()
    }
    assert out[1] == ("", 3) and out[2] == ("", 3)
    assert out[3][1] == 0


def test_mixture_rejects_nan_weight_and_survives_null_tokens(spark):
    """A NaN weight must be rejected up front (it silently uncapped
    every rate: min(1.0, NaN) is 1.0 in Python), and an all-NULL token
    column must yield the clean edge-0 path, not int(None) (r10
    review)."""
    from pinecone_datasets_spark.operators.mixing import mixture_edges

    df = spark.createDataFrame(
        [("web", 1, None), ("web", 2, None)],
        "source string, doc_id long, n_chars long",
    )
    with pytest.raises(ValueError, match="finite"):
        mixture_edges(df, {"web": float("nan")}, 100)
    edges = mixture_edges(df, {"web": 1.0}, 100)
    assert edges["web"] == (0, 2, 0)


def test_mixture_edges_invalid_budget_fails_before_scan(spark):
    """r11 ADVICE: token_budget was validated only AFTER the per-domain
    aggregate collect, so an invalid budget still paid a full corpus
    scan. Prove the check fires before any Spark action: the documents
    frame here EXPLODES if executed (ANSI division by zero), so a
    ValueError — not a Spark error — means validation came first."""
    import pytest
    from pyspark.sql import functions as F

    poisoned = spark.range(10).select(
        F.lit("web").alias("source"),
        (F.lit(1) / (F.col("id") - F.col("id"))).alias("n_chars"),
        F.col("id").alias("doc_id"),
    )
    for bad in (None, 0, -5):
        with pytest.raises(ValueError, match="token_budget"):
            mixture_edges(poisoned, {"web": 1.0}, token_budget=bad)

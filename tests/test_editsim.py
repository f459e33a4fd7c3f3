"""Edit-distance similarity join (operators/editsim.py): prefix-filter
losslessness against brute force, short-string fallback, planted
variants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pinecone_datasets_spark.operators.editsim import edit_distance_pairs


def _brute(rows, d):
    import itertools

    def lev(a, b):
        if abs(len(a) - len(b)) > d:
            return d + 1
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(
                        prev[j] + 1,
                        cur[j - 1] + 1,
                        prev[j - 1] + (ca != cb),
                    )
                )
            prev = cur
        return prev[-1]

    out = {}
    for (ia, ta), (ib, tb) in itertools.combinations(rows, 2):
        dist = lev(ta, tb)
        if dist <= d:
            out[(min(ia, ib), max(ia, ib))] = dist
    return out


def test_prefix_filter_is_lossless_vs_bruteforce(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),   # d=3
        (3, "the quick brown fox leaps over the lazy dog"),   # d<=4
        (4, "completely different content here entirely"),
        (5, "the quick brown fox jumps over the lazy dog!"),  # d=1
        (6, "xx"),                                            # short
        (7, "xy"),                                            # short, d=1
        (8, "zz"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for d in (1, 2, 4):
        got = {
            (r["id_a"], r["id_b"]): r["distance"]
            for r in edit_distance_pairs(df, max_distance=d).collect()
        }
        assert got == _brute(rows, d), f"d={d}"


def test_planted_variants_on_fixture(spark, sf_dir):
    """Fixture docs (200-char prefixes) plus 4-char-suffixed variants:
    the join finds exactly the planted pairs at d=4."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("doc_id") < 100)
        .select("doc_id", F.substring("text", 1, 200).alias("text"))
    )
    pert = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 3_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" xyz")).alias("text"),
    )
    corpus = docs.unionByName(pert)
    got = {
        (r["id_a"], r["id_b"]): r["distance"]
        for r in edit_distance_pairs(corpus, max_distance=4).collect()
    }
    # ground truth via DuckDB's levenshtein (the same brute-force
    # contract the q17 oracle uses)
    import duckdb

    rows = [(r["doc_id"], r["text"]) for r in corpus.collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = {
        (ia, ib): d
        for ia, ib, d in con.execute(
            """
            SELECT a.id, b.id, levenshtein(a.s, b.s)
            FROM t a JOIN t b ON a.id < b.id
              AND abs(length(a.s) - length(b.s)) <= 4
            WHERE levenshtein(a.s, b.s) <= 4
            """
        ).fetchall()
    }
    assert got == want
    # every planted pair is in there at exactly distance 4
    planted = {
        (r["doc_id"], r["doc_id"] + 3_000_000)
        for r in docs.where(F.col("doc_id") % 10 == 0).collect()
    }
    assert planted <= set(got)
    assert all(got[p] == 4 for p in planted)


def test_validates(spark):
    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError):
        edit_distance_pairs(df, max_distance=-1)
    with pytest.raises(ValueError):
        edit_distance_pairs(df, q=0)


def test_no_cartesian_in_plan(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("doc_id") < 50)
        .select("doc_id", F.substring("text", 1, 100).alias("text"))
    )
    plan = (
        edit_distance_pairs(docs, max_distance=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan


def test_gram_poor_strings_within_distance_are_found(spark):
    """r11 review: the pigeonhole guarantee needs >= q*d+1 DISTINCT
    grams. 'abcde' vs 'azcze' are at distance 2 but share zero 3-grams
    — the old length<q fallback missed them entirely."""
    from pinecone_datasets_spark.operators.editsim import edit_distance_pairs

    df = spark.createDataFrame(
        [(1, "abcde"), (2, "azcze")], "doc_id long, text string"
    )
    out = {
        (r.id_a, r.id_b, r.distance)
        for r in edit_distance_pairs(df, max_distance=2).collect()
    }
    assert out == {(1, 2, 2)}


def test_repeated_char_strings_any_length_are_found(spark):
    """'aaaaaaa' has ONE distinct 3-gram regardless of length, so two
    edits can destroy its whole gram set — distinct-gram count, not
    string length, decides the fallback band."""
    from pinecone_datasets_spark.operators.editsim import edit_distance_pairs

    df = spark.createDataFrame(
        [(1, "aaaaaaa"), (2, "aabaaba")], "doc_id long, text string"
    )
    out = {
        (r.id_a, r.id_b, r.distance)
        for r in edit_distance_pairs(df, max_distance=2).collect()
    }
    assert (1, 2, 2) in out


def test_identical_short_strings_at_distance_zero(spark):
    """r11 review: max_distance=0 skipped the short-string fallback, so
    identical <q-char strings were never paired."""
    from pinecone_datasets_spark.operators.editsim import edit_distance_pairs

    df = spark.createDataFrame(
        [(1, "ab"), (2, "ab"), (3, "cd")], "doc_id long, text string"
    )
    out = {
        (r.id_a, r.id_b, r.distance)
        for r in edit_distance_pairs(df, max_distance=0).collect()
    }
    assert out == {(1, 2, 0)}


def test_prefix_filter_still_lossless_vs_brute_force(spark):
    """Sweep a small mixed corpus (short, repeated-char, and normal
    strings) against brute force at several (q, d) settings."""
    from pyspark.sql import functions as F

    from pinecone_datasets_spark.operators.editsim import edit_distance_pairs

    rows = [
        (1, "abcde"), (2, "azcze"), (3, "abcdef"), (4, "abcxef"),
        (5, "aaaa"), (6, "aaba"), (7, "xy"), (8, "xy"), (9, "xz"),
        (10, "hello world"), (11, "hello world"), (12, "completely diff"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = df.select(F.col("doc_id").alias("id_a"), F.col("text").alias("ta"))
    b = df.select(F.col("doc_id").alias("id_b"), F.col("text").alias("tb"))
    for d in (0, 1, 2):
        brute = {
            (r.id_a, r.id_b, r.d)
            for r in a.join(b, F.col("id_a") < F.col("id_b"))
            .withColumn("d", F.levenshtein("ta", "tb"))
            .where(F.col("d") <= d)
            .collect()
        }
        got = {
            (r.id_a, r.id_b, r.distance)
            for r in edit_distance_pairs(df, max_distance=d).collect()
        }
        assert got == brute, (d, got ^ brute)


def test_gram_poor_cross_band_lengths_are_found(spark):
    """r13: the gram-poor fallback is a length-band EQUI-join (width
    d+1, shorts exploded to the 3 adjacent bands) instead of a
    broadcast nested-loop. The pair below sits in ADJACENT bands
    (d=2 -> width 3: len 4 -> band 1, len 6 -> band 2), so dropping
    the +/-1 band explode silently loses it."""
    from pinecone_datasets_spark.operators.editsim import edit_distance_pairs

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "aaaaaa"), (3, "zzzzzzzzzz")],
        "doc_id long, text string",
    )
    out = {
        (r.id_a, r.id_b, r.distance)
        for r in edit_distance_pairs(df, max_distance=2).collect()
    }
    assert (1, 2, 2) in out
    assert not any(3 in (a, b) for a, b, _ in out)

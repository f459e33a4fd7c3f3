"""Domain curation (operators/domains.py) + snapshot diff
(operators/snapshot.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pinecone_datasets_spark.operators.domains import (
    cap_domains,
    domain_report,
    filter_domains,
    registrable_domain,
    url_host,
)
from pinecone_datasets_spark.operators.snapshot import (
    snapshot_diff,
    snapshot_summary,
)


def _docs(spark):
    rows = [
        (0, "alpha beta gamma", "en", "a.com"),
        (1, "alpha beta gamma", "en", "a.com"),   # exact dup of 0
        (2, "delta epsilon", "de", "a.com"),
        (3, "zeta eta theta iota", "en", "b.org"),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


def test_url_host_and_registrable_domain(spark):
    rows = [
        ("https://news.example.com/a/b?x=1",),
        ("http://Sub.Deep.example.CO.UK/path",),
        ("https://example.org",),
        ("not a url",),
    ]
    df = spark.createDataFrame(rows, "url string")
    out = df.select(
        url_host("url").alias("h"),
        registrable_domain(url_host("url")).alias("d"),
    ).collect()
    assert (out[0].h, out[0].d) == ("news.example.com", "example.com")
    assert (out[1].h, out[1].d) == (
        "sub.deep.example.co.uk",
        "example.co.uk",
    )
    assert (out[2].h, out[2].d) == ("example.org", "example.org")
    assert out[3].h is None and out[3].d is None


def test_registrable_domain_bare_suffix_and_short(spark):
    df = spark.createDataFrame([("co.uk",), ("localhost",)], "h string")
    out = df.select(registrable_domain("h").alias("d")).collect()
    assert out[0].d == "co.uk"     # a bare public suffix stays itself
    assert out[1].d == "localhost"


def test_domain_report_counts_and_dup_rate(spark):
    rep = {r.domain: r for r in domain_report(_docs(spark)).collect()}
    a, b = rep["a.com"], rep["b.org"]
    assert a.n_docs == 3 and b.n_docs == 1
    assert a.n_unique == 2          # docs 0/1 share a fingerprint
    assert a.dup_rate == pytest.approx(1 - 2 / 3, abs=1e-6)
    assert b.dup_rate == 0.0
    assert a.n_langs == 2 and b.n_langs == 1
    assert a.corpus_share == pytest.approx(0.75)
    assert b.corpus_share == pytest.approx(0.25)
    assert a.total_chars == sum(len(t) for t in
                                ("alpha beta gamma",) * 2 + ("delta epsilon",))


def test_filter_domains_block_then_allow(spark):
    docs = _docs(spark)
    block = spark.createDataFrame([("b.org",)], "domain string")
    out = filter_domains(docs, blocklist=block)
    assert {r.source for r in out.collect()} == {"a.com"}
    allow = spark.createDataFrame([("b.org",)], "domain string")
    out = filter_domains(docs, allowlist=allow)
    assert {r.doc_id for r in out.collect()} == {3}
    # block wins over allow when a domain is in both
    out = filter_domains(docs, blocklist=block, allowlist=allow)
    assert out.count() == 0


def test_cap_domains_keeps_best_first(spark):
    docs = _docs(spark)
    out = cap_domains(docs, 2)
    got = sorted((r.source, r.doc_id) for r in out.collect())
    assert got == [("a.com", 0), ("a.com", 1), ("b.org", 3)]
    # custom order: keep longest text per domain
    out = cap_domains(
        docs, 1, order_by=[F.length("text").desc(), F.col("doc_id")]
    )
    got = {r.source: r.doc_id for r in out.collect()}
    assert got == {"a.com": 0, "b.org": 3}


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [(0, "same text"), (1, "will change"), (2, "will vanish")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(0, "same text"), (1, "has changed"), (3, "brand new")],
        "doc_id long, text string",
    )
    d = {r.doc_id: r.status for r in snapshot_diff(old, new).collect()}
    assert d == {1: "changed", 2: "removed", 3: "added"}
    full = snapshot_diff(old, new, include_unchanged=True)
    d = {r.doc_id: r.status for r in full.collect()}
    assert d[0] == "unchanged" and len(d) == 4
    # normalization: whitespace/case changes are NOT content changes
    old2 = spark.createDataFrame([(9, "Hello  World")], "doc_id long, text string")
    new2 = spark.createDataFrame([(9, "hello world")], "doc_id long, text string")
    assert snapshot_diff(old2, new2).count() == 0
    s = {r.status: r.n for r in snapshot_summary(snapshot_diff(old, new)).collect()}
    assert s == {"changed": 1, "removed": 1, "added": 1}


def test_snapshot_diff_precomputed_fingerprint(spark):
    old = spark.createDataFrame([(0, "aa"), (1, "bb")], "doc_id long, fp string")
    new = spark.createDataFrame([(0, "aa"), (1, "zz")], "doc_id long, fp string")
    d = {
        r.doc_id: r.status
        for r in snapshot_diff(old, new, fingerprint_col="fp").collect()
    }
    assert d == {1: "changed"}


def test_diff_datasets_through_catalog(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from pinecone_datasets_spark import Catalog, Dataset
    from pinecone_datasets_spark.metadata import (
        DatasetMetadata,
        DenseModelMetadata,
    )
    from pinecone_datasets_spark.operators.snapshot import diff_datasets

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.select(
        F.col("vec_id").cast("string").alias("id"),
        F.col("embedding").cast("array<float>").alias("values"),
        F.to_json(F.struct(F.col("label"))).alias("metadata"),
    )

    def save(name, df):
        meta = DatasetMetadata(
            name=name, documents=df.count(), queries=0,
            dense_model=DenseModelMetadata(name="synthetic", dimension=64),
        )
        Catalog(spark, base_path=str(tmp_path)).save_dataset(
            Dataset.from_dataframe(spark, df, meta)
        )

    save("corpus-v1", base)
    v2 = base.where(F.col("id").cast("long") % 10 != 0).withColumn(
        "metadata",
        F.when(
            F.col("id").cast("long") % 3 == 0, F.lit('{"label": 999}')
        ).otherwise(F.col("metadata")),
    )
    save("corpus-v2", v2)

    cat = Catalog(spark, base_path=str(tmp_path))
    d = diff_datasets(cat, "corpus-v1", "corpus-v2")
    rows = d.collect()
    by_status = {}
    for r in rows:
        by_status.setdefault(r.status, set()).add(int(r.id))
    n = base.count()
    assert by_status["removed"] == {i for i in range(n) if i % 10 == 0}
    assert by_status["changed"] == {
        i for i in range(n) if i % 10 != 0 and i % 3 == 0
    }
    assert "added" not in by_status
    # values-only diff ignores the metadata rewrite
    d2 = diff_datasets(cat, "corpus-v1", "corpus-v2",
                       content_cols=["values"])
    s2 = {r.status for r in d2.collect()}
    assert s2 == {"removed"}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        diff_datasets(cat, "corpus-v1", "corpus-v2", content_cols=[])


def test_fixture_scale_snapshot_and_report(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # simulate v2: drop ids %7==0, rewrite text of %5==0, add shifted ids
    v2 = (
        docs.where(F.col("doc_id") % 7 != 0)
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" v2"))
            ).otherwise(F.col("text")),
        )
        .unionByName(
            docs.limit(10).withColumn("doc_id", F.col("doc_id") + 10_000_000)
        )
    )
    s = {r.status: r.n for r in snapshot_summary(snapshot_diff(docs, v2)).collect()}
    n = docs.count()
    assert s["added"] == 10
    assert s["removed"] == len([i for i in range(n) if i % 7 == 0])
    # changed = %5==0 survivors of the %7 filter
    assert s["changed"] == len(
        [i for i in range(n) if i % 7 != 0 and i % 5 == 0]
    )
    rep = domain_report(docs)
    tot = rep.agg(
        F.sum("n_docs").alias("nd"), F.sum("corpus_share").alias("cs")
    ).collect()[0]
    assert tot.nd == n and abs(tot.cs - 1.0) < 1e-3


# ---------------------------------------------------------------------------
# URL canonicalization
# ---------------------------------------------------------------------------

_MESSY_URLS = [
    "HTTPS://WWW.Example.COM:443/a//b/c/?utm_source=x&b=2&a=1&fbclid=z#f",
    "http://example.com:80/",
    "http://example.com",
    "http://user:Pw@Example.com:8080/Path/?z=1&y=2",
    "https://example.co.uk/a/b//c///d/",
    "not a url at all",
    "   https://a.b/c?utm_campaign=1   ",
    "https://a.b/x?ref=home&q=hello%20world&REF=keep",
    None,
]


def test_normalize_url_known_answers(spark):
    from pinecone_datasets_spark.operators.domains import normalize_url

    df = spark.createDataFrame([(u,) for u in _MESSY_URLS], "url string")
    got = [r[0] for r in df.select(normalize_url("url")).collect()]
    assert got[0] == "https://www.example.com/a/b/c?a=1&b=2"
    assert got[1] == "http://example.com"       # default port + bare /
    assert got[2] == "http://example.com"       # already canonical
    # non-default port and userinfo survive; path case survives
    assert got[3] == "http://user:Pw@example.com:8080/Path?y=2&z=1"
    assert got[4] == "https://example.co.uk/a/b/c/d"
    assert got[5] == "not a url at all"          # pass-through, trimmed
    assert got[6] == "https://a.b/c"             # tracking-only query drops
    # params sort bytewise; REF (uppercase) is NOT the tracking token
    assert got[7] == "https://a.b/x?REF=keep&q=hello%20world"
    assert got[8] is None


def test_normalize_url_duckdb_twin_parity(spark):
    duckdb = pytest.importorskip("duckdb")
    from pinecone_datasets_spark.operators.domains import (
        normalize_url,
        normalize_url_sql,
    )

    df = spark.createDataFrame([(u,) for u in _MESSY_URLS], "url string")
    got = [r[0] for r in df.select(normalize_url("url")).collect()]
    con = duckdb.connect()
    expr = normalize_url_sql("url")
    for u, a in zip(_MESSY_URLS, got):
        b = con.execute(
            f"SELECT {expr} FROM (SELECT ? AS url)", [u]
        ).fetchone()[0]
        assert a == b, (u, a, b)


def test_normalize_url_strip_www_and_idempotent(spark):
    from pinecone_datasets_spark.operators.domains import normalize_url

    df = spark.createDataFrame(
        [("https://WWW.a.b/x?b=1&a=2#z",), ("https://wwwx.a.b/",)],
        "url string",
    )
    got = [
        r[0]
        for r in df.select(normalize_url("url", strip_www=True)).collect()
    ]
    assert got == ["https://a.b/x?a=2&b=1", "https://wwwx.a.b"]
    # canonicalizing a canonical URL is a no-op
    once = df.select(normalize_url("url", strip_www=True).alias("url"))
    twice = [
        r[0]
        for r in once.select(normalize_url("url", strip_www=True)).collect()
    ]
    assert twice == got


def test_dedup_by_url_collapses_variants(spark):
    from pinecone_datasets_spark.operators.domains import dedup_by_url

    rows = [
        (1, "https://A.com/x?b=2&a=1"),
        (2, "HTTPS://a.COM/x/?a=1&b=2&utm_source=mail"),  # same canonical
        (3, "https://a.com/x?a=1"),                        # different query
        (4, "https://a.com:443/x?b=2&a=1#frag"),           # same canonical
        (5, "https://b.com/x?b=2&a=1"),                    # different host
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    kept = sorted(r["doc_id"] for r in dedup_by_url(df).collect())
    assert kept == [1, 3, 5]


def test_dedup_by_url_keeps_all_null_url_rows(spark):
    """ADVICE r7: NULL canonical keys must not be grouped together —
    every URL-less doc survives (absence of a URL is not evidence of
    duplication), while real variants still collapse."""
    from pinecone_datasets_spark.operators.domains import dedup_by_url

    rows = [
        (1, "https://a.com/x"),
        (2, "https://a.com:443/x#frag"),  # same canonical as 1
        (3, None),
        (4, None),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    kept = sorted(r["doc_id"] for r in dedup_by_url(df).collect())
    assert kept == [1, 3, 4, 5]


def test_normalize_url_generated_parity_sweep(spark):
    """200 generated messy URLs (deterministic LCG over parts): Spark
    and the DuckDB twin must agree on every one — the fuzz version of
    the known-answer parity test."""
    duckdb = pytest.importorskip("duckdb")
    from pinecone_datasets_spark.operators.domains import (
        normalize_url,
        normalize_url_sql,
    )

    schemes = ["http", "HTTP", "https", "HTTPS", "ftp"]
    hosts = ["Example.COM", "a.b.co.uk", "WWW.site.ORG", "x.y", "h0st.io"]
    ports = ["", ":80", ":443", ":8080"]
    userinfos = ["", "u@", "User:Pw@"]
    paths = ["", "/", "/A//b/", "/p/q", "//", "/trail/"]
    queries = [
        "", "?a=1&b=2", "?b=2&a=1&utm_source=x", "?utm_campaign=1",
        "?REF=keep&ref=drop", "?z&=&a=1", "?gclid=9&q=hello%20x",
    ]
    frags = ["", "#f", "#a#b"]
    seed = 123456789
    urls = []
    for i in range(200):
        seed = (seed * 1103515245 + 12345) % (1 << 31)
        s = seed
        pick = []
        for options in (schemes, userinfos, hosts, ports, paths, queries,
                        frags):
            pick.append(options[s % len(options)])
            s //= 7
        sch, ui, host, port, path, q, frag = pick
        urls.append(f"{sch}://{ui}{host}{port}{path}{q}{frag}")
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [r[0] for r in df.select(normalize_url("url")).collect()]
    con = duckdb.connect()
    expr = normalize_url_sql("url")
    for u, a in zip(urls, got):
        b = con.execute(
            f"SELECT {expr} FROM (SELECT ? AS url)", [u]
        ).fetchone()[0]
        assert a == b, (u, a, b)
    # idempotence over the whole sweep
    once = df.select(normalize_url("url").alias("url"))
    twice = [r[0] for r in once.select(normalize_url("url")).collect()]
    assert twice == got


def test_normalize_url_ipv6_hosts_stay_distinct(spark):
    """r11 review: the [^:]* host regex truncated bracketed IPv6
    literals at the first colon, collapsing DIFFERENT hosts to one
    canonical key — wrongful dedup deletion."""
    import duckdb

    from pinecone_datasets_spark.operators.domains import (
        normalize_url,
        normalize_url_sql,
    )

    urls = ["http://[::1]/a", "http://[2001:db8::1]/a", "http://[::1]:8080/a"]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [
        r["n"] for r in df.select(normalize_url("url").alias("n")).collect()
    ]
    assert got == urls  # nothing to normalize: all distinct, intact
    # SQL twin agrees
    con = duckdb.connect()
    sql = normalize_url_sql("url")
    twin = [
        con.execute(f"SELECT {sql} FROM (SELECT ? AS url)", [u]).fetchone()[0]
        for u in urls
    ]
    assert twin == got


def test_domain_report_null_text_not_counted_as_duplicate(spark):
    """r11 review: countDistinct skips NULL fingerprints, so NULL-text
    docs inflated dup_rate (an all-null domain read 1.0)."""
    from pinecone_datasets_spark.operators.domains import domain_report

    rows = (
        [("a.com", "unique %d" % i) for i in range(5)]
        + [("a.com", None)] * 5
        + [("b.com", None)] * 3
    )
    df = spark.createDataFrame(rows, "source string, text string")
    rep = {
        r["domain"]: r["dup_rate"]
        for r in domain_report(df, lang_col=None).collect()
    }
    assert rep["a.com"] == 0.0   # five uniques + five no-evidence rows
    assert rep["b.com"] == 0.0   # no text at all: no dup evidence

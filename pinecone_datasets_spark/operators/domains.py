"""Domain-level corpus curation: per-domain health report, block/allow
filters, anti-domination caps.

Web-scale training corpora are dominated by a long tail of source
domains, and most curation policy is *domain-granular*: blocklists
(spam/SEO farms), per-domain quality audits, and caps so no single
domain dominates the mixture (C4, RefinedWeb, FineWeb all gate this
way). The reference's data model carries the provenance column
(``documents.source``); this module turns it into the reports and
gates a pipeline applies. Layer-B extension — the reference itself has
no curation surface (cited against cfg.py:23-36's metadata model only).

Scale shapes (100 TB corpus, ~10^5-10^7 distinct domains):

* ``domain_report``: ONE corpus pass — a single groupBy(domain) whose
  map-side partial aggregates reduce every metric (counts, sums,
  distinct fingerprints via the exact-dedup fingerprint) before the
  exchange; the shuffle carries one partial row per (task, domain).
  The corpus-share denominator is a window SUM over the *aggregated*
  frame (one row per domain — small by construction), never a second
  corpus pass.
* ``filter_domains``: block/allow lists are policy artifacts (human-
  curated, thousands of rows) — broadcast hash semi/anti-joins, never
  a shuffle of the corpus.
* ``cap_domains``: delegates to ``sampling.cap_per_group`` — literal
  ``n`` gives the plan a ``WindowGroupLimit``, so every map task
  truncates each domain to n rows BEFORE the exchange.

URL columns: ``url_host`` extracts the hostname with the built-in
``parse_url`` (JVM, codegen'd); ``registrable_domain`` reduces a host
to its registrable suffix+1 against a caller-supplied public-suffix
set (the real PSL is a policy file; the default covers the common
simple/two-level TLDs). Pure column expressions — usable inside any
filter or groupBy without a Python crossing.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import doc_fingerprint

# Minimal two-level public-suffix entries for the default behavior of
# registrable_domain; pass the full PSL for production crawls.
_DEFAULT_TWO_LEVEL_SUFFIXES = (
    "co.uk", "ac.uk", "gov.uk", "org.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.za",
)


def url_host(url: Column | str) -> Column:
    """Hostname of a URL column, lower-cased (NULL for unparseable
    values). Built-in ``parse_url`` — JVM-side, codegen'd."""
    c = F.col(url) if isinstance(url, str) else url
    return F.lower(F.try_parse_url(c, F.lit("HOST")))


def registrable_domain(
    host: Column | str,
    two_level_suffixes: Sequence[str] = _DEFAULT_TWO_LEVEL_SUFFIXES,
) -> Column:
    """Registrable domain (eTLD+1) of a hostname column: the last two
    labels, or the last three when the last two form a listed public
    suffix (``a.b.co.uk`` -> ``b.co.uk``). Pure expression over
    ``split``/``slice`` — no UDF."""
    h = F.col(host) if isinstance(host, str) else host
    parts = F.split(F.lower(h), r"\.")
    n = F.size(parts)
    # slice() rejects start <= 0, and when() evaluates both branches'
    # expressions — clamp the starts so 1-label hosts stay valid.
    last2 = F.array_join(
        F.slice(parts, F.greatest(n - 1, F.lit(1)), 2), "."
    )
    take = F.when(
        last2.isin(*two_level_suffixes) & (n >= 3), F.lit(3)
    ).otherwise(F.lit(2))
    return F.when(n <= take, F.lower(h)).otherwise(
        F.array_join(
            F.slice(parts, F.greatest(n - take + 1, F.lit(1)), take), "."
        )
    )


def domain_report(
    docs: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
    lang_col: Optional[str] = "lang",
    round_to: int = 6,
) -> DataFrame:
    """Per-domain corpus health: ``(domain, n_docs, total_chars,
    avg_chars, n_langs, n_unique, dup_rate, corpus_share)``.

    ``n_unique`` counts distinct exact-dedup fingerprints
    (``functions.text.doc_fingerprint``) so ``dup_rate = 1 -
    n_unique / count(non-null fingerprints)`` is the domain's internal
    exact-duplicate load — boilerplate-heavy domains surface
    immediately (NULL-text docs carry no content evidence and are
    excluded from the rate; 0.0 when a domain has no text at all).
    ``corpus_share`` is the domain's fraction of all docs."""
    agg = (
        docs.select(
            F.col(domain_col).alias("domain"),
            F.length(text_col).alias("_chars"),
            doc_fingerprint(F.col(text_col)).alias("_fp"),
            *([F.col(lang_col).alias("_lang")] if lang_col else []),
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_chars").alias("total_chars"),
            *(
                [F.countDistinct("_lang").alias("n_langs")]
                if lang_col
                else [F.lit(None).cast("long").alias("n_langs")]
            ),
            F.countDistinct("_fp").alias("n_unique"),
            # non-null fingerprints only: countDistinct skips NULLs, so
            # dividing by n_docs counted every NULL-text doc as a
            # duplicate (an all-null-text domain read dup_rate=1.0) —
            # absence of text is absence of evidence (r11 review; same
            # stance as dedup_by_url)
            F.count("_fp").alias("_n_fp"),
        )
    )
    # denominator over the aggregated frame (one row per domain), not a
    # second corpus pass
    total = F.sum("n_docs").over(Window.partitionBy())
    return agg.select(
        "domain",
        "n_docs",
        "total_chars",
        F.round(F.col("total_chars") / F.col("n_docs"), round_to).alias(
            "avg_chars"
        ),
        "n_langs",
        "n_unique",
        F.when(
            F.col("_n_fp") > 0,
            F.round(
                1.0 - F.col("n_unique") / F.col("_n_fp"), round_to
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_rate"),
        F.round(F.col("n_docs") / total, round_to).alias("corpus_share"),
    )


def filter_domains(
    docs: DataFrame,
    blocklist: Optional[DataFrame] = None,
    allowlist: Optional[DataFrame] = None,
    domain_col: str = "source",
    list_col: str = "domain",
) -> DataFrame:
    """Apply domain policy lists: drop ``blocklist`` domains, then (if
    given) keep only ``allowlist`` domains. Both are broadcast — the
    corpus never shuffles."""
    out = docs
    if blocklist is not None:
        out = out.join(
            F.broadcast(
                blocklist.select(F.col(list_col).alias(domain_col))
            ),
            domain_col,
            "left_anti",
        )
    if allowlist is not None:
        out = out.join(
            F.broadcast(
                allowlist.select(F.col(list_col).alias(domain_col))
            ),
            domain_col,
            "left_semi",
        )
    return out


def cap_domains(
    docs: DataFrame,
    n: int,
    domain_col: str = "source",
    order_by: Optional[Sequence[Column]] = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Anti-domination cap: at most ``n`` docs per domain, best-first
    (default: deterministic by id). ``WindowGroupLimit`` shape — see
    ``sampling.cap_per_group``."""
    from .sampling import cap_per_group

    order = list(order_by) if order_by is not None else [F.col(id_col)]
    return cap_per_group(docs, domain_col, n, order)


# ---------------------------------------------------------------------------
# URL canonicalization: the dedup key of every crawl pipeline
# ---------------------------------------------------------------------------

#: Anchored pattern for one ``key=value`` query token that is tracking
#: noise, not content (utm campaign tags, click ids, mail-merge ids).
#: Shared verbatim by the SQL twin — alternation + anchors only, no
#: lookaround, so it means the same thing to Java regex and RE2.
TRACKING_PARAM_PATTERN = (
    r"^(utm_[^=&]*|fbclid|gclid|dclid|msclkid|wbraid|gbraid|yclid|"
    r"mc_cid|mc_eid|igshid|spm|ref|ref_src|_ga|s_kwcid)(=.*)?$"
)

#: URL splitter: scheme :// authority path ?query #fragment. Capture
#: groups 1-4; the fragment is matched but never captured (canonical
#: form drops it). Non-capturing groups only — portable to RE2.
_URL_SPLIT_PATTERN = (
    r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)"
    r"(?:\?([^#]*))?(?:#.*)?$"
)


def normalize_url(
    url: Column | str,
    tracking_param_pattern: str = TRACKING_PARAM_PATTERN,
    strip_www: bool = False,
) -> Column:
    """Canonical form of a URL column — the dedup key every crawl
    pipeline hangs exact URL-dedup on (C4 / CC-Net dedup by normalized
    URL before any content pass).

    Canonicalization, applied only when the value parses as
    ``scheme://...`` (anything else passes through trimmed — a
    pass-through is auditable, a guessed parse is corpus damage):

    * scheme and host lower-cased (userinfo, path, query keep case)
    * fragment dropped
    * default port dropped (``:80`` for http, ``:443`` for https)
    * ``www.`` prefix dropped when ``strip_www=True``
    * duplicate slashes in the path collapsed, trailing slashes dropped
      (``/a/`` == ``/a``; a bare ``/`` root drops entirely)
    * query tokens split on ``&``: empties and tracking params
      (``tracking_param_pattern``) removed, the rest sorted bytewise
      and rejoined — param order never distinguishes two URLs

    Pure column expressions (regexp + array built-ins): codegen'd,
    no Python crossing, and dialect-portable — ``normalize_url_sql``
    emits the identical transformation for DuckDB replay.
    """
    c = F.col(url) if isinstance(url, str) else url
    c = F.trim(c)
    scheme = F.lower(F.regexp_extract(c, _URL_SPLIT_PATTERN, 1))
    auth = F.regexp_extract(c, _URL_SPLIT_PATTERN, 2)
    path = F.regexp_extract(c, _URL_SPLIT_PATTERN, 3)
    query = F.regexp_extract(c, _URL_SPLIT_PATTERN, 4)

    userinfo = F.regexp_extract(auth, r"^([^@]*@)", 1)
    # bracketed alternative first: an IPv6 literal host ([::1],
    # [2001:db8::1]) contains colons, so the bare [^:]* form truncated
    # it at the first colon and collapsed DIFFERENT hosts to one
    # canonical key — wrongful dedup deletion (r11 review; mirrored in
    # normalize_url_sql)
    host = F.lower(
        F.regexp_extract(auth, r"^(?:[^@]*@)?(\[[^\]]*\]|[^:]*)", 1)
    )
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    port = F.regexp_extract(auth, r":([0-9]+)$", 1)
    port_part = F.when(
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))

    path_n = F.regexp_replace(
        F.regexp_replace(path, r"/{2,}", "/"), r"/+$", ""
    )

    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda t: (t != "") & ~t.rlike(tracking_param_pattern),
        )
    )
    q_part = F.when(
        F.size(kept) > 0,
        F.concat(F.lit("?"), F.array_join(kept, "&")),
    ).otherwise(F.lit(""))

    rebuilt = F.concat(
        scheme, F.lit("://"), userinfo, host, port_part, path_n, q_part
    )
    return F.when(scheme == "", c).otherwise(rebuilt)


def normalize_url_sql(
    url_expr: str,
    tracking_param_pattern: str = TRACKING_PARAM_PATTERN,
    strip_www: bool = False,
) -> str:
    """DuckDB twin of ``normalize_url`` — same split pattern, same
    tracking-param pattern, same rebuild, for oracle replay."""
    split = _URL_SPLIT_PATTERN.replace("'", "''")
    track = tracking_param_pattern.replace("'", "''")
    u = f"trim({url_expr})"
    scheme = f"lower(regexp_extract({u}, '{split}', 1))"
    auth = f"regexp_extract({u}, '{split}', 2)"
    path = f"regexp_extract({u}, '{split}', 3)"
    query = f"regexp_extract({u}, '{split}', 4)"
    userinfo = f"regexp_extract({auth}, '^([^@]*@)', 1)"
    # same IPv6-literal alternative as normalize_url (r11 review)
    host = (
        f"lower(regexp_extract({auth},"
        " '^(?:[^@]*@)?(\\[[^\\]]*\\]|[^:]*)', 1))"
    )
    if strip_www:
        host = f"regexp_replace({host}, '^www\\.', '')"
    port = f"regexp_extract({auth}, ':([0-9]+)$', 1)"
    port_part = (
        f"CASE WHEN {port} = '' OR ({scheme} = 'http' AND {port} = '80')"
        f" OR ({scheme} = 'https' AND {port} = '443') THEN ''"
        f" ELSE ':' || {port} END"
    )
    path_n = (
        f"regexp_replace(regexp_replace({path}, '/{{2,}}', '/', 'g'),"
        f" '/+$', '')"
    )
    kept = (
        f"list_sort(list_filter(str_split({query}, '&'),"
        f" t -> t <> '' AND NOT regexp_matches(t, '{track}')))"
    )
    q_part = (
        f"CASE WHEN len({kept}) > 0"
        f" THEN '?' || list_aggregate({kept}, 'string_agg', '&')"
        f" ELSE '' END"
    )
    rebuilt = (
        f"{scheme} || '://' || {userinfo} || {host} || {port_part}"
        f" || {path_n} || {q_part}"
    )
    return f"CASE WHEN {scheme} = '' THEN {u} ELSE {rebuilt} END"


def dedup_by_url(
    docs: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    strip_www: bool = False,
) -> DataFrame:
    """Exact URL dedup: keep the lowest-id row per canonical URL —
    the first corpus gate of a crawl pipeline (cheaper than any content
    pass; C4/CC-Net run it before text ever shuffles). Same two-narrow-
    shuffles shape as ``dedup.exact_dedup``: only (canonical-url hash,
    id) pairs move, payloads stay put.

    Rows whose URL is NULL (so the canonical key is NULL) are kept
    UNCONDITIONALLY — a missing URL is absence of evidence, not
    evidence of duplication, and grouping NULL keys together would
    silently drop every URL-less doc but one."""
    key = F.md5(normalize_url(F.col(url_col), strip_www=strip_www))
    fp = docs.select(F.col(id_col), key.alias("_ufp"))
    keep = (
        fp.where(F.col("_ufp").isNotNull())
        .groupBy("_ufp")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
        .unionByName(fp.where(F.col("_ufp").isNull()).select(id_col))
    )
    return docs.join(keep, on=id_col, how="left_semi")

"""Training-data curation pipeline: the composition the engine exists for.

One declarative plan chaining the Layer-B operators — exact dedup →
quality gate → length gate — so Catalyst sees the whole thing at once:
filters fuse into the scan where possible, the dedup semi-join shuffles
only (fingerprint, id) pairs, and nothing materializes between stages.
At 100 TB this is the difference between one pass and four.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import quality_score, word_count
from .dedup import exact_dedup

# Quality is a float expression; Spark and a SQL oracle can disagree by
# 1 ulp right at the gate boundary. Both sides therefore threshold on the
# value rounded to a fixed precision — semantics-neutral away from the
# boundary, deterministic across engines at it.
_QUALITY_DECIMALS = 6


def _quality_gate(min_quality: float) -> Column:
    return F.round(F.col("quality"), _QUALITY_DECIMALS) >= min_quality


def filter_by_quantile(
    df: DataFrame,
    score_col: str,
    quantile: float,
    keep: str = "above",
    round_to: int = _QUALITY_DECIMALS,
) -> DataFrame:
    """Keep rows whose score is above (or below) the corpus-wide exact
    quantile of ``score_col`` — the relative quality gate ("top 25% of
    the corpus") used when an absolute threshold is unknowable upfront.

    Two-pass by design: pass 1 computes the exact interpolated
    percentile as ONE driver-side scalar (an aggregate whose shuffle is
    a single row — at 100 TB the cost is the scan, not the quantile);
    pass 2 filters against the now-*literal* threshold, so it pushes
    into the scan like any constant predicate. Both the threshold and
    the compared values are rounded to ``round_to`` decimals first:
    1-ulp float divergence at the boundary must not flip membership
    between engines (the q34 lesson).
    """
    if not 0.0 <= quantile <= 1.0:
        raise ValueError(f"quantile must be in [0, 1]: {quantile}")
    if keep not in ("above", "below"):
        raise ValueError(f"keep must be 'above' or 'below': {keep}")
    row = df.agg(
        F.round(
            F.percentile(score_col, F.lit(float(quantile))), round_to
        ).alias("thr")
    ).collect()[0]
    thr = row["thr"]
    if thr is None:
        return df
    rounded = F.round(F.col(score_col), round_to)
    cond = rounded >= F.lit(thr) if keep == "above" else rounded <= F.lit(
        thr
    )
    return df.where(cond)


def quantile_bucket_by_group(
    df: DataFrame,
    score_col: str,
    group_col: str,
    n_buckets: int = 4,
    exact: bool = True,
    round_to: int = _QUALITY_DECIMALS,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Per-group quantile bucket of a score — the calibration that makes
    quality scores comparable ACROSS domains before mixing: a raw
    threshold keeps the easy domain's boilerplate and drops the hard
    domain's prose; bucket b = the row sits in its own group's b-th
    quantile band, so "top quartile" means the same thing everywhere.

    Plan: one aggregate computes each group's ``n_buckets - 1`` interior
    boundaries (a groups × buckets frame — tiny), broadcast back;
    ``bucket`` = number of boundaries ≤ the score, via an in-plan array
    filter. No per-group global window anywhere, so a giant group costs
    one aggregate, not one partition. ``exact=False`` switches the
    boundary aggregate to ``percentile_approx`` — the sketch path for
    groups too large to sort; ``exact=True`` keeps linear-interpolated
    exact percentiles (engine-replayable — the q51 oracle relies on it).
    Boundaries and scores are rounded to ``round_to`` before the
    comparison so a 1-ulp cross-engine wobble cannot flip bucket
    membership.
    """
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2: {n_buckets}")
    qs = [i / n_buckets for i in range(1, n_buckets)]
    fn = "percentile" if exact else "percentile_approx"
    bounds = df.groupBy(group_col).agg(
        F.expr(
            f"transform({fn}({score_col},"
            f" array({', '.join(f'{q}D' for q in qs)})),"
            f" b -> round(b, {int(round_to)}))"
        ).alias("__bounds")
    )
    rounded = F.round(F.col(score_col), round_to)
    return (
        df.join(F.broadcast(bounds), group_col)
        .withColumn("__r", rounded)
        .withColumn(
            bucket_col,
            F.expr("size(filter(__bounds, b -> b <= __r))").cast("long"),
        )
        .drop("__bounds", "__r")
    )


def curate_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
    min_words: int = 30,
) -> DataFrame:
    """Curated corpus: deduplicated documents passing quality and length
    gates. Returns (id, n_words, quality) plus original columns intact.
    """
    deduped = exact_dedup(df, text_col=text_col, id_col=id_col)
    return (
        deduped.withColumn("n_words", word_count(text_col).cast("long"))
        .withColumn("quality", quality_score(text_col))
        .where(
            _quality_gate(min_quality) & (F.col("n_words") >= min_words)
        )
    )


def _stage_flags(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_quality: float,
    min_words: int,
    max_boilerplate: Optional[float],
    neardup_jaccard: Optional[float],
    benchmark: Optional[DataFrame],
    decontam_n: int,
    neardup_max_df: Optional[int] = None,
) -> DataFrame:
    """Annotate every row with one boolean per curation stage. The
    join-based stages (dedup, near-dup, decontamination) become
    broadcast/key-shuffle flag joins; the row-local gates are pure
    expressions — so the whole funnel is ONE plan and Catalyst fuses the
    gates into the scan."""
    from ..functions.text import quality_score, word_count
    from .boilerplate import boilerplate_profile
    from .dedup import exact_dedup, ngram_jaccard_pairs

    # No widen() of df here: the funnel fans df into three subtrees
    # with different pruned columns, so a widen exchange is not reused
    # across them and the measured fresh-session A/B at sf0.1 shows
    # the extra shuffles losing more than the parallelism gains (the
    # heavy sub-operators that profit widen internally already do).

    ann = (
        df.withColumn("n_words", word_count(text_col).cast("long"))
        .withColumn("quality", quality_score(text_col))
        .withColumn("k_quality", _quality_gate(min_quality))
        .withColumn("k_length", F.col("n_words") >= min_words)
    )
    # exact dedup flag: member of the kept-representative set
    kept_exact = exact_dedup(df, text_col=text_col, id_col=id_col).select(
        F.col(id_col).alias("__ke")
    )
    ann = ann.join(
        kept_exact, ann[id_col] == F.col("__ke"), "left"
    ).withColumn("k_exact", F.col("__ke").isNotNull()).drop("__ke")
    # near-dup flag: smaller-id keep rule over verified Jaccard pairs
    # (the verified-pair frame is tiny relative to N, broadcast).
    # neardup_max_df is the hot-shingle skew cap — without it a common
    # shingle contributes d² self-join rows (r11 review: the comment
    # claimed the knob existed but nothing plumbed it through)
    if neardup_jaccard is not None:
        drops = (
            ngram_jaccard_pairs(
                df, threshold=neardup_jaccard,
                text_col=text_col, id_col=id_col,
                **({"max_df": neardup_max_df}
                   if neardup_max_df is not None else {}),
            )
            .select(F.col("id_b").alias("__nd"))
            .distinct()
        )
        # drop-id set scales with the corpus's duplicate fraction — a
        # crawl corpus can put half its ids here, so no broadcast hint
        # (r13 audit; AQE promotes when small). Ditto `flagged` below.
        ann = ann.join(
            drops, ann[id_col] == F.col("__nd"), "left"
        ).withColumn("k_neardup", F.col("__nd").isNull()).drop("__nd")
    else:
        ann = ann.withColumn("k_neardup", F.lit(True))
    if max_boilerplate is not None:
        prof = boilerplate_profile(
            df, n=2, text_col=text_col, id_col=id_col
        ).select(id_col, "boilerplate_frac")
        ann = ann.join(prof, id_col, "left").withColumn(
            "k_boiler",
            F.coalesce(F.col("boilerplate_frac"), F.lit(0.0))
            <= max_boilerplate,
        )
    else:
        ann = ann.withColumn("k_boiler", F.lit(True)).withColumn(
            "boilerplate_frac", F.lit(None).cast("double")
        )
    if benchmark is not None:
        from .decontaminate import ngram_contamination

        flagged = (
            ngram_contamination(
                df, benchmark, n=decontam_n,
                text_col=text_col, id_col=id_col,
            )
            .where(F.col("contamination_rate") > 0.0)
            .select(F.col(id_col).alias("__ct"))
        )
        ann = ann.join(
            flagged, ann[id_col] == F.col("__ct"), "left"
        ).withColumn("k_decontam", F.col("__ct").isNull()).drop("__ct")
    else:
        ann = ann.withColumn("k_decontam", F.lit(True))
    return ann


def curate_corpus_full(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
    min_words: int = 30,
    max_boilerplate: Optional[float] = None,
    neardup_jaccard: Optional[float] = None,
    benchmark: Optional[DataFrame] = None,
    decontam_n: int = 3,
    mixture_weights: Optional[dict] = None,
    mixture_budget: Optional[int] = None,
    domain_col: str = "source",
    token_col: str = "n_chars",
    seed: int = 42,
    url_col: Optional[str] = None,
    sentence_span_n: Optional[int] = None,
    line_gates: Optional[dict] = None,
    neardup_max_df: Optional[int] = None,
) -> DataFrame:
    """The full curation chain as ONE declarative composition:
    [URL-key dedup] → [C4 sentence-span removal] → [line gates] →
    exact dedup → near-dup drop (verified Jaccard, smaller-id keep) →
    quality gate → length gate → boilerplate gate → benchmark
    decontamination → optional domain-mixture draw. Optional stages
    switch off with ``None``; every gate is a flag column over one
    annotated frame, so Catalyst sees the whole funnel at once and the
    corpus text crosses no exchange (the join stages move ids and
    fingerprints only).

    The three crawl-side pre-stages (all default-off, order = cost):
    ``url_col`` dedups on the canonical URL before any content pass
    (``domains.dedup_by_url`` — 24-byte key shuffle); ``line_gates`` is
    a map-only structural filter taking any of ``max_dup_line_frac``,
    ``max_bullet_line_frac``, ``min_end_punct_line_frac``,
    ``min_mean_words_per_line``; ``sentence_span_n`` rewrites documents
    minus corpus-repeated n-sentence spans
    (``boilerplate.remove_duplicated_sentence_spans`` — C4's rule,
    applied before fingerprinting so span-stripped copies dedup
    exactly).

    Ordering constraint: the line gates run on the ORIGINAL text,
    BEFORE the sentence-span rewrite. The rewrite joins surviving
    sentences with single spaces, collapsing the line structure the
    gates measure — evaluated afterwards, ``duplicate_line_fraction``
    would read ~0 and ``mean_words_per_line`` would read the whole-doc
    word count, silently disabling the FineWeb/Gopher thresholds.
    """
    if mixture_weights is not None and mixture_budget is None:
        # fail BEFORE the corpus pass: domain_mixture_sample would
        # otherwise crash on float(None) only after the full curation
        # scan has already run (r11 review)
        raise ValueError(
            "mixture_weights requires mixture_budget (token budget)"
        )
    if url_col is not None:
        from .domains import dedup_by_url

        df = dedup_by_url(df, url_col=url_col, id_col=id_col)
    if line_gates:
        from ..functions.text import apply_line_gates

        df = apply_line_gates(df, line_gates, text_col=text_col)
    if sentence_span_n is not None:
        from .boilerplate import remove_duplicated_sentence_spans

        df = (
            remove_duplicated_sentence_spans(
                df,
                n=sentence_span_n,
                text_col=text_col,
                id_col=id_col,
                out_col="__c4_clean",
            )
            .withColumn(text_col, F.col("__c4_clean"))
            .drop("__c4_clean", "n_removed_sentences")
        )
    ann = _stage_flags(
        df, text_col, id_col, min_quality, min_words,
        max_boilerplate, neardup_jaccard, benchmark, decontam_n,
        neardup_max_df=neardup_max_df,
    )
    kept = ann.where(
        F.col("k_exact")
        & F.col("k_neardup")
        & F.col("k_quality")
        & F.col("k_length")
        & F.col("k_boiler")
        & F.col("k_decontam")
    ).drop(
        "k_exact", "k_neardup", "k_quality", "k_length", "k_boiler",
        "k_decontam",
    )
    if mixture_weights is not None:
        from .mixing import domain_mixture_sample

        kept = domain_mixture_sample(
            kept,
            mixture_weights,
            mixture_budget,
            domain_col=domain_col,
            token_col=token_col,
            key_col=id_col,
            seed=seed,
        )
    return kept


def curation_funnel(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
    min_words: int = 30,
    max_boilerplate: Optional[float] = None,
    neardup_jaccard: Optional[float] = None,
    benchmark: Optional[DataFrame] = None,
    decontam_n: int = 3,
    neardup_max_df: Optional[int] = None,
) -> DataFrame:
    """Stage-by-stage survival counts for ``curate_corpus_full``'s gate
    order — the dashboard that says which stage is eating the corpus.
    One aggregation over the annotated frame: each row's flags are
    computed once and the progressive conjunctions are sums."""
    ann = _stage_flags(
        df, text_col, id_col, min_quality, min_words,
        max_boilerplate, neardup_jaccard, benchmark, decontam_n,
        neardup_max_df=neardup_max_df,
    )
    stages = [
        ("exact_dedup", F.col("k_exact")),
        ("neardup", F.col("k_exact") & F.col("k_neardup")),
        (
            "quality",
            F.col("k_exact") & F.col("k_neardup") & F.col("k_quality"),
        ),
        (
            "length",
            F.col("k_exact")
            & F.col("k_neardup")
            & F.col("k_quality")
            & F.col("k_length"),
        ),
        (
            "boilerplate",
            F.col("k_exact")
            & F.col("k_neardup")
            & F.col("k_quality")
            & F.col("k_length")
            & F.col("k_boiler"),
        ),
        (
            "decontaminate",
            F.col("k_exact")
            & F.col("k_neardup")
            & F.col("k_quality")
            & F.col("k_length")
            & F.col("k_boiler")
            & F.col("k_decontam"),
        ),
    ]
    aggs = [F.count(F.lit(1)).alias("n_input")] + [
        F.sum(cond.cast("long")).alias(f"n_{name}")
        for name, cond in stages
    ]
    return ann.agg(*aggs)


def curation_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
    min_words: int = 30,
) -> DataFrame:
    """Per-language funnel stats for a curation run: how many documents
    survive each gate. One aggregation pass over the annotated corpus."""
    deduped = exact_dedup(df, text_col=text_col, id_col=id_col)
    annotated = deduped.withColumn(
        "n_words", word_count(text_col).cast("long")
    ).withColumn("quality", quality_score(text_col))
    return (
        annotated.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_deduped"),
            F.sum(
                F.when(_quality_gate(min_quality), 1).otherwise(0)
            ).alias("n_quality_pass"),
            F.sum(
                F.when(
                    _quality_gate(min_quality)
                    & (F.col("n_words") >= min_words),
                    1,
                ).otherwise(0)
            ).alias("n_curated"),
        )
    )

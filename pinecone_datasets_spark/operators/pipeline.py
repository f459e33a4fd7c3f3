"""Training-data curation pipeline: the composition the engine exists for.

One declarative plan chaining the Layer-B operators — exact dedup →
quality gate → length gate — so Catalyst sees the whole thing at once:
filters fuse into the scan where possible, the dedup semi-join shuffles
only (fingerprint, id) pairs, and nothing materializes between stages.
At 100 TB this is the difference between one pass and four.
"""

from __future__ import annotations

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

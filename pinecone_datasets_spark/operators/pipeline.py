"""Training-data curation pipeline: the composition the engine exists for.

One declarative plan chaining the Layer-B operators — exact dedup →
quality gate → length gate — so Catalyst sees the whole thing at once:
filters fuse into the scan where possible, the dedup semi-join shuffles
only (fingerprint, id) pairs, and nothing materializes between stages.
At 100 TB this is the difference between one pass and four.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import quality_score, word_count
from .dedup import exact_dedup


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
            (F.col("quality") >= min_quality)
            & (F.col("n_words") >= min_words)
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
                F.when(F.col("quality") >= min_quality, 1).otherwise(0)
            ).alias("n_quality_pass"),
            F.sum(
                F.when(
                    (F.col("quality") >= min_quality)
                    & (F.col("n_words") >= min_words),
                    1,
                ).otherwise(0)
            ).alias("n_curated"),
        )
    )

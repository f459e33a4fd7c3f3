"""Embedding-corpus statistics and drift detection.

Production vector pipelines re-embed continuously (model upgrades,
re-crawls); a batch whose embedding distribution silently shifts
against the serving corpus breaks ANN recall and score calibration
long before anything errors. The standard monitor is per-dimension
moment tracking: corpus mean/std per dimension, batch mean per
dimension, and the standardized shift ``z = (mean_b - mean_c) /
(std_c / sqrt(n_b))`` per dimension.

Scale shape: ``posexplode`` turns vectors into (dim, value) scalars —
D rows per vector — feeding a map-side-combined hash aggregate keyed on
``dim`` (D distinct keys, trivially small shuffle). Same shape as the
label-centroid operator (q59); no vector UDF, no driver-side matrices.
Std uses the population form via sum/sum-of-squares so every moment is
an associative aggregate.

Reference scope note: the reference (pinecone-io/pinecone-datasets)
stores embeddings without analytics; Layer-B extension, cited against
its data model only (cfg.py:23-36).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def embedding_dim_stats(
    df: DataFrame,
    vector_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Per-dimension (dim, n, mean, std, min, max) over the corpus.
    Population std from the moment sums — one aggregate pass."""
    ex = df.select(F.posexplode(vector_col).alias("dim", "v"))
    agg = ex.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("_s"),
        F.sum(F.col("v") * F.col("v")).alias("_ss"),
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
    )
    mean = F.col("_s") / F.col("n")
    var = F.greatest(
        F.col("_ss") / F.col("n") - mean * mean, F.lit(0.0)
    )
    return agg.select(
        F.col("dim").cast("long").alias("dim"),
        F.col("n").cast("long").alias("n"),
        F.round(mean, round_to).alias("mean"),
        F.round(F.sqrt(var), round_to).alias("std"),
        F.round("vmin", round_to).alias("vmin"),
        F.round("vmax", round_to).alias("vmax"),
    )


def embedding_drift(
    corpus: DataFrame,
    batch: DataFrame,
    vector_col: str = "embedding",
    z_threshold: float = 3.0,
    round_to: int = 6,
) -> DataFrame:
    """Per-dimension drift of ``batch`` against ``corpus``:
    ``z = (mean_batch - mean_corpus) / (std_corpus / sqrt(n_batch))``
    (the standard error of the batch mean under the corpus
    distribution), plus a ``drifted`` flag at ``z_threshold``. A
    zero-variance corpus dimension reports z = 0 when the means agree
    and the threshold sentinel otherwise.

    Both sides are one aggregate each; the join is on ``dim`` (D rows).
    """
    c = (
        corpus.select(F.posexplode(vector_col).alias("dim", "v"))
        .groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n_c"),
            F.sum("v").alias("_s"),
            F.sum(F.col("v") * F.col("v")).alias("_ss"),
        )
        .select(
            "dim",
            "n_c",
            (F.col("_s") / F.col("n_c")).alias("mean_c"),
            F.sqrt(
                F.greatest(
                    F.col("_ss") / F.col("n_c")
                    - (F.col("_s") / F.col("n_c")) ** 2,
                    F.lit(0.0),
                )
            ).alias("std_c"),
        )
    )
    b = (
        batch.select(F.posexplode(vector_col).alias("dim", "v"))
        .groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n_b"),
            (F.sum("v") / F.count(F.lit(1))).alias("mean_b"),
        )
    )
    se = F.col("std_c") / F.sqrt(F.col("n_b"))
    z = F.when(
        F.col("std_c") > 0,
        (F.col("mean_b") - F.col("mean_c")) / se,
    ).otherwise(
        F.when(
            F.abs(F.col("mean_b") - F.col("mean_c")) < 1e-12, F.lit(0.0)
        ).otherwise(F.lit(float(z_threshold)))
    )
    # full outer, not inner (r11 review): a batch re-embedded at a
    # DIFFERENT dimensionality — the model-upgrade scenario this module
    # exists for — puts dims on only one side; an inner join dropped
    # exactly those rows, so the grossest drift class (wrong embedding
    # width) produced NO drifted rows. One-sided dims carry NULL stats
    # for the missing side and drifted=1.
    one_sided = F.col("n_c").isNull() | F.col("n_b").isNull()
    return (
        c.join(b, "dim", "full_outer")
        .select(
            F.col("dim").cast("long").alias("dim"),
            F.col("n_c").cast("long").alias("n_c"),
            F.col("n_b").cast("long").alias("n_b"),
            F.round("mean_c", round_to).alias("mean_c"),
            F.round("mean_b", round_to).alias("mean_b"),
            F.round("std_c", round_to).alias("std_c"),
            F.when(one_sided, F.lit(None).cast("double"))
            .otherwise(F.round(z, round_to))
            .alias("z"),
            F.when(one_sided, F.lit(1))
            .otherwise((F.abs(z) >= z_threshold).cast("long"))
            .cast("long")
            .alias("drifted"),
        )
    )

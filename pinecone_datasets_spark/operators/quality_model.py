"""Trained quality classifier: the CCNet / GPT-3-style learned filter.

Heuristic quality rules (``functions.text.quality_score``, the Gopher
repetition signals) are hand-tuned gates; production corpora add a
LEARNED filter on top — a linear classifier trained to separate a
trusted target domain (curated reference text) from raw crawl, whose
probability becomes the curation score (GPT-3's Wikipedia-vs-crawl
logistic filter; CCNet's fastText domain model). This module trains
exactly that shape on Spark MLlib: hashed bag-of-words features into
logistic regression, scoring as a map-only probability column.

``weak_labels`` bootstraps the training set without human labels
(weak supervision / self-distillation): the heuristic score's
confident extremes become the positive/negative classes, and the
trained model generalizes BETWEEN the extremes — scoring the ambiguous
middle the hand rule cannot rank.

Scale shape (100 TB corpus):

* Featurization is ``HashingTF`` — map-only, fixed 2^18-dim sparse
  output, no vocabulary state to build or broadcast (the hashing
  trick is what makes fastText-style filters corpus-scale).
* Training cost scales with the LABELED sample, not the corpus:
  callers train on ``weak_labels``' extremes (or any labeled sliver) —
  MLlib LBFGS runs ``maxIter`` treeAggregate passes over that sample
  only. Sample it down before training; the model is a single dense
  coefficient vector (2^18 doubles ≈ 2 MB).
* Scoring is the model broadcast into a map-only transform — one pass,
  no shuffle; the output column drops into ``filter_by_quantile`` /
  ``curation_funnel`` like any other per-doc score.

Not SQL-replayable (LBFGS float accumulation is engine-specific), so
verified by pytest separation/ordering properties instead of a DuckDB
twin — the same deal as the streaming operators.

Reference scope note: the reference stores corpora and has no curation
surface; Layer-B extension (cited against cfg.py:23-36's data model).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import quality_score


def weak_labels(
    docs: DataFrame,
    text_col: str = "text",
    lo: float = 0.35,
    hi: float = 0.65,
    score_col: Optional[str] = None,
) -> DataFrame:
    """Weak-supervision training set from the heuristic quality score:
    docs scoring ≥ ``hi`` labeled 1, ≤ ``lo`` labeled 0, the ambiguous
    middle dropped. Pass ``score_col`` to label on a precomputed score
    instead of the built-in heuristic."""
    if not lo < hi:
        raise ValueError(f"need lo < hi: {lo} >= {hi}")
    s = F.col(score_col) if score_col else quality_score(F.col(text_col))
    return (
        docs.withColumn("_s", s)
        .where((F.col("_s") <= lo) | (F.col("_s") >= hi))
        .withColumn(
            "label", (F.col("_s") >= hi).cast("double")
        )
        .drop("_s")
    )


def train_quality_classifier(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    num_features: int = 1 << 18,
    max_iter: int = 30,
    reg_param: float = 1e-4,
):
    """Fit the hashed-BoW logistic filter on a labeled frame
    (``label_col`` ∈ {0.0, 1.0}); returns a fitted ``PipelineModel``.
    Train on a bounded sample — the corpus is what gets SCORED, not
    what gets trained on."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, RegexTokenizer

    tok = RegexTokenizer(
        inputCol=text_col,
        outputCol="_words",
        pattern=r"\W+",
        toLowercase=True,
    )
    tf = HashingTF(
        inputCol="_words", outputCol="_features", numFeatures=num_features
    )
    lr = LogisticRegression(
        featuresCol="_features",
        labelCol=label_col,
        maxIter=max_iter,
        regParam=reg_param,
    )
    return Pipeline(stages=[tok, tf, lr]).fit(labeled)


def score_quality(
    docs: DataFrame,
    model,
    out_col: str = "quality_prob",
) -> DataFrame:
    """Append the model's P(label=1) as ``out_col`` — map-only (model
    coefficients ride in the broadcast transform); all intermediate
    feature columns dropped."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(docs)
    return scored.withColumn(
        out_col, vector_to_array(F.col("probability")).getItem(1)
    ).drop("_words", "_features", "rawPrediction", "probability",
           "prediction")

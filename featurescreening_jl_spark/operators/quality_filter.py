"""Model-based document quality filtering (the GPT-3 / LLaMA recipe).

The heuristic quality scores in ``text_analysis`` (length / punctuation /
stopword ratios) are stage one; production pipelines then train a small
CLASSIFIER to separate a trusted reference corpus (Wikipedia/books) from
raw crawl, and keep crawl documents the model scores reference-like
(Brown et al. 2020 §A; Touvron et al. 2023 "quality classifier"). This
module is that stage, Spark-first:

- featurization is the shared map-side :func:`quality_features`
  expression set — no tokenizer, no Python, one scan;
- the model is MLlib ``LogisticRegression`` (L2, standardized), whose
  fit is a handful of treeAggregate gradient passes over the assembled
  vectors — the designed distributed path for convex fits at 10^12 rows
  (contrast: the screen loop's forest uses the partitioned backend
  because trees don't gradient-aggregate);
- scoring is ``model.transform`` — map-only, broadcast coefficients.

Reference scope: FeatureScreening.jl has no text layer; this belongs to
the training-data graft (SURVEY.md §2.11+). The train/score split keeps
leakage semantics explicit: the label is a SOURCE property (membership
in ``positive_sources``), never derived from the text features
themselves.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["quality_classifier_scores", "QUALITY_FEATURE_ORDER"]

# pinned feature order — the coefficient vector is meaningless without it
# (keys from text_analysis.quality_features)
QUALITY_FEATURE_ORDER = [
    "n_chars",
    "n_tokens",
    "mean_word_len",
    "stopword_ratio",
    "punct_ratio",
    "upper_ratio",
]


def _feature_array(text_col):
    from featurescreening_jl_spark.operators.text_analysis import (
        quality_features,
    )

    qf = quality_features(text_col)
    missing = [k for k in QUALITY_FEATURE_ORDER if k not in qf]
    if missing:
        raise KeyError(f"quality_features lost columns: {missing}")
    return F.array(
        *[qf[k].cast("double") for k in QUALITY_FEATURE_ORDER]
    )


def quality_classifier_scores(
    docs: DataFrame,
    positive_sources: Sequence[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    reg_param: float = 0.01,
    max_iter: int = 50,
) -> DataFrame:
    """Train a logistic quality classifier (reference sources = positive)
    and score EVERY document.

    Returns ``(id_col, label, quality_score)`` where ``quality_score`` is
    the model's probability that the document comes from a reference
    source, rounded to 4 decimals (LBFGS float reductions are not
    bit-stable across partitionings; 4dp is). Downstream, filter with
    ``quality_score >= t`` or — the GPT-3 trick — keep stochastically
    with probability ``score`` to avoid a hard cliff.

    Scale shape: featurization is map-only expressions; the fit is
    ``max_iter`` treeAggregate passes over (features, label) rows — each
    pass map-side-combines per-partition gradient partials into one
    driver-sized vector (6 doubles here), so the corpus never shuffles;
    scoring broadcasts the 6+1 coefficients. Class imbalance at crawl
    scale (reference ≪ crawl) is the caller's knob: pass a
    pre-downsampled frame or wrap with ``weightCol`` upstream.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector, vector_to_array

    pos = [str(s) for s in positive_sources]
    if not pos:
        raise ValueError("positive_sources must be non-empty")
    base = docs.select(
        F.col(id_col),
        F.col(source_col).isin(pos).cast("double").alias("label"),
        array_to_vector(_feature_array(F.col(text_col))).alias("features"),
    )
    lr = LogisticRegression(
        maxIter=max_iter,
        regParam=reg_param,
        standardization=True,
        family="binomial",
    )
    model = lr.fit(base)
    # Score with the closed-form sigmoid over the EXTRACTED coefficients
    # instead of model.transform: the fitted model object drags its
    # training summary — which holds a SparkSession reference — into the
    # task closure (observed NotSerializableException on
    # ObservationManager under Spark 4.1 classic). Seven double literals
    # in a codegen expression are also the honest 100 TB shape: the
    # "broadcast" is the literal plan itself, no JVM object graph rides
    # along. Binomial LR's probability is exactly
    # sigmoid(intercept + coef·x), so values match transform's output.
    coefs = [float(c) for c in model.coefficients.toArray()]
    intercept = float(model.intercept)
    feats = vector_to_array(F.col("features"))
    margin = F.lit(intercept)
    for i, c in enumerate(coefs):
        margin = margin + F.lit(c) * feats[i]
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
    return base.select(
        id_col,
        F.col("label").cast("long").alias("label"),
        F.round(prob, 4).alias("quality_score"),
    )

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

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "quality_classifier_scores",
    "fit_quality_classifier",
    "score_quality",
    "QualityModel",
    "QUALITY_FEATURE_ORDER",
]

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


def _score_expr(model: "QualityModel", text_col):
    """The single definition of the scoring arithmetic, shared by
    :func:`score_quality` and :func:`quality_classifier_scores` so the
    split and composed paths (pinned equal by test and oracle) cannot
    drift: ``sigmoid(intercept + coef·features)`` as a fixed-order
    left-to-right literal dot product."""
    feats = _feature_array(text_col)
    margin = F.lit(float(model.intercept))
    for i, c in enumerate(model.coefficients):
        margin = margin + F.lit(float(c)) * feats[i]
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))


@dataclass(frozen=True)
class QualityModel:
    """A fitted quality classifier, reduced to what scoring needs: the
    coefficient vector (in :data:`QUALITY_FEATURE_ORDER`) and intercept.
    Deliberately NOT the MLlib model object — seven doubles are
    checkpoint-serializable, survive across sessions, and make the
    scoring half a pure deterministic function that a SQL oracle can
    replay verbatim (the ``fit_quantile_bins`` fit/transform contract)."""

    coefficients: tuple
    intercept: float

    def rounded(self, dp: int = 6) -> "QualityModel":
        """The frozen-literal form: coefficients/intercept rounded to
        ``dp`` decimals — what you embed in configs, docs, and oracle SQL
        (full-precision doubles don't round-trip through decimal text)."""
        return QualityModel(
            coefficients=tuple(round(c, dp) for c in self.coefficients),
            intercept=round(self.intercept, dp),
        )


def fit_quality_classifier(
    docs: DataFrame,
    positive_sources: Sequence[str],
    *,
    text_col: str = "text",
    source_col: str = "source",
    reg_param: float = 0.01,
    max_iter: int = 50,
    tol: float = 1e-6,
) -> QualityModel:
    """The ITERATIVE half: fit MLlib ``LogisticRegression`` (L2,
    standardized) to separate reference sources from the rest, and return
    just the :class:`QualityModel` coefficients.

    Scale shape: featurization is map-only expressions; the fit is at
    most ``max_iter`` treeAggregate gradient passes over (features,
    label) rows — each pass map-side-combines per-partition partials into
    one driver-sized vector (6 doubles here), so the corpus never
    shuffles. ``tol`` is the convergence stop: LBFGS exits early once the
    relative improvement drops below it, so ``max_iter`` is a ceiling,
    not a cost floor. Class imbalance at crawl scale (reference ≪ crawl)
    is the caller's knob: pre-downsample or add ``weightCol`` upstream.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    pos = [str(s) for s in positive_sources]
    if not pos:
        raise ValueError("positive_sources must be non-empty")
    base = docs.select(
        F.col(source_col).isin(pos).cast("double").alias("label"),
        array_to_vector(_feature_array(F.col(text_col))).alias("features"),
    )
    lr = LogisticRegression(
        maxIter=max_iter,
        regParam=reg_param,
        tol=tol,
        standardization=True,
        family="binomial",
    )
    model = lr.fit(base)
    return QualityModel(
        coefficients=tuple(float(c) for c in model.coefficients.toArray()),
        intercept=float(model.intercept),
    )


def score_quality(
    docs: DataFrame,
    model: QualityModel,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_dp: int = 4,
) -> DataFrame:
    """The DETERMINISTIC half: closed-form sigmoid scoring against a
    (possibly frozen) :class:`QualityModel` — returns ``(id_col,
    quality_score)``, the probability the document is reference-like,
    rounded to ``round_dp``.

    Scoring uses the extracted coefficients as plan literals instead of
    ``model.transform``: the fitted model object drags its training
    summary — which holds a SparkSession reference — into the task
    closure (observed NotSerializableException on ObservationManager
    under Spark 4.1 classic). Seven double literals in a codegen
    expression are also the honest 100 TB shape: the "broadcast" is the
    literal plan itself, map-only, no JVM object graph rides along.
    Binomial LR's probability is exactly ``sigmoid(intercept + coef·x)``,
    so values match ``transform``'s output — and because the arithmetic
    is a fixed-order dot product over engine-replayable features, a SQL
    oracle replays it value-for-value (unlike the fit, which stays in
    the documented iterative rows-only class).
    """
    if len(model.coefficients) != len(QUALITY_FEATURE_ORDER):
        raise ValueError(
            f"model has {len(model.coefficients)} coefficients; expected "
            f"{len(QUALITY_FEATURE_ORDER)} ({QUALITY_FEATURE_ORDER})"
        )
    return docs.select(
        id_col,
        F.round(_score_expr(model, F.col(text_col)), round_dp).alias(
            "quality_score"
        ),
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
    tol: float = 1e-6,
) -> DataFrame:
    """Train a logistic quality classifier (reference sources = positive)
    and score EVERY document — :func:`fit_quality_classifier` composed
    with :func:`score_quality`, plus the training label for inspection.

    Returns ``(id_col, label, quality_score)`` where ``quality_score`` is
    the model's probability that the document comes from a reference
    source, rounded to 4 decimals (LBFGS float reductions are not
    bit-stable across partitionings; 4dp is). Downstream, filter with
    ``quality_score >= t`` or — the GPT-3 trick — keep stochastically
    with probability ``score`` to avoid a hard cliff.
    """
    model = fit_quality_classifier(
        docs,
        positive_sources,
        text_col=text_col,
        source_col=source_col,
        reg_param=reg_param,
        max_iter=max_iter,
        tol=tol,
    )
    # one map-only scan carrying both the label and the score — joining
    # score_quality's output back on id would re-scan and shuffle for a
    # column that is a cheap expression over the same row
    pos = [str(s) for s in positive_sources]
    return docs.select(
        id_col,
        F.col(source_col).isin(pos).cast("long").alias("label"),
        F.round(_score_expr(model, F.col(text_col)), 4).alias(
            "quality_score"
        ),
    )

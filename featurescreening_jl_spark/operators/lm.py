"""Corpus-trained character n-gram language model scoring — the
self-supervised quality signal LLM-corpus pipelines use (CCNet/KenLM
style): documents whose character statistics diverge from the corpus
(mojibake, binary spill, boilerplate soup) score low average log
probability and can be filtered or bucketed by score.

Two passes over the corpus, both declarative:

1. **Train** — count every character ``n``-gram corpus-wide. The model
   table is bounded by the alphabet size to the ``n``-th power (NOT by
   corpus size), so at 100 TB it is still a few million rows — one
   map-side-combined hash aggregate, then broadcastable.
2. **Score** — re-stream the corpus, explode each document's grams, hash
   join against the broadcast model, aggregate per document. The corpus
   side never shuffles except the final per-doc aggregate (map-side
   partials on ``id_col``, which parquet row-groups already cluster).

Add-one (Laplace) smoothing: ``p(g) = (c(g) + 1) / (N + V)`` with ``N``
total gram occurrences and ``V`` distinct grams — unseen grams (possible
when scoring a shard against a model trained elsewhere) get mass instead
of -inf.

Reference scope: FeatureScreening.jl has no corpus operators; this is
part of the LLM-training-data graft layer (same family as
``operators/text_analysis.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "char_ngram_counts",
    "ngram_lm_score",
    "dsir_weights",
    "perplexity_buckets",
]


def _exploded_char_grams(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """One row per character ``n``-gram occurrence (NOT distinct — LM
    counts are occurrence counts), over whitespace-normalized lowercase
    text. Documents shorter than ``n`` yield no rows.

    Both optimizer traps pinned elsewhere in this package are avoided:
    the normalized string is bound as a LAMBDA VARIABLE via
    ``transform(array(norm), s -> …)`` so CollapseProject cannot inline
    the regexp into every per-gram element (O(len²) re-evaluation —
    see ``winnow_fingerprints``), and the explode is ``explode_outer``
    + null filter so ``InferFiltersFromGenerate`` cannot clone the gram
    expression into a pre-projection filter (see
    ``winnow_candidate_pairs``).
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")

    def grams_of(s):
        return F.when(
            F.length(s) >= n,
            F.transform(
                F.sequence(F.lit(1), F.length(s) - n + 1),
                lambda i: s.substr(i, F.lit(n)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    grams = F.element_at(F.transform(F.array(norm), grams_of), 1)
    return (
        df.select(F.col(id_col), F.explode_outer(grams).alias("__g"))
        .where(F.col("__g").isNotNull())
    )


def char_ngram_counts(
    df: DataFrame,
    n: int = 3,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The LM "training" pass: corpus-wide occurrence counts per character
    ``n``-gram. Output: ``gram``, ``c`` (occurrences). One hash aggregate
    — map-side partial combine keeps the shuffle bounded by the gram
    vocabulary per task, not by corpus rows."""
    return (
        _exploded_char_grams(df, id_col, text_col, n)
        .groupBy(F.col("__g").alias("gram"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def ngram_lm_score(
    df: DataFrame,
    model: DataFrame | None = None,
    n: int = 3,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-document average log probability under an add-one-smoothed
    character ``n``-gram model. ``model`` defaults to training on ``df``
    itself (the CCNet-style self-scoring setup); pass a precomputed
    :func:`char_ngram_counts` output to score a shard against a reference
    corpus model.

    Output: ``id_col``, ``n_ngrams`` (gram occurrences scored),
    ``avg_logp`` (mean natural-log probability; higher = more typical).
    Documents shorter than ``n`` characters produce no row (they have no
    grams — gate them with ``text_stats`` length filters instead).

    Scale shape: the model is bounded by alphabet^n and broadcast
    (``broadcast_model=True``, the default); the corpus streams map-side
    through the join. Unseen grams (left-anti cases when scoring against
    an external model) still score via the smoothing floor — the join is
    LEFT and ``c`` coalesces to 0.
    """
    if model is None:
        model = char_ngram_counts(df, n, id_col=id_col, text_col=text_col)
    totals = model.agg(
        F.sum("c").alias("__N"), F.count(F.lit(1)).alias("__V")
    )
    m = model.select(F.col("gram").alias("__mg"), F.col("c").alias("__c"))
    if broadcast_model:
        m = F.broadcast(m)
    grams = _exploded_char_grams(df, id_col, text_col, n)
    scored = (
        grams.join(m, grams["__g"] == m["__mg"], "left")
        .join(F.broadcast(totals))
        .select(
            id_col,
            F.log(
                (F.coalesce(F.col("__c"), F.lit(0)) + F.lit(1.0))
                / (F.col("__N") + F.col("__V"))
            ).alias("__lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_ngrams"),
        F.avg("__lp").alias("avg_logp"),
    )


def dsir_weights(
    df: DataFrame,
    target: DataFrame,
    n: int = 3,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool = True,
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
    arXiv:2302.03169) re-expressed declaratively: weight every raw-corpus
    document by the likelihood ratio between a TARGET-domain n-gram LM
    and the RAW-corpus LM, ``w(x) = exp(avg_logp_target(x) -
    avg_logp_raw(x))`` — documents that look like the target domain get
    weight > 1 and can be importance-sampled into the training mix
    (compose with :func:`~featurescreening_jl_spark.operators.sampling.
    weighted_reservoir` for the resampling step). Both LMs are add-one-
    smoothed character n-gram models (:func:`char_ngram_counts`); the
    ratio is per-gram-averaged (length-normalized), the standard
    stabilization.

    Plan shape: the two models are FULL-OUTER merged into one bounded
    table (≤ alphabet^n rows) and broadcast once, so the raw corpus is
    exploded and scored in a SINGLE pass — one broadcast hash join + one
    per-doc aggregate, instead of two independent score passes. The
    target corpus is scanned once (its count aggregate); the raw corpus
    twice (its model + the scoring pass), both map-side-combined.

    Output: ``id_col``, ``n_ngrams``, ``avg_logp_target``,
    ``avg_logp_raw``, ``log_ratio``, ``weight``.
    """
    mt = char_ngram_counts(target, n, id_col=id_col, text_col=text_col)
    mr = char_ngram_counts(df, n, id_col=id_col, text_col=text_col)
    merged = (
        mt.select(F.col("gram"), F.col("c").alias("__ct"))
        .join(
            mr.select(F.col("gram"), F.col("c").alias("__cr")),
            "gram",
            "full_outer",
        )
    )
    tot = merged.agg(
        F.sum(F.coalesce("__ct", F.lit(0))).alias("__Nt"),
        F.count("__ct").alias("__Vt"),
        F.sum(F.coalesce("__cr", F.lit(0))).alias("__Nr"),
        F.count("__cr").alias("__Vr"),
    )
    m = merged
    if broadcast_model:
        m = F.broadcast(m)
    grams = _exploded_char_grams(df, id_col, text_col, n)
    scored = (
        grams.join(m, grams["__g"] == m["gram"], "left")
        .join(F.broadcast(tot))
        .select(
            id_col,
            F.log(
                (F.coalesce(F.col("__ct"), F.lit(0)) + F.lit(1.0))
                / (F.col("__Nt") + F.col("__Vt"))
            ).alias("__lpt"),
            F.log(
                (F.coalesce(F.col("__cr"), F.lit(0)) + F.lit(1.0))
                / (F.col("__Nr") + F.col("__Vr"))
            ).alias("__lpr"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_ngrams"),
        F.avg("__lpt").alias("avg_logp_target"),
        F.avg("__lpr").alias("avg_logp_raw"),
    )
    ratio = F.col("avg_logp_target") - F.col("avg_logp_raw")
    return per_doc.select(
        id_col,
        "n_ngrams",
        "avg_logp_target",
        "avg_logp_raw",
        ratio.alias("log_ratio"),
        F.exp(ratio).alias("weight"),
    )


def perplexity_buckets(
    df: DataFrame,
    model: DataFrame | None = None,
    n: int = 3,
    *,
    n_buckets: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    approx: bool = False,
) -> DataFrame:
    """CCNet-style per-language perplexity partitioning (Wenzek et al.
    2020): score every document under the char-``n``-gram LM
    (:func:`ngram_lm_score`), then split each language into ``n_buckets``
    equal tiles by score — bucket 1 is the most-typical "head", the last
    the "tail" that quality-sensitive training mixes downweight or drop.

    Ordering is on the score ROUNDED to 6 decimals with ``id_col`` as the
    tiebreak, so bucket assignment is engine-portable and re-run-stable
    (raw double scores differ across engines in the last ulps).
    Documents shorter than ``n`` chars have no grams, hence no score and
    no row — gate them separately with length filters.

    ``approx=False`` (default): exact ``ntile`` — ONE window shuffle on
    ``lang_col``; each language partition is totally sorted, which is the
    verifier-grade form but funnels a dominant language through one sort
    at corpus scale.

    ``approx=True``: the 100 TB path — per-language bucket BOUNDARIES
    from ``approx_percentile`` (a map-side-combinable sketch aggregate,
    one bounded row per language, broadcast back), then map-only range
    assignment. No per-language total sort; tile sizes are approximate at
    the sketch's accuracy, head/tail semantics identical.

    Output: ``(id_col, lang, avg_logp, bucket)``, ``bucket`` ∈ 1..n_buckets.
    """
    scores = ngram_lm_score(
        df, model, n, id_col=id_col, text_col=text_col
    ).select(id_col, F.round("avg_logp", 6).alias("avg_logp"))
    base = df.select(id_col, lang_col).join(scores, id_col)
    if not approx:
        w = (
            Window.partitionBy(lang_col)
            .orderBy(F.desc("avg_logp"), F.col(id_col))
        )
        return base.select(
            id_col, lang_col, "avg_logp", F.ntile(n_buckets).over(w).alias("bucket")
        )
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = base.groupBy(lang_col).agg(
        F.approx_percentile("avg_logp", probs, 10000).alias("__cuts")
    )
    joined = base.join(F.broadcast(bounds), lang_col)
    # descending-score buckets: scores above the (1 - 1/n)-quantile are
    # bucket 1; aggregate counts how many cuts sit at-or-above the score
    bucket = (
        F.aggregate(
            F.col("__cuts"),
            F.lit(0),
            lambda acc, cut: acc
            + F.when(F.col("avg_logp") <= cut, 1).otherwise(0),
        )
    )
    return joined.select(
        id_col,
        lang_col,
        "avg_logp",
        (bucket + F.lit(1)).alias("bucket"),
    )

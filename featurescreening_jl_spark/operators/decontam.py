"""Benchmark decontamination: flag training documents that overlap an
evaluation/benchmark set by shared word n-grams.

The standard LLM-corpus hygiene step (GPT-3 appendix C, PaLM, Llama — all
n-gram-overlap based): any training document sharing enough long word
n-grams with a benchmark prompt/answer is contaminated and must be
dropped or audited before training.

Scale design (the asymmetry IS the algorithm): the benchmark side is
small by definition (eval sets are thousands of rows, the corpus is
billions), so the benchmark's exploded n-gram index is ``broadcast`` —
the corpus side streams map-side through a broadcast hash join and NEVER
shuffles; only the matching ``(doc, bench)`` candidate pairs (a tiny
fraction of the corpus) enter the aggregate that counts shared n-grams.
Corpus n-grams are produced by the same lazily-exploded expression as the
dedup operators (``dedup.shingles`` — distinct word n-grams), pipelined
into the join probe without materialization.

Reference scope: FeatureScreening.jl has no corpus operators; this is
part of the LLM-training-data graft layer (same family as
``operators/dedup.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from featurescreening_jl_spark.operators.dedup import shingles

__all__ = ["contamination_pairs", "flag_contaminated"]


def _exploded_ngrams(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    # explode_outer + null filter, not explode: InferFiltersFromGenerate
    # would clone the shingle expression into a pre-projection Filter run
    # on every input row (same trap as winnow_candidate_pairs).
    return (
        df.select(
            F.col(id_col),
            F.explode_outer(shingles(F.col(text_col), n=n)).alias("__g"),
        )
        .where(F.col("__g").isNotNull() & (F.length("__g") > 0))
    )


def contamination_pairs(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 8,
    min_shared: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "text",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """``(id_col, bench_id_col, n_shared)`` for every corpus document
    sharing ≥ ``min_shared`` distinct word ``n``-grams with a benchmark
    row. ``n_shared`` is the exact distinct-n-gram intersection size
    (both sides shingle with ``array_distinct``, so the count of join
    hits per pair IS the intersection cardinality).

    ``broadcast_benchmark=True`` (default) pins the broadcast-hash-join
    strategy — set it False only if the "benchmark" side is genuinely
    large, in which case a shuffled join on the n-gram string applies.
    ``n`` defaults to 8 words, the common decontamination gram length;
    lower it for short benchmark prompts.
    """
    c = _exploded_ngrams(corpus, id_col, text_col, n)
    b = _exploded_ngrams(benchmark, bench_id_col, bench_text_col, n).select(
        F.col(bench_id_col), F.col("__g").alias("__bg")
    )
    if broadcast_benchmark:
        b = F.broadcast(b)
    return (
        c.join(b, c["__g"] == b["__bg"])
        .groupBy(id_col, bench_id_col)
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def flag_contaminated(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 8,
    min_shared: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "text",
    flag_col: str = "contaminated",
    matches_col: str = "n_bench_matches",
) -> DataFrame:
    """Corpus rows annotated with ``flag_col`` (true iff the row shares ≥
    ``min_shared`` n-grams with ANY benchmark row) and ``matches_col``
    (how many benchmark rows it matched). The per-doc rollup of
    :func:`contamination_pairs` joined back — the join's right side is
    one row per contaminated doc (tiny), so AQE broadcasts it.
    """
    pairs = contamination_pairs(
        corpus,
        benchmark,
        n=n,
        min_shared=min_shared,
        id_col=id_col,
        text_col=text_col,
        bench_id_col=bench_id_col,
        bench_text_col=bench_text_col,
    )
    per_doc = pairs.groupBy(id_col).agg(
        F.count(F.lit(1)).alias(matches_col)
    )
    return (
        corpus.join(per_doc, on=id_col, how="left")
        .withColumn(matches_col, F.coalesce(F.col(matches_col), F.lit(0)))
        .withColumn(flag_col, F.col(matches_col) >= 1)
    )

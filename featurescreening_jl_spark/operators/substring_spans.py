"""Exact substring-span dedup statistics (Lee et al. 2022 style).

The fifth dedup family alongside exact / MinHash-LSH / SimHash /
n-gram-Jaccard (``operators/dedup.py``): instead of judging whole
documents near-duplicate, find the exact CHARACTER SPANS that are
repeated verbatim anywhere in the corpus and report, per document, how
much of it is duplicated text. This is the span-level dedup from
"Deduplicating Training Data Makes Language Models Better"
(Lee et al., 2022, arXiv:2107.06499), re-expressed Spark-first: the
paper's suffix-array pass is replaced by the bounded k-gram-hash
formulation (a span is "duplicated" iff every length-``k`` window in it
occurs ``min_count``-plus times corpus-wide), which needs only two
shuffles and no global suffix order.

Plan shape (all JVM-side, zero Python UDFs):

1. map:     one scan of ``docs`` explodes each text into
            ``len - k + 1`` rows of ``(doc_id, pos, xxhash64(k-gram))``
            — the shuffle rows are ~24 bytes wide; the k-gram STRING
            never leaves the map side.
2. shuffle 1 (gram hash): a window ``count(*)`` per hash marks
            positions whose k-gram repeats (``cross_doc_only=True``
            instead marks hashes seen in >1 distinct document via the
            window min/max doc_id trick — ``COUNT(DISTINCT)`` is not a
            window function).
3. shuffle 2 (doc_id): merge the fixed-length candidate spans per
            document with a conditional-lag window — with positions
            sorted, merged coverage is ``sum(min(k, pos - prev_pos))``
            (first span contributes ``k``) — then a same-partitioning
            ``groupBy(doc_id)`` Catalyst plans WITHOUT a third exchange.

Documents shorter than ``k`` ride the same single scan via
``explode_outer`` (their empty position array keeps one null row, which
contributes 0 duplicated chars), so the operator never joins back to the
input table.

100 TB notes: cost is one wide-ish map stage plus two narrow shuffles;
no O(n²) term anywhere (the window over gram hashes replaces the
self-join). 64-bit hashing means a hash collision between distinct
k-grams can only ADD duplicated-span rows (never drop one); at 10^12
grams the expected number of colliding pairs is ~10^4 spans of k chars —
negligible against the corpus, and the same add-only argument as
``dedup.ngram_jaccard_pairs_indexed``. Short-doc null rows are re-keyed
to a per-doc salt so the null-hash window partition cannot become a
skew hotspot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["duplicated_spans"]


def duplicated_spans(
    docs: DataFrame,
    k: int = 40,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
    cross_doc_only: bool = False,
) -> DataFrame:
    """Per-document duplicated-span statistics from corpus-wide repeated
    character ``k``-grams.

    Returns one row per input document:
    ``(id_col, n_chars, dup_chars, dup_fraction)`` where ``dup_chars`` is
    the size of the union of all length-``k`` windows whose content
    occurs at least ``min_count`` times in the whole corpus (or, with
    ``cross_doc_only=True``, occurs in at least two distinct documents —
    self-repeats inside one document then don't count).

    ``k`` is the minimum duplicated-span length to detect (Lee et al.
    use 50 BPE tokens; character-domain defaults differ). ``dup_fraction``
    is ``dup_chars / n_chars`` (0.0 for empty docs).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")

    text = F.col(text_col)
    positions = F.sequence(F.lit(1), F.length(text) - F.lit(k - 1))
    grams = F.when(
        F.length(text) >= k,
        F.transform(
            positions,
            lambda p: F.struct(
                p.alias("pos"),
                F.xxhash64(text.substr(p, F.lit(k))).alias("gh"),
            ),
        ),
    )  # null (not empty-array) when len < k, so explode_outer keeps the doc

    exploded = docs.select(
        F.col(id_col),
        F.length(text).alias("n_chars"),
        F.explode_outer(grams).alias("g"),
    ).select(
        id_col,
        "n_chars",
        F.col("g.pos").alias("pos"),
        # re-key short-doc null rows to a per-doc salt: they must neither
        # pool into one giant null partition (skew) nor ever count as
        # duplicated (each salt is unique, so its window count is 1)
        F.coalesce(
            F.col("g.gh"),
            F.xxhash64(F.concat(F.lit("\x00short\x00"), F.col(id_col))),
        ).alias("gh"),
    )

    w_gram = Window.partitionBy("gh")
    if cross_doc_only:
        is_dup = (F.col("pos").isNotNull()) & (
            F.min(id_col).over(w_gram) != F.max(id_col).over(w_gram)
        )
    else:
        is_dup = (F.col("pos").isNotNull()) & (
            F.count(F.lit(1)).over(w_gram) >= min_count
        )
    marked = exploded.withColumn("is_dup", is_dup)

    # conditional lag: last DUPLICATED position before this row, so
    # non-candidate rows pass through contributing 0 without a filter
    # (keeps every doc in one pipeline — no join back to the input).
    w_doc = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_dup_pos = F.max(F.when(F.col("is_dup"), F.col("pos"))).over(w_doc)
    contribution = F.when(
        F.col("is_dup"),
        F.least(F.lit(k), F.col("pos") - F.coalesce(prev_dup_pos, F.col("pos") - k)),
    ).otherwise(F.lit(0))

    return (
        marked.withColumn("contrib", contribution)
        .groupBy(id_col)
        .agg(
            F.first("n_chars").alias("n_chars"),
            F.sum("contrib").alias("dup_chars"),
        )
        .select(
            id_col,
            "n_chars",
            "dup_chars",
            F.round(
                F.col("dup_chars") / F.greatest(F.col("n_chars"), F.lit(1)), 6
            ).alias("dup_fraction"),
        )
    )

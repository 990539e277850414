"""Deterministic distinct-count sketching (KMV / k-minimum-values).

``approx_count_distinct`` (HyperLogLog++) is the built-in answer, but its
estimates depend on Spark's internal hashing and register layout — no
external engine can reproduce them, so a pipeline that *audits* its
cardinality estimates (or needs them stable across engine versions) can't
check them. KMV gives the same O(k) space / mergeable-sketch contract
with a fully deterministic, engine-portable definition:

    map values to the unit interval with the portable 60-bit md5 hash,
    keep the k smallest distinct hashes; estimate = (k-1) / u_k
    (Beyer et al., "On synopses for distinct-value estimation under
    multiset operations", SIGMOD 2007).

The k smallest GLOBAL hashes are computable without a global sort:
per-group it's one ``row_number() <= k`` window over the deduplicated
hash table — partial aggregation dedups map-side, the window sees only
distinct hashes, and at 10^12 rows the shuffle carries (group, hash)
pairs, never raw values. The sketch (a k-array of hashes) merges across
tables by concat → dedup → re-take-k, which is how two corpora's
cardinalities union without rescanning either.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["kmv_hash_unit", "kmv_distinct_by", "kmv_overlap"]

_KMV_SCALE = float(1 << 60)


def kmv_hash_unit(col: Column) -> Column:
    """Portable hash of a value into the unit interval [0, 1): the 60-bit
    md5 prefix (``dedup.hash60_portable``) divided by 2^60. Any engine
    with md5 reproduces it bit-for-bit — the property the estimate's
    oracle-checkability rests on."""
    from featurescreening_jl_spark.operators.dedup import hash60_portable

    return hash60_portable(col.cast("string")) / F.lit(_KMV_SCALE)


def _min_k_sketch(hashes: DataFrame, keys: list[str], k: int) -> DataFrame:
    """Exact per-group min-k of a deduplicated ``(keys…, __u)`` hash table
    as two BOUNDED aggregate levels (no per-group window sort): level 1
    keeps each shuffle partition's k smallest per group (state ≤ k per
    (group, partition); the exchange moves only those arrays), level 2
    merges ≤ k × num_partitions candidates per group. The min-k set is
    partition-invariant, so the result is exact and deterministic; a
    row_number() window here would sort a group's ENTIRE distinct-hash
    set in one reducer — the part that breaks first at 10^9-cardinality
    groups. Returns one row per group with ``__sk``: the sorted array of
    ≤ k smallest hashes (the mergeable KMV sketch itself)."""
    lvl1 = (
        hashes.groupBy(*keys, F.spark_partition_id().alias("__pid"))
        .agg(F.slice(F.array_sort(F.collect_set("__u")), 1, k).alias("__tk"))
        .select(*keys, F.explode("__tk").alias("__u"))
    )
    return lvl1.groupBy(*keys).agg(
        F.slice(F.array_sort(F.collect_set("__u")), 1, k).alias("__sk")
    )


def kmv_distinct_by(
    df: DataFrame,
    value_col: str,
    by: str | list[str],
    k: int = 64,
) -> DataFrame:
    """Per-group KMV distinct-count estimate of ``value_col``.

    Returns one row per group: ``n_rows`` (group size), ``kmv_k`` (the
    number of hashes actually kept — min(k, true distinct count)),
    ``kmv_estimate`` (the (k-1)/u_k estimator; exact count when the
    group has fewer than k distinct values — the sketch IS the value set
    then), and ``kmv_max_hash`` (u_k, the sketch boundary, exposed so
    sketches are comparable/mergeable downstream).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    keys = [by] if isinstance(by, str) else list(by)
    u = kmv_hash_unit(F.col(value_col)).alias("__u")
    sizes = df.groupBy(*keys).agg(F.count("*").alias("n_rows"))
    # distinct hashes per group (map-side partial dedup, shuffled on the
    # WIDE (keys, hash) key so no single reducer owns a group) …
    hashes = df.select(*keys, u).groupBy(*keys, "__u").agg(F.lit(1)).select(
        *keys, "__u"
    )
    est = _min_k_sketch(hashes, keys, k).select(
        *keys,
        F.size("__sk").cast("long").alias("kmv_k"),
        F.element_at("__sk", -1).alias("kmv_max_hash"),
    )
    est = est.withColumn(
        "kmv_estimate",
        F.when(F.col("kmv_k") < k, F.col("kmv_k").cast("double")).otherwise(
            (F.lit(k - 1)) / F.col("kmv_max_hash")
        ),
    )
    return sizes.join(est, on=keys, how="inner").select(
        *keys,
        "n_rows",
        "kmv_k",
        F.round("kmv_estimate", 4).alias("kmv_estimate"),
        F.round("kmv_max_hash", 8).alias("kmv_max_hash"),
    )


def kmv_overlap(
    df: DataFrame,
    value_col: str,
    by: str,
    k: int = 128,
) -> DataFrame:
    """Pairwise corpus-overlap estimation: for every pair of groups,
    estimate the Jaccard similarity of their DISTINCT-``value_col`` sets
    from O(k) KMV (bottom-k) sketches — "how much of source A's content
    is also in source B" without ever intersecting the full sets. The
    bottom-k estimator (Beyer et al., SIGMOD 2007; same family as the
    KMV distinct count above): take the k smallest hashes of the UNION
    of the two sketches and count how many land in both —
    ``J ≈ |min-k(A ∪ B) ∩ A ∩ B| / |min-k(A ∪ B)|``. Exact (up to md5
    collisions) whenever both groups have < k distinct values, because
    then each sketch IS its value set.

    Scale: the corpus collapses to one ≤k-element sorted hash array per
    group via the same two bounded aggregate levels as
    :func:`kmv_distinct_by` (the (group, hash) dedup shuffle is the only
    pass over the data; raw values never shuffle). The pairwise stage is
    a broadcast self-join over |groups| sketch rows — |groups|²/2 pairs
    of O(k) array intersections, independent of corpus size. Sketches
    for new shards merge with old ones by union → re-take-k, so corpus
    overlap is maintainable incrementally.

    Output: one row per unordered group pair — ``{by}_a``, ``{by}_b``
    (with ``{by}_a < {by}_b``), ``k_union`` (merged-sketch size actually
    used), ``k_inter`` (of those, how many are in both sketches), and
    ``jaccard_est = k_inter / k_union`` (rounded to 6 dp).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    u = kmv_hash_unit(F.col(value_col)).alias("__u")
    hashes = (
        df.select(F.col(by).alias("__g"), u)
        .groupBy("__g", "__u")
        .agg(F.lit(1))
        .select("__g", "__u")
    )
    sk = _min_k_sketch(hashes, ["__g"], k)
    a = sk.select(F.col("__g").alias(f"{by}_a"), F.col("__sk").alias("__ska"))
    b = sk.select(F.col("__g").alias(f"{by}_b"), F.col("__sk").alias("__skb"))
    # |groups| rows per side: the inequality self-join is a broadcast
    # nested loop over the tiny sketch table by construction
    pairs = a.join(F.broadcast(b), F.col(f"{by}_a") < F.col(f"{by}_b"))
    merged = F.slice(
        F.array_sort(F.array_union(F.col("__ska"), F.col("__skb"))), 1, k
    )
    both = F.filter(
        merged,
        lambda h: F.array_contains(F.col("__ska"), h)
        & F.array_contains(F.col("__skb"), h),
    )
    return pairs.select(
        f"{by}_a",
        f"{by}_b",
        F.size(merged).cast("long").alias("k_union"),
        F.size(both).cast("long").alias("k_inter"),
        F.round(
            F.size(both) / F.size(merged).cast("double"), 6
        ).alias("jaccard_est"),
    )

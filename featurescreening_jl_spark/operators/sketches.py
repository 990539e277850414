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

__all__ = ["kmv_hash_unit", "kmv_distinct_by"]

_KMV_SCALE = float(1 << 60)


def kmv_hash_unit(col: Column) -> Column:
    """Portable hash of a value into the unit interval [0, 1): the 60-bit
    md5 prefix (``dedup.hash60_portable``) divided by 2^60. Any engine
    with md5 reproduces it bit-for-bit — the property the estimate's
    oracle-checkability rests on."""
    from featurescreening_jl_spark.operators.dedup import hash60_portable

    return hash60_portable(col.cast("string")) / F.lit(_KMV_SCALE)


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
    # … then an exact min-k in two BOUNDED aggregate levels instead of a
    # per-group window: level 1 keeps each shuffle partition's k smallest
    # per group (state ≤ k per (group, partition); the exchange moves only
    # those arrays), level 2 merges ≤ k × num_partitions candidates per
    # group. The min-k set is partition-invariant, so the result is exact
    # and deterministic; the row_number() window this replaces sorted a
    # group's ENTIRE distinct-hash set in one reducer — the part that
    # breaks first at 10^9-cardinality groups.
    lvl1 = (
        hashes.groupBy(*keys, F.spark_partition_id().alias("__pid"))
        .agg(F.slice(F.array_sort(F.collect_set("__u")), 1, k).alias("__tk"))
        .select(*keys, F.explode("__tk").alias("__u"))
    )
    est = (
        lvl1.groupBy(*keys)
        .agg(F.slice(F.array_sort(F.collect_set("__u")), 1, k).alias("__tk"))
        .select(
            *keys,
            F.size("__tk").cast("long").alias("kmv_k"),
            F.element_at("__tk", -1).alias("kmv_max_hash"),
        )
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

"""Interval (range) join: match point events to covering time intervals.

Spark has no native range-join operator (Databricks' range-join hint is
not in OSS); the naive formulation — a key-equi join with a BETWEEN
predicate — planwise degenerates: Catalyst keeps the equality as the join
key and evaluates the range as a post-join filter, so a hot key with E
events and I intervals materializes E×I rows before filtering.

This operator makes the range part of the JOIN KEY via time bucketing,
the same trick as ``asof_join``'s bucketed strategy
(`operators/asof_join.py`):

1. each point row computes its single bucket ``floor(ts / bucket)``;
2. each interval row is replicated to EVERY bucket its ``[start, end]``
   span covers (``sequence`` + ``explode`` — pure codegen, no UDF);
3. an equi-join on ``(key, bucket)`` followed by the exact containment
   filter.

A (point, interval) pair meets in exactly ONE bucket — the point's — so
no post-join dedup is needed. Replication factor per interval is
``span/bucket_seconds + 1``, bounded and chosen by the caller; join
groups are bounded by (rows per key per bucket), not (rows per key), so
skewed keys don't blow up a task. At 10^12 rows both sides shuffle once
on ``(key, bucket)``; pick ``bucket_seconds`` near the typical interval
span so replication stays O(1) per interval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from featurescreening_jl_spark.functions.time import epoch_micros, epoch_seconds

__all__ = ["range_join"]


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    by: str | list[str] | None = None,
    bucket_seconds: int = 600,
    max_span_buckets: int = 1000,
    inclusive_end: bool = True,
) -> DataFrame:
    """Inner-join ``points`` to every interval row whose
    ``[start, end]`` (or ``[start, end)`` with ``inclusive_end=False``)
    contains the point's timestamp, optionally also matching key columns
    ``by``.

    ``max_span_buckets`` bounds the per-interval replication: an interval
    spanning more buckets raises (never a silent O(span) blow-up — widen
    ``bucket_seconds`` instead). The guard compiles to a codegen
    ``raise_error`` inside the plan, so it costs nothing until violated
    and needs no driver-side pre-scan.
    """
    keys = [by] if isinstance(by, str) else list(by or [])
    overlap = set(points.columns) & set(intervals.columns) - set(keys)
    if overlap:
        raise ValueError(
            f"points and intervals share non-key columns {sorted(overlap)}; "
            "rename or drop them before joining"
        )

    # bucket on TRUNCATED seconds (floor(floor(x)/b) == floor(x/b) for
    # integer b, so truncation never mis-buckets), but test containment
    # on exact epoch MICROS — second-truncated comparisons would flip
    # sub-second boundary cases
    p_sec = epoch_seconds(F.col(point_ts))
    s_sec = epoch_seconds(F.col(start_col))
    e_sec = epoch_seconds(F.col(end_col))

    p = points.withColumn(
        "__bucket", F.floor(p_sec / F.lit(bucket_seconds)).cast("long")
    )
    lo = F.floor(s_sec / F.lit(bucket_seconds)).cast("long")
    hi = F.floor(e_sec / F.lit(bucket_seconds)).cast("long")
    span_guard = F.when(
        hi - lo >= max_span_buckets,
        F.raise_error(
            F.format_string(
                "range_join: interval spans more than %d buckets of %ds — "
                "increase bucket_seconds",
                F.lit(max_span_buckets),
                F.lit(bucket_seconds),
            )
        ).cast("long"),
    ).otherwise(hi)
    iv = intervals.withColumn(
        "__bucket", F.explode(F.sequence(lo, span_guard))
    )

    p_us = epoch_micros(F.col(point_ts))
    cond = p_us >= epoch_micros(F.col(start_col))
    e_us = epoch_micros(F.col(end_col))
    cond &= (p_us <= e_us) if inclusive_end else (p_us < e_us)
    joined = p.join(iv, on=keys + ["__bucket"], how="inner").where(cond)
    return joined.drop("__bucket")

"""Distributed Lloyd's k-means in exact fixed-point integer arithmetic.

The fully-distributed complement to ``ivf.train_centroids`` (which
k-means a bounded driver-side SAMPLE): here every corpus row votes in
every iteration, the path you want when cluster structure lives in the
tail a 100k-row sample misses (rare languages, small semantic islands)
— e.g. corpus bucketing for curriculum/mixture design, or building IVF
cells from the full corpus instead of a sample.

Scale design (10^12 rows, K cells, D dims):

- Per iteration exactly TWO narrow operations: a map-only assignment
  (argmin over a broadcast centroid literal — one codegen fold, no UDF,
  no join) and ONE groupBy(cell) aggregate whose map-side partials
  collapse each partition to ≤ K rows of (count, D sums) before the
  exchange — the only shuffle of the iteration moves K × partitions
  bounded rows, never the corpus.
- Centroids live on the driver between iterations (K × D int64 — a few
  KB); the corpus is scanned ``iters`` times and never cached by the
  operator (callers persist the snapped projection if their storage
  tier makes re-scans expensive).
- ALL arithmetic is int64 fixed-point (vectors snap to a 10^-scale
  grid, the ``feature_corr`` / ``expanding_zscore`` convention):
  integer sums commute, so centroids and assignments are bit-identical
  under any partitioning, core count, or execution order — and the
  whole fixed-iteration computation replays engine-exactly in the
  DuckDB oracle (stacked CTEs, floor-division centroid update).
- Quantized Lloyd's: each new centroid snaps back to the grid by
  rounding s/c half-AWAY-FROM-ZERO via integer division on |s|
  (sign(s) * ((2*|s| + c) // (2*c))) — the one rounding rule that is
  engine-portable: Python's // floors while DuckDB's // truncates
  toward zero, so they only agree on non-negative operands.
  Per-coordinate grid error is ≤ 0.5 * 10^-scale — noise for any real
  embedding scale, and the price of exactness. Empty cells keep their
  previous centroid (deterministic; no re-seeding RNG).
- Init is the K corpus rows with the smallest portable md5 hash of
  their id (``hash60_portable``, id tie-break) — a seedless uniform
  pick that is stable across partitioning AND reproducible verbatim in
  SQL, unlike kmeans++ whose sequential RNG would make the oracle
  unwritable.

Ties in the argmin break toward the lower cell index (the struct
``(d2, cell)`` min), so assignment is a pure function of the data.

Reference scope note: FeatureScreening.jl has no clustering operator —
this is part of the LLM-training-data graft layer, not reference parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from featurescreening_jl_spark.operators.dedup import hash60_portable

__all__ = ["kmeans_fit", "kmeans_assign", "snap_fixed_point"]


def snap_fixed_point(vec_col: Column, scale: int = 3) -> Column:
    """``array<float/double>`` → ``array<long>`` on the 10^-scale grid,
    round-half-up (``floor(x * 10^scale + 0.5)`` — the exact expression
    ``feature_corr_pairs`` uses, replayable in any engine)."""
    m = 10**scale
    return F.transform(
        vec_col,
        lambda v: F.floor(v.cast("double") * m + F.lit(0.5)).cast("long"),
    )


def _long_matrix_literal(rows) -> Column:
    # one generated-SQL expr (the double_array_literal lesson: one py4j
    # round-trip per element makes big literals a plan bottleneck)
    return F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(f"{int(v)}L" for v in r) + ")" for r in rows
        )
        + ")"
    )


def _assign_expr(x: Column, centroids) -> Column:
    """0-based cell index of the nearest centroid (squared L2, exact
    int64), ties to the lower cell. One sequential fold per cell —
    deterministic evaluation order, no floats anywhere."""
    k = len(centroids)
    cent = _long_matrix_literal(centroids)

    def d2(j: Column) -> Column:
        c = F.element_at(cent, (j + 1).cast("int"))
        return F.aggregate(
            F.zip_with(x, c, lambda xi, ci: (xi - ci) * (xi - ci)),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )

    best = F.array_min(
        F.transform(
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda j: F.struct(
                d2(j).alias("d"), j.cast("int").alias("cell")
            ),
        )
    )
    return best["cell"]


def kmeans_fit(
    df: DataFrame,
    *,
    k: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 3,
    scale: int = 3,
) -> list:
    """Fit ``k`` centroids over ALL rows; returns the centroid matrix as
    a list of ``k`` int64 vectors on the 10^-scale grid (feed to
    :func:`kmeans_assign`, or divide by ``10^scale`` for floats).

    An index BUILD — runs ``iters + 1`` bounded Spark jobs by design
    (the ``train_centroids`` precedent: an explicit action, never a
    hidden side effect of plan composition). Every job's driver-side
    result is ≤ ``k × (dim + 1)`` longs.
    """
    if k < 1:
        raise ValueError("kmeans_fit: k must be >= 1")
    snapped = df.select(
        F.col(id_col).alias("__id"),
        snap_fixed_point(F.col(vec_col), scale).alias("__x"),
    )
    init = (
        snapped.orderBy(
            hash60_portable(
                F.concat(F.lit("km:"), F.col("__id").cast("string"))
            ),
            F.col("__id"),
        )
        .limit(k)
        .collect()
    )
    if len(init) < k:
        raise ValueError(f"kmeans_fit: corpus has {len(init)} rows < k={k}")
    cents = [list(r["__x"]) for r in init]
    for _ in range(iters):
        agg = (
            snapped.select(
                _assign_expr(F.col("__x"), cents).alias("__cell"), "__x"
            )
            .groupBy("__cell")
            .agg(
                F.count(F.lit(1)).alias("__c"),
                *[
                    F.sum(F.element_at("__x", i + 1)).alias(f"__s{i}")
                    for i in range(dim)
                ],
            )
            .collect()
        )
        for r in agg:
            c = r["__c"]
            # round-half-away-from-zero(s / c) via integer division on
            # |s| (see module docstring: the oracle's // truncates where
            # Python's floors, so divide non-negatives only); empty
            # cells never reach here and keep their previous centroid
            cents[r["__cell"]] = [
                _rhafz(r[f"__s{i}"], c) for i in range(dim)
            ]
    return cents


def _rhafz(s: int, c: int) -> int:
    q = (2 * abs(s) + c) // (2 * c)
    return q if s >= 0 else -q


def kmeans_assign(
    df: DataFrame,
    centroids,
    *,
    vec_col: str = "embedding",
    scale: int = 3,
    cell_col: str = "cell",
) -> DataFrame:
    """Adds ``cell_col`` (0-based nearest-centroid index) as ONE map-only
    codegen expression against the broadcast centroid literal — no UDF,
    no join, no shuffle; at scale the result is written
    ``partitionBy(cell_col)`` / bucketed so downstream per-cluster work
    prunes files, exactly like ``ivf.assign_cells``."""
    return df.withColumn(
        cell_col,
        _assign_expr(snap_fixed_point(F.col(vec_col), scale), centroids),
    )

"""Single-pass data-quality gates (the Deequ/expectations pattern).

A 100 TB ingest that discovers bad data in its FEATURES is weeks too
late; production pipelines front-load declarative checks — null rates,
uniqueness, ranges, value sets, regex shape — and fail fast. The design
constraint at scale is pass count: every check here compiles to
AGGREGATE EXPRESSIONS evaluated in ONE scan of the table (map-side
partials, one tiny shuffled row per partition), never one job per check.
The result is a long-format verdict table small enough to collect,
alert on, or append to a lineage log.

- :func:`profile_columns` — per-column observability: row/null counts,
  null rate, distinct count (exact, or ``approx=True`` for the
  HLL-sketch one-pass path at scale — multiple EXACT count-distincts in
  one aggregate force a row-multiplying Expand, which is the documented
  cost of ``approx=False`` on wide profiles), min/max rendered to
  strings so one schema serves every column type.
- :func:`check_constraints` — declarative constraints compiled into the
  same single pass: ``not_null``, ``unique``, ``in_range`` (inclusive),
  ``allowed`` (value whitelist), ``matches`` (regex full-match).
  Returns ``(check, column, violations, passed)`` per constraint.

Reference scope: FeatureScreening.jl trusts its HDF5 inputs
(src/FeatureScreening.jl:92-100 loads matrices unvalidated); the gate
belongs to the graft's production-pipeline layer.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_columns", "check_constraints"]


def profile_columns(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    *,
    approx: bool = False,
) -> DataFrame:
    """Profile ``cols`` (default: every column) in one aggregate pass.

    Returns one row per column:
    ``(column, n_rows, n_null, null_rate, n_distinct, min_value,
    max_value)`` with min/max cast to strings (NULL for all-null
    columns). ``approx=True`` swaps exact ``count_distinct`` for the
    mergeable HLL sketch (±~2.3%) — the wide-profile scale path, since
    k exact distincts in one aggregate Expand the input k-fold.
    """
    names = list(cols) if cols is not None else list(df.columns)
    missing = [c for c in names if c not in df.columns]
    if missing:
        raise ValueError(f"unknown columns: {missing}")
    if not names:
        raise ValueError("no columns to profile")
    distinct = F.approx_count_distinct if approx else F.count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(names):
        col = F.col(c)
        aggs += [
            F.count(col).alias(f"__nn_{i}"),
            distinct(col).alias(f"__nd_{i}"),
            F.min(col).cast("string").alias(f"__mn_{i}"),
            F.max(col).cast("string").alias(f"__mx_{i}"),
        ]
    one = df.agg(*aggs)
    # unpivot the 1-row wide result into long format — driver-free, the
    # stack runs over a single row
    stacked = one.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            "stack({}, {})".format(
                len(names),
                ", ".join(
                    f"'{c}', __nn_{i}, __nd_{i}, __mn_{i}, __mx_{i}"
                    for i, c in enumerate(names)
                ),
            )
        ).alias("column", "__nn", "n_distinct", "min_value", "max_value"),
    )
    return stacked.select(
        "column",
        "n_rows",
        (F.col("n_rows") - F.col("__nn")).alias("n_null"),
        F.when(F.col("n_rows") > 0,
               F.round(1.0 - F.col("__nn") / F.col("n_rows"), 6))
        .otherwise(F.lit(0.0))
        .alias("null_rate"),
        "n_distinct",
        "min_value",
        "max_value",
    )


def check_constraints(
    df: DataFrame,
    constraints: Sequence[tuple],
) -> DataFrame:
    """Evaluate declarative constraints in one aggregate pass.

    Each constraint is a tuple:

    - ``("not_null", col)``              — no NULLs
    - ``("unique", col)``                — no duplicated non-null value
    - ``("in_range", col, lo, hi)``      — every non-null value in
      ``[lo, hi]`` (inclusive)
    - ``("allowed", col, values)``       — every non-null value in the
      whitelist
    - ``("matches", col, regex)``        — every non-null value
      full-matches the regex

    Returns ``(check, column, violations, passed)`` — one row per
    constraint, in input order. NULL handling is deliberate: range /
    whitelist / regex checks skip NULLs (compose with ``not_null`` when
    NULLs are themselves violations), so each check answers exactly one
    question.
    """
    if not constraints:
        raise ValueError("no constraints given")
    aggs = []
    labels = []
    for i, spec in enumerate(constraints):
        kind, col = spec[0], spec[1]
        if col not in df.columns:
            raise ValueError(f"unknown column {col!r} in {spec!r}")
        c = F.col(col)
        if kind == "not_null":
            viol = F.sum(F.when(c.isNull(), 1).otherwise(0))
        elif kind == "unique":
            # duplicated non-null rows = non-null count − distinct count
            viol = F.count(c) - F.count_distinct(c)
        elif kind == "in_range":
            lo, hi = spec[2], spec[3]
            viol = F.sum(
                F.when(c.isNotNull() & ~c.between(F.lit(lo), F.lit(hi)), 1)
                .otherwise(0)
            )
        elif kind == "allowed":
            viol = F.sum(
                F.when(c.isNotNull() & ~c.isin(list(spec[2])), 1)
                .otherwise(0)
            )
        elif kind == "matches":
            viol = F.sum(
                F.when(
                    c.isNotNull() & ~c.cast("string").rlike(str(spec[2])),
                    1,
                ).otherwise(0)
            )
        else:
            raise ValueError(f"unknown constraint kind {kind!r}")
        aggs.append(viol.cast("long").alias(f"__v_{i}"))
        labels.append((kind, col))
    one = df.agg(*aggs)
    return one.select(
        F.expr(
            "stack({}, {})".format(
                len(labels),
                ", ".join(
                    f"'{k}', '{c}', __v_{i}"
                    for i, (k, c) in enumerate(labels)
                ),
            )
        ).alias("check", "column", "violations")
    ).select(
        "check",
        "column",
        "violations",
        (F.col("violations") == 0).alias("passed"),
    )

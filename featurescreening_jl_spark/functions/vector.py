"""Vector column functions over ``array<float/double>`` embeddings.

Built-in higher-order functions (``zip_with`` + ``aggregate``) so the dot
products run inside codegen on the JVM — no UDF, no Python, no Arrow hop.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["dot", "norm", "cosine", "unit", "double_array_literal"]


def double_array_literal(values) -> Column:
    """Arbitrary-depth nested ``array<...array<double>>`` literal in ONE
    py4j call. Building big numeric literals element-wise
    (``F.array(*[F.lit(x) ...])``) costs one Python↔JVM round-trip per
    element — measured 2.1 s to construct a 6×8×64 hyperplane literal vs
    11 ms for the equivalent generated-SQL form (values identical:
    ``repr(float)`` round-trips doubles exactly, ``D`` marks a double
    literal). Plan-time cost only; the resulting literal is the same."""

    def render(v) -> str:
        if isinstance(v, (list, tuple)):
            return "array(" + ",".join(render(x) for x in v) + ")"
        return repr(float(v)) + "D"

    return F.expr(render(values))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def unit(a: Column) -> Column:
    """Unit-normalized copy of the vector (zero vectors pass through
    unchanged). The norm is struct-bound as a LAMBDA VARIABLE so HOF
    eval computes it once per row — inlining ``norm(a)`` in the
    per-element lambda would recompute the full aggregate for every
    element (the O(len²) re-evaluation trap)."""

    def scale(pair):
        return F.transform(
            pair["v"],
            lambda x: x.cast("double")
            / F.when(pair["n"] > 0, pair["n"]).otherwise(F.lit(1.0)),
        )

    bound = F.struct(a.alias("v"), norm(a).alias("n"))
    return F.element_at(F.transform(F.array(bound), scale), 1)

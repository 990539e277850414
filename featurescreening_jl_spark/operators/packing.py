"""Sequence packing: assemble documents into fixed token-budget training
sequences ("packs") — the standard pre-training batching step that turns a
ragged corpus into dense context windows.

Two strategies, both DETERMINISTIC at any cluster size (the pack a document
lands in is a pure function of the data and the seed — never of partition
layout, unlike anything built on ``rand()`` or ``monotonically_increasing_id``):

- ``offset``  — concat-then-chunk semantics: documents are laid out in a
  deterministic hash-shuffled order and the running token offset is cut at
  multiples of ``budget``; a document belongs to the pack where it BEGINS.
  Pure window expressions (one shuffle on the pack group), fully
  SQL-expressible, but a pack may overflow by up to ``max doc tokens - 1``
  (the straddling document finishes in the pack it started).
- ``greedy``  — capacity-respecting first-fit-sequential: walk the same
  deterministic order, close the pack when the next document would not
  fit. No pack ever exceeds ``budget`` (a single oversized document gets a
  pack of its own, flagged ``oversize``). The per-group scan is inherently
  sequential, so it runs as an Arrow-batched ``applyInPandas`` over hash
  groups — vectorized sort + a tight numpy loop per group, never per-row
  Python at the Spark row level.

Scale design: a global sequential scan cannot scale, so BOTH strategies
first split the corpus into ``num_groups`` deterministic hash groups
(``pmod(hash60(seed:id), G)``) and pack each group independently — the
standard sharded-packing formulation (each shard yields its own pack
stream; shard count = parallelism knob). One shuffle on the group key; a
group holds ~n/G documents, so G is sized to keep a group's (id, tokens)
pairs — NOT the text — in one task's memory: 10^12 docs at G = 2^20 is
~10^6 rows of 16 bytes per task. Pack ids are globalized as
``grp * 2^32 + local_pack`` (collision-free while a group emits < 2^32
packs).

Reference scope: FeatureScreening.jl has no corpus operators; this is part
of the LLM-training-data graft layer (same family as ``operators/dedup.py``
and ``operators/sampling.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from featurescreening_jl_spark.operators.sampling import hash_int

__all__ = ["pack_sequences"]

_PACK_STRIDE = 1 << 32  # globalized pack_id = grp * stride + local pack


def _order_key(id_col: str, seed: int):
    """Portable deterministic shuffle key — sampling.hash_int, the one
    definition of the ``seed:key`` 60-bit portable hash every
    ``md5(seed || ':' || key)`` oracle replays."""
    return hash_int(F.col(id_col), seed)


def pack_sequences(
    df: DataFrame,
    budget: int,
    *,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    strategy: str = "greedy",
    num_groups: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Assign every row a training-sequence pack.

    Input needs ``id_col`` (unique) and ``token_col`` (precomputed token
    count — compose with ``text_analysis.token_count`` upstream so the
    pack scan never touches text). Returns the input columns plus:

    - ``pack_id``     long — globally unique pack (grp * 2^32 + seq)
    - ``pack_pos``    int  — 0-based position of the row within its pack
    - ``pack_tokens`` long — the pack's total token count so far INCLUDING
      this row (the final row's value is the pack's fill level)
    - ``oversize``    bool — true iff this row alone exceeds ``budget``
      (greedy gives it a dedicated pack; offset lets it straddle)

    ``strategy='offset'`` / ``'greedy'`` per the module docstring.
    """
    if budget <= 0:
        raise ValueError("pack_sequences: budget must be positive")
    if strategy not in ("offset", "greedy"):
        raise ValueError(f"pack_sequences: unknown strategy {strategy!r}")
    toks = F.col(token_col).cast("long")
    keyed = df.withColumn("__hk", _order_key(id_col, seed)).withColumn(
        "__grp", F.pmod(F.col("__hk"), F.lit(num_groups)).cast("long")
    )

    if strategy == "offset":
        w = Window.partitionBy("__grp").orderBy("__hk", id_col)
        prev = F.coalesce(
            F.sum(toks).over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0).cast("long"),
        )
        staged = keyed.withColumn(
            "__local", F.floor(prev / F.lit(budget)).cast("long")
        )
        # second window keyed on the materialized pack column; its exchange
        # is a sub-partitioning of the first (same __grp prefix), and only
        # the slim (keys, tokens) projection flows through it
        wp = Window.partitionBy("__grp", "__local").orderBy("__hk", id_col)
        return (
            staged.select(
                "*",
                (F.col("__grp") * F.lit(_PACK_STRIDE) + F.col("__local"))
                .alias("pack_id"),
                (F.row_number().over(wp) - 1).cast("int").alias("pack_pos"),
                F.sum(toks)
                .over(wp.rowsBetween(Window.unboundedPreceding, 0))
                .alias("pack_tokens"),
                (toks > F.lit(budget)).alias("oversize"),
            )
            .drop("__hk", "__grp", "__local")
        )

    # greedy: sequential per-group scan in an Arrow-batched cogroup. Only
    # (id, hk, tokens) enter the pandas group — the text column (or any
    # other payload) never crosses the Python boundary; results join back
    # on id. The scan is a single numpy-backed loop over the group's rows.
    slim = keyed.select(
        F.col(id_col).alias("__id"), "__hk", "__grp", toks.alias("__t")
    )
    out_schema = StructType(
        [
            StructField("__id", slim.schema["__id"].dataType),
            StructField("pack_id", LongType()),
            StructField("pack_pos", IntegerType()),
            StructField("pack_tokens", LongType()),
            StructField("oversize", BooleanType()),
        ]
    )

    def pack_group(pdf):
        import pandas as pd

        pdf = pdf.sort_values(["__hk", "__id"], kind="mergesort")
        grp = int(pdf["__grp"].iloc[0])
        t = pdf["__t"].to_numpy()
        n = len(t)
        pack = [0] * n
        pos = [0] * n
        fill = [0] * n
        acc = 0
        cur = 0
        p = 0
        for i in range(n):
            ti = int(t[i])
            if i > 0 and acc + ti > budget:
                cur += 1
                acc = 0
                p = 0
            elif i > 0:
                p += 1
            acc += ti
            pack[i] = grp * _PACK_STRIDE + cur
            pos[i] = p
            fill[i] = acc
        return pd.DataFrame(
            {
                "__id": pdf["__id"].to_numpy(),
                "pack_id": pd.array(pack, dtype="int64"),
                "pack_pos": pd.array(pos, dtype="int32"),
                "pack_tokens": pd.array(fill, dtype="int64"),
                "oversize": t > budget,
            }
        )

    packed = slim.groupBy("__grp").applyInPandas(pack_group, out_schema)
    return (
        keyed.drop("__hk", "__grp")
        .join(packed.withColumnRenamed("__id", id_col), on=id_col)
    )

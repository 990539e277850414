"""Sequence-packing operator tests: budget respect, determinism across
partitioning, exact agreement with a plain-Python greedy reference, and
oversize handling."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from featurescreening_jl_spark.operators.packing import (
    _PACK_STRIDE,
    pack_sequences,
)

BUDGET = 100


def _docs(spark, n=200, parts=4):
    # deterministic ragged token counts in 1..60, a few zeros
    rows = [(f"d{i:04d}", (i * 37) % 61 if i % 17 else 0) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id string, n_tokens int").repartition(
        parts
    )


def _py_hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_greedy(rows, budget, num_groups, seed):
    """Plain-Python reference: identical order key, identical scan."""
    keyed = [
        (_py_hash60(f"{seed}:{d}") % num_groups, _py_hash60(f"{seed}:{d}"), d, t)
        for d, t in rows
    ]
    out = {}
    for grp in sorted({g for g, *_ in keyed}):
        grp_rows = sorted(
            [(hk, d, t) for g, hk, d, t in keyed if g == grp]
        )
        acc, cur, pos = 0, 0, 0
        for i, (hk, d, t) in enumerate(grp_rows):
            if i > 0 and acc + t > budget:
                cur, acc, pos = cur + 1, 0, 0
            elif i > 0:
                pos += 1
            acc += t
            out[d] = (grp * _PACK_STRIDE + cur, pos, acc)
    return out


class TestGreedy:
    def test_matches_python_reference(self, spark):
        df = _docs(spark)
        got = {
            r["doc_id"]: (r["pack_id"], r["pack_pos"], r["pack_tokens"])
            for r in pack_sequences(
                df, BUDGET, strategy="greedy", num_groups=4
            ).collect()
        }
        rows = [(f"d{i:04d}", (i * 37) % 61 if i % 17 else 0) for i in range(200)]
        assert got == _py_greedy(rows, BUDGET, num_groups=4, seed=42)

    def test_budget_respected(self, spark):
        out = pack_sequences(_docs(spark), BUDGET, strategy="greedy")
        fills = (
            out.groupBy("pack_id")
            .agg(F.sum("n_tokens").alias("tot"), F.max("oversize").alias("ov"))
            .collect()
        )
        for r in fills:
            assert r["ov"] or r["tot"] <= BUDGET

    def test_partitioning_invariance(self, spark):
        a = pack_sequences(_docs(spark, parts=1), BUDGET, strategy="greedy")
        b = pack_sequences(_docs(spark, parts=16), BUDGET, strategy="greedy")
        cols = ["doc_id", "pack_id", "pack_pos", "pack_tokens"]
        assert sorted(map(tuple, a.select(cols).collect())) == sorted(
            map(tuple, b.select(cols).collect())
        )

    def test_oversize_isolated(self, spark):
        df = spark.createDataFrame(
            [("big", 500)] + [(f"s{i}", 10) for i in range(20)],
            "doc_id string, n_tokens int",
        )
        out = pack_sequences(df, BUDGET, strategy="greedy", num_groups=2)
        big = out.where("doc_id = 'big'").first()
        assert big["oversize"] and big["pack_pos"] == 0
        mates = out.where(
            (F.col("pack_id") == big["pack_id"]) & (F.col("doc_id") != "big")
        ).count()
        assert mates == 0

    def test_every_doc_packed_once(self, spark):
        df = _docs(spark)
        out = pack_sequences(df, BUDGET, strategy="greedy")
        assert out.count() == df.count()
        assert out.select("doc_id").distinct().count() == df.count()


class TestOffset:
    def test_matches_python_reference(self, spark):
        """pack_id = floor(start_offset / budget) in deterministic hash
        order — recomputed row by row in plain Python."""
        out = {
            r["doc_id"]: r["pack_id"]
            for r in pack_sequences(
                _docs(spark), BUDGET, strategy="offset", num_groups=4
            ).collect()
        }
        rows = [(f"d{i:04d}", (i * 37) % 61 if i % 17 else 0) for i in range(200)]
        keyed = [(_py_hash60(f"42:{d}") % 4, _py_hash60(f"42:{d}"), d, t)
                 for d, t in rows]
        expected = {}
        for grp in {g for g, *_ in keyed}:
            off = 0
            for hk, d, t in sorted((hk, d, t) for g, hk, d, t in keyed if g == grp):
                expected[d] = grp * _PACK_STRIDE + off // BUDGET
                off += t
        assert out == expected

    def test_contiguous_local_packs(self, spark):
        out = pack_sequences(_docs(spark), BUDGET, strategy="offset", num_groups=4)
        rows = out.select("pack_id").distinct().collect()
        by_grp = {}
        for r in rows:
            by_grp.setdefault(r["pack_id"] // _PACK_STRIDE, set()).add(
                r["pack_id"] % _PACK_STRIDE
            )
        for grp, locals_ in by_grp.items():
            assert locals_ == set(range(len(locals_)))

    def test_partitioning_invariance(self, spark):
        a = pack_sequences(_docs(spark, parts=1), BUDGET, strategy="offset")
        b = pack_sequences(_docs(spark, parts=16), BUDGET, strategy="offset")
        cols = ["doc_id", "pack_id", "pack_pos", "pack_tokens"]
        assert sorted(map(tuple, a.select(cols).collect())) == sorted(
            map(tuple, b.select(cols).collect())
        )

    def test_offset_cumsum_semantics(self, spark):
        """Within a pack, pack_tokens is the running sum; across packs the
        total equals the group total."""
        df = _docs(spark, n=80)
        out = pack_sequences(df, BUDGET, strategy="offset", num_groups=2)
        per_pack_last = (
            out.groupBy("pack_id").agg(F.max("pack_tokens").alias("fill"))
        )
        total = per_pack_last.agg(F.sum("fill")).first()[0]
        assert total == df.agg(F.sum("n_tokens")).first()[0]


def test_bad_args(spark):
    df = _docs(spark, n=4)
    with pytest.raises(ValueError):
        pack_sequences(df, 0)
    with pytest.raises(ValueError):
        pack_sequences(df, 10, strategy="nope")

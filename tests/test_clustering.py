"""Distributed exact-integer k-means (operators/clustering.py).

Pinned here: bit-identical agreement with a pure-Python replica of the
same fixed-point algorithm (the bpe/importance treatment for iterative
operators), invariance to partitioning (integer sums commute — the
property float k-means cannot have), deterministic tie-breaks, the
empty-cell retention rule, and the map-only assignment plan.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from featurescreening_jl_spark.operators.clustering import (
    kmeans_assign,
    kmeans_fit,
    snap_fixed_point,
)

pytestmark = pytest.mark.spark


def _replica(ids, vecs, k, iters, scale=3):
    """Pure-Python replay of the exact algorithm: same snap, same md5
    init order, same integer argmin tie-break, same floor-div update."""
    m = 10**scale
    snap = [[math.floor(float(v) * m + 0.5) for v in vec] for vec in vecs]

    def h(i):
        return int(hashlib.md5(f"km:{i}".encode()).hexdigest()[:15], 16)

    order = sorted(range(len(ids)), key=lambda i: (h(ids[i]), ids[i]))
    cents = [list(snap[i]) for i in order[:k]]
    for _ in range(iters):
        members = {}
        for x in snap:
            _, j = min(
                (sum((xi - ci) ** 2 for xi, ci in zip(x, c)), j)
                for j, c in enumerate(cents)
            )
            members.setdefault(j, []).append(x)
        for j, xs in members.items():
            c = len(xs)
            cents[j] = [
                (lambda s: (2 * abs(s) + c) // (2 * c) * (1 if s >= 0 else -1))(
                    sum(col)
                )
                for col in zip(*xs)
            ]
    assign = [
        min(
            (sum((xi - ci) ** 2 for xi, ci in zip(x, c)), j)
            for j, c in enumerate(cents)
        )[1]
        for x in snap
    ]
    return cents, assign


@pytest.fixture(scope="module")
def blobs(spark):
    # three well-separated 2-d blobs, ids interleaved across blobs
    pts = []
    for i in range(30):
        blob = i % 3
        cx, cy = [(0.0, 0.0), (10.0, 10.0), (-10.0, 5.0)][blob]
        # deterministic jitter, no RNG
        pts.append((i, [cx + (i % 7) * 0.01, cy - (i % 5) * 0.01]))
    return pts


class TestKmeans:
    def test_matches_pure_python_replica_exactly(self, spark, blobs):
        df = spark.createDataFrame(blobs, ["vec_id", "embedding"])
        cents = kmeans_fit(df, k=3, dim=2, iters=3)
        ref_cents, ref_assign = _replica(
            [i for i, _ in blobs], [v for _, v in blobs], k=3, iters=3
        )
        assert cents == ref_cents
        got = {
            r["vec_id"]: r["cell"]
            for r in kmeans_assign(df, cents).collect()
        }
        assert [got[i] for i, _ in blobs] == ref_assign
        # and the blobs actually separate: 3 non-empty distinct cells
        assert len(set(ref_assign)) == 3

    def test_partitioning_invariance(self, spark, blobs):
        one = spark.createDataFrame(blobs, ["vec_id", "embedding"]).repartition(1)
        many = spark.createDataFrame(blobs, ["vec_id", "embedding"]).repartition(
            13, "vec_id"
        )
        assert kmeans_fit(one, k=3, dim=2, iters=3) == kmeans_fit(
            many, k=3, dim=2, iters=3
        )

    def test_duplicate_points_tie_to_lower_cell(self, spark):
        # two identical centroids (duplicate init rows): every point ties
        # and must land in the LOWER cell index
        df = spark.createDataFrame(
            [(0, [1.0, 1.0]), (1, [1.0, 1.0]), (2, [1.0, 1.0])],
            ["vec_id", "embedding"],
        )
        cents = kmeans_fit(df, k=2, dim=2, iters=1)
        assert cents[0] == cents[1] == [1000, 1000]
        cells = {r["cell"] for r in kmeans_assign(df, cents).collect()}
        assert cells == {0}

    def test_empty_cell_keeps_previous_centroid(self, spark):
        # identical points, k=2: every point ties into cell 0 each
        # iteration, so cell 1 receives no mass — its centroid must hold
        # its init value through all 5 iterations (no re-seeding, no NaN)
        df = spark.createDataFrame(
            [(i, [5.0, 5.0]) for i in range(4)], ["vec_id", "embedding"]
        )
        cents = kmeans_fit(df, k=2, dim=2, iters=5)
        assert cents == [[5000, 5000], [5000, 5000]]

    def test_assignment_is_map_only(self, spark, blobs):
        df = spark.createDataFrame(blobs, ["vec_id", "embedding"])
        cents = kmeans_fit(df, k=3, dim=2, iters=1)
        plan = (
            kmeans_assign(df, cents)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan

    def test_validation(self, spark):
        df = spark.createDataFrame([(0, [1.0])], ["vec_id", "embedding"])
        with pytest.raises(ValueError, match="k must be"):
            kmeans_fit(df, k=0, dim=1)
        with pytest.raises(ValueError, match="rows < k"):
            kmeans_fit(df, k=5, dim=1)

    def test_update_rounding_is_engine_portable(self):
        # round-half-away-from-zero must agree with DuckDB's truncating
        # // on the |s| formulation for NEGATIVE sums too (plain Python
        # floor-div would not: -7//2 = -4 in Python, -3 in DuckDB)
        import duckdb

        from featurescreening_jl_spark.operators.clustering import _rhafz

        for s in (-7, -6, -5, -1, 0, 1, 5, 6, 7):
            for c in (1, 2, 3):
                got = duckdb.sql(
                    f"SELECT CASE WHEN ({s}) >= 0 "
                    f"THEN (2*({s}) + {c}) // (2*{c}) "
                    f"ELSE -((2*(-({s})) + {c}) // (2*{c})) END"
                ).fetchall()[0][0]
                assert _rhafz(s, c) == got, (s, c)

    def test_snap_round_half_up_matches_oracle_convention(self, spark):
        df = spark.createDataFrame(
            [(0, [0.0015, -0.0015, 0.9999])], ["vec_id", "v"]
        )
        row = df.select(
            snap_fixed_point(F.col("v"), 3).alias("s")
        ).collect()[0]["s"]
        assert list(row) == [
            math.floor(0.0015 * 1000 + 0.5),
            math.floor(-0.0015 * 1000 + 0.5),
            math.floor(0.9999 * 1000 + 0.5),
        ]

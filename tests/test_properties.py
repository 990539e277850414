"""Property-based fuzzing (hypothesis) of the pure driver-side kernels.

Spark round-trips are too slow for per-example fuzzing, so this file
targets the deterministic Python kernels other operators lean on:
``get_count`` (the reference-parity count/ratio normalizer,
``/root/reference/src/utilities.jl`` semantics) and the portable-hash
contract that sampling/splitting membership relies on.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from featurescreening_jl_spark.operators.selection import get_count


@settings(max_examples=300, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=10_000),
    count=st.integers(min_value=-100, max_value=20_000),
)
def test_get_count_int_nonstrict_clamps_and_strict_guards(n, count):
    coll = range(n)
    got = get_count(coll, count, strict=False)
    assert 0 <= got <= n
    assert got == max(0, min(count, n))
    if 0 <= count <= n:
        assert get_count(coll, count, strict=True) == count
    else:
        with pytest.raises(AssertionError):
            get_count(coll, count, strict=True)


@settings(max_examples=300, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=10_000),
    ratio=st.floats(
        min_value=-2.0, max_value=3.0, allow_nan=False, allow_infinity=False
    ),
)
def test_get_count_ratio_floor_and_bounds(n, ratio):
    coll = range(n)
    got = get_count(coll, ratio, strict=False)
    assert 0 <= got <= n
    clamped = max(0.0, min(ratio, 1.0))
    assert got == int(math.floor(n * clamped))
    if 0.0 <= ratio <= 1.0:
        assert get_count(coll, ratio, strict=True) == int(
            math.floor(n * ratio)
        )
    else:
        with pytest.raises(AssertionError):
            get_count(coll, ratio, strict=True)


@settings(max_examples=200, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=5_000),
    r1=st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
    r2=st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
)
def test_get_count_ratio_monotone_in_ratio(n, r1, r2):
    # a bigger keep-fraction can never select fewer items
    coll = range(n)
    lo, hi = sorted((r1, r2))
    assert get_count(coll, lo) <= get_count(coll, hi)


@settings(max_examples=100, deadline=None)
@given(
    key=st.text(min_size=0, max_size=40),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_hash_unit_contract_matches_python_md5(key, seed):
    # the portable-hash membership contract: Spark's hash_unit(key, seed)
    # is documented as ('0x'||substr(md5(seed||':'||key),1,15))::BIGINT /
    # 2^60 — replicate in pure Python and check range + determinism
    import hashlib

    h = hashlib.md5(f"{seed}:{key}".encode()).hexdigest()
    u = int(h[:15], 16) / float(1 << 60)
    assert 0.0 <= u < 1.0
    h2 = hashlib.md5(f"{seed}:{key}".encode()).hexdigest()
    assert int(h2[:15], 16) / float(1 << 60) == u


def test_hash_unit_spark_matches_python_md5(spark):
    # one Spark round-trip over a diverse key set: the JVM md5/conv path
    # must produce bit-identical units to the pure-Python replica (this
    # equality is what makes split membership portable across engines)
    import hashlib

    from pyspark.sql import functions as F

    from featurescreening_jl_spark.operators.sampling import hash_unit

    keys = ["", "a", "0", "user_42", "Ünïcødé-✓", "x" * 200] + [
        f"k{i}" for i in range(100)
    ]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {
        r["k"]: r["u"]
        for r in df.select(
            "k", hash_unit(F.col("k"), seed=7).alias("u")
        ).collect()
    }
    for k in keys:
        h = hashlib.md5(f"7:{k}".encode()).hexdigest()
        assert got[k] == int(h[:15], 16) / float(1 << 60), k


class TestSnapshotDiff:
    def _frames(self, spark):
        old = spark.createDataFrame(
            [(1, "a", "x"), (2, "b", None), (3, "c", "z"), (4, "d", "w")],
            "id long, v string, extra string",
        )
        new = spark.createDataFrame(
            [(1, "a", "x"),        # unchanged
             (2, None, "b"),       # changed: values swapped across columns
             (3, "c2", "z"),       # changed
             (5, "e", "q")],       # added (4 removed)
            "id long, v string, extra string",
        )
        return old, new

    def test_classification(self, spark):
        from featurescreening_jl_spark.operators.profiling import (
            snapshot_diff,
        )

        old, new = self._frames(spark)
        got = {
            r["id"]: r["status"]
            for r in snapshot_diff(old, new, ["id"], rows=True).collect()
        }
        assert got == {1: "unchanged", 2: "changed", 3: "changed",
                       4: "removed", 5: "added"}

    def test_null_sentinel_distinguishes_column_position(self, spark):
        # (None, 'b') vs ('b', None) must NOT fingerprint equal — the
        # per-column NULL sentinel guards against concat-collapse
        from featurescreening_jl_spark.operators.profiling import (
            snapshot_diff,
        )

        old = spark.createDataFrame([(1, None, "b")],
                                    "id long, v string, extra string")
        new = spark.createDataFrame([(1, "b", None)],
                                    "id long, v string, extra string")
        [row] = snapshot_diff(old, new, ["id"], rows=True).collect()
        assert row["status"] == "changed"

    def test_summary_counts_and_compare_subset(self, spark):
        from featurescreening_jl_spark.operators.profiling import (
            snapshot_diff,
        )

        old, new = self._frames(spark)
        counts = {
            r["status"]: r["n"]
            for r in snapshot_diff(old, new, ["id"]).collect()
        }
        assert counts == {"unchanged": 1, "changed": 2, "removed": 1,
                          "added": 1}
        # comparing only `extra`: id 3 (same extra) becomes unchanged
        got = {
            r["id"]: r["status"]
            for r in snapshot_diff(
                old, new, ["id"], compare_cols=["extra"], rows=True
            ).collect()
        }
        assert got[3] == "unchanged" and got[2] == "changed"

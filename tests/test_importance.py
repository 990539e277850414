"""Importance extraction tests.

Layer-4-style exact tests for the RNG-independent counting fold (on a
hand-built debug string) and layer-3-style invariant tests for the fitted
forest (reference /root/reference/test/test.importance.jl:23-29: labels are
a subset of names, importances positive ints).
"""

from __future__ import annotations

import re
from collections import Counter

import pytest

from featurescreening_jl_spark.operators.importance import (
    _IF_FEATURE,
    DEFAULT_CONFIG_FOR_FEATURE_IMPORTANCE,
    DEFAULT_SCREEN_CONFIG,
    feature_importance,
    fit_forest,
    feature_importance_from_model,
    rf_params,
    split_counts,
)

pytestmark = pytest.mark.spark


class TestCountingFold:
    """Exact counting semantics on a synthetic forest debug string —
    internal nodes count once each, leaves never
    (/root/reference/src/importance.jl:62-94)."""

    DEBUG = """RandomForestClassificationModel: uid=rfc_x, numTrees=2
  Tree 0 (weight 1.0):
    If (feature 0 <= 0.5)
     If (feature 2 <= 0.25)
      Predict: 0.0
     Else (feature 2 > 0.25)
      Predict: 1.0
    Else (feature 0 > 0.5)
     Predict: 1.0
  Tree 1 (weight 1.0):
    If (feature 2 <= 0.1)
     Predict: 0.0
    Else (feature 2 > 0.1)
     If (feature 5 in {0.0,1.0})
      Predict: 1.0
     Else (feature 5 not in {0.0,1.0})
      Predict: 0.0
"""

    def test_exact_counts(self):
        counts = Counter(int(m) for m in _IF_FEATURE.findall(self.DEBUG))
        assert counts == {0: 1, 2: 2, 5: 1}

    def test_else_lines_not_double_counted(self):
        # each internal node prints one If and one Else; only If counts
        assert len(re.findall(r"Else \(feature", self.DEBUG)) == 4
        assert sum(Counter(int(m) for m in _IF_FEATURE.findall(self.DEBUG)).values()) == 4

    def test_ranking_tie_break(self):
        names = ["n0", "n1", "n2", "n3", "n4", "n5"]
        counts = Counter(int(m) for m in _IF_FEATURE.findall(self.DEBUG))
        pairs = [(names[i], c) for i, c in counts.items()]
        pos = {n: i for i, n in enumerate(names)}
        pairs.sort(key=lambda p: (-p[1], pos[p[0]]))
        # count desc, then original position asc on ties (0 before 5)
        assert pairs == [("n2", 2), ("n0", 1), ("n5", 1)]


class TestRfParams:
    def test_reference_defaults_mapping(self):
        p = rf_params({}, seed=7)
        assert p["numTrees"] == 100
        assert p["subsamplingRate"] == 0.7
        assert p["featureSubsetStrategy"] == "sqrt"
        assert p["maxDepth"] == 30  # -1 unbounded → Spark cap
        assert p["minInstancesPerNode"] == 4  # max(4, ceil(4/2))
        assert p["minInfoGain"] == 0.1
        assert p["seed"] == 7

    def test_screen_defaults(self):
        p = rf_params(DEFAULT_SCREEN_CONFIG, seed=1)
        assert p["numTrees"] == 1000
        assert p["subsamplingRate"] == 0.9
        assert p["minInstancesPerNode"] == 10
        assert p["minInfoGain"] == 0.0

    def test_explicit_subfeatures(self):
        assert rf_params({"n_subfeatures": 3}, seed=0)["featureSubsetStrategy"] == "3"

    def test_depth_capped(self):
        assert rf_params({"max_depth": 99}, seed=0)["maxDepth"] == 30
        assert rf_params({"max_depth": 5}, seed=0)["maxDepth"] == 5


class TestFeatureImportanceOnFrame:
    def test_invariants(self, feature_frame):
        # reference /root/reference/test/test.importance.jl:23-29
        ranked = feature_importance(feature_frame, rng=1)
        names = set(feature_frame.names)
        assert len(ranked) > 0
        assert all(lbl in names for lbl, _ in ranked)
        assert all(isinstance(imp, int) and imp > 0 for _, imp in ranked)
        counts = [imp for _, imp in ranked]
        assert counts == sorted(counts, reverse=True)

    def test_deterministic_given_seed(self, feature_frame):
        cfg = {"n_trees": 20, "min_samples_leaf": 2, "min_purity_increase": 0.0}
        a = feature_importance(feature_frame, config=cfg, rng=42)
        b = feature_importance(feature_frame, config=cfg, rng=42)
        assert a == b

    def test_model_roundtrip(self, feature_frame):
        model = fit_forest(
            feature_frame,
            {"n_trees": 10, "min_samples_leaf": 2, "min_purity_increase": 0.0},
            seed=3,
        )
        counts = split_counts(model)
        assert sum(counts.values()) > 0
        ranked = feature_importance_from_model(model, feature_frame.names)
        assert sum(c for _, c in ranked) == sum(counts.values())

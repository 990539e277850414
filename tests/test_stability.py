"""Stability selection (operators/stability.stability_select): the
Meinshausen–Bühlmann guard over the reference's split-count importance.
RNG-/forest-based, so verified by pytest invariants (the
feature_importance treatment), not a SQL oracle: determinism under a
fixed rng, separability (informative features stable, noise features
not), fold-membership portability, and backend parity of the contract.
"""

from __future__ import annotations

import numpy as np
import pytest

from featurescreening_jl_spark.frame import FeatureFrame
from featurescreening_jl_spark.operators.stability import stability_select

from conftest import fixture_screen_config

pytestmark = pytest.mark.spark


def _separable_frame(spark, n_rows=120, n_noise=8, seed=3):
    """Two informative columns (class-shifted), n_noise pure-noise ones."""
    rng = np.random.default_rng(seed)
    y = ["pos" if i % 2 == 0 else "neg" for i in range(n_rows)]
    shift = np.array([3.0 if c == "pos" else -3.0 for c in y])
    names = ["inf_a", "inf_b"] + [f"noise_{i}" for i in range(n_noise)]
    X = rng.standard_normal((n_rows, len(names)))
    X[:, 0] += shift
    X[:, 1] -= shift
    return FeatureFrame.from_arrays(spark, y, names, X)


class TestStabilitySelect:
    def test_informative_features_are_stable(self, spark):
        ff = _separable_frame(spark)
        out = stability_select(
            ff, top_m=2, n_folds=5, config=fixture_screen_config(), rng=11
        )
        freq = {name: f for name, f, _ in out}
        # the two informative columns dominate every fold's top-2
        assert freq.get("inf_a", 0.0) >= 0.8
        assert freq.get("inf_b", 0.0) >= 0.8
        # no noise column is stable
        for name, f, _ in out:
            if name.startswith("noise_"):
                assert f <= 0.4, (name, f)
        # sorted by freq desc
        freqs = [f for _, f, _ in out]
        assert freqs == sorted(freqs, reverse=True)

    def test_deterministic_and_partitioning_invariant(self, spark):
        ff = _separable_frame(spark)
        a = stability_select(
            ff, top_m=3, n_folds=3, config=fixture_screen_config(), rng=7
        )
        b = stability_select(
            ff, top_m=3, n_folds=3, config=fixture_screen_config(), rng=7
        )
        assert a == b
        # fold MEMBERSHIP is a pure function of (id, seed): reshaping the
        # frame cannot change which rows enter which fold (the fitted
        # forest itself is deterministic only for a fixed partitioning —
        # the same contract screen() documents)
        from pyspark.sql import functions as F

        from featurescreening_jl_spark.operators.importance import make_rng
        from featurescreening_jl_spark.operators.sampling import hash_unit

        seed = int(make_rng(7).integers(0, 2**31 - 1))
        member = hash_unit(F.col("sample_id"), seed) < F.lit(0.5)
        ids_base = sorted(
            r["sample_id"]
            for r in ff.df.where(member).select("sample_id").collect()
        )
        ids_reshaped = sorted(
            r["sample_id"]
            for r in ff.df.repartition(13)
            .where(member)
            .select("sample_id")
            .collect()
        )
        assert ids_base == ids_reshaped and 0 < len(ids_base) < ff.count()

    def test_partitioned_backend_contract(self, spark):
        ff = _separable_frame(spark, n_rows=160)
        out = stability_select(
            ff,
            top_m=2,
            n_folds=3,
            config={"n_trees": 16, "max_depth": 6, "min_samples_leaf": 2,
                    "min_purity_increase": 0.0},
            rng=5,
            backend="partitioned",
            backend_options={"num_partitions": 4},
        )
        freq = {name: f for name, f, _ in out}
        assert freq.get("inf_a", 0.0) >= 2 / 3
        assert freq.get("inf_b", 0.0) >= 2 / 3

    def test_validation(self, spark):
        ff = _separable_frame(spark, n_rows=40, n_noise=2)
        with pytest.raises(ValueError):
            stability_select(ff, top_m=0)
        with pytest.raises(ValueError):
            stability_select(ff, top_m=2, subsample=0.0)
        with pytest.raises(ValueError):
            stability_select(ff, top_m=2, backend="nope")

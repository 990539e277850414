"""Partition-ensemble importance backend (operators/importance_dist.py).

Contract mirror of the MLlib backend tests: output invariants, seeded
determinism (including across parallelism levels — the property that makes
cluster-size-independent results possible), and signal detection on a
separable fixture.
"""

from __future__ import annotations

import numpy as np
import pytest
from collections import Counter

from featurescreening_jl_spark.frame import FeatureFrame
from featurescreening_jl_spark.operators.importance_dist import (
    feature_importance_partitioned,
    local_forest_split_counts,
)
from featurescreening_jl_spark.operators.screen import screen

CFG = {"n_trees": 64, "max_depth": 8, "min_samples_leaf": 5,
       "min_samples_split": 10, "min_purity_increase": 0.0}


def _separable_frame(spark, n=600, noise_cols=4, seed=3):
    """Two classes separated on feature 'sig'; the rest pure noise."""
    rng = np.random.default_rng(seed)
    y = np.repeat(["a", "b"], n // 2)
    sig = np.where(y == "a", 0.0, 3.0) + rng.standard_normal(n) * 0.3
    X = np.column_stack(
        [sig] + [rng.standard_normal(n) for _ in range(noise_cols)]
    )
    names = ["sig"] + [f"noise{i}" for i in range(noise_cols)]
    return FeatureFrame.from_arrays(spark, y, names, X)


class TestLocalForest:
    def test_finds_signal(self):
        rng = np.random.default_rng(0)
        n = 500
        y = np.repeat([0, 1], n // 2)
        X = np.column_stack(
            [np.where(y == 0, 0.0, 5.0) + rng.standard_normal(n) * 0.1,
             rng.standard_normal(n), rng.standard_normal(n)]
        )
        cfg = {**CFG, "partial_sampling": 0.9, "n_subfeatures": -1,
               "_trees": 16, "_max_depth": 8, "_n_candidate_features": 2}
        counts = local_forest_split_counts(
            X, y, 2, cfg, np.random.default_rng(1)
        )
        assert isinstance(counts, Counter)
        assert counts.most_common(1)[0][0] == 0  # signal column wins

    def test_min_leaf_respected(self):
        # all-identical rows → no valid split anywhere
        X = np.ones((50, 3))
        y = np.array([0, 1] * 25)
        cfg = {**CFG, "partial_sampling": 0.9, "_trees": 8, "_max_depth": 8,
               "_n_candidate_features": 2}
        counts = local_forest_split_counts(
            X, y, 2, cfg, np.random.default_rng(1)
        )
        assert counts == Counter()


class TestPartitionedImportance:
    def test_invariants(self, spark):
        ff = _separable_frame(spark)
        pairs = feature_importance_partitioned(
            ff, config=CFG, rng=7, num_partitions=8
        )
        names = set(ff.feature_names)
        assert all(n in names for n, _ in pairs)
        assert all(isinstance(c, int) and c > 0 for _, c in pairs)
        counts = [c for _, c in pairs]
        assert counts == sorted(counts, reverse=True)
        assert pairs[0][0] == "sig"

    def test_deterministic_given_seed(self, spark):
        ff = _separable_frame(spark)
        a = feature_importance_partitioned(ff, config=CFG, rng=7,
                                           num_partitions=8)
        b = feature_importance_partitioned(ff, config=CFG, rng=7,
                                           num_partitions=8)
        assert a == b

    def test_deterministic_across_parallelism(self, spark):
        # fixed num_partitions ⇒ identical results whatever the core count;
        # emulate by varying shuffle partitions of the input side
        ff = _separable_frame(spark)
        a = feature_importance_partitioned(ff, config=CFG, rng=7,
                                           num_partitions=8)
        ff2 = FeatureFrame(
            ff.df.repartition(3), ff.feature_names
        )
        b = feature_importance_partitioned(ff2, config=CFG, rng=7,
                                           num_partitions=8)
        assert a == b

    def test_screen_with_partitioned_backend(self, spark):
        ff = _separable_frame(spark, noise_cols=7)
        result = screen(
            ff, reduced_size=2, step_size=3, config=CFG, rng=42,
            show_progress=False, importance_backend="partitioned",
            backend_options={"num_partitions": 8},
        )
        assert result.n_features == 2
        assert "sig" in result.feature_names
        assert result.count() == 600


class TestPlanShape:
    def test_pre_partitioned_training_is_map_only(self, spark):
        """With pre_partitioned=True the projection feeding mapInPandas must
        add NO exchange: shuffle count of the plan equals the shuffle count
        of the pre-shaped input (one, from the explicit repartition)."""
        from pyspark.sql import functions as F

        ff = _separable_frame(spark)
        shaped = FeatureFrame(
            ff.df.repartition(8, "sample_id").sortWithinPartitions("sample_id"),
            ff.feature_names,
        )
        labels = shaped.distinct_labels()
        mapping = F.create_map(
            *[x for i, lbl in enumerate(labels) for x in (F.lit(lbl), F.lit(i))]
        )
        proj = shaped.df.select(
            mapping[F.col("label")].alias("__y"),
            *[F.col(c).cast("double") for c in shaped.feature_names],
        )
        plan = proj._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1  # only the explicit repartition


class TestBackendAgreement:
    def test_top_feature_agrees_with_mllib(self, spark):
        ff = _separable_frame(spark)
        dist = feature_importance_partitioned(ff, config=CFG, rng=5,
                                              num_partitions=8)
        from featurescreening_jl_spark.operators.importance import (
            feature_importance,
        )

        ml = feature_importance(ff, config=CFG, rng=5)
        assert dist[0][0] == ml[0][0] == "sig"


class TestTransferDtype:
    def test_float_transfer_same_ranking_shape(self, spark):
        # float32 halves Arrow transfer; on well-separated data the
        # ranking must match the float64 path (quantile-edge ties could
        # differ in general — documented, opt-in)
        import numpy as np

        from featurescreening_jl_spark.frame import FeatureFrame
        from featurescreening_jl_spark.operators.importance_dist import (
            feature_importance_partitioned,
        )

        rng = np.random.default_rng(2)
        X = rng.standard_normal((300, 6))
        X[:, 4] += np.repeat([0.0, 5.0], 150)
        ff = FeatureFrame.from_xy(spark, X, np.repeat(["a", "b"], 150))
        cfg = {"n_trees": 64, "max_depth": 6}
        r64 = feature_importance_partitioned(
            ff, config=cfg, rng=3, num_partitions=8)
        r32 = feature_importance_partitioned(
            ff, config=cfg, rng=3, num_partitions=8, transfer_dtype="float")
        assert r64[0][0] == r32[0][0] == "5"
        assert [n for n, _ in r64] == [n for n, _ in r32]

    def test_rejects_bad_dtype(self, spark):
        import numpy as np

        from featurescreening_jl_spark.frame import FeatureFrame
        from featurescreening_jl_spark.operators.importance_dist import (
            feature_importance_partitioned,
        )

        ff = FeatureFrame.from_xy(
            spark, np.zeros((20, 2)), ["a"] * 10 + ["b"] * 10)
        with pytest.raises(ValueError, match="transfer_dtype"):
            feature_importance_partitioned(ff, transfer_dtype="int")

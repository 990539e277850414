"""IVF ANN operator (operators/ivf.py).

Key invariants:
- n_probe == n_cells degrades IVF to EXACT brute force (full-probe
  equality — the strongest correctness statement an ANN operator has);
- a query that is itself a corpus row always probes its own cell first,
  so self-retrieval at rank 1 is guaranteed at any n_probe ≥ 1;
- build determinism (same seed → same centroids, independent of input
  partitioning, because the training sample is hash-ordered);
- the whole query path is codegen expressions — no Python UDF nodes.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from featurescreening_jl_spark.operators.ivf import (
    assign_cells,
    ivf_topk,
    train_centroids,
)
from featurescreening_jl_spark.operators.similarity import brute_force_topk

pytestmark = pytest.mark.spark

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def embeddings(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet")
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def centroids(embeddings):
    return train_centroids(embeddings, 8, seed=42, n_iter=10)


class TestBuild:
    def test_centroids_shape_unit_norm_deterministic(self, embeddings):
        c1 = train_centroids(embeddings, 8, seed=42)
        assert c1.shape == (8, 64)
        assert np.allclose(np.linalg.norm(c1, axis=1), 1.0, atol=1e-9)
        # determinism across repartitioned input (hash-ordered sample)
        c2 = train_centroids(embeddings.repartition(13), 8, seed=42)
        assert np.allclose(c1, c2)

    def test_too_few_rows_raises(self, spark, embeddings):
        with pytest.raises(ValueError, match="n_cells"):
            train_centroids(embeddings.limit(3), 8)

    def test_assignment_in_range_and_nonempty(self, embeddings, centroids):
        assigned = assign_cells(embeddings, centroids)
        stats = assigned.agg(
            F.min("cell").alias("lo"),
            F.max("cell").alias("hi"),
            F.countDistinct("cell").alias("n"),
        ).first()
        assert stats["lo"] >= 0 and stats["hi"] <= 7
        # k-means over this corpus should populate most cells
        assert stats["n"] >= 4

    def test_assignment_matches_numpy(self, embeddings, centroids):
        rows = (
            assign_cells(embeddings, centroids)
            .where(F.col("vec_id") < 20)
            .orderBy("vec_id")
            .toPandas()
        )
        X = np.array(rows["embedding"].tolist(), dtype=np.float64)
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        expect = np.argmax(Xn @ centroids.T, axis=1)
        assert (rows["cell"].to_numpy() == expect).all()


class TestQuery:
    def _queries(self, embeddings, n=5):
        return embeddings.where(F.col("vec_id") < n).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )

    def test_full_probe_equals_brute_force(self, embeddings, centroids):
        q = self._queries(embeddings)
        exact = (
            brute_force_topk(embeddings, q, k=5)
            .orderBy("query_id", "rank")
            .toPandas()
        )
        full = (
            ivf_topk(
                embeddings, q, k=5, dim=64, centroids=centroids, n_probe=8
            )
            .orderBy("query_id", "rank")
            .toPandas()
        )
        assert full["vec_id"].tolist() == exact["vec_id"].tolist()
        assert np.allclose(full["similarity"], exact["similarity"])

    def test_self_retrieval_any_probe(self, embeddings, centroids):
        out = ivf_topk(
            embeddings, self._queries(embeddings), k=3, dim=64,
            centroids=centroids, n_probe=1,
        ).toPandas()
        top1 = out[out["rank"] == 1]
        assert (top1["query_id"].to_numpy() == top1["vec_id"].to_numpy()).all()
        assert np.allclose(top1["similarity"], 1.0, atol=1e-6)

    def test_partial_probe_recall(self, embeddings, centroids):
        q = self._queries(embeddings)
        exact = brute_force_topk(embeddings, q, k=5).toPandas()
        approx = ivf_topk(
            embeddings, q, k=5, dim=64, centroids=centroids, n_probe=4
        ).toPandas()
        hits = 0
        for qid in range(5):
            e = set(exact[exact["query_id"] == qid]["vec_id"])
            a = set(approx[approx["query_id"] == qid]["vec_id"])
            hits += len(e & a)
        # half the cells probed → expect well over half the neighbors
        assert hits / 25 >= 0.5

    def test_pre_assigned_corpus_path(self, embeddings, centroids):
        assigned = assign_cells(embeddings, centroids)
        q = self._queries(embeddings)
        via_pre = ivf_topk(
            assigned, q, k=5, dim=64, centroids=centroids, n_probe=8,
            assigned_cell_col="cell",
        ).orderBy("query_id", "rank").toPandas()
        via_fresh = ivf_topk(
            embeddings, q, k=5, dim=64, centroids=centroids, n_probe=8
        ).orderBy("query_id", "rank").toPandas()
        assert via_pre["vec_id"].tolist() == via_fresh["vec_id"].tolist()

    def test_no_python_udf_in_plan(self, embeddings, centroids):
        plan = ivf_topk(
            embeddings, self._queries(embeddings), k=5, dim=64,
            centroids=centroids, n_probe=2,
        )._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan

    def test_dim_required(self, embeddings, centroids):
        with pytest.raises(ValueError, match="dim"):
            ivf_topk(embeddings, self._queries(embeddings), centroids=centroids)


class TestPoolEmbeddings:
    """Group-level embedding pooling (similarity.pool_embeddings)."""

    def test_mean_pool_and_normalize(self, spark):
        import math

        from featurescreening_jl_spark.operators.similarity import (
            pool_embeddings,
        )

        rows = [
            ("g1", [1.0, 0.0]),
            ("g1", [0.0, 1.0]),
            ("g2", [3.0, 4.0]),
            ("g3", []),  # no usable vectors -> dropped
        ]
        df = spark.createDataFrame(rows, ["conv_id", "embedding"])
        out = {r["conv_id"]: r for r in pool_embeddings(df).collect()}
        assert set(out) == {"g1", "g2"}
        # g1 mean = (0.5, 0.5) -> normalized (1/sqrt2, 1/sqrt2)
        v = out["g1"]["pooled"]
        assert out["g1"]["n_vectors"] == 2
        assert abs(v[0] - 1 / math.sqrt(2)) < 1e-8
        assert abs(v[1] - 1 / math.sqrt(2)) < 1e-8
        # g2 single vector normalizes to (0.6, 0.8)
        w = out["g2"]["pooled"]
        assert abs(w[0] - 0.6) < 1e-8 and abs(w[1] - 0.8) < 1e-8

    def test_unnormalized_mean_and_single_aggregate_plan(self, spark):
        from featurescreening_jl_spark.operators.similarity import (
            pool_embeddings,
        )

        df = spark.createDataFrame(
            [("g", [2.0, 4.0]), ("g", [4.0, 8.0])],
            ["conv_id", "embedding"],
        )
        out = pool_embeddings(df, normalize=False).collect()[0]
        assert out["pooled"] == [3.0, 6.0]
        plan = (
            pool_embeddings(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # one conv-keyed hash aggregate: exactly one exchange, and the
        # per-dimension explode never appears
        assert plan.count("Exchange hashpartitioning") == 1
        assert "Generate" not in plan

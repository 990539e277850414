"""Product-quantization tests: numpy-replica exactness of encode + ADC,
recall on separable clustered data, partition invariance, validation."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from featurescreening_jl_spark.operators.pq import (
    pq_encode,
    pq_topk,
    random_codebooks,
    train_pq,
)

pytestmark = pytest.mark.spark


def _unit(X):
    n = np.linalg.norm(X, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return X / n


def _np_codes(U, books):
    m, ksub, dsub = books.shape
    codes = np.empty((len(U), m), dtype=int)
    for j in range(m):
        S = U[:, j * dsub : (j + 1) * dsub]
        adj = S @ books[j].T - 0.5 * (books[j] ** 2).sum(axis=1)
        codes[:, j] = np.argmax(adj, axis=1)  # first-max, like Spark
    return codes


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    df.cache().count()
    return df


class TestEncode:
    def test_codes_match_numpy_replica(self, spark, emb):
        books = train_pq(emb, m=8, ksub=16, dim=64, seed=42)
        got = (
            pq_encode(emb, books)
            .select("vec_id", "embedding", "code")
            .orderBy("vec_id")
            .toPandas()
        )
        U = _unit(np.array(got["embedding"].tolist()))
        np.testing.assert_array_equal(
            np.array(got["code"].tolist()), _np_codes(U, books)
        )

    def test_partition_invariant(self, spark, emb):
        books = random_codebooks(8, 16, 8, seed=17)
        a = (
            pq_encode(emb, books)
            .select("vec_id", "code")
            .orderBy("vec_id")
            .toPandas()
        )
        b = (
            pq_encode(emb.repartition(7, "vec_id"), books)
            .select("vec_id", "code")
            .orderBy("vec_id")
            .toPandas()
        )
        assert [list(x) for x in a["code"]] == [list(x) for x in b["code"]]

    def test_dim_not_divisible_raises(self, spark, emb):
        with pytest.raises(ValueError, match="not divisible"):
            train_pq(emb, m=7, ksub=4, dim=64)


class TestAdc:
    def test_scores_match_numpy_lut(self, spark, emb):
        books = train_pq(emb, m=8, ksub=16, dim=64, seed=42)
        coded = pq_encode(emb, books)
        q = emb.where(F.col("vec_id") < 2).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        got = pq_topk(coded, q, books, k=1000).orderBy(
            "query_id", "rank"
        ).toPandas()

        full = emb.orderBy("vec_id").toPandas()
        U = _unit(np.array(full["embedding"].tolist()))
        ids = full["vec_id"].to_numpy()
        m, ksub, dsub = books.shape
        codes = _np_codes(U, books)
        Qv = np.concatenate(
            [books[j][codes[:, j]] for j in range(m)], axis=1
        )
        for qi in (0, 1):
            qv = U[ids == qi][0]
            sc = Qv @ qv
            order = np.lexsort((ids, -sc))
            sub = got[got.query_id == qi]
            np.testing.assert_array_equal(
                sub["vec_id"].to_numpy(), ids[order]
            )
            np.testing.assert_allclose(
                sub["adc_score"].to_numpy(), sc[order], rtol=1e-9
            )

    def test_recall_on_separable_clusters(self, spark):
        # 16 well-separated cluster centers (orthogonal-ish), 8 members
        # each with small noise; querying a center must retrieve its own
        # cluster — the gap (intra-cos ~0.99 vs inter ~0.0) dwarfs the
        # quantization error of a TRAINED codebook
        rng = np.random.default_rng(3)
        dim, n_clu, per = 64, 16, 8
        centers = np.linalg.qr(rng.standard_normal((dim, dim)))[0][:n_clu]
        rows = []
        vid = 0
        for ci in range(n_clu):
            for _ in range(per):
                v = centers[ci] + 0.05 * rng.standard_normal(dim)
                rows.append((vid, ci, [float(x) for x in v]))
                vid += 1
        df = spark.createDataFrame(
            rows, "vec_id long, clu int, embedding array<double>"
        )
        books = train_pq(df, m=8, ksub=16, dim=64, seed=42, n_iter=15)
        coded = pq_encode(df, books)
        q = spark.createDataFrame(
            [(ci, [float(x) for x in centers[ci]]) for ci in range(n_clu)],
            "query_id long, embedding array<double>",
        )
        out = pq_topk(coded, q, books, k=per).toPandas()
        truth = {
            ci: set(range(ci * per, (ci + 1) * per)) for ci in range(n_clu)
        }
        recalls = [
            len(set(out[out.query_id == ci]["vec_id"]) & truth[ci]) / per
            for ci in range(n_clu)
        ]
        assert float(np.mean(recalls)) >= 0.9, recalls

    def test_plan_broadcasts_queries_never_shuffles_corpus(self, spark, emb):
        books = random_codebooks(8, 16, 8, seed=17)
        coded = pq_encode(emb, books)
        q = emb.where(F.col("vec_id") < 2).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        plan = (
            pq_topk(coded, q, books, k=5)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
        # the only Exchange allowed besides the query broadcast is the
        # final per-query top-k window shuffle
        assert plan.count("Exchange hashpartitioning") == 1, plan


class TestIvfPq:
    def test_full_probe_equals_pq_topk(self, spark, emb):
        from featurescreening_jl_spark.operators.ivf import train_centroids
        from featurescreening_jl_spark.operators.pq import ivfpq_topk

        books = train_pq(emb, m=8, ksub=16, dim=64, seed=42)
        cents = train_centroids(emb, 8, seed=42)
        q = emb.where(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        full = ivfpq_topk(
            emb, q, cents, books, k=10, n_probe=8
        ).orderBy("query_id", "rank").toPandas()
        flat = pq_topk(pq_encode(emb, books), q, books, k=10).orderBy(
            "query_id", "rank"
        ).toPandas()
        assert full["vec_id"].tolist() == flat["vec_id"].tolist()
        np.testing.assert_allclose(
            full["adc_score"].to_numpy(), flat["adc_score"].to_numpy(),
            rtol=1e-12,
        )

    def test_probing_prunes_candidates(self, spark, emb):
        from featurescreening_jl_spark.operators.ivf import train_centroids
        from featurescreening_jl_spark.operators.pq import ivfpq_topk

        books = train_pq(emb, m=8, ksub=16, dim=64, seed=42)
        cents = train_centroids(emb, 8, seed=42)
        q = emb.where(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        # probed subset result must be a subset-consistent reranking:
        # every returned row also appears in the full-probe candidate
        # ranking with the SAME score
        pruned = ivfpq_topk(
            emb, q, cents, books, k=10, n_probe=2
        ).toPandas()
        full = ivfpq_topk(
            emb, q, cents, books, k=1000, n_probe=8
        ).toPandas()
        fmap = {
            (r.query_id, r.vec_id): r.adc_score for r in full.itertuples()
        }
        for r in pruned.itertuples():
            assert (r.query_id, r.vec_id) in fmap
            assert abs(fmap[(r.query_id, r.vec_id)] - r.adc_score) < 1e-12

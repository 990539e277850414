"""Deterministic sampling operators (operators/sampling.py).

The load-bearing property everywhere: row membership is a pure function
of (key, seed) — invariant to partitioning, cluster size, and execution
order. Each test that matters for scale re-runs the operator on a
repartitioned input and demands the IDENTICAL row set (``rand(seed)`` /
``sampleBy`` would fail these).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from featurescreening_jl_spark.operators.sampling import (
    hash_split,
    hash_unit,
    per_key_cap,
    stratified_sample,
    weighted_mix,
)

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def keyed(spark):
    df = spark.range(0, 10_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("grp"),
        (F.col("id") % 3).cast("string").alias("stratum"),
    )
    df.cache().count()
    return df


class TestHashUnit:
    def test_range_and_determinism(self, keyed):
        stats = keyed.select(
            hash_unit(F.col("k"), 42).alias("u")
        ).agg(
            F.min("u").alias("lo"), F.max("u").alias("hi"),
            F.avg("u").alias("mean"),
        ).first()
        assert 0.0 <= stats["lo"] and stats["hi"] < 1.0
        assert abs(stats["mean"] - 0.5) < 0.02

    def test_seeds_independent(self, keyed):
        both = keyed.select(
            hash_unit(F.col("k"), 1).alias("a"),
            hash_unit(F.col("k"), 2).alias("b"),
        )
        corr = both.agg(F.corr("a", "b")).first()[0]
        assert abs(corr) < 0.05


class TestHashSplit:
    WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}

    def test_proportions_and_total(self, keyed):
        out = hash_split(keyed, self.WEIGHTS, key_col="k")
        rows = {r["split"]: r["count"] for r in
                out.groupBy("split").count().collect()}
        assert sum(rows.values()) == 10_000
        assert abs(rows["train"] / 10_000 - 0.8) < 0.02
        assert abs(rows["val"] / 10_000 - 0.1) < 0.01
        assert abs(rows["test"] / 10_000 - 0.1) < 0.01

    def test_stable_under_repartition(self, keyed):
        a = hash_split(keyed, self.WEIGHTS, key_col="k").orderBy("k")
        b = hash_split(
            keyed.repartition(17), self.WEIGHTS, key_col="k"
        ).orderBy("k")
        assert [r["split"] for r in a.collect()] == [
            r["split"] for r in b.collect()
        ]

    def test_same_key_same_split(self, keyed):
        # split on grp (7 distinct values): every row of a grp shares a split
        out = hash_split(keyed, self.WEIGHTS, key_col="grp")
        n = out.groupBy("grp").agg(
            F.countDistinct("split").alias("n")
        ).agg(F.max("n")).first()[0]
        assert n == 1

    def test_map_only_plan(self, keyed):
        plan = (
            hash_split(keyed, self.WEIGHTS, key_col="k")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan

    def test_bad_weights_raise(self, keyed):
        with pytest.raises(ValueError, match="positive"):
            hash_split(keyed, {"a": 0.0}, key_col="k")


class TestStratifiedSample:
    def test_fractions_per_stratum(self, keyed):
        out = stratified_sample(
            keyed, {"0": 0.5, "1": 1.0}, strata_col="stratum", key_col="k"
        )
        rows = {r["stratum"]: r["count"] for r in
                out.groupBy("stratum").count().collect()}
        assert "2" not in rows          # default_fraction=0 drops it
        assert rows["1"] == 3333        # fraction 1.0 keeps the whole stratum
        assert abs(rows["0"] / 3334 - 0.5) < 0.05

    def test_stable_under_repartition(self, keyed):
        a = stratified_sample(
            keyed, {"0": 0.3}, strata_col="stratum", key_col="k"
        )
        b = stratified_sample(
            keyed.repartition(23), {"0": 0.3}, strata_col="stratum",
            key_col="k",
        )
        assert sorted(r["k"] for r in a.collect()) == sorted(
            r["k"] for r in b.collect()
        )


class TestPerKeyCap:
    def test_cap_and_order(self, keyed):
        out = per_key_cap(
            keyed, ["grp"], 5, order_by=[F.desc("k")], keep_rank="rk"
        )
        pdf = out.toPandas()
        assert (pdf.groupby("grp").size() <= 5).all()
        # order_by desc k → each grp keeps its 5 largest ids
        top = pdf[pdf["grp"] == 0]["k"].sort_values().tolist()
        expect = [k for k in range(10_000) if k % 7 == 0][-5:]
        assert top == expect
        assert set(pdf["rk"]) == {1, 2, 3, 4, 5}

    def test_under_cap_keys_kept_whole(self, spark):
        df = spark.createDataFrame(
            [(0, 1), (0, 2), (1, 3)], "key long, v long"
        )
        out = per_key_cap(df, ["key"], 10, order_by=["v"]).toPandas()
        assert len(out) == 3


class TestWeightedMix:
    def test_mix_tags_and_fractions(self, keyed):
        evens = keyed.where(F.col("k") % 2 == 0)
        odds = keyed.where(F.col("k") % 2 == 1)
        out = weighted_mix(
            [("even", evens, 1.0), ("odd", odds, 0.5)], key_col="k"
        )
        rows = {r["source_name"]: r["count"] for r in
                out.groupBy("source_name").count().collect()}
        assert rows["even"] == 5000     # fraction 1.0 == whole source
        assert abs(rows["odd"] / 5000 - 0.5) < 0.05

    def test_per_source_coins_independent(self, keyed):
        # the SAME key drawn through two source names must not reuse the coin
        out = weighted_mix(
            [("a", keyed, 0.5), ("b", keyed, 0.5)], key_col="k"
        ).groupBy("k").count()
        dist = {r["count"]: 1 for r in out.collect()}
        # if coins were shared, every key appears 0 or 2 times — never 1
        assert 1 in dist

    def test_empty_raises(self):
        with pytest.raises(ValueError, match="at least one"):
            weighted_mix([], key_col="k")


class TestWeightedReservoir:
    def test_membership_stable_under_repartition(self, keyed):
        from featurescreening_jl_spark.operators.sampling import (
            weighted_reservoir,
        )

        df = keyed.withColumn("w", (F.col("k") % 10 + 1).cast("double"))
        a = weighted_reservoir(df, 50, weight_col="w", key_col="k")
        b = weighted_reservoir(
            df.repartition(17), 50, weight_col="w", key_col="k"
        )
        ka = sorted(r["k"] for r in a.collect())
        kb = sorted(r["k"] for r in b.collect())
        assert ka == kb
        assert len(ka) == 50

    def test_nonpositive_weight_never_selected(self, keyed):
        from featurescreening_jl_spark.operators.sampling import (
            weighted_reservoir,
        )

        # only 100 rows have positive weight; k=200 must return exactly them
        df = keyed.withColumn(
            "w", F.when(F.col("k") < 100, 1.0).otherwise(0.0)
        )
        out = weighted_reservoir(df, 200, weight_col="w", key_col="k")
        ks = sorted(r["k"] for r in out.collect())
        assert ks == list(range(100))

    def test_weight_proportionality(self, keyed):
        from featurescreening_jl_spark.operators.sampling import (
            weighted_reservoir,
        )

        # A-Res: with weights 50:1 on half the rows each, a k=100 sample of
        # 10k rows should be dominated by the heavy half (p_heavy ~ 50/51
        # per slot early on; even a loose bound separates a broken impl)
        df = keyed.withColumn(
            "w", F.when(F.col("k") % 2 == 0, 50.0).otherwise(1.0)
        )
        out = weighted_reservoir(df, 100, weight_col="w", key_col="k")
        heavy = sum(1 for r in out.collect() if r["k"] % 2 == 0)
        assert heavy > 85

    def test_plans_take_ordered(self, keyed):
        from featurescreening_jl_spark.operators.sampling import (
            weighted_reservoir,
        )

        df = keyed.withColumn("w", F.lit(1.0))
        plan = weighted_reservoir(
            df, 10, weight_col="w", key_col="k"
        )._jdf.queryExecution().executedPlan().toString()
        # global top-k must be per-partition top-k + driver merge — never a
        # global sort
        assert "TakeOrderedAndProject" in plan
        assert "Sort " not in plan

    def test_bad_k_raises(self, keyed):
        from featurescreening_jl_spark.operators.sampling import (
            weighted_reservoir,
        )

        with pytest.raises(ValueError, match="positive"):
            weighted_reservoir(keyed, 0, weight_col="k", key_col="k")


class TestTokenBudgetMix:
    @pytest.fixture(scope="class")
    def sourced(self, spark):
        df = spark.range(0, 3_000).select(
            F.col("id").alias("k"),
            F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias(
                "source"
            ),
            (F.col("id") % 11 + 1).alias("toks"),
        )
        df.cache().count()
        return df

    def test_budget_respected_and_clamped(self, sourced):
        from featurescreening_jl_spark.operators.sampling import (
            token_budget_mix,
        )

        totals = {
            r["source"]: r["tot"]
            for r in sourced.groupBy("source")
            .agg(F.sum("toks").alias("tot"))
            .collect()
        }
        out = token_budget_mix(
            sourced,
            {"s0": totals["s0"] / 2.0, "s1": totals["s1"] * 10.0},
            token_col="toks",
            key_col="k",
            frac_col="f",
        )
        pdf = out.toPandas()
        # s2 absent from the spec → dropped entirely
        assert set(pdf["source"]) == {"s0", "s1"}
        # s1's budget exceeds its total → fraction clamps to 1, all kept
        s1 = pdf[pdf["source"] == "s1"]
        assert len(s1) == 1000 and (s1["f"] == 1.0).all()
        # s0 kept tokens land near half its total (hash-uniform)
        kept = pdf[pdf["source"] == "s0"]["toks"].sum()
        assert abs(kept / totals["s0"] - 0.5) < 0.08

    def test_membership_stable_under_repartition(self, sourced):
        from featurescreening_jl_spark.operators.sampling import (
            token_budget_mix,
        )

        spec = {"s0": 2000.0, "s2": 1500.0}
        a = token_budget_mix(
            sourced, spec, token_col="toks", key_col="k"
        )
        b = token_budget_mix(
            sourced.repartition(17), spec, token_col="toks", key_col="k"
        )
        assert sorted(r["k"] for r in a.collect()) == sorted(
            r["k"] for r in b.collect()
        )


class TestTemperatureWeights:
    def test_tau_one_is_natural_distribution(self, spark):
        from featurescreening_jl_spark.operators.sampling import (
            temperature_weights,
        )

        df = spark.createDataFrame(
            [("en", 900), ("fr", 90), ("zh", 10)], "lang string, n long"
        )
        out = temperature_weights(
            df, group_col="lang", size_col="n", tau=1.0
        ).toPandas().set_index("lang")
        assert abs(out.loc["en", "weight"] - 0.9) < 1e-6
        assert abs(out.loc["zh", "weight"] - 0.01) < 1e-6
        assert abs(out["weight"].sum() - 1.0) < 1e-5

    def test_tau_zero_is_uniform(self, spark):
        from featurescreening_jl_spark.operators.sampling import (
            temperature_weights,
        )

        df = spark.createDataFrame(
            [("en", 900), ("fr", 90), ("zh", 10)], "lang string, n long"
        )
        out = temperature_weights(
            df, group_col="lang", size_col="n", tau=0.0
        ).toPandas()
        assert (abs(out["weight"] - 1 / 3) < 1e-6).all()

    def test_budget_allocation_and_oversample(self, spark):
        from featurescreening_jl_spark.operators.sampling import (
            temperature_weights,
        )

        df = spark.createDataFrame(
            [("web", 8000), ("wiki", 2000)], "src string, n long"
        )
        out = temperature_weights(
            df, group_col="src", size_col="n", tau=0.5, budget=10_000.0
        ).toPandas().set_index("src")
        # share 0.8/0.2 -> sqrt -> 0.894/0.447 -> weights 2/3, 1/3
        assert abs(out.loc["web", "weight"] - 2 / 3) < 1e-4
        assert abs(out.loc["wiki", "target_size"] - 10_000 / 3) < 0.5
        # wiki gets MORE than its size: oversample factor > 1
        assert out.loc["wiki", "sample_factor"] > 1.0
        assert out.loc["web", "sample_factor"] < 1.0

    def test_tau_rejects_negative(self, spark):
        import pytest as _pytest

        from featurescreening_jl_spark.operators.sampling import (
            temperature_weights,
        )

        df = spark.createDataFrame([("a", 1)], "g string, n long")
        with _pytest.raises(ValueError):
            temperature_weights(df, group_col="g", size_col="n", tau=-0.1)


class TestHashNegatives:
    def test_deterministic_and_partition_invariant(self, spark):
        from featurescreening_jl_spark.operators.sampling import (
            hash_negatives,
        )

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        a = hash_negatives(emb, "vec_id", k=3, n_buckets=64).orderBy(
            "vec_id", "slot"
        ).toPandas()
        b = hash_negatives(
            emb.repartition(7), "vec_id", k=3, n_buckets=64
        ).orderBy("vec_id", "slot").toPandas()
        assert a.equals(b)
        assert len(a) > 0

    def test_no_self_pairs_and_bounded_slots(self, spark):
        from featurescreening_jl_spark.operators.sampling import (
            hash_negatives,
        )

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        out = hash_negatives(emb, "vec_id", k=4, n_buckets=64).toPandas()
        assert (out["vec_id"] != out["neg_id"]).all()
        assert out["slot"].between(0, 3).all()
        # ≤ k negatives per anchor (empty target buckets drop rows)
        assert out.groupby("vec_id").size().max() <= 4

    def test_k_validation(self, spark):
        import pytest as _pytest

        from featurescreening_jl_spark.operators.sampling import (
            hash_negatives,
        )

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        with _pytest.raises(ValueError):
            hash_negatives(emb, "vec_id", k=0)


class TestExactStratifiedSample:
    def _df(self, spark):
        rows = (
            [(i, "en") for i in range(0, 55)]
            + [(i, "de") for i in range(100, 130)]
            + [(i, "fr") for i in range(200, 212)]
            + [(i, None) for i in range(300, 303)]
        )
        return spark.createDataFrame(rows, ["doc_id", "lang"])

    def test_exact_total_and_hamilton_apportionment(self, spark):
        from featurescreening_jl_spark.operators.sampling import (
            exact_stratified_sample,
        )

        df = self._df(spark)
        out = exact_stratified_sample(
            df, strata_col="lang", key_col="doc_id", n_total=20
        ).collect()
        assert len(out) == 20
        got = {}
        for r in out:
            got[r["lang"]] = got.get(r["lang"], 0) + 1
        # replicate Hamilton: counts en=55 de=30 fr=12 null=3, N=100
        counts = {"en": 55, "de": 30, "fr": 12, "<NULL>": 3}
        base = {v: 20 * c // 100 for v, c in counts.items()}
        extra = 20 - sum(base.values())
        order = sorted(
            counts.items(), key=lambda vc: (-(20 * vc[1] % 100), -vc[1], vc[0])
        )
        for v, _ in order[:extra]:
            base[v] += 1
        want = {(None if v == "<NULL>" else v): n for v, n in base.items() if n}
        assert got == want

    def test_partitioning_invariance_same_rows(self, spark):
        from featurescreening_jl_spark.operators.sampling import (
            exact_stratified_sample,
        )

        df = self._df(spark)
        a = {
            r["doc_id"]
            for r in exact_stratified_sample(
                df.repartition(1), strata_col="lang", key_col="doc_id",
                n_total=33,
            ).collect()
        }
        b = {
            r["doc_id"]
            for r in exact_stratified_sample(
                df.repartition(17, "doc_id"), strata_col="lang",
                key_col="doc_id", n_total=33,
            ).collect()
        }
        assert a == b and len(a) == 33

    def test_validation_and_edges(self, spark):
        from featurescreening_jl_spark.operators.sampling import (
            exact_stratified_sample,
        )

        df = self._df(spark)
        assert (
            exact_stratified_sample(
                df, strata_col="lang", key_col="doc_id", n_total=0
            ).count()
            == 0
        )
        # taking every row returns every row exactly once
        assert (
            exact_stratified_sample(
                df, strata_col="lang", key_col="doc_id", n_total=100
            ).count()
            == 100
        )
        import pytest as _pytest

        with _pytest.raises(ValueError, match="n_total=101 > 100"):
            exact_stratified_sample(
                df, strata_col="lang", key_col="doc_id", n_total=101
            )

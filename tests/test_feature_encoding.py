"""Point-in-time encoders + profiling: leakage pins, numerical stability,
and the invariants the SQL oracles can't express.

The driver oracle (tools/check_correctness.py → target_encode,
decayed_features, decayed_features_arrow, rolling_folds, skew_profile,
psi_drift) checks end-to-end values; these tests pin the *semantics*:
same-timestamp exclusion, the expanding-window property, long-span
numerical stability where the closed form would overflow, and the
zero-drift identity of PSI.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from featurescreening_jl_spark.operators.feature_encoding import (
    decayed_time_features,
    decayed_time_features_stable,
    pit_global_prior,
    pit_target_encode,
    rolling_origin_folds,
)
from featurescreening_jl_spark.operators.profiling import (
    bucketize,
    psi_drift,
    skew_profile,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


# ---------------------------------------------------------------------------
# pit_target_encode
# ---------------------------------------------------------------------------


def test_target_encode_excludes_same_timestamp_peers(spark):
    # Two same-key rows sharing an exact timestamp must not see each
    # other's label — the classic batch-leak. Both get only the strictly
    # earlier row (label 10.0).
    rows = [
        ("k", _ts("2024-01-01T00:00:00"), 10.0, 1),
        ("k", _ts("2024-01-02T00:00:00"), 100.0, 2),
        ("k", _ts("2024-01-02T00:00:00"), 200.0, 3),
    ]
    df = spark.createDataFrame(rows, "key string, ts timestamp, y double, i int")
    out = pit_target_encode(
        df, "key", "y", ts_col="ts", prior=0.0, smoothing=0.0
    )
    got = {r["i"]: (r["te"], r["te_n"]) for r in out.collect()}
    assert got[1][1] == 0  # first occurrence: nothing earlier
    assert got[2] == (10.0, 1)
    assert got[3] == (10.0, 1)  # peer's 100.0 invisible


def test_target_encode_first_occurrence_gets_prior(spark):
    df = spark.createDataFrame(
        [("a", _ts("2024-01-01T00:00:00"), 5.0)],
        "key string, ts timestamp, y double",
    )
    out = pit_target_encode(
        df, "key", "y", ts_col="ts", prior=7.5, smoothing=20.0
    ).collect()[0]
    assert out["te"] == pytest.approx(7.5)
    assert out["te_n"] == 0


def test_pit_global_prior_cutoff(spark):
    df = spark.createDataFrame(
        [
            (_ts("2024-01-01T00:00:00"), 1.0),
            (_ts("2024-01-05T00:00:00"), 3.0),
            (_ts("2024-01-20T00:00:00"), 1000.0),
        ],
        "ts timestamp, y double",
    )
    assert pit_global_prior(df, "y", cutoff="2024-01-10") == pytest.approx(2.0)
    assert pit_global_prior(df.limit(0), "y") == 0.0


def test_target_encode_matches_bruteforce(spark):
    rng = np.random.default_rng(7)
    n = 300
    pdf = pd.DataFrame(
        {
            "key": rng.choice(list("abc"), n),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10**6, n), unit="s"),
            "y": rng.uniform(0, 10, n),
            "i": np.arange(n),
        }
    )
    out = (
        pit_target_encode(
            spark.createDataFrame(pdf), "key", "y", ts_col="ts",
            prior=5.0, smoothing=3.0,
        )
        .select("i", "te")
        .toPandas()
        .set_index("i")["te"]
    )
    for _, g in pdf.groupby("key"):
        tsv = g["ts"].to_numpy()
        yv = g["y"].to_numpy()
        for pos in range(len(g)):
            mask = tsv < tsv[pos]
            want = (yv[mask].sum() + 3.0 * 5.0) / (mask.sum() + 3.0)
            assert out[g["i"].iloc[pos]] == pytest.approx(want, abs=1e-9)


# ---------------------------------------------------------------------------
# decayed_time_features (closed form + stable Arrow variant)
# ---------------------------------------------------------------------------


def _long_span_frame(n=400, span_half_lives=10_000, hl_s=3600.0, seed=0):
    rng = np.random.default_rng(seed)
    t0 = np.datetime64("2000-01-01", "us")
    ts = t0 + np.sort(
        rng.integers(0, int(span_half_lives * hl_s * 1e6), n)
    ).astype("timedelta64[us]")
    v = rng.uniform(0, 10, n)
    return pd.DataFrame({"k": 1, "ts": ts, "v": v, "i": np.arange(n)})


def test_decayed_variants_agree_on_real_data(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    a = (
        decayed_time_features(
            ev,
            ["user_id"],
            {"d_cnt": F.lit(1.0), "d_val": F.col("value")},
            ts_col="ts",
            order_cols=["event_id"],
            half_life_s=86400.0,
        )
        .select("event_id", "d_cnt", "d_val")
        .toPandas()
        .set_index("event_id")
        .sort_index()
    )
    b = (
        decayed_time_features_stable(
            ev.withColumn("__one", F.lit(1.0)),
            ["user_id"],
            {"d_cnt": "__one", "d_val": "value"},
            ts_col="ts",
            order_cols=["event_id"],
            half_life_s=86400.0,
        )
        .select("event_id", "d_cnt", "d_val")
        .toPandas()
        .set_index("event_id")
        .sort_index()
    )
    # two independent implementations (JVM codegen vs numpy segments)
    assert np.allclose(a.to_numpy(), b.to_numpy(), atol=1e-9)
    assert float(a["d_cnt"].max()) > 0.5  # non-vacuous: real decay mass


def test_decayed_stable_long_span_matches_bruteforce(spark):
    # 10,000 half-lives of span: the closed form's 2^x factor would need
    # 2^10000 (double overflows at 2^1024) — the segmented variant must
    # still match an exact brute force computed at bounded exponents.
    pdf = _long_span_frame()
    out = (
        decayed_time_features_stable(
            spark.createDataFrame(pdf),
            ["k"],
            {"d": "v"},
            ts_col="ts",
            order_cols=["i"],
            half_life_s=3600.0,
        )
        .toPandas()
        .sort_values("i")["d"]
        .to_numpy()
    )
    x = (pdf["ts"].to_numpy() - pdf["ts"].to_numpy()[0]).astype(
        "int64"
    ) / 1e6 / 3600.0
    v = pdf["v"].to_numpy()
    brute = np.array(
        [
            np.sum(v[:i] * np.exp2(np.clip(x[:i] - x[i], -1074, 0)))
            for i in range(len(v))
        ]
    )
    assert np.all(np.isfinite(out))
    assert np.allclose(out, brute, atol=1e-9)


def test_decayed_closed_form_first_row_zero_and_monotone_weighting(spark):
    rows = [
        ("c", _ts("2024-01-01T00:00:00"), 1),
        ("c", _ts("2024-01-02T00:00:00"), 2),  # 1 half-life later
        ("c", _ts("2024-01-03T00:00:00"), 3),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, i int")
    out = (
        decayed_time_features(
            df, ["k"], {"d": F.lit(1.0)}, ts_col="ts",
            order_cols=["i"], half_life_s=86400.0,
        )
        .orderBy("i")
        .collect()
    )
    assert out[0]["d"] == 0.0
    assert out[1]["d"] == pytest.approx(0.5)
    assert out[2]["d"] == pytest.approx(0.25 + 0.5)


def test_decayed_stable_cross_batch_stitching(spark):
    # force tiny Arrow batches so single conversations straddle many
    # mapInPandas batches — the held-back-tail stitching must make batch
    # size invisible to the result
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    args = dict(ts_col="ts", order_cols=["event_id"], half_life_s=86400.0)
    try:
        spark.conf.set(key, "7")
        tiny = (
            decayed_time_features_stable(
                ev.withColumn("__one", F.lit(1.0)),
                ["user_id"],
                {"d": "__one"},
                **args,
            )
            .select("event_id", "d")
            .toPandas()
            .set_index("event_id")
            .sort_index()
        )
    finally:
        spark.conf.set(key, old)
    ref = (
        decayed_time_features(
            ev, ["user_id"], {"d": F.lit(1.0)}, **args
        )
        .select("event_id", "d")
        .toPandas()
        .set_index("event_id")
        .sort_index()
    )
    assert np.allclose(tiny["d"].to_numpy(), ref["d"].to_numpy(), atol=1e-9)


# ---------------------------------------------------------------------------
# rolling_origin_folds
# ---------------------------------------------------------------------------


def test_rolling_folds_expanding_and_disjoint(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    f = rolling_origin_folds(
        ev, ["2024-01-08", "2024-01-15", "2024-01-22"], ts_col="ts"
    )
    agg = {
        (r["fold"], r["split"]): set(r["ids"])
        for r in f.groupBy("fold", "split")
        .agg(F.collect_set("event_id").alias("ids"))
        .collect()
    }
    # expanding: fold 2's train is exactly fold 1's train ∪ test
    assert agg[(2, "train")] == agg[(1, "train")] | agg[(1, "test")]
    # within a fold, train and test never share a row
    for k in (1, 2):
        assert not (agg[(k, "train")] & agg[(k, "test")])
    with pytest.raises(ValueError):
        rolling_origin_folds(ev, ["2024-01-08"], ts_col="ts")


# ---------------------------------------------------------------------------
# profiling
# ---------------------------------------------------------------------------


def test_skew_profile_counts_null_and_orders(spark):
    df = spark.createDataFrame(
        [("a",)] * 6 + [(None,)] * 3 + [("b",)] * 1, "k string"
    )
    rows = skew_profile(df, "k", top_n=3).orderBy("rank").collect()
    assert [(r["value"], r["cnt"]) for r in rows] == [
        ("a", 6), ("<NULL>", 3), ("b", 1),
    ]
    assert rows[0]["n_distinct"] == 3
    # top1=6, uniform per-key mean = 10/3 → skew = 1.8
    assert rows[0]["skew"] == pytest.approx(1.8)
    assert sum(r["share"] for r in rows) == pytest.approx(1.0, abs=1e-5)


def test_bucketize_golden(spark):
    df = spark.createDataFrame(
        [(v,) for v in (-5.0, 0.0, 9.9, 10.0, 49.0, 50.0, 1e9)], "v double"
    )
    got = [
        r["b"]
        for r in df.select(
            bucketize(F.col("v"), [0.0, 10.0, 50.0]).alias("b")
        ).collect()
    ]
    assert got == [0, 1, 1, 2, 2, 3, 3]


def test_psi_zero_on_identical_distribution(spark):
    # same value distribution before and after the split → every bin's
    # contribution is ~0 (exactly 0 up to smoothing of equal counts)
    rows = []
    for day, base in (("2024-01-05", 0), ("2024-01-25", 0)):
        rows += [(_ts(f"{day}T00:00:00"), float(v)) for v in range(100)]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = psi_drift(
        df, "value", [25.0, 50.0, 75.0], ts_col="ts", split="2024-01-15"
    ).collect()
    assert sum(abs(r["psi"]) for r in out) < 1e-9
    assert {r["bin"] for r in out} == {0, 1, 2, 3}


def test_heavy_hitters_small_m_guarantee(spark):
    # zipf-ish synthetic: one key holds 40% of rows. With m=8 counters
    # per partition the MG guarantee (every key with freq > N/(m+1)
    # survives phase 1) must still surface it with its EXACT count.
    from featurescreening_jl_spark.operators.profiling import heavy_hitters

    rows = (
        [("hot",)] * 4000
        + [(f"warm{i}",) for i in range(4) for _ in range(500)]
        + [(f"cold{i}",) for i in range(4000)]
    )
    df = spark.createDataFrame(rows, "k string").repartition(8)
    got = {
        r["value"]: r["cnt"]
        for r in heavy_hitters(df, "k", k=5, m=8).collect()
    }
    assert got["hot"] == 4000  # exact, not approximate
    for i in range(4):
        assert got[f"warm{i}"] == 500


def test_heavy_hitters_matches_exact_with_large_m(spark):
    from featurescreening_jl_spark.operators.profiling import heavy_hitters

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = [
        (r["value"], r["cnt"], r["rank"])
        for r in heavy_hitters(ev, "event_type", k=3, m=4096).collect()
    ]
    exact = (
        ev.groupBy(F.col("event_type").alias("value"))
        .count()
        .orderBy(F.desc("count"), F.asc("value"))
        .limit(3)
        .collect()
    )
    assert got == [
        (r["value"], r["count"], i + 1) for i, r in enumerate(exact)
    ]


def test_psi_detects_shift(spark):
    rows = [
        (_ts("2024-01-05T00:00:00"), float(v)) for v in range(100)
    ] + [
        (_ts("2024-01-25T00:00:00"), float(v) + 60.0) for v in range(100)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    total = sum(
        r["psi"]
        for r in psi_drift(
            df, "value", [25.0, 50.0, 75.0], ts_col="ts",
            split="2024-01-15",
        ).collect()
    )
    assert total > 0.25  # "broken" threshold for a 60% quantile shift


def test_oof_target_encode_own_fold_invisible(spark):
    # perturbing every label in fold f must leave fold-f rows' encodings
    # unchanged — the definition of out-of-fold
    from featurescreening_jl_spark.operators.feature_encoding import (
        oof_target_encode,
    )
    from featurescreening_jl_spark.operators.sampling import hash_unit

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    fold = F.floor(hash_unit(F.col("event_id"), seed=42) * 3).cast("int")
    base = ev.withColumn("__f", fold)
    perturbed = base.withColumn(
        "value",
        F.when(F.col("__f") == 1, F.col("value") + 10000.0).otherwise(
            F.col("value")
        ),
    )
    a = (
        oof_target_encode(
            base, "user_id", "value", fold=F.col("__f"), n_folds=3
        )
        .where(F.col("__f") == 1)
        .select("event_id", "te")
        .toPandas()
        .set_index("event_id")
        .sort_index()
    )
    b = (
        oof_target_encode(
            perturbed, "user_id", "value", fold=F.col("__f"), n_folds=3
        )
        .where(F.col("__f") == 1)
        .select("event_id", "te")
        .toPandas()
        .set_index("event_id")
        .sort_index()
    )
    assert len(a) > 100
    assert np.allclose(a["te"].to_numpy(), b["te"].to_numpy(), atol=1e-9)


def test_oof_target_encode_matches_bruteforce(spark):
    from featurescreening_jl_spark.operators.feature_encoding import (
        oof_target_encode,
    )

    rows = [
        ("k", 0, 1.0), ("k", 0, 3.0), ("k", 1, 10.0),
        ("j", 0, 5.0), ("j", 1, 7.0), ("j", 1, 9.0),
    ]
    df = spark.createDataFrame(rows, "key string, f int, y double")
    out = oof_target_encode(
        df, "key", "y", fold=F.col("f"), n_folds=2, smoothing=2.0
    ).collect()
    # fold-0 prior = mean of fold-1 labels = (10+7+9)/3; fold-1 prior =
    # (1+3+5)/3
    p0, p1 = 26.0 / 3, 3.0
    for r in out:
        if r["key"] == "k" and r["f"] == 0:
            want = (10.0 + 2.0 * p0) / (1 + 2.0)  # k's fold-1: one label
        elif r["key"] == "k" and r["f"] == 1:
            want = (4.0 + 2.0 * p1) / (2 + 2.0)
        elif r["key"] == "j" and r["f"] == 0:
            want = (16.0 + 2.0 * p0) / (2 + 2.0)
        else:
            want = (5.0 + 2.0 * p1) / (1 + 2.0)
        assert abs(r["te"] - want) < 1e-9, (r, want)


def test_project_embeddings_preserves_distances(spark):
    # JL sanity: pairwise cosine/distance structure approximately
    # preserved 64 -> 16 dims, and the operator matches numpy exactly
    from featurescreening_jl_spark.operators.similarity import (
        project_embeddings,
        projection_matrix,
    )

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .where(F.col("vec_id") < 50)
        .select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("embedding"),
        )
    )
    out = (
        project_embeddings(emb, in_dim=64, out_dim=16, seed=17)
        .select("vec_id", "projected", "embedding")
        .toPandas()
        .sort_values("vec_id")
    )
    X = np.stack(out["embedding"].to_numpy())
    P = np.stack(out["projected"].to_numpy())
    W = np.array(projection_matrix(64, 16, 17))
    assert np.allclose(P, X @ W.T, atol=1e-9)  # exact vs numpy
    # distance preservation in expectation: median ratio near 1
    d_hi = np.linalg.norm(X[:20, None] - X[None, :20], axis=-1)
    d_lo = np.linalg.norm(P[:20, None] - P[None, :20], axis=-1)
    iu = np.triu_indices(20, 1)
    ratio = d_lo[iu] / d_hi[iu]
    assert 0.7 < np.median(ratio) < 1.3


class TestWoeEncode:
    def test_matches_python_replica(self, spark):
        import math

        from featurescreening_jl_spark.operators.feature_encoding import (
            woe_encode,
        )

        rows = [("a", 1)] * 7 + [("a", 0)] * 3 + [("b", 1)] * 2 + [
            ("b", 0)
        ] * 8 + [("c", 0)] * 4  # c: zero positives — smoothing keeps finite
        df = spark.createDataFrame(rows, "k string, y int")
        got = {
            r["k"]: r
            for r in woe_encode(df, "k", "y", smoothing=0.5)
            .collect()
        }
        pos_t, neg_t = 9, 15
        for k, (p, n) in {"a": (7, 3), "b": (2, 8), "c": (0, 4)}.items():
            woe = (
                math.log(p + 0.5) - math.log(pos_t + 1.0)
                - (math.log(n + 0.5) - math.log(neg_t + 1.0))
            )
            iv = ((p + 0.5) / (pos_t + 1.0) - (n + 0.5) / (neg_t + 1.0)) * woe
            assert got[k]["pos_k"] == p and got[k]["neg_k"] == n
            assert got[k]["woe"] == pytest.approx(round(woe, 6))
            assert got[k]["iv"] == pytest.approx(round(iv, 6))

    def test_monotone_in_positive_rate(self, spark):
        from featurescreening_jl_spark.operators.feature_encoding import (
            woe_encode,
        )

        rows = [("hi", 1)] * 9 + [("hi", 0)] * 1 + [("lo", 1)] * 1 + [
            ("lo", 0)
        ] * 9
        df = spark.createDataFrame(rows, "k string, y int")
        got = {r["k"]: r["woe"] for r in woe_encode(df, "k", "y").collect()}
        assert got["hi"] > 0 > got["lo"]


class TestHashedCross:
    def test_null_token_distinguishes_missing(self, spark):
        from featurescreening_jl_spark.operators.feature_encoding import (
            hashed_cross,
        )

        df = spark.createDataFrame(
            [(0, None, "NULL"), (1, "NULL", None), (2, None, None)],
            "id long, a string, b string",
        )
        # with a large bucket count, (None,'NULL') and ('NULL',None) must
        # land in different buckets — the reserved token prevents the
        # coalesce-to-same-string collision
        got = {
            r["id"]: r["c"]
            for r in hashed_cross(df, ["a", "b"], 1 << 20, out="c").collect()
        }
        assert got[0] != got[1]

    def test_deterministic_and_bounded(self, spark):
        from featurescreening_jl_spark.operators.feature_encoding import (
            hashed_cross,
        )

        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        a = hashed_cross(ev, ["event_type", "user_id"], 32).select(
            "event_id", "cross_bucket"
        ).orderBy("event_id").toPandas()
        b = hashed_cross(
            ev.repartition(5), ["event_type", "user_id"], 32
        ).select("event_id", "cross_bucket").orderBy("event_id").toPandas()
        assert a["cross_bucket"].tolist() == b["cross_bucket"].tolist()
        assert a["cross_bucket"].between(0, 31).all()

    def test_empty_cols_raises(self, spark):
        from featurescreening_jl_spark.operators.feature_encoding import (
            hashed_cross,
        )

        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        with pytest.raises(ValueError):
            hashed_cross(ev, [], 32)


class TestQuantileBin:
    def _ev(self, spark):
        return spark.read.parquet("/root/testdata/sf0.001/events.parquet")

    def test_equal_frequency_within_tolerance(self, spark):
        from featurescreening_jl_spark.operators.feature_encoding import (
            fit_quantile_bins,
            quantile_bin,
        )

        ev = self._ev(spark)
        bins = fit_quantile_bins(ev, "value", 4)
        out = quantile_bin(ev, bins, "value")
        counts = (
            out.groupBy("bucket").count().orderBy("bucket").toPandas()
        )
        n = ev.count()
        assert sorted(counts["bucket"]) == [0, 1, 2, 3]
        # continuous values, exact quantile fit: each bin holds n/4 ± 1
        assert (counts["count"] - n / 4).abs().max() <= 1

    def test_matches_numpy_reference(self, spark):
        import numpy as np

        from featurescreening_jl_spark.operators.feature_encoding import (
            fit_quantile_bins,
        )

        ev = self._ev(spark)
        vals = np.array(
            [r["value"] for r in ev.select("value").collect()]
        )
        want = np.round(
            np.quantile(vals, [0.25, 0.5, 0.75], method="linear"), 6
        )
        [row] = fit_quantile_bins(ev, "value", 4).collect()
        got = np.array(row["boundaries"])
        np.testing.assert_allclose(got, want, atol=1e-9)

    def test_approx_close_to_exact(self, spark):
        from featurescreening_jl_spark.operators.feature_encoding import (
            fit_quantile_bins,
            quantile_bin,
        )

        ev = self._ev(spark)
        exact = fit_quantile_bins(ev, "value", 8, by="event_type")
        approx = fit_quantile_bins(
            ev, "value", 8, by="event_type", approx=True
        )
        a = quantile_bin(ev, exact, "value", by="event_type")
        b = quantile_bin(ev, approx, "value", by="event_type")
        both = a.select("event_id", F.col("bucket").alias("be")).join(
            b.select("event_id", F.col("bucket").alias("ba")), "event_id"
        )
        n = both.count()
        agree = both.where(F.col("be") == F.col("ba")).count()
        # the sketch may shift rows at bin edges, nowhere else
        assert agree / n > 0.95, (agree, n)

    def test_null_values_get_null_bucket(self, spark):
        from featurescreening_jl_spark.operators.feature_encoding import (
            fit_quantile_bins,
            quantile_bin,
        )

        df = spark.createDataFrame(
            [(1, 1.0), (2, 2.0), (3, 3.0), (4, 4.0), (5, None)],
            "id long, value double",
        )
        bins = fit_quantile_bins(df, "value", 2)
        out = {
            r["id"]: r["bucket"]
            for r in quantile_bin(df, bins, "value").collect()
        }
        assert out[5] is None
        assert out[1] == 0 and out[4] == 1

    def test_partitioning_invariance(self, spark):
        from featurescreening_jl_spark.operators.feature_encoding import (
            fit_quantile_bins,
            quantile_bin,
        )

        ev = self._ev(spark)
        a = quantile_bin(
            ev, fit_quantile_bins(ev, "value", 8, by="event_type"),
            "value", by="event_type",
        ).select("event_id", "bucket").orderBy("event_id").toPandas()
        ev2 = ev.repartition(7)
        b = quantile_bin(
            ev2, fit_quantile_bins(ev2, "value", 8, by="event_type"),
            "value", by="event_type",
        ).select("event_id", "bucket").orderBy("event_id").toPandas()
        assert a["bucket"].tolist() == b["bucket"].tolist()

    def test_transform_is_map_only(self, spark):
        """the transform side must not shuffle the scan: broadcast join +
        HOF fold only"""
        from featurescreening_jl_spark.operators.feature_encoding import (
            fit_quantile_bins,
            quantile_bin,
        )

        ev = self._ev(spark)
        bins = fit_quantile_bins(ev, "value", 8, by="event_type")
        out = quantile_bin(ev, bins, "value", by="event_type")
        p = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in p, p
        assert "Exchange hashpartitioning" not in p.split(
            "BroadcastExchange"
        )[0], p

    def test_rejects_bad_bins(self, spark):
        from featurescreening_jl_spark.operators.feature_encoding import (
            fit_quantile_bins,
        )

        with pytest.raises(ValueError, match="n_bins"):
            fit_quantile_bins(self._ev(spark), "value", 1)

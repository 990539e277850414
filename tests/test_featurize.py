"""Featurization-layer tests: generator determinism, sessionization,
lag/lead, leakage-free running features, per-turn text-equality invariant."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from featurescreening_jl_spark.operators.window_features import (
    TURN_FEATURE_COLS,
    conversation_aggregates,
    sessionize,
    turn_features,
    with_lag_lead,
)
from featurescreening_jl_spark.sources.transcripts import synthetic_transcripts

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def transcripts(spark):
    df = synthetic_transcripts(spark, n_conversations=30, seed=42, heavy_every=29)
    df.cache().count()
    return df


class TestGenerator:
    def test_schema(self, transcripts):
        assert [f.name for f in transcripts.schema.fields] == [
            "conv_id", "turn_idx", "role", "text", "tool", "ts",
        ]

    def test_deterministic_regeneration(self, spark, transcripts):
        again = synthetic_transcripts(spark, n_conversations=30, seed=42,
                                      heavy_every=29, num_partitions=3)
        a = transcripts.orderBy("conv_id", "turn_idx").toPandas()
        b = again.orderBy("conv_id", "turn_idx").toPandas()
        pd.testing.assert_frame_equal(a, b)

    def test_skew_built_in(self, transcripts):
        counts = (
            transcripts.groupBy("conv_id").count().orderBy(F.desc("count")).toPandas()
        )
        assert counts["count"].iloc[0] > 20 * counts["count"].iloc[2]

    def test_turn_idx_dense_and_ts_monotone(self, transcripts):
        pdf = transcripts.orderBy("conv_id", "turn_idx").toPandas()
        for _, g in pdf.groupby("conv_id"):
            assert list(g["turn_idx"]) == list(range(len(g)))
            assert g["ts"].is_monotonic_increasing


class TestSessionize:
    def test_gap_semantics(self, spark):
        rows = [
            ("c1", 0, "2025-01-01 00:00:00"),
            ("c1", 1, "2025-01-01 00:10:00"),
            ("c1", 2, "2025-01-01 02:00:00"),  # > 30 min gap → new session
            ("c1", 3, "2025-01-01 02:10:00"),
            ("c2", 0, "2025-01-01 00:00:00"),  # separate conversation
        ]
        df = spark.createDataFrame(rows, "conv_id string, turn_idx int, ts_s string")
        df = df.withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
        out = sessionize(df, gap_seconds=1800).orderBy("conv_id", "turn_idx").toPandas()
        assert out["session_id"].tolist() == [0, 0, 1, 1, 0]

    def test_boundary_exactly_at_gap_stays(self, spark):
        rows = [("c", 0, "2025-01-01 00:00:00"), ("c", 1, "2025-01-01 00:30:00")]
        df = spark.createDataFrame(rows, "conv_id string, turn_idx int, s string")
        df = df.withColumn("ts", F.to_timestamp("s")).drop("s")
        out = sessionize(df, gap_seconds=1800).orderBy("turn_idx").toPandas()
        # gap == 1800 is NOT > 1800 → same session
        assert out["session_id"].tolist() == [0, 0]


class TestLagLead:
    def test_lag_lead(self, spark):
        rows = [("c", i, float(i * 10), f"2025-01-01 00:0{i}:00") for i in range(4)]
        df = spark.createDataFrame(rows, "conv_id string, turn_idx int, v double, s string")
        df = df.withColumn("ts", F.to_timestamp("s")).drop("s")
        out = (
            with_lag_lead(df, {"v_lag1": ("v", -1), "v_lead1": ("v", 1)})
            .orderBy("turn_idx")
            .toPandas()
        )
        assert out["v_lag1"].tolist()[1:] == [0.0, 10.0, 20.0]
        assert pd.isna(out["v_lag1"].iloc[0])
        assert out["v_lead1"].tolist()[:3] == [10.0, 20.0, 30.0]
        assert pd.isna(out["v_lead1"].iloc[3])


class TestTurnFeatures:
    def test_feature_columns_present_and_leakage_free(self, transcripts):
        feats = turn_features(transcripts)
        for c in TURN_FEATURE_COLS + ["label_next_is_tool", "session_id"]:
            assert c in feats.columns
        pdf = (
            feats.where(F.col("conv_id") == "conv_00000001")
            .orderBy("turn_idx")
            .toPandas()
        )
        # running counters are non-decreasing (function of past only)
        assert pdf["cum_tool_calls"].is_monotonic_increasing
        assert pdf["cum_user_turns"].is_monotonic_increasing
        # hand-check running tool count == cumsum of is_tool
        assert (pdf["cum_tool_calls"] == pdf["is_tool"].cumsum()).all()
        # lag1 equals previous row's text_len
        assert (
            pdf["lag1_text_len"].iloc[1:].to_numpy()
            == pdf["text_len"].iloc[:-1].to_numpy()
        ).all()

    def test_text_preserved_under_stable_ordering(self, transcripts):
        """Per-turn text equality under (conv_id, turn_idx) ordering —
        the graft's per-row invariant (BASELINE.json input_hint)."""
        feats = turn_features(transcripts)
        a = transcripts.select("conv_id", "turn_idx", "text").orderBy(
            "conv_id", "turn_idx"
        ).toPandas()
        b = feats.select("conv_id", "turn_idx", "text").orderBy(
            "conv_id", "turn_idx"
        ).toPandas()
        pd.testing.assert_frame_equal(a, b)

    def test_single_window_sort(self, transcripts):
        """All per-turn features share one (conv_id / ts,turn_idx) sort: the
        physical plan must not contain more than the session-window's two
        sorts. Guards against accidental per-feature window specs."""
        feats = turn_features(transcripts)
        plan = feats._jdf.queryExecution().executedPlan().toString()
        n_sorts = plan.count("Sort [")
        assert n_sorts <= 3, f"too many sorts ({n_sorts}) in plan"


class TestConversationAggregates:
    def test_rollup(self, transcripts):
        agg = conversation_aggregates(transcripts)
        pdf = agg.orderBy("conv_id").toPandas()
        assert (pdf["n_turns"] >= 4).all()
        assert (pdf["n_sessions"] >= 1).all()
        total = transcripts.count()
        assert pdf["n_turns"].sum() == total

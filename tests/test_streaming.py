"""Streaming ingest: watermarked session windows vs the batch
sessionizer on identical data (same gap ⇒ same per-conversation session
count and per-session turn totals)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from featurescreening_jl_spark.operators.window_features import sessionize
from featurescreening_jl_spark.sources.transcripts import synthetic_transcripts
from featurescreening_jl_spark.streaming.ingest import (
    read_transcript_stream,
    streaming_conversation_rates,
    streaming_session_aggregates,
)

GAP = 1800


@pytest.fixture(scope="module")
def transcript_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream") / "transcripts")
    synthetic_transcripts(spark, 30, seed=11, heavy_every=0).repartition(
        4
    ).write.parquet(path)
    return path


def _run_stream(spark, df, mode: str, name: str):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


class TestStreamingSessions:
    def test_matches_batch_sessionization(self, spark, transcript_dir):
        stream = read_transcript_stream(spark, transcript_dir)
        out = _run_stream(
            spark,
            streaming_session_aggregates(stream, gap_seconds=GAP),
            "complete",
            "sessions_tbl",
        ).toPandas()

        batch = (
            sessionize(
                spark.read.parquet(transcript_dir), gap_seconds=GAP
            )
            .groupBy("conv_id", "session_id")
            .agg(
                F.count("*").alias("n_turns"),
                F.sum(
                    F.when(F.col("tool").isNotNull(), 1).otherwise(0)
                ).alias("n_tool_calls"),
            )
            .toPandas()
        )

        # same session count per conversation
        s_counts = out.groupby("conv_id").size().sort_index()
        b_counts = batch.groupby("conv_id").size().sort_index()
        assert s_counts.equals(b_counts)

        # same multiset of (n_turns, n_tool_calls) per conversation
        key = lambda pdf: sorted(
            map(tuple, pdf[["n_turns", "n_tool_calls"]].values.tolist())
        )
        for conv in b_counts.index:
            assert key(out[out.conv_id == conv]) == key(
                batch[batch.conv_id == conv]
            ), conv

    def test_session_bounds_ordered(self, spark, transcript_dir):
        stream = read_transcript_stream(spark, transcript_dir)
        out = _run_stream(
            spark,
            streaming_session_aggregates(stream, gap_seconds=GAP),
            "complete",
            "sessions_bounds_tbl",
        ).toPandas()
        assert (out["session_start"] <= out["session_end"]).all()
        assert (out["first_turn_idx"] <= out["last_turn_idx"]).all()


class TestStreamingRates:
    def test_rate_totals_match_batch(self, spark, transcript_dir):
        stream = read_transcript_stream(spark, transcript_dir)
        out = _run_stream(
            spark,
            streaming_conversation_rates(stream, window="5 minutes"),
            "complete",
            "rates_tbl",
        ).toPandas()
        batch_total = spark.read.parquet(transcript_dir).count()
        assert int(out["n_turns"].sum()) == batch_total
        assert set(out["role"]) <= {"user", "assistant", "tool"}
        assert (out["n_active_convs"] > 0).all()

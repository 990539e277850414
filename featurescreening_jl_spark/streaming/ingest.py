"""Structured Streaming ingest for transcript turns.

The reference is strictly batch (SURVEY.md §2.9 — no streaming operators
exist in /root/reference), so nothing here ports reference semantics.
This module is the engine's forward path for CONTINUOUS transcript
arrival: the same per-turn aggregates the batch layer computes, expressed
as a watermarked streaming query so late turns are handled explicitly
instead of silently reordering history.

Design points (the parts that matter at cluster scale):

- ``readStream`` over the same parquet/Iceberg directory layout the batch
  engine uses — one schema, two execution modes.
- Event-time watermark on ``ts`` bounds state: conversations idle past the
  watermark are finalized and evicted, so state size tracks ACTIVE
  conversations, not history.
- ``F.session_window(ts, gap)`` is the streaming twin of the batch
  gap-sessionization in operators/window_features.py (lag + cumulative
  sum): same gap semantics, windows merge as turns arrive.
- Aggregations are all built-ins → partial aggregation + state-store
  backed incremental merge; no Python in the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from featurescreening_jl_spark.sources.transcripts import TRANSCRIPT_SCHEMA

__all__ = [
    "read_transcript_stream",
    "streaming_session_aggregates",
    "streaming_conversation_rates",
]


def read_transcript_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int = 8,
) -> DataFrame:
    """File-source stream over a transcripts directory (parquet files
    appear → micro-batches). Schema is pinned — streaming sources cannot
    infer it."""
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def streaming_session_aggregates(
    stream: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "2 hours",
) -> DataFrame:
    """Per (conversation, session) rollup with merging session windows.

    Emits one row per closed session: turn/tool counts, text volume, and
    session bounds. The watermark finalizes a session once event time has
    moved ``watermark`` past its last turn — late turns inside the
    watermark still merge; later ones are dropped (counted by the state
    store metrics, not silently absorbed).
    """
    gap = f"{gap_seconds} seconds"
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("conv_id", F.session_window("ts", gap).alias("session"))
        .agg(
            F.count("*").alias("n_turns"),
            F.sum(
                F.when(F.col("tool").isNotNull(), 1).otherwise(0)
            ).alias("n_tool_calls"),
            F.sum(F.length("text")).alias("total_chars"),
            F.min("turn_idx").alias("first_turn_idx"),
            F.max("turn_idx").alias("last_turn_idx"),
        )
        .select(
            "conv_id",
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "n_turns",
            "n_tool_calls",
            "total_chars",
            "first_turn_idx",
            "last_turn_idx",
        )
    )


def streaming_conversation_rates(
    stream: DataFrame,
    window: str = "5 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling-window turn/tool rates — the monitoring feed for an
    ingestion pipeline (turns/interval per role)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "role")
        .agg(
            F.count("*").alias("n_turns"),
            # exact distinct is unsupported on streams; the HLL sketch is
            # the standard monitoring-feed answer
            F.approx_count_distinct("conv_id").alias("n_active_convs"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "role",
            "n_turns",
            "n_active_convs",
        )
    )

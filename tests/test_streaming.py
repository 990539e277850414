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


class TestStatefulTurnFeatures:
    def test_state_carries_across_micro_batches(self, spark, tmp_path):
        """applyInPandasWithState running features == batch running
        features, with the input split into two file batches processed by
        two availableNow runs sharing one checkpoint (state must carry)."""
        import pandas as pd
        from pyspark.sql import Window

        from featurescreening_jl_spark.streaming.ingest import (
            streaming_turn_state_features,
        )

        full = synthetic_transcripts(spark, 8, seed=7, heavy_every=0)
        full.cache()
        # stateful micro-batches commit one state store per shuffle
        # partition per batch — at tiny scale that overhead dominates, so
        # pin the stream to 2 partitions for this test
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        split = 4
        part1 = full.where(F.col("turn_idx") < split)
        part2 = full.where(F.col("turn_idx") >= split)
        data_dir = str(tmp_path / "turns")
        ckpt = str(tmp_path / "ckpt")
        out_dir = str(tmp_path / "out")
        part1.coalesce(1).write.mode("append").parquet(data_dir)

        def run_phase():
            # file sink: the one built-in sink that supports restarting
            # from the checkpoint (memory sink does not)
            stream = read_transcript_stream(spark, data_dir)
            q = (
                # TTL (= watermark delay) larger than the dataset's time
                # span: nothing is late, nothing evicts mid-test
                streaming_turn_state_features(stream, state_ttl_seconds=10**7)
                .writeStream.format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            # a stateful query with registered processing-time timeouts
            # stays alive waiting for them — block until the data is
            # processed, then stop explicitly
            q.processAllAvailable()
            q.stop()
            q.awaitTermination(60)

        run_phase()
        part2.coalesce(1).write.mode("append").parquet(data_dir)
        run_phase()
        got = (
            spark.read.parquet(out_dir)
            .toPandas()
            .sort_values(["conv_id", "turn_seq"])
            .reset_index(drop=True)
        )

        w = Window.partitionBy("conv_id").orderBy("ts", "turn_idx")
        exp = (
            full.select(
                "conv_id",
                "turn_idx",
                (F.row_number().over(w) - 1).cast("long").alias("turn_seq"),
                F.sum(
                    F.when(F.col("tool").isNotNull(), 1).otherwise(0)
                )
                .over(
                    w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                )
                .cast("long")
                .alias("cum_tool_calls"),
                F.coalesce(
                    F.col("ts").cast("double")
                    - F.lag(F.col("ts").cast("double")).over(w),
                    F.lit(0.0),
                ).alias("time_since_prev"),
            )
            .toPandas()
            .sort_values(["conv_id", "turn_seq"])
            .reset_index(drop=True)
        )
        # phase 1 saw turn_idx < split first: since ts increases with
        # turn_idx within a conversation, arrival order == event order and
        # the streamed running features must equal the batch ones
        assert len(got) == len(exp)
        pd.testing.assert_frame_equal(
            got[["conv_id", "turn_idx", "turn_seq", "cum_tool_calls"]],
            exp[["conv_id", "turn_idx", "turn_seq", "cum_tool_calls"]],
            check_dtype=False,
        )
        assert (abs(got["time_since_prev"] - exp["time_since_prev"]) < 1e-6).all()
        full.unpersist()
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


class TestStreamingDedup:
    """streaming_dedup_turns: exactly-once materialization from an
    at-least-once source — every turn delivered twice must come out
    once, matching the batch-distinct answer on the same files."""

    @pytest.fixture(scope="class")
    def dup_dir(self, spark, tmp_path_factory):
        path = str(tmp_path_factory.mktemp("stream-dup") / "transcripts")
        df = synthetic_transcripts(spark, 20, seed=5, heavy_every=0)
        df.repartition(2).write.parquet(path)
        # simulate redelivery: the whole feed arrives a second time
        df.repartition(3).write.mode("append").parquet(path)
        return path

    def test_identity_dedup_matches_batch_distinct(self, spark, dup_dir):
        from featurescreening_jl_spark.streaming.ingest import (
            streaming_dedup_turns,
        )

        out = _run_stream(
            spark,
            streaming_dedup_turns(read_transcript_stream(spark, dup_dir)),
            "append",
            "dedup_ident_tbl",
        ).toPandas()
        raw = spark.read.parquet(dup_dir)
        n_raw = raw.count()
        n_distinct = raw.select("conv_id", "turn_idx").distinct().count()
        assert n_raw == 2 * n_distinct  # the fixture really doubled the feed
        assert len(out) == n_distinct
        assert out.duplicated(["conv_id", "turn_idx"]).sum() == 0

    def test_content_dedup_matches_batch_distinct_text(self, spark, dup_dir):
        from featurescreening_jl_spark.streaming.ingest import (
            streaming_dedup_turns,
        )

        out = _run_stream(
            spark,
            streaming_dedup_turns(
                read_transcript_stream(spark, dup_dir), by_content=True
            ),
            "append",
            "dedup_content_tbl",
        ).toPandas()
        norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
        n_texts = (
            spark.read.parquet(dup_dir).select(norm.alias("t")).distinct().count()
        )
        assert len(out) == n_texts
        # the internal fingerprint column must not leak into the output
        assert "__fp" not in out.columns


class TestStreamingDecayedFeatures:
    def test_matches_batch_decay(self, spark, transcript_dir):
        # all data in one availableNow pass, arrival order = event-time
        # order ⇒ the O(1)-state streaming recurrence must agree with the
        # batch closed-form operator per (conv, turn)
        from featurescreening_jl_spark.operators.feature_encoding import (
            decayed_time_features,
        )
        from featurescreening_jl_spark.streaming.ingest import (
            streaming_decayed_features,
        )

        batch_df = spark.read.parquet(transcript_dir)
        stream = read_transcript_stream(spark, transcript_dir)
        got = _run_stream(
            spark,
            streaming_decayed_features(
                stream, half_life_s=86400.0, state_ttl_seconds=10**7
            ),
            "append",
            "decay_stream",
        ).toPandas().set_index(["conv_id", "turn_idx"]).sort_index()

        want = (
            decayed_time_features(
                batch_df,
                ["conv_id"],
                {
                    "dec_turns": F.lit(1.0),
                    "dec_chars": F.length(
                        F.coalesce(F.col("text"), F.lit(""))
                    ),
                },
                ts_col="ts",
                order_cols=["turn_idx"],
                half_life_s=86400.0,
            )
            .select("conv_id", "turn_idx", "dec_turns", "dec_chars")
            .toPandas()
            .set_index(["conv_id", "turn_idx"])
            .sort_index()
        )
        assert len(got) == len(want) and len(got) > 0
        import numpy as np

        assert np.allclose(
            got[["dec_turns", "dec_chars"]].to_numpy(),
            want[["dec_turns", "dec_chars"]].to_numpy(),
            atol=1e-6,
        )

    def test_state_carries_across_micro_batches_decay(self, spark, tmp_path):
        """Two availableNow runs over a shared checkpoint: the second
        run's outputs must continue the first run's O(1) decayed
        accumulator, agreeing with the batch operator over the union."""
        import numpy as np

        from featurescreening_jl_spark.operators.feature_encoding import (
            decayed_time_features,
        )
        from featurescreening_jl_spark.sources.transcripts import (
            synthetic_transcripts,
        )
        from featurescreening_jl_spark.streaming.ingest import (
            streaming_decayed_features,
        )

        full = synthetic_transcripts(spark, 12, seed=23, heavy_every=0)
        full.cache()
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        try:
            split = 4
            data_dir = str(tmp_path / "turns")
            ckpt = str(tmp_path / "ckpt")
            out_dir = str(tmp_path / "out")
            full.where(F.col("turn_idx") < split).coalesce(1).write.mode(
                "append"
            ).parquet(data_dir)

            def run_phase():
                stream = read_transcript_stream(spark, data_dir)
                q = (
                    streaming_decayed_features(
                        stream, half_life_s=86400.0,
                        state_ttl_seconds=10**7,
                    )
                    .writeStream.format("parquet")
                    .option("path", out_dir)
                    .option("checkpointLocation", ckpt)
                    .outputMode("append")
                    .trigger(availableNow=True)
                    .start()
                )
                q.processAllAvailable()
                q.stop()
                q.awaitTermination(60)

            run_phase()
            full.where(F.col("turn_idx") >= split).coalesce(1).write.mode(
                "append"
            ).parquet(data_dir)
            run_phase()
            got = (
                spark.read.parquet(out_dir)
                .toPandas()
                .set_index(["conv_id", "turn_idx"])
                .sort_index()
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        want = (
            decayed_time_features(
                full,
                ["conv_id"],
                {
                    "dec_turns": F.lit(1.0),
                    "dec_chars": F.length(
                        F.coalesce(F.col("text"), F.lit(""))
                    ),
                },
                ts_col="ts",
                order_cols=["turn_idx"],
                half_life_s=86400.0,
            )
            .select("conv_id", "turn_idx", "dec_turns", "dec_chars")
            .toPandas()
            .set_index(["conv_id", "turn_idx"])
            .sort_index()
        )
        assert len(got) == len(want) and len(got) > 20
        assert np.allclose(
            got[["dec_turns", "dec_chars"]].to_numpy(),
            want[["dec_turns", "dec_chars"]].to_numpy(),
            atol=1e-6,
        )


class TestStreamingExpandingZscore:
    def test_bit_identical_to_batch(self, spark, transcript_dir):
        # integer-sum state ⇒ EXACT equality with the batch operator (no
        # allclose tolerance needed), arrival order == event-time order
        import numpy as np

        from featurescreening_jl_spark.operators.window_features import (
            expanding_zscore,
        )
        from featurescreening_jl_spark.streaming.ingest import (
            streaming_expanding_zscore,
        )

        stream = read_transcript_stream(spark, transcript_dir)
        got = (
            _run_stream(
                spark,
                streaming_expanding_zscore(stream, state_ttl_seconds=10**7),
                "append",
                "zscore_stream",
            )
            .toPandas()
            .set_index(["conv_id", "turn_idx"])
            .sort_index()
        )
        batch_df = spark.read.parquet(transcript_dir).withColumn(
            "text_len", F.length(F.coalesce(F.col("text"), F.lit(""))).cast("long")
        )
        want = (
            expanding_zscore(batch_df, "text_len")
            .select("conv_id", "turn_idx", "zscore")
            .toPandas()
            .set_index(["conv_id", "turn_idx"])
            .sort_index()
        )
        assert len(got) == len(want) and len(got) > 0
        g = got["zscore"].to_numpy(dtype=float)
        w = want["zscore"].to_numpy(dtype=float)
        assert ((g == w) | (np.isnan(g) & np.isnan(w))).all()

    def test_state_carries_across_micro_batches(self, spark, tmp_path):
        import numpy as np

        from featurescreening_jl_spark.operators.window_features import (
            expanding_zscore,
        )
        from featurescreening_jl_spark.sources.transcripts import (
            synthetic_transcripts,
        )
        from featurescreening_jl_spark.streaming.ingest import (
            streaming_expanding_zscore,
        )

        src = str(tmp_path / "src")
        ckpt = str(tmp_path / "ckpt")
        out_dir = str(tmp_path / "out")
        full = synthetic_transcripts(spark, 12, seed=23, heavy_every=0)
        full.cache()
        full.where(F.col("turn_idx") < 5).coalesce(1).write.mode(
            "append"
        ).parquet(src)

        def run():
            stream = read_transcript_stream(spark, src)
            q = (
                streaming_expanding_zscore(stream, state_ttl_seconds=10**7)
                .writeStream.format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.processAllAvailable()
            q.stop()
            q.awaitTermination(60)

        run()
        full.where(F.col("turn_idx") >= 5).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        run()
        got = (
            spark.read.parquet(out_dir)
            .toPandas()
            .set_index(["conv_id", "turn_idx"])
            .sort_index()
        )
        batch_df = spark.read.parquet(src).withColumn(
            "text_len", F.length(F.coalesce(F.col("text"), F.lit(""))).cast("long")
        )
        want = (
            expanding_zscore(batch_df, "text_len")
            .select("conv_id", "turn_idx", "zscore")
            .toPandas()
            .set_index(["conv_id", "turn_idx"])
            .sort_index()
        )
        assert len(got) == len(want) and len(got) > 0
        g = got["zscore"].to_numpy(dtype=float)
        w = want["zscore"].to_numpy(dtype=float)
        assert ((g == w) | (np.isnan(g) & np.isnan(w))).all()


class TestNeardupGate:
    """Streaming near-dup gate (streaming_neardup_gate): per micro-batch
    LSH match against a static index must agree pair-for-pair with the
    batch incremental path on identical data."""

    @pytest.fixture(scope="class")
    def corpora(self, spark, tmp_path_factory):
        # index: 30 docs; stream: 10 docs of which 4 are near-copies of
        # index docs (a few words dropped)
        idx_rows = [
            (i, " ".join(f"w{(i * 13 + j * 7) % 101}" for j in range(50)))
            for i in range(30)
        ]
        idx = spark.createDataFrame(idx_rows, ["doc_id", "text"])
        new_rows = [
            (1000 + i, " ".join(f"v{(i * 11 + j * 5) % 97}" for j in range(50)))
            for i in range(6)
        ] + [
            (2000 + i, " ".join(idx_rows[i * 7][1].split()[:45]))
            for i in range(4)
        ]
        new = spark.createDataFrame(new_rows, ["doc_id", "text"])
        path = str(tmp_path_factory.mktemp("gate") / "new_docs")
        new.repartition(3).write.parquet(path)
        return idx, new, path

    def test_stream_matches_batch_incremental(self, spark, corpora):
        from featurescreening_jl_spark.operators.dedup import (
            minhash_lsh_pairs_incremental,
        )
        from featurescreening_jl_spark.streaming.ingest import (
            streaming_neardup_gate,
        )

        idx, new, path = corpora
        want = sorted(
            map(
                tuple,
                minhash_lsh_pairs_incremental(
                    idx, new, jaccard_threshold=0.7
                ).collect(),
            )
        )
        assert len(want) >= 4  # the injected near-copies are found

        got: list[tuple] = []
        stream = spark.readStream.schema("doc_id long, text string").option(
            "maxFilesPerTrigger", 1
        ).parquet(path)
        q = streaming_neardup_gate(
            stream,
            idx,
            lambda pairs, _bid: got.extend(map(tuple, pairs.collect())),
            jaccard_threshold=0.7,
        )
        q.awaitTermination(120)
        assert sorted(got) == want

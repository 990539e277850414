"""As-of join tests: golden semantics, cross-strategy agreement, and the
zero-temporal-leakage poison-row property (SURVEY.md §5d, §7.3)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from featurescreening_jl_spark.operators.asof_join import asof_join
from featurescreening_jl_spark.sources.transcripts import synthetic_transcripts

pytestmark = pytest.mark.spark

STRATEGIES = ["window", "merge_asof", "bucketed"]


def _ts_df(spark, rows, schema):
    df = spark.createDataFrame(rows, schema)
    return df.withColumn("ts", F.to_timestamp("s")).drop("s")


@pytest.fixture(scope="module")
def simple(spark):
    sources = _ts_df(
        spark,
        [
            ("a", "2025-01-01 00:00:00", 1.0),
            ("a", "2025-01-01 01:00:00", 2.0),
            ("a", "2025-01-01 05:00:00", 3.0),
            ("b", "2025-01-01 02:00:00", 10.0),
        ],
        "k string, s string, v double",
    )
    queries = _ts_df(
        spark,
        [
            ("a", "2025-01-01 00:30:00"),  # → 1.0
            ("a", "2025-01-01 01:00:00"),  # exact → 2.0
            ("a", "2025-01-01 04:59:59"),  # → 2.0 (bucket-crossing carry)
            ("a", "2025-01-01 23:00:00"),  # → 3.0 (many empty buckets later)
            ("b", "2025-01-01 01:00:00"),  # → null (no earlier source)
            ("b", "2025-01-01 03:00:00"),  # → 10.0
            ("c", "2025-01-01 01:00:00"),  # → null (key with no sources)
        ],
        "k string, s string",
    )
    return queries, sources


EXPECTED = {
    ("a", "2025-01-01 00:30:00"): 1.0,
    ("a", "2025-01-01 01:00:00"): 2.0,
    ("a", "2025-01-01 04:59:59"): 2.0,
    ("a", "2025-01-01 23:00:00"): 3.0,
    ("b", "2025-01-01 01:00:00"): None,
    ("b", "2025-01-01 03:00:00"): 10.0,
    ("c", "2025-01-01 01:00:00"): None,
}


def _check(out_pdf):
    got = {
        (r.k, r.ts.strftime("%Y-%m-%d %H:%M:%S")): (None if pd.isna(r.v) else r.v)
        for r in out_pdf.itertuples()
    }
    assert got == EXPECTED


class TestAsofGolden:
    @pytest.mark.parametrize("strategy", STRATEGIES)
    def test_backward_semantics(self, simple, strategy):
        queries, sources = simple
        out = asof_join(
            queries, sources, on="ts", by="k", value_cols=["v"],
            strategy=strategy, bucket_seconds=3600,
        )
        _check(out.toPandas())

    @pytest.mark.parametrize("strategy", STRATEGIES)
    def test_strict_exact_matches_false(self, simple, strategy):
        queries, sources = simple
        out = asof_join(
            queries, sources, on="ts", by="k", value_cols=["v"],
            strategy=strategy, allow_exact_matches=False, bucket_seconds=3600,
        ).toPandas()
        got = {
            (r.k, r.ts.strftime("%Y-%m-%d %H:%M:%S")): (None if pd.isna(r.v) else r.v)
            for r in out.itertuples()
        }
        # the exact-ts query now matches the PREVIOUS source
        assert got[("a", "2025-01-01 01:00:00")] == 1.0

    @pytest.mark.parametrize("strategy", STRATEGIES)
    def test_tolerance(self, simple, strategy):
        queries, sources = simple
        out = asof_join(
            queries, sources, on="ts", by="k", value_cols=["v"],
            strategy=strategy, tolerance_seconds=3600, bucket_seconds=3600,
        ).toPandas()
        got = {
            (r.k, r.ts.strftime("%Y-%m-%d %H:%M:%S")): (None if pd.isna(r.v) else r.v)
            for r in out.itertuples()
        }
        # 23:00 query's match (05:00) is 18h old → nulled by tolerance
        assert got[("a", "2025-01-01 23:00:00")] is None
        assert got[("a", "2025-01-01 00:30:00")] == 1.0

    def test_value_col_clash_rejected(self, simple):
        queries, sources = simple
        with pytest.raises(ValueError):
            asof_join(queries.withColumn("v", F.lit(0.0)), sources,
                      on="ts", by="k", value_cols=["v"])


class TestCrossStrategyAgreement:
    def test_agree_on_transcript_scale(self, spark):
        """All three strategies produce identical results on realistic
        skewed data (heavy-hitter conversations included)."""
        tr = synthetic_transcripts(spark, n_conversations=20, seed=7, heavy_every=19)
        sources = tr.where(F.col("tool").isNotNull()).select(
            "conv_id", "ts", F.length("text").cast("double").alias("tool_text_len")
        )
        queries = tr.select("conv_id", "turn_idx", "ts")
        outs = {}
        for s in STRATEGIES:
            outs[s] = (
                asof_join(queries, sources, on="ts", by="conv_id",
                          value_cols=["tool_text_len"], strategy=s,
                          bucket_seconds=600)
                .orderBy("conv_id", "turn_idx")
                .toPandas()
                .reset_index(drop=True)
            )
        base = outs["window"][["conv_id", "turn_idx", "tool_text_len"]]
        for s in STRATEGIES[1:]:
            pd.testing.assert_frame_equal(
                base, outs[s][["conv_id", "turn_idx", "tool_text_len"]],
                check_dtype=False,
            )


class TestMegaKey:
    def test_single_mega_key_bucketed_correct(self, spark):
        """One key holding ~all rows of the corpus — salting can NOT split
        a single key (all its rows share hash(key) % salt), so the pandas
        group bound is the hottest key's rows per ``bucket_seconds``.
        Verifies (a) correctness vs the window strategy under that stress
        and (b) the docstring's bound: shrinking bucket_seconds shrinks
        the worst-case cogroup."""
        n = 3000
        # mega-key rows 1 second apart → with bucket_seconds=60 each
        # bucket holds ≤60 of the mega-key's rows; with 10^6 all 3000
        # land in one group
        rows = spark.range(n).select(
            F.lit("mega").alias("k"),
            F.timestamp_seconds(1735689600 + F.col("id")).alias("ts"),
            (F.col("id") % 97).cast("double").alias("v"),
        )
        other = spark.range(5).select(
            F.concat(F.lit("k"), F.col("id")).alias("k"),
            F.timestamp_seconds(1735689600 + F.col("id") * 37).alias("ts"),
            F.lit(-1.0).alias("v"),
        )
        sources = rows.unionByName(other)
        queries = sources.select(
            "k", (F.col("ts") + F.expr("INTERVAL 1 SECOND")).alias("ts")
        )
        ref = (
            asof_join(queries, sources, on="ts", by="k", value_cols=["v"],
                      strategy="window")
            .orderBy("k", "ts").toPandas().reset_index(drop=True)
        )
        for bucket_seconds in (60, 10**6):
            got = (
                asof_join(queries, sources, on="ts", by="k",
                          value_cols=["v"], strategy="bucketed",
                          bucket_seconds=bucket_seconds, salt_buckets=8)
                .orderBy("k", "ts").toPandas().reset_index(drop=True)
            )
            pd.testing.assert_frame_equal(ref, got, check_dtype=False)
        # the documented bound: max rows of any (salt, bucket) cogroup
        from pyspark.sql.functions import xxhash64

        def max_group(bucket_seconds):
            return (
                sources.groupBy(
                    (xxhash64("k") % 8),
                    (F.unix_timestamp("ts") / bucket_seconds).cast("long"),
                )
                .count().agg(F.max("count")).first()[0]
            )

        assert max_group(60) <= 60
        assert max_group(10**6) >= n  # salting alone cannot split a key


class TestZeroLeakage:
    @pytest.mark.parametrize("strategy", STRATEGIES)
    def test_poison_row_does_not_change_earlier_cutoffs(self, spark, strategy):
        """Inject a future-dated poison source; no query at an earlier
        cutoff may change — the north_rule's zero-temporal-leakage clause."""
        sources = _ts_df(
            spark,
            [("a", "2025-01-01 00:00:00", 1.0), ("a", "2025-01-01 02:00:00", 2.0)],
            "k string, s string, v double",
        )
        poison = _ts_df(
            spark, [("a", "2025-01-01 03:00:00", 666.0)], "k string, s string, v double"
        )
        queries = _ts_df(
            spark,
            [("a", "2025-01-01 01:00:00"), ("a", "2025-01-01 02:30:00")],
            "k string, s string",
        )
        kwargs = dict(on="ts", by="k", value_cols=["v"], strategy=strategy,
                      bucket_seconds=3600)
        clean = asof_join(queries, sources, **kwargs).orderBy("ts").toPandas()
        dirty = asof_join(queries, sources.unionByName(poison), **kwargs).orderBy(
            "ts"
        ).toPandas()
        pd.testing.assert_frame_equal(clean, dirty)
        assert clean["v"].tolist() == [1.0, 2.0]

"""Physical-plan shape assertions — the plans we DESIGNED for, not just
the first ones that passed. Each test pins a property that a regression
(or an innocent-looking refactor) would silently destroy at 100× scale.

Complements tests/test_importance_dist.py::TestPlanShape (which pins the
map-only screening round)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark

SF = "/root/testdata/sf0.001"


def plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


class TestScanPruning:
    def test_projection_prunes_scan_columns(self, spark):
        import __spark_entry__ as em

        df = em.q_projection(spark, SF)
        txt = formatted(df)
        # ReadSchema of the parquet scan must carry ONLY the 4 projected
        # columns — a scan reading all 16 lineitem columns for a
        # 4-column projection is wrong at any scale
        read = [ln for ln in txt.splitlines() if "ReadSchema" in ln]
        assert read, txt
        schema_line = read[0]
        for col in ("l_orderkey", "l_linenumber", "l_quantity",
                    "l_extendedprice"):
            assert col in schema_line
        assert "l_comment" not in schema_line
        assert "l_shipdate" not in schema_line

    def test_filter_pushed_to_scan(self, spark):
        # NB: the supplier table — other test modules .cache() documents/
        # events, and the CacheManager would substitute an
        # InMemoryTableScan for any matching plan fragment, hiding the
        # parquet scan this test asserts on
        sup = (
            spark.read.parquet(f"{SF}/supplier.parquet")
            .where(F.col("s_suppkey") < 100)
            .select("s_suppkey")
        )
        txt = formatted(sup)
        assert "PushedFilters" in txt
        assert "LessThan(s_suppkey,100)" in txt.replace(" ", "")


class TestTopK:
    def test_topk_is_take_ordered(self, spark):
        # sort+limit must plan TakeOrderedAndProject (per-partition top-k,
        # tiny driver merge), NOT a global sort
        import __spark_entry__ as em

        assert "TakeOrderedAndProject" in plan(em.q_topk(spark, SF))

    def test_select_top_fraction_is_take_ordered(self, spark):
        # the round-1 version used an un-partitioned window = single
        # partition execution; this pins the fix
        import __spark_entry__ as em

        p = plan(em.q_select_top_fraction(spark, SF))
        assert "TakeOrderedAndProject" in p
        assert "Window" not in p


class TestJoinStrategies:
    def test_small_dim_join_broadcasts(self, spark):
        import __spark_entry__ as em

        assert "BroadcastHashJoin" in plan(em.q_column_merge_join(spark, SF))

    def test_asof_window_single_shuffle(self, spark):
        # union-tag-window as-of: exactly ONE exchange (the window
        # partitionBy) on the query path — a second shuffle would double
        # the dominant cost of the throughput-critical operator
        from featurescreening_jl_spark.operators.asof_join import asof_join

        ev = spark.read.parquet(f"{SF}/events.parquet")
        q = ev.select("event_id", "user_id", "ts")
        s = ev.select("user_id", "ts", F.col("value").alias("v"))
        out = asof_join(q, s, on="ts", by="user_id", value_cols=["v"],
                        strategy="window")
        n_exchanges = plan(out).count("Exchange hashpartitioning")
        assert n_exchanges == 1, plan(out)


class TestFeaturizeShape:
    def test_single_sort_for_window_features(self, spark):
        # all turn features share one (conv_id / ts, turn_idx) window
        # ordering; the plan must not sort once per feature
        from featurescreening_jl_spark.operators.window_features import (
            turn_features,
        )
        from featurescreening_jl_spark.sources.transcripts import (
            synthetic_transcripts,
        )

        t = synthetic_transcripts(spark, 50, seed=1)
        out = turn_features(t, keep_text=False)
        p = plan(out)
        # conv_id-keyed exchanges: sessionize + feature windows must share
        # ONE shuffle; the session-scoped windows add no new exchange
        # because (conv_id, session_id) is a refinement of conv_id
        assert p.count("Exchange hashpartitioning") <= 1, p

    def test_keep_text_false_excludes_text_from_exchange(self, spark):
        from featurescreening_jl_spark.operators.window_features import (
            turn_features,
        )
        from featurescreening_jl_spark.sources.transcripts import (
            synthetic_transcripts,
        )

        t = synthetic_transcripts(spark, 50, seed=1)
        slim = turn_features(t, keep_text=False)
        # cum_tool_calls forces the window (and its exchange) to survive
        # pruning; the exchange's Input column list must carry the derived
        # text_len but NOT the raw text
        txt = formatted(slim.select("conv_id", "turn_idx", "cum_tool_calls",
                                    "lag1_text_len"))
        assert "Exchange" in txt, txt
        import re

        section = txt[txt.index(") Exchange"):]
        input_line = [ln for ln in section.splitlines() if "Input" in ln][0]
        assert "text_len#" in input_line
        assert re.search(r"\btext#", input_line) is None, input_line
        wide = turn_features(t, keep_text=True)
        assert "text" in wide.columns and "text" not in slim.columns


def optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


class TestHofBindingPlanShape:
    """Pin the lambda-variable-binding fixes for the four HOF
    re-evaluation sites (shingles, winnow_fingerprints, repetition_stats,
    assign_cells): each expensive subexpression must stay bound through
    ``transform(array(x), f)`` so per-element lambda eval can't re-compute
    it O(len) times per row. The assertion counts the expensive marker in
    the OPTIMIZED plan; removing the binding (or a Catalyst rewrite of
    transform(array(x), f) → f(x)) clones the expression into lambda
    bodies and the count jumps past the threshold (measured regressed
    counts noted per test). A downstream explode is included where that
    was the historical CollapseProject/InferFiltersFromGenerate trigger."""

    def test_shingles_norm_not_cloned_into_lambda(self, spark):
        from featurescreening_jl_spark.operators.dedup import shingles

        docs = spark.createDataFrame(
            [(1, "a b c d e f g")], ["doc_id", "text"]
        )
        sh = docs.select("doc_id", shingles(F.col("text")).alias("s"))
        ex = sh.select("doc_id", F.explode("s").alias("g"))
        # bound: 3 (project + generate + inferred filter); unbound
        # regression measured: 4+ (cloned into the per-index lambda)
        assert optimized(ex).count("regexp_replace") <= 3, optimized(ex)

    def test_winnow_grams_not_cloned_into_window_lambda(self, spark):
        from featurescreening_jl_spark.operators.text_analysis import (
            winnow_fingerprints,
        )

        docs = spark.createDataFrame(
            [(1, "abcdefghij klmnop qrstuv")], ["doc_id", "text"]
        )
        wf = winnow_fingerprints(docs)
        ex = wf.select("doc_id", F.explode("fingerprints").alias("fp"))
        # bound: 3 md5 renderings; unbound regression measured: 6 (the
        # full md5-gram array cloned into the per-window lambda — the
        # O(len²) 16× slowdown fixed in round 3)
        assert optimized(ex).count("md5") <= 3, optimized(ex)

    def test_repetition_stats_split_not_cloned(self, spark):
        from featurescreening_jl_spark.operators.text_analysis import (
            repetition_stats,
        )

        docs = spark.createDataFrame(
            [(1, "a b a b a b c d")], ["doc_id", "text"]
        )
        rs = repetition_stats(docs)
        # bound: 4 regexp_replace renderings (normalization reused across
        # the line/bigram branches); inlining bigrams into run_stats adds
        # a full extra clone per lambda site
        assert optimized(rs).count("regexp_replace") <= 4, optimized(rs)

    def test_assign_cells_dots_evaluated_once(self, spark):
        import numpy as np

        from featurescreening_jl_spark.operators.ivf import assign_cells

        emb = spark.createDataFrame([(1, [1.0, 0.0])], ["id", "embedding"])
        cents = np.array([[1.0, 0.0], [0.0, 1.0]])
        ac = assign_cells(emb, cents)
        txt = optimized(ac)
        # the n_cells×dim dot-product array must be computed ONCE per row:
        # inlining `dots` into both array_position and array_max doubles
        # the zip_with/aggregate expression tree
        assert txt.count("zip_with") == 1, txt
        assert txt.count("aggregate(") == 1, txt


class TestRound4PlanShapes:
    def test_target_encode_single_shuffle(self, spark):
        # one exchange (the per-key window partition), nothing else
        from featurescreening_jl_spark.operators.feature_encoding import (
            pit_target_encode,
        )

        ev = spark.read.parquet(f"{SF}/events.parquet")
        out = pit_target_encode(
            ev, "user_id", "value", ts_col="ts", prior=1.0, smoothing=20.0
        )
        assert plan(out).count("Exchange hashpartitioning") == 1, plan(out)

    def test_decayed_closed_form_single_shuffle(self, spark):
        from featurescreening_jl_spark.operators.feature_encoding import (
            decayed_time_features,
        )

        ev = spark.read.parquet(f"{SF}/events.parquet")
        out = decayed_time_features(
            ev, ["user_id"], {"d": F.lit(1.0)}, ts_col="ts",
            order_cols=["event_id"],
        )
        assert plan(out).count("Exchange hashpartitioning") == 1, plan(out)

    def test_rolling_folds_and_projection_are_map_only(self, spark):
        # no shuffle anywhere: fold explode and the JL projection are
        # pure per-row expressions against broadcast literals
        from featurescreening_jl_spark.operators.feature_encoding import (
            rolling_origin_folds,
        )
        from featurescreening_jl_spark.operators.similarity import (
            project_embeddings,
        )

        ev = spark.read.parquet(f"{SF}/events.parquet")
        folds = rolling_origin_folds(
            ev, ["2024-01-08", "2024-01-15"], ts_col="ts"
        )
        assert "Exchange" not in plan(folds), plan(folds)
        emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("embedding"),
        )
        proj = project_embeddings(emb, in_dim=64, out_dim=8)
        assert "Exchange" not in plan(proj), plan(proj)

    def test_mask_boilerplate_broadcasts_boiler_set(self, spark):
        # the positions⋈boilerplate join must be a broadcast hash join in
        # the STATIC plan (not an AQE discovery), so the grams table's
        # only exchange is the df-aggregate
        from featurescreening_jl_spark.operators.text_analysis import (
            mask_repeated_ngrams,
        )

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        out = mask_repeated_ngrams(docs, n=4, min_df=5)
        txt = plan(out)
        assert "BroadcastHashJoin" in txt, txt

    def test_sft_pairs_single_shuffle(self, spark):
        from featurescreening_jl_spark.operators.conversations import (
            sft_pairs,
        )

        ev = spark.read.parquet(f"{SF}/events.parquet").select(
            F.col("user_id").cast("string").alias("conv_id"),
            F.col("event_id").alias("turn_idx"),
            F.when(F.col("event_id") % 2 == 0, "user")
            .otherwise("assistant")
            .alias("role"),
            F.col("event_type").alias("text"),
        )
        out = sft_pairs(ev)
        assert plan(out).count("Exchange hashpartitioning") == 1, plan(out)


class TestPointInTimePlanShapes:
    def test_zscore_and_slope_share_one_shuffle_and_sort(self, spark):
        """expanding_zscore + trailing_slope composed on the same key/order
        must plan ONE Exchange and ONE Sort (two Window nodes over the
        shared clustering) — the 'one window shuffle for all features'
        contract of the featurization layer."""
        from featurescreening_jl_spark.operators.window_features import (
            expanding_zscore,
            trailing_slope,
        )
        from featurescreening_jl_spark.sources.transcripts import (
            synthetic_transcripts,
        )
        from pyspark.sql import functions as F

        t = synthetic_transcripts(spark, n_conversations=5, seed=1)
        t = t.withColumn("y", F.length("text").cast("long"))
        p = plan(trailing_slope(expanding_zscore(t, "y"), "y", k=5))
        assert p.count("Exchange") == 1, p
        assert p.count("+- Sort ") == 1, p
        assert p.count("Window") == 2, p


class TestUnitAndPqBindingPlanShape:
    def test_unit_norm_evaluated_once(self, spark):
        """unit()'s norm aggregate must stay struct-bound: inlining it
        into the per-element scale lambda re-computes the full
        sum-of-squares fold for EVERY element (O(dim²) per row)."""
        from featurescreening_jl_spark.functions.vector import unit

        emb = spark.createDataFrame(
            [(1, [3.0, 4.0])], ["id", "embedding"]
        )
        u = emb.select("id", unit(F.col("embedding")).alias("u"))
        txt = optimized(u)
        assert txt.count("aggregate(") == 1, txt

    def test_pq_encode_one_codebook_walk(self, spark):
        """pq_encode must plan ONE fused walk over the 3-D codebook
        literal — the unrolled per-subspace form (m separate argmin
        subtrees) multiplied plan-analysis + JIT cost ~m×."""
        import numpy as np

        from featurescreening_jl_spark.operators.pq import (
            pq_encode,
            random_codebooks,
        )

        emb = spark.createDataFrame(
            [(1, [float(i) for i in range(8)])], ["id", "embedding"]
        )
        books = random_codebooks(2, 4, 4, seed=17)
        txt = optimized(pq_encode(emb, books))
        # one argmax (array_position/array_max pair) inside the fused
        # per-subspace lambda — the unrolled regression shows m of each
        assert txt.count("array_position") == 1, txt
        assert txt.count("array_max") == 1, txt
        # the unit norm is still bound once
        assert txt.count("SQRT") == 1, txt


class TestPartitionPruning:
    """The two storage-pruning levers a 100 TB layout lives on: static
    partition pruning (a literal predicate on the partition column never
    lists non-matching directories) and dynamic partition pruning (a
    selective dim-side filter prunes fact partitions at RUNTIME through
    the join key — the star-join pattern of the corpus lake)."""

    def _write_facts(self, spark, tmp_path):
        facts = spark.range(4000).select(
            (F.col("id") % 20).alias("day"), F.col("id").alias("v")
        )
        path = str(tmp_path / "facts")
        facts.write.mode("overwrite").partitionBy("day").parquet(path)
        return spark.read.parquet(path)

    def test_static_partition_pruning(self, spark, tmp_path):
        f = self._write_facts(spark, tmp_path)
        p = plan(f.where(F.col("day") == 5))
        scan = [l for l in p.splitlines() if "PartitionFilters" in l]
        assert scan and "(day" in scan[0], p
        # the literal lands in PartitionFilters (directory-level skip),
        # NOT in DataFilters (row-level post-read)
        assert "DataFilters: []" in scan[0], scan[0]

    def test_dynamic_partition_pruning_through_join(self, spark, tmp_path):
        f = self._write_facts(spark, tmp_path)
        dim = spark.range(20).select(
            F.col("id").alias("day"),
            F.when(F.col("id") < 3, "hot").otherwise("cold").alias("tag"),
        )
        dpath = str(tmp_path / "dim")
        dim.write.mode("overwrite").parquet(dpath)
        hot = spark.read.parquet(dpath).where(F.col("tag") == "hot")
        j = f.join(hot, "day")
        assert j.count() == 600  # 3 hot days x 200 rows/day
        p = plan(j)
        fact_scan = [
            l for l in p.splitlines()
            if "PartitionFilters" in l and "facts" in l
        ]
        assert fact_scan and "dynamicpruning" in fact_scan[0], p


class TestAQESkewJoin:
    def test_skewed_join_splits_at_runtime(self, spark):
        """AQE skew-join is the engine's answer to hot keys it was NOT
        pre-salted for: the skewed shuffle partition splits at runtime
        (SortMergeJoin(skew=true) + AQEShuffleRead skewed in the FINAL
        adaptive plan). Payload is sha2 (incompressible) — with a
        compressible pad the skewed partition's shuffle BYTES sit under
        the threshold and the rule correctly declines, which is also why
        production thresholds are sized on observed shuffle sizes."""
        keep = {
            k: spark.conf.get(k)
            for k in (
                "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
                "spark.sql.adaptive.advisoryPartitionSizeInBytes",
                "spark.sql.autoBroadcastJoinThreshold",
            )
        }
        try:
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2"
            )
            spark.conf.set(
                "spark.sql.adaptive.skewJoin."
                "skewedPartitionThresholdInBytes",
                "100KB",
            )
            spark.conf.set(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes", "100KB"
            )
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            left = spark.range(1_000_000).select(
                F.when(F.col("id") % 3 != 0, 0)
                .otherwise(F.col("id") % 97)
                .alias("k"),
                F.sha2(F.col("id").cast("string"), 256).alias("pad"),
            )
            right = spark.range(97).select(
                F.col("id").alias("k"), F.lit("r").alias("rv")
            )
            j = left.join(right, "k").select(
                F.sum(F.length("pad")).alias("s")
            )
            [row] = j.collect()  # executes THIS QueryExecution (final plan)
            assert row["s"] == 1_000_000 * 64
            p = plan(j)
            assert "isFinalPlan=true" in p, p
            assert "SortMergeJoin(skew=true)" in p, p
            # reader may read "skewed" alone or "coalesced and skewed"
            # depending on the session's shuffle-partition count
            assert any(
                "AQEShuffleRead" in l and "skewed" in l
                for l in p.splitlines()
            ), p
        finally:
            for k, v in keep.items():
                spark.conf.set(k, v)


class TestCubeSinglePass:
    def test_cube_is_one_scan_one_shuffle(self, spark):
        """CUBE must plan ONE FileScan + Expand + a single aggregation
        exchange — not a union of per-grouping scans"""
        import __spark_entry__ as em

        out = em.queries()["corpus_cube"](spark, SF)
        p = plan(out)
        assert p.count("FileScan") == 1, p
        assert "Expand" in p, p
        # exactly one AGGREGATION exchange (keyed on the grouping id);
        # the entry's _t helper adds its own read-side repartition, which
        # is not the cube's doing
        agg_exchanges = [
            l for l in p.splitlines()
            if "Exchange hashpartitioning" in l and "spark_grouping_id" in l
        ]
        assert len(agg_exchanges) == 1, p

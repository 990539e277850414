"""Corpus-prep operators added late in round 3: chat-template rendering
(operators/conversations.render_chat), fixed-size overlapping chunking
(operators/text_analysis.chunk_documents), token-length histograms
(operators/text_analysis.token_length_histogram), and cluster-representative
dedup (operators/dedup.keep_best_per_cluster).

Scale properties pinned here: chunk_documents must stay MAP-ONLY (zero
exchanges — sequence → explode → substring runs inside the scan stage),
and render_chat must order turns deterministically regardless of input
row order (array_sort on the struct, not input arrival).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from featurescreening_jl_spark.operators.conversations import render_chat
from featurescreening_jl_spark.operators.dedup import (
    keep_best_per_cluster,
    minhash_lsh_pairs_incremental,
)
from featurescreening_jl_spark.operators.lm import (
    char_ngram_counts,
    ngram_lm_score,
)
from featurescreening_jl_spark.operators.text_analysis import (
    chunk_documents,
    length_quantiles,
    token_length_histogram,
)

pytestmark = pytest.mark.spark


class TestRenderChat:
    def test_golden_and_order_invariance(self, spark):
        # turns deliberately out of order; one NULL text
        rows = [
            ("c1", 2, "user", "third"),
            ("c1", 0, "system", "first"),
            ("c1", 1, "assistant", None),
            ("c2", 0, "user", "solo turn"),
        ]
        df = spark.createDataFrame(
            rows, ["conv_id", "turn_idx", "role", "text"]
        )
        out = {r["conv_id"]: r for r in render_chat(df).collect()}
        assert (
            out["c1"]["rendered"]
            == "<|system|>first\n<|assistant|>\n<|user|>third"
        )
        assert out["c1"]["n_turns"] == 3
        # whitespace tokens of the rendered string (newlines separate)
        assert out["c1"]["n_tokens"] == 3
        assert out["c2"]["rendered"] == "<|user|>solo turn"
        assert out["c2"]["n_tokens"] == 2

        # shuffled input must render identically
        out2 = {
            r["conv_id"]: r["rendered"]
            for r in render_chat(
                df.orderBy(F.rand(seed=7))
            ).collect()
        }
        assert out2 == {k: v["rendered"] for k, v in out.items()}


class TestChunkDocuments:
    def test_boundaries_and_coverage(self, spark):
        df = spark.createDataFrame(
            [
                (0, "abcdefghij"),  # 10 chars: chunks at 0,6 (size 8, ov 2)
                (1, "abc"),  # shorter than chunk → exactly one chunk
                (2, ""),  # empty → one empty chunk
                (3, "abcdefgh"),  # exactly chunk_chars → one chunk
            ],
            ["doc_id", "text"],
        )
        out = chunk_documents(df, chunk_chars=8, overlap=2).collect()
        by_doc: dict[int, list] = {}
        for r in sorted(out, key=lambda r: (r["doc_id"], r["chunk_idx"])):
            by_doc.setdefault(r["doc_id"], []).append(r)
        assert [c["chunk_text"] for c in by_doc[0]] == ["abcdefgh", "ghij"]
        assert [c["chunk_start"] for c in by_doc[0]] == [0, 6]
        assert [c["chunk_text"] for c in by_doc[1]] == ["abc"]
        assert [c["chunk_text"] for c in by_doc[2]] == [""]
        assert [c["chunk_text"] for c in by_doc[3]] == ["abcdefgh"]
        # every character covered: union of [start, start+len) == doc
        for doc_id, chunks in by_doc.items():
            covered = set()
            for c in chunks:
                covered |= set(
                    range(c["chunk_start"], c["chunk_start"] + len(c["chunk_text"]))
                )
            n = {0: 10, 1: 3, 2: 0, 3: 8}[doc_id]
            assert covered == set(range(n))

    def test_rejects_bad_overlap(self, spark):
        df = spark.createDataFrame([(0, "x")], ["doc_id", "text"])
        with pytest.raises(ValueError):
            chunk_documents(df, chunk_chars=8, overlap=8)

    def test_map_only_plan(self, spark):
        df = spark.createDataFrame([(0, "abc" * 100)], ["doc_id", "text"])
        plan = (
            chunk_documents(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan


class TestTokenLengthHistogram:
    def test_buckets_and_overflow(self, spark):
        df = spark.createDataFrame(
            [
                (0, ""),  # 0 tokens → bucket 0
                (1, "a b c"),  # 3 tokens → bucket 0
                (2, " ".join(["t"] * 4)),  # 4 → bucket 1 (width 4)
                (3, " ".join(["t"] * 100)),  # clamps to max_bucket 2
            ],
            ["doc_id", "text"],
        )
        out = {
            r["bucket"]: r
            for r in token_length_histogram(
                df, bucket_tokens=4, max_bucket=2
            ).collect()
        }
        assert out[0]["n_docs"] == 2 and out[0]["sum_tokens"] == 3
        assert out[0]["lo_tokens"] == 0
        assert out[1]["n_docs"] == 1 and out[1]["sum_tokens"] == 4
        assert out[1]["lo_tokens"] == 4
        assert out[2]["n_docs"] == 1 and out[2]["sum_tokens"] == 100
        assert out[2]["lo_tokens"] == 8


class TestKeepBestPerCluster:
    def test_argmax_ties_and_singletons(self, spark):
        docs = spark.createDataFrame(
            [(i, s) for i, s in [(1, 10.0), (2, 30.0), (3, 30.0),
                                 (4, 5.0), (5, 99.0)]],
            ["doc_id", "score"],
        )
        # clusters: {1,2,3} (chain), {4} via pair 4-4? no — 4 unpaired,
        # 5 unpaired → singletons
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3)], ["id_a", "id_b"]
        )
        out = {r["doc_id"]: r for r in
               keep_best_per_cluster(docs, pairs, "score").collect()}
        # cluster {1,2,3}: max score 30 shared by 2 and 3 → lowest id (2)
        assert set(out) == {2, 4, 5}
        assert out[2]["n_docs"] == 3 and out[2]["component"] == 1
        assert out[4]["n_docs"] == 1 and out[4]["component"] == 4
        assert out[5]["n_docs"] == 1 and out[5]["component"] == 5

    @pytest.mark.slow
    def test_mega_cluster_100k_docs_one_component(self, spark):
        # pathological shape: ONE component holds all 100k paired docs
        # (star graph 0—i). The argmax is a min_by aggregate with map-side
        # partials, so no single task ever sorts the whole cluster — this
        # would OOM/straggle under a row_number window at corpus scale.
        n = 100_000
        docs = spark.range(n).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 997).cast("double").alias("score"),
        )
        pairs = spark.range(1, n).select(
            F.lit(0).cast("long").alias("id_a"), F.col("id").alias("id_b")
        )
        out = keep_best_per_cluster(docs, pairs, "score").collect()
        assert len(out) == 1
        r = out[0]
        # max score 996 first reached at doc_id 996 (lowest-id tiebreak)
        assert r["component"] == 0
        assert r["n_docs"] == n
        assert r["doc_id"] == 996 and r["score"] == 996.0


class TestNgramLmScore:
    def test_self_scored_golden(self, spark):
        import math

        # grams (n=3): "abab" -> aba, bab; "ab" -> none (too short, no row)
        df = spark.createDataFrame(
            [(0, "abab"), (1, "ab")], ["doc_id", "text"]
        )
        model = {r["gram"]: r["c"] for r in char_ngram_counts(df).collect()}
        assert model == {"aba": 1, "bab": 1}
        out = {r["doc_id"]: r for r in ngram_lm_score(df).collect()}
        # N=2 occurrences, V=2 distinct -> p(g) = (1+1)/(2+2) = 0.5 each
        assert set(out) == {0}
        assert out[0]["n_ngrams"] == 2
        assert out[0]["avg_logp"] == pytest.approx(math.log(0.5))

    def test_external_model_unseen_grams(self, spark):
        import math

        corpus = spark.createDataFrame([(0, "abab")], ["doc_id", "text"])
        model = char_ngram_counts(corpus)
        shard = spark.createDataFrame([(9, "xyz")], ["doc_id", "text"])
        out = ngram_lm_score(shard, model=model).collect()
        # unseen gram "xyz": p = (0+1)/(2+2) = 0.25 via the smoothing floor
        assert len(out) == 1
        assert out[0]["n_ngrams"] == 1
        assert out[0]["avg_logp"] == pytest.approx(math.log(0.25))

    def test_normalization_matches_text_stats(self, spark):
        # whitespace collapses and case folds before gramming
        df = spark.createDataFrame([(0, "A  B"), (1, "a b")],
                                   ["doc_id", "text"])
        out = {r["doc_id"]: r["avg_logp"]
               for r in ngram_lm_score(df).collect()}
        assert out[0] == pytest.approx(out[1])


class TestLengthQuantiles:
    def test_linear_interpolation_golden(self, spark):
        # token counts per group g: [1, 2, 3, 10]
        df = spark.createDataFrame(
            [("g", "t"), ("g", "t t"), ("g", "t t t"),
             ("g", " ".join(["t"] * 10))],
            ["lang", "text"],
        )
        r = length_quantiles(df, by="lang", probs=(0.5, 0.9)).collect()[0]
        # quantile_cont: p50 = 2.5; p90 = 3 + 0.7*(10-3) = 7.9
        assert r["n_docs"] == 4
        assert r["p50"] == pytest.approx(2.5)
        assert r["p90"] == pytest.approx(7.9)

    def test_approx_tracks_exact_on_skewed_data(self, spark):
        # heavy-tailed token counts: 900 docs of 1-9 tokens, 90 of ~100,
        # 10 of ~1000 — the shape where a naive sample misses the tail.
        rows = []
        for i in range(900):
            rows.append(("en", " ".join(["t"] * (1 + i % 9))))
        for i in range(90):
            rows.append(("en", " ".join(["t"] * (100 + i))))
        for i in range(10):
            rows.append(("en", " ".join(["t"] * (1000 + 7 * i))))
        df = spark.createDataFrame(rows, ["lang", "text"]).repartition(8)
        probs = (0.5, 0.9, 0.99)
        exact = length_quantiles(df, by="lang", probs=probs).collect()[0]
        appr = length_quantiles(
            df, by="lang", probs=probs, approx=True, accuracy=10_000
        ).collect()[0]
        assert appr["n_docs"] == exact["n_docs"] == 1000
        # accuracy=10000 on n=1000 → rank error < 1 row, so the approx
        # value must be one of the two data values BRACKETING the exact
        # (interpolated) quantile. Sorted data: 100× each of 1..9, then
        # 100..189, then 1000,1007,...,1063.
        # p50: index 499.5 → exact 5.5, brackets {5, 6}
        assert exact["p50"] == pytest.approx(5.5)
        assert appr["p50"] in (5.0, 6.0)
        # p90: index 899.1 → exact 9 + 0.1*(100-9) = 18.1, brackets {9, 100}
        assert exact["p90"] == pytest.approx(18.1)
        assert appr["p90"] in (9.0, 100.0)
        # p99: index 989.01 → exact 189 + 0.01*(1000-189), brackets {189, 1000}
        assert exact["p99"] == pytest.approx(197.11)
        assert appr["p99"] in (189.0, 1000.0)


class TestMinhashIncremental:
    def test_exact_copy_found_distinct_not(self, spark):
        base = (
            "the quick brown fox jumps over the lazy dog and keeps "
            "running through the quiet field until the sun goes down"
        )
        other = (
            "completely different content about spark physical plans "
            "and shuffle partitioning strategy at terabyte scale today"
        )
        index = spark.createDataFrame(
            [(0, base), (1, other)], ["doc_id", "text"]
        )
        new = spark.createDataFrame(
            [(100, base), (101, "unrelated fresh shard text with nothing "
                                "shared across any shingle at all here")],
            ["doc_id", "text"],
        )
        out = minhash_lsh_pairs_incremental(
            index, new, jaccard_threshold=0.8
        ).collect()
        assert [(r["new_id"], r["index_id"], r["jaccard"])
                for r in out] == [(100, 0, 1.0)]

    def test_banding_matches_self_join_scheme(self, spark):
        # a pair that collides for the self-join variant must collide
        # incrementally too (shared _band_table) — near-identical docs
        from featurescreening_jl_spark.operators.dedup import (
            minhash_lsh_pairs,
        )

        a = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lambda mu nu xi omicron pi rho sigma tau upsilon")
        b = a + " phi"
        both = spark.createDataFrame([(0, a), (1, b)], ["doc_id", "text"])
        self_pairs = minhash_lsh_pairs(both, jaccard_threshold=0.7).collect()
        inc = minhash_lsh_pairs_incremental(
            both.where(F.col("doc_id") == 0),
            both.where(F.col("doc_id") == 1),
            jaccard_threshold=0.7,
        ).collect()
        assert (len(self_pairs) == 1) == (len(inc) == 1)
        if inc:
            assert inc[0]["jaccard"] == pytest.approx(
                self_pairs[0]["jaccard"]
            )


class TestPerplexityBuckets:
    def _docs(self, spark):
        # three languages, enough docs per lang for meaningful tertiles
        rows = []
        for i in range(30):
            lang = ["en", "de", "fr"][i % 3]
            # vary typicality: repeat common trigrams more in low-i docs
            body = ("the cat sat " * (1 + i % 5)) + f"tail{i % 7} " * (i % 4)
            rows.append((i, body.strip(), lang))
        return spark.createDataFrame(
            rows, "doc_id long, text string, lang string"
        )

    def test_exact_tiles_per_language(self, spark):
        from featurescreening_jl_spark.operators.lm import perplexity_buckets

        docs = self._docs(spark)
        out = perplexity_buckets(docs, n=3, n_buckets=3).toPandas()
        assert len(out) == 30
        for lang, grp in out.groupby("lang"):
            sizes = grp["bucket"].value_counts()
            # ntile: tile sizes differ by at most one, all tiles present
            assert set(sizes.index) == {1, 2, 3}
            assert sizes.max() - sizes.min() <= 1
            # bucket 1 holds the highest (most typical) scores
            b1 = grp[grp["bucket"] == 1]["avg_logp"].min()
            b3 = grp[grp["bucket"] == 3]["avg_logp"].max()
            assert b1 >= b3

    def test_approx_agrees_with_exact_on_head_vs_tail(self, spark):
        from featurescreening_jl_spark.operators.lm import perplexity_buckets

        docs = self._docs(spark)
        exact = {
            r["doc_id"]: r["bucket"]
            for r in perplexity_buckets(docs, n=3, n_buckets=3).collect()
        }
        approx = {
            r["doc_id"]: r["bucket"]
            for r in perplexity_buckets(
                docs, n=3, n_buckets=3, approx=True
            ).collect()
        }
        assert set(approx) == set(exact)
        assert all(b in (1, 2, 3) for b in approx.values())
        # boundary ties may land one tile apart; never head<->tail flips
        assert all(abs(approx[k] - exact[k]) <= 1 for k in exact)
        # the buckets broadly agree (>= 70% identical on this data)
        same = sum(approx[k] == exact[k] for k in exact)
        assert same >= 0.7 * len(exact)

    def test_short_docs_have_no_row(self, spark):
        from featurescreening_jl_spark.operators.lm import perplexity_buckets

        docs = spark.createDataFrame(
            [(1, "ab", "en"), (2, "abcdef abcdef", "en"),
             (3, "abcdef abcdff", "en"), (4, "zzz qqq xxx", "en")],
            "doc_id long, text string, lang string",
        )
        ids = {
            r["doc_id"] for r in perplexity_buckets(docs, n=3).collect()
        }
        assert ids == {2, 3, 4}


class TestQualityClassifier:
    def _docs(self, spark):
        import numpy as np

        rng = np.random.default_rng(11)
        rows = []
        for i in range(240):
            if i % 2 == 0:  # "reference" style: longer, stopword-rich
                n = int(rng.integers(25, 60))
                words = rng.choice(
                    ["the", "of", "and", "value", "table", "merge", "a",
                     "is", "to", "in"], n)
                src = "wiki"
            else:  # "crawl" style: short, shouty, punctuation-heavy
                n = int(rng.integers(3, 10))
                words = rng.choice(
                    ["BUY!!!", "CLICK", "WIN$$$", "FREE!!", "NOW!!"], n)
                src = "crawl"
            rows.append((i, " ".join(words), src))
        return spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )

    def test_separates_reference_from_crawl(self, spark):
        from featurescreening_jl_spark.operators.quality_filter import (
            quality_classifier_scores,
        )

        docs = self._docs(spark)
        out = quality_classifier_scores(docs, ["wiki"]).toPandas()
        assert len(out) == 240
        pos = out[out["label"] == 1]["quality_score"]
        neg = out[out["label"] == 0]["quality_score"]
        # clearly separable synthetic data: the model must separate it
        assert pos.mean() > 0.9 and neg.mean() < 0.1
        # AUC: every positive above every negative here
        assert pos.min() > neg.max()

    def test_deterministic_across_fits(self, spark):
        from featurescreening_jl_spark.operators.quality_filter import (
            quality_classifier_scores,
        )

        docs = self._docs(spark)
        a = {
            r["doc_id"]: r["quality_score"]
            for r in quality_classifier_scores(docs, ["wiki"]).collect()
        }
        b = {
            r["doc_id"]: r["quality_score"]
            for r in quality_classifier_scores(
                docs.repartition(7), ["wiki"]
            ).collect()
        }
        # 4dp rounding absorbs LBFGS float-reduction order differences
        diffs = [abs(a[k] - b[k]) for k in a]
        assert max(diffs) <= 1e-3

    def test_empty_positive_sources_raises(self, spark):
        import pytest as _pytest

        from featurescreening_jl_spark.operators.quality_filter import (
            quality_classifier_scores,
        )

        with _pytest.raises(ValueError):
            quality_classifier_scores(self._docs(spark), [])

    def test_fit_score_split_matches_composed(self, spark):
        # fit_quality_classifier + score_quality must reproduce
        # quality_classifier_scores exactly — the split exists so the
        # deterministic scoring half can be value-oracled (and frozen
        # models replayed across sessions) without the iterative fit
        from featurescreening_jl_spark.operators.quality_filter import (
            fit_quality_classifier,
            quality_classifier_scores,
            score_quality,
        )

        docs = self._docs(spark)
        model = fit_quality_classifier(docs, ["wiki"])
        split = {
            r["doc_id"]: r["quality_score"]
            for r in score_quality(docs, model).collect()
        }
        composed = {
            r["doc_id"]: r["quality_score"]
            for r in quality_classifier_scores(docs, ["wiki"]).collect()
        }
        assert max(abs(split[k] - composed[k]) for k in split) <= 1e-3

    def test_frozen_model_rounds_and_rejects_bad_arity(self, spark):
        import pytest as _pytest

        from featurescreening_jl_spark.operators.quality_filter import (
            QualityModel,
            score_quality,
        )

        m = QualityModel(
            coefficients=(0.123456789, -0.5, 0.0, 1e-9, 2.0, -3.0),
            intercept=-1.23456789,
        )
        r = m.rounded(4)
        assert r.coefficients[0] == 0.1235 and r.intercept == -1.2346
        with _pytest.raises(ValueError, match="coefficients"):
            score_quality(
                self._docs(spark),
                QualityModel(coefficients=(1.0,), intercept=0.0),
            )


class TestLeakageSafeSplit:
    """Near-dup-closure-atomic splitting (dedup.leakage_safe_split)."""

    def test_cluster_members_share_split_and_singletons_match_plain(
        self, spark
    ):
        from featurescreening_jl_spark.operators.dedup import (
            leakage_safe_split,
        )
        from featurescreening_jl_spark.operators.sampling import hash_split

        docs = spark.createDataFrame(
            [(i,) for i in range(20)], ["doc_id"]
        )
        # two closures: {0,1,2} (transitive through 1) and {7,8}
        pairs = spark.createDataFrame(
            [(0, 1), (1, 2), (7, 8)], ["id_a", "id_b"]
        )
        w = {"train": 0.75, "val": 0.125, "test": 0.125}
        out = {
            r["doc_id"]: r
            for r in leakage_safe_split(docs, pairs, w).collect()
        }
        assert len(out) == 20
        # closure atomicity
        assert out[0]["split"] == out[1]["split"] == out[2]["split"]
        assert out[7]["split"] == out[8]["split"]
        assert (
            out[0]["cluster_label"]
            == out[1]["cluster_label"]
            == out[2]["cluster_label"]
            == 0
        )
        # singletons carry their own id and match a plain hash split
        plain = {
            r["doc_id"]: r["split"]
            for r in hash_split(
                docs.selectExpr("doc_id", "doc_id AS cluster_label"),
                w,
                key_col="cluster_label",
            ).collect()
        }
        for i in set(range(20)) - {0, 1, 2, 7, 8}:
            assert out[i]["cluster_label"] == i
            assert out[i]["split"] == plain[i]

    def test_deterministic_across_partitionings(self, spark):
        from featurescreening_jl_spark.operators.dedup import (
            leakage_safe_split,
        )

        docs = spark.createDataFrame([(i,) for i in range(50)], ["doc_id"])
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(0, 10, 2)], ["id_a", "id_b"]
        )
        w = {"train": 0.9, "val": 0.1}
        a = sorted(
            map(tuple, leakage_safe_split(docs, pairs, w).collect())
        )
        b = sorted(
            map(
                tuple,
                leakage_safe_split(
                    docs.repartition(17), pairs.repartition(3), w
                ).collect(),
            )
        )
        assert a == b


class TestSoftDedupWeights:
    """Cluster-size sampling weights (dedup.soft_dedup_weights)."""

    def test_cluster_mass_is_uniform_per_distinct_item(self, spark):
        from featurescreening_jl_spark.operators.dedup import (
            soft_dedup_weights,
        )

        docs = spark.createDataFrame([(i,) for i in range(12)], ["doc_id"])
        # closures: {0,1,2,3} (chain) and {9,10}; rest singletons
        pairs = spark.createDataFrame(
            [(0, 1), (1, 2), (2, 3), (9, 10)], ["id_a", "id_b"]
        )
        out = {
            r["doc_id"]: r for r in soft_dedup_weights(docs, pairs).collect()
        }
        assert len(out) == 12
        for i in (0, 1, 2, 3):
            assert out[i]["cluster_label"] == 0
            assert out[i]["cluster_size"] == 4
            assert out[i]["weight"] == 0.25
        for i in (9, 10):
            assert out[i]["cluster_label"] == 9
            assert out[i]["cluster_size"] == 2
            assert out[i]["weight"] == 0.5
        singles = set(range(12)) - {0, 1, 2, 3, 9, 10}
        for i in singles:
            assert out[i]["cluster_label"] == i
            assert out[i]["cluster_size"] == 1
            assert out[i]["weight"] == 1.0
        # total mass == number of distinct content items (closures)
        total = sum(r["weight"] for r in out.values())
        assert abs(total - (2 + len(singles))) < 1e-9

    def test_composes_with_weighted_reservoir_schema(self, spark):
        # the advertised downstream composition: weights feed the
        # weighted sampler without reshaping
        from featurescreening_jl_spark.operators.dedup import (
            soft_dedup_weights,
        )
        from featurescreening_jl_spark.operators.sampling import (
            weighted_reservoir,
        )

        docs = spark.createDataFrame([(i,) for i in range(30)], ["doc_id"])
        pairs = spark.createDataFrame([(0, 1)], ["id_a", "id_b"])
        w = soft_dedup_weights(docs, pairs)
        picked = weighted_reservoir(
            w, k=5, weight_col="weight", key_col="doc_id", seed=7
        )
        assert picked.count() == 5


class TestSplitClosureProperties:
    """Randomized cross-checks of leakage_safe_split / soft_dedup_weights
    against a driver-side union-find reference (a few seeded graphs, not
    per-example fuzzing — Spark round-trips are too slow for hypothesis)."""

    @staticmethod
    def _union_find(n_docs, edges):
        parent = list(range(n_docs))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # min-id labeling, matching connected_components' contract
        return {i: find(i) for i in range(n_docs)}

    def test_random_graphs_match_union_find(self, spark):
        import random

        from featurescreening_jl_spark.operators.dedup import (
            leakage_safe_split,
            soft_dedup_weights,
        )

        for seed in (1, 7, 23):
            rng = random.Random(seed)
            n = 120
            edges = sorted(
                {
                    tuple(sorted(rng.sample(range(n), 2)))
                    for _ in range(rng.randint(5, 60))
                }
            )
            docs = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
            pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
            ref = self._union_find(n, edges)
            ref_sizes: dict[int, int] = {}
            for lbl in ref.values():
                ref_sizes[lbl] = ref_sizes.get(lbl, 0) + 1

            out = {
                r["doc_id"]: r
                for r in leakage_safe_split(
                    docs, pairs, {"train": 0.8, "test": 0.2}
                ).collect()
            }
            w = {
                r["doc_id"]: r
                for r in soft_dedup_weights(docs, pairs).collect()
            }
            for i in range(n):
                assert out[i]["cluster_label"] == ref[i], (seed, i)
                assert w[i]["cluster_size"] == ref_sizes[ref[i]], (seed, i)
                # atomicity: same closure -> same split
                assert out[i]["split"] == out[ref[i]]["split"], (seed, i)


class TestContextBudgetProperties:
    """Randomized cross-check of context_budget_features against a
    brute-force O(n²) window scan."""

    def test_random_conversations_match_bruteforce(self, spark):
        import random

        from featurescreening_jl_spark.operators.conversations import (
            context_budget_features,
        )

        rng = random.Random(42)
        rows = []
        ref_toks: dict[str, list[int]] = {}
        for c in range(8):
            conv = f"c{c}"
            toks = [rng.randint(0, 12) for _ in range(rng.randint(1, 40))]
            ref_toks[conv] = [max(t, 1) for t in toks]
            for i, t in enumerate(toks):
                rows.append((conv, i, " ".join(["w"] * t)))
        df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "text"])
        B = 25
        out = {
            (r["conv_id"], r["turn_idx"]): r
            for r in context_budget_features(df, B).collect()
        }
        for conv, toks in ref_toks.items():
            for i in range(len(toks)):
                # brute force: longest suffix window ending at i with
                # total tokens <= B
                best_turns, best_tokens = 0, 0
                s = 0
                for j in range(i, -1, -1):
                    s += toks[j]
                    if s > B:
                        break
                    best_turns, best_tokens = i - j + 1, s
                r = out[(conv, i)]
                assert r["ctx_turns"] == best_turns, (conv, i)
                assert r["ctx_tokens"] == best_tokens, (conv, i)
                assert r["turn_tokens"] == toks[i]

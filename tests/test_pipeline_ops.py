"""Tests for the training-data pipeline operators: dedup families,
similarity search, text analysis, multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from featurescreening_jl_spark.functions.vector import cosine
from featurescreening_jl_spark.operators.dedup import (
    dedup_exact,
    minhash_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_dedup,
    shingles,
)
from featurescreening_jl_spark.operators.multimodal import (
    attach_media_metadata,
    extract_media_features,
    sample_frames,
)
from featurescreening_jl_spark.operators.similarity import (
    brute_force_topk,
    cosine_neardup_pairs,
    lsh_topk,
)
from featurescreening_jl_spark.operators.text_analysis import document_features

pytestmark = pytest.mark.spark

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet")
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def embeddings(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet")
    df.cache().count()
    return df


class TestDedupExact:
    def test_duplicates_removed(self, spark):
        rows = [(0, "hello  world"), (1, "Hello World"), (2, "other text"),
                (3, "hello world")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = dedup_exact(df).orderBy("doc_id").toPandas()
        # normalization folds case+whitespace: 0,1,3 identical → keep 0
        assert out["doc_id"].tolist() == [0, 2]

    def test_no_normalize(self, spark):
        rows = [(0, "a"), (1, "A")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        assert dedup_exact(df, normalize=False).count() == 2


class TestMinhash:
    def test_near_dups_found_far_pairs_absent(self, spark):
        base = "the quick brown fox jumps over the lazy dog again and again today"
        near = base.replace("today", "tomorrow")
        far = "completely unrelated content about spark query planning and shuffles"
        df = spark.createDataFrame(
            [(0, base), (1, near), (2, far)], "doc_id long, text string"
        )
        pairs = minhash_lsh_pairs(df, jaccard_threshold=0.5).toPandas()
        assert {(r.id_a, r.id_b) for r in pairs.itertuples()} == {(0, 1)}

    def test_dedup_keeps_min_id(self, spark):
        base = "the quick brown fox jumps over the lazy dog again and again today"
        df = spark.createDataFrame(
            [(5, base), (9, base + " extra"), (1, "something else entirely here now")],
            "doc_id long, text string",
        )
        out = minhash_dedup(df, jaccard_threshold=0.5).orderBy("doc_id").toPandas()
        assert out["doc_id"].tolist() == [1, 5]

    def test_runs_on_real_documents(self, documents):
        pairs = minhash_lsh_pairs(
            documents.limit(200), jaccard_threshold=0.8
        )
        assert pairs.count() >= 0  # executes end-to-end


class TestSimhashAndJaccard:
    def test_simhash_dedup_identical_texts(self, spark):
        df = spark.createDataFrame(
            [(0, "aaa bbb ccc ddd"), (1, "aaa bbb ccc ddd"), (2, "xyz qrs tuv wxy")],
            "doc_id long, text string",
        )
        out = simhash_dedup(df).orderBy("doc_id").toPandas()
        assert out["doc_id"].tolist() == [0, 2]

    def test_ngram_jaccard_golden(self, spark):
        # hand-checkable: shared word trigrams
        df = spark.createDataFrame(
            [(0, "a b c d"), (1, "a b c e")], "doc_id long, text string"
        )
        out = ngram_jaccard_pairs(df, threshold=0.0).toPandas()
        # trigrams: {abc, bcd} vs {abc, bce} → jaccard = 1/3
        assert len(out) == 1
        assert abs(out["jaccard"].iloc[0] - 1 / 3) < 1e-9

    def test_shingle_contents(self, spark):
        df = spark.createDataFrame([("a b c d",)], "text string")
        got = df.select(shingles(F.col("text"), n=2).alias("s")).first()["s"]
        assert sorted(got) == ["a b", "b c", "c d"]


class TestSimilarity:
    def test_brute_force_self_is_top1(self, spark, embeddings):
        queries = embeddings.where(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        out = brute_force_topk(embeddings, queries, k=5).toPandas()
        top1 = out[out["rank"] == 1]
        assert (top1["query_id"].to_numpy() == top1["vec_id"].to_numpy()).all()
        assert np.allclose(top1["similarity"], 1.0, atol=1e-6)
        # 5 results per query, similarity non-increasing per query
        for qid, g in out.groupby("query_id"):
            assert len(g) == 5
            sims = g.sort_values("rank")["similarity"].to_numpy()
            assert (np.diff(sims) <= 1e-12).all()

    def test_lsh_recall_against_brute_force(self, spark, embeddings):
        queries = embeddings.where(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        exact = brute_force_topk(embeddings, queries, k=5).toPandas()
        approx = lsh_topk(
            embeddings, queries, k=5, dim=64, n_planes=6, n_tables=8, seed=1
        ).toPandas()
        # recall@5 ≥ 0.5 with generous tables on this tiny corpus
        hits = 0
        for qid in range(5):
            e = set(exact[exact["query_id"] == qid]["vec_id"])
            a = set(approx[approx["query_id"] == qid]["vec_id"])
            hits += len(e & a)
        assert hits / 25 >= 0.5
        # self-match always survives LSH (identical sketch)
        top1 = approx[approx["rank"] == 1]
        assert (top1["query_id"].to_numpy() == top1["vec_id"].to_numpy()).all()

    def test_neardup_pairs_threshold(self, spark):
        vecs = [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.999, 0.01, 0.0, 0.0]),   # near-dup of 0
            (2, [0.0, 1.0, 0.0, 0.0]),       # orthogonal
        ]
        df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
        pairs = cosine_neardup_pairs(df, threshold=0.95, dim=4,
                                     n_planes=4, n_tables=8).toPandas()
        assert {(r.id_a, r.id_b) for r in pairs.itertuples()} == {(0, 1)}


class TestTextAnalysis:
    def test_document_features(self, documents):
        out = document_features(documents.limit(100))
        pdf = out.toPandas()
        assert (pdf["n_chars"] == pdf["text"].str.len()).all()
        assert (pdf["n_tokens"] > 0).all()
        assert pdf["punct_ratio"].between(0, 1).all()
        assert pdf["stopword_ratio"].between(0, 1).all()
        assert pdf["lang_pred"].isin(["en", "es", "de", "fr", "und"]).all()

    def test_fingerprint_stable_and_normalizing(self, spark):
        df = spark.createDataFrame(
            [(0, "Hello  World"), (1, "hello world"), (2, "bye")],
            "doc_id long, text string",
        )
        pdf = document_features(df).toPandas()
        fp = dict(zip(pdf["doc_id"], pdf["fingerprint"]))
        assert fp[0] == fp[1] != fp[2]


class TestMultimodal:
    @pytest.fixture(scope="class")
    def media(self, spark):
        rows = [
            (0, "image", b"\x89PNGfakebytes0", (64, 64, None, "png")),
            (1, "image", b"\x89PNGfakebytes0", (64, 64, None, "png")),  # dup payload
            (2, "video", b"\x00\x00vid", (320, 240, 3500, "h264")),
            (3, "audio", b"RIFFfake", (None, None, 2000, "pcm")),
        ]
        return spark.createDataFrame(
            rows,
            "media_id long, kind string, payload binary, "
            "meta struct<width:int, height:int, duration_ms:int, codec:string>",
        )

    def test_metadata_and_payload_dedup_keys(self, media):
        out = attach_media_metadata(media).toPandas()
        assert (out["payload_bytes"] > 0).all()
        h = dict(zip(out["media_id"], out["payload_hash"]))
        assert h[0] == h[1] != h[2]

    def test_feature_extraction_deterministic(self, media):
        a = extract_media_features(media).orderBy("media_id").toPandas()
        b = extract_media_features(media).orderBy("media_id").toPandas()
        assert a["feature"].map(tuple).tolist() == b["feature"].map(tuple).tolist()
        assert all(len(f) == 16 for f in a["feature"])
        # identical payloads → identical features
        assert tuple(a["feature"][0]) == tuple(a["feature"][1])

    def test_frame_sampling(self, media):
        frames = sample_frames(media.where(F.col("kind") == "video"),
                               every_ms=1000).toPandas()
        assert frames["frame_ts_ms"].tolist() == [0, 1000, 2000]


def _encode_png(px, filters=None) -> bytes:
    """Spec-following test encoder: 8-bit truecolor/grayscale PNG with a
    chosen filter type per scanline (exercises the decoder's unfilter)."""
    import struct
    import zlib

    import numpy as np

    h, w, ch = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    filters = filters or [0] * h

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int16)
    for y in range(h):
        line = px[y].reshape(-1).astype(np.int16)
        f = filters[y]
        if f == 0:
            enc = line
        elif f == 1:  # Sub
            left = np.concatenate([np.zeros(ch, np.int16), line[:-ch]])
            enc = (line - left) % 256
        elif f == 2:  # Up
            enc = (line - prev) % 256
        elif f == 3:  # Average
            enc = line.copy()
            for x in range(w * ch):
                a = int(line[x - ch]) if x >= ch else 0
                enc[x] = (int(line[x]) - ((a + int(prev[x])) >> 1)) % 256
        elif f == 4:  # Paeth
            enc = line.copy()
            for x in range(w * ch):
                a = int(line[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[x] = (int(line[x]) - pr) % 256
        raw.append(f)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _encode_wav(samples, rate=8000) -> bytes:
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes((samples * 32767).astype("<i2").tobytes())
    return buf.getvalue()


class TestRealMediaDecoders:
    """The decoder= seam driven by REAL codecs on real bytes: stdlib-only
    PNG (zlib inflate + full unfilter) and 16-bit PCM WAV decode inside
    the Arrow mapInPandas worker — closing the 'only the hash stub has
    ever run' gap; the stub stays the default."""

    def test_png_roundtrip_every_filter_type(self, spark):
        import numpy as np

        from featurescreening_jl_spark.operators.media_codecs import (
            decode_png,
        )

        rng = np.random.default_rng(7)
        px = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
        for f in range(5):
            payload = _encode_png(px, filters=[f] * 5)
            out = decode_png(payload)
            assert out.shape == (5, 4, 3), f
            assert (out == px).all(), f"filter {f} roundtrip"
        # grayscale + mixed filters
        g = rng.integers(0, 256, size=(6, 3, 1), dtype=np.uint8)
        assert (decode_png(_encode_png(g, [0, 1, 2, 3, 4, 2])) == g).all()

    def test_wav_roundtrip_features(self, spark):
        import numpy as np

        from featurescreening_jl_spark.operators.media_codecs import (
            wav_features,
        )

        t = np.arange(8000) / 8000.0
        sine = 0.5 * np.sin(2 * np.pi * 440 * t)
        feats = wav_features(_encode_wav(sine, rate=8000))
        dur, ch, khz, rms, peak, zcr = feats
        assert dur == pytest.approx(1.0)
        assert ch == 1 and khz == pytest.approx(8.0)
        # RMS of a 0.5-amplitude sine = 0.5/sqrt(2)
        assert rms == pytest.approx(0.5 / 2**0.5, rel=1e-3)
        assert peak == pytest.approx(0.5, rel=1e-3)
        # a 440 Hz sine crosses zero 880 times/sec
        assert zcr == pytest.approx(880 / 8000, rel=0.02)

    def test_route_decoder_through_spark_seam(self, spark):
        import numpy as np

        from featurescreening_jl_spark.operators.media_codecs import (
            png_features,
            route_decoder,
            wav_features,
        )

        rng = np.random.default_rng(11)
        px = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
        png = _encode_png(px, filters=[4] * 8)
        wav = _encode_wav(0.25 * np.sin(np.arange(4000) * 0.3))
        rows = [
            (0, "image", png, (8, 8, None, "png")),
            (1, "audio", wav, (None, None, 500, "pcm")),
            (2, "video", b"\x00\x00vid", (320, 240, 3500, "h264")),
        ]
        media = spark.createDataFrame(
            rows,
            "media_id long, kind string, payload binary, "
            "meta struct<width:int,height:int,duration_ms:int,codec:string>",
        ).repartition(3)
        out = {
            r["media_id"]: r["feature"]
            for r in extract_media_features(
                media, decoder=route_decoder
            ).collect()
        }
        np.testing.assert_allclose(out[0], png_features(png))
        np.testing.assert_allclose(out[1], wav_features(wav))
        assert len(out[2]) == 16  # unknown kind → deterministic fake


class TestConnectedComponents:
    def test_chain_and_islands(self, spark):
        from featurescreening_jl_spark.operators.graph import (
            connected_components,
        )

        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22)],
            "id_a long, id_b long",
        )
        cc = {
            r["id"]: r["component"]
            for r in connected_components(pairs).collect()
        }
        assert cc == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                      20: 20, 21: 20, 22: 20}

    def test_star_matches_minlabel(self, spark):
        from featurescreening_jl_spark.operators.graph import (
            connected_components,
        )

        # deterministic pseudo-random graph: 80 edges over 60 nodes
        pairs = spark.range(80).select(
            ((F.col("id") * 7919 + 13) % 60).alias("id_a"),
            ((F.col("id") * 104729 + 7) % 60).alias("id_b"),
        ).where(F.col("id_a") != F.col("id_b"))
        a = {
            r["id"]: r["component"]
            for r in connected_components(pairs).collect()
        }
        b = {
            r["id"]: r["component"]
            for r in connected_components(pairs, algorithm="star").collect()
        }
        assert a == b

    def test_star_long_chain_converges_in_log_rounds(self, spark):
        # 1000-node path graph: diameter 999. Plain per-hop min-label would
        # need one round per hop; BOTH implemented variants are O(log n):
        # min-label carries a pointer-jumping shortcut (label[label]) and
        # large-star/small-star halves chain length per round. 15 rounds
        # (> log2(1000) ≈ 10) must suffice for each.
        from featurescreening_jl_spark.operators.graph import (
            connected_components,
        )

        n = 1000
        pairs = spark.range(n - 1).select(
            F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
        )
        for algo in ("minlabel", "star"):
            cc = connected_components(
                pairs, algorithm=algo, max_iterations=15
            ).toPandas()
            assert len(cc) == n, algo
            assert (cc["component"] == 0).all(), algo

    def test_star_rejects_unknown_algorithm(self, spark):
        from featurescreening_jl_spark.operators.graph import (
            connected_components,
        )

        pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
        with pytest.raises(ValueError, match="algorithm"):
            connected_components(pairs, algorithm="bogus")


class TestPageRank:
    @staticmethod
    def _reference_pagerank(edges, damping, iterations):
        # pure-python replay of the simplified recurrence
        from collections import defaultdict

        out_w = defaultdict(float)
        for s, d, w in edges:
            out_w[s] += w
        nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
        n = len(nodes)
        rank = {v: 1.0 / n for v in nodes}
        for _ in range(iterations):
            inc = defaultdict(float)
            for s, d, w in edges:
                inc[d] += rank[s] * w / out_w[s]
            rank = {
                v: (1 - damping) / n + damping * inc.get(v, 0.0)
                for v in nodes
            }
        return rank

    EDGES = [
        (1, 2, 1.0), (1, 3, 1.0), (2, 3, 2.0), (3, 1, 1.0),
        (4, 3, 1.0), (4, 5, 3.0), (5, 4, 1.0), (2, 5, 1.0),
    ]

    def test_matches_pure_python_replay(self, spark):
        from featurescreening_jl_spark.operators.graph import pagerank

        df = spark.createDataFrame(
            self.EDGES, "src long, dst long, w double"
        )
        got = {
            r["node"]: r["rank"]
            for r in pagerank(
                df, "src", "dst", "w", damping=0.85, iterations=3
            ).collect()
        }
        want = self._reference_pagerank(self.EDGES, 0.85, 3)
        assert set(got) == set(want)
        for v in want:
            assert abs(got[v] - want[v]) < 1e-12, v

    def test_partitioning_invariance(self, spark):
        # float sums reorder across partitionings; equality must hold to
        # well below the 6dp the oracle rounds to
        from featurescreening_jl_spark.operators.graph import pagerank

        edges = spark.range(400).select(
            ((F.col("id") * 7919 + 13) % 40).alias("src"),
            ((F.col("id") * 104729 + 7) % 40).alias("dst"),
            (F.col("id") % 5 + 1).cast("double").alias("w"),
        ).where(F.col("src") != F.col("dst"))
        a = pagerank(edges, iterations=3, partitions=2).toPandas()
        b = pagerank(edges, iterations=3, partitions=17).toPandas()
        merged = a.merge(b, on="node", suffixes=("_a", "_b"))
        assert len(merged) == len(a) == len(b)
        assert (merged["rank_a"] - merged["rank_b"]).abs().max() < 1e-9

    def test_unweighted_parallel_edges_equal_weighted(self, spark):
        # weight=None counts each parallel edge once; pre-aggregated
        # weighted form must give identical ranks
        from featurescreening_jl_spark.operators.graph import pagerank

        flat = spark.createDataFrame(
            [(1, 2), (1, 2), (1, 3), (2, 3), (3, 1)], "src long, dst long"
        )
        agg = flat.groupBy("src", "dst").agg(
            F.count("*").cast("double").alias("w")
        )
        a = {
            r["node"]: r["rank"]
            for r in pagerank(flat, iterations=2).collect()
        }
        b = {
            r["node"]: r["rank"]
            for r in pagerank(agg, "src", "dst", "w", iterations=2).collect()
        }
        assert set(a) == set(b)
        for v in a:
            assert abs(a[v] - b[v]) < 1e-12

    def test_rejects_zero_iterations(self, spark):
        from featurescreening_jl_spark.operators.graph import pagerank

        df = spark.createDataFrame([(1, 2)], "src long, dst long")
        with pytest.raises(ValueError, match="iterations"):
            pagerank(df, iterations=0)

    def test_transitive_minhash_dedup_keeps_one_per_chain(self, spark):
        # A~B and B~C near-dup (but A vs C just below threshold): greedy
        # drops B and C's pair-losers only; transitive keeps exactly A.
        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        rows = [
            (0, base),
            (1, base + " lambda"),            # ~ 0 (high jaccard)
            (2, base + " lambda mu nu xi"),   # ~ 1, farther from 0
            (3, "totally different text with none of those words at all"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        kept = minhash_dedup(
            df, transitive=True, jaccard_threshold=0.5, shingle_n=2,
        ).select("doc_id").toPandas()["doc_id"].tolist()
        assert 0 in kept and 3 in kept
        # every doc of the 0-1-2 chain except the representative is gone
        assert 1 not in kept and 2 not in kept


class TestSimhashNeardup:
    def test_banded_recall_guarantee(self, spark, documents):
        # append-two-tokens copies are within a few simhash bits of their
        # originals; the (k+1)-band join must find EVERY such pair
        # (pigeonhole recall 1), and the verify step bounds hamming <= k
        from featurescreening_jl_spark.operators.dedup import (
            simhash_neardup_pairs,
        )

        docs = documents.where(F.col("doc_id") < 60).select("doc_id", "text")
        copies = docs.select(
            (F.col("doc_id") + 1000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zz qq")).alias("text"),
        )
        out = simhash_neardup_pairs(
            docs.unionByName(copies), num_bits=32, hamming_k=10,
        ).toPandas()
        assert (out["hamming"] <= 10).all()
        copy_pairs = out[(out["id_b"] - out["id_a"]) == 1000]
        # exact-copy-pair hammings, recomputed brute force
        from featurescreening_jl_spark.operators.dedup import simhash

        sims = (
            docs.unionByName(copies)
            .select("doc_id", simhash(F.col("text"), num_bits=32).alias("s"))
            .toPandas()
            .set_index("doc_id")["s"]
        )
        expect = {
            i for i in range(60)
            if bin(int(sims[i]) ^ int(sims[i + 1000])).count("1") <= 10
        }
        assert set(copy_pairs["id_a"]) == expect
        assert len(expect) > 30  # non-vacuous: most copies are near-dups


def _wait_for_cap_log(caplog, timeout: float = 10.0) -> None:
    """The cap report is logged by a daemon thread the instant the
    observation's action completes — a hair after toPandas() returns."""
    import time

    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if any("capped" in r.message for r in caplog.records):
            return
        time.sleep(0.05)


class TestBucketCap:
    def test_hot_bucket_capped_and_logged(self, spark, caplog):
        import logging

        # 12 identical docs = one hot bucket in every band; 2 distinct
        # near-dups that must still be found when the hot bucket is capped
        base = "alpha beta gamma delta epsilon zeta eta theta"
        rows = [(i, "same boring boilerplate text repeated verbatim here")
                for i in range(12)]
        rows += [(100, base), (101, base + " iota")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        with caplog.at_level(logging.WARNING,
                             logger="featurescreening_jl_spark.operators.dedup"):
            pairs = minhash_lsh_pairs(
                df, jaccard_threshold=0.5, shingle_n=2, max_bucket_size=5,
            ).toPandas()
            _wait_for_cap_log(caplog)
        got = {(r.id_a, r.id_b) for r in pairs.itertuples()}
        assert (100, 101) in got
        # the capped boilerplate pairs are gone (bucket size 12 > cap 5)
        assert not any(a < 100 and b < 100 for a, b in got)
        assert any("capped" in r.message for r in caplog.records)

    def test_no_cap_keeps_everything(self, spark):
        rows = [(i, "same boring boilerplate text repeated verbatim here")
                for i in range(6)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = minhash_lsh_pairs(df, jaccard_threshold=0.5).toPandas()
        assert len(pairs) == 15  # all 6-choose-2 exact-dup pairs

    def test_cap_leaves_no_cached_tables(self, spark):
        # round-2 regression: _cap_buckets persisted the sized keys and
        # never unpersisted — every capped call leaked executor cache for
        # the session's lifetime. The agg+anti-join form caches nothing.
        rows = [(i, "same boring boilerplate text repeated verbatim here")
                for i in range(12)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        before = spark.sparkContext._jsc.getPersistentRDDs().size()
        minhash_lsh_pairs(
            df, jaccard_threshold=0.5, shingle_n=2, max_bucket_size=5
        ).count()
        after = spark.sparkContext._jsc.getPersistentRDDs().size()
        # no NEW cached tables (<=: the ContextCleaner may concurrently
        # release earlier tests' localCheckpoint RDDs, shrinking the set)
        assert after <= before


class TestHotShingleCap:
    def test_hot_shingle_capped_and_logged(self, spark, caplog):
        import logging

        from featurescreening_jl_spark.operators.dedup import (
            ngram_jaccard_pairs_indexed,
        )

        # every doc carries the same boilerplate bigrams (df = 22 ≫ cap);
        # docs 100/101 additionally share genuine content bigrams
        boiler = "standard legal disclaimer footer"
        rows = [(i, f"unique{i} token{i} filler{i} {boiler}")
                for i in range(20)]
        rows += [(100, f"alpha beta gamma delta {boiler}"),
                 (101, f"alpha beta gamma echo {boiler}")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        with caplog.at_level(
            logging.WARNING,
            logger="featurescreening_jl_spark.operators.dedup",
        ):
            # threshold below the capped lower bound 2/12: docs 100/101
            # share 2 uncapped bigrams of 7 each → capped jaccard ≈ 0.167
            capped = ngram_jaccard_pairs_indexed(
                df, shingle_n=2, threshold=0.1, max_shingle_df=5
            ).toPandas()
            _wait_for_cap_log(caplog)
        assert any("capped" in r.message for r in caplog.records)
        got = {(r.id_a, r.id_b) for r in capped.itertuples()}
        # the real pair survives on its uncapped shared bigrams
        assert (100, 101) in got
        # boilerplate-only overlaps never materialize: no join rows exist
        # for them once the hot shingles leave the index
        assert not any(a < 100 and b < 100 for a, b in got)
        # capped jaccard is a LOWER bound on the true value
        full = ngram_jaccard_pairs(
            df.where(F.col("doc_id").isin(100, 101)), shingle_n=2,
            threshold=0.0,
        ).toPandas()
        capped_j = float(capped.set_index(["id_a", "id_b"])
                         .loc[(100, 101), "jaccard"])
        true_j = float(full["jaccard"].iloc[0])
        assert capped_j <= true_j + 1e-12

    def test_uncapped_unchanged(self, spark, documents):
        # max_shingle_df=None keeps the operator byte-exact vs cross join
        # (covered by TestNgramJaccardIndexed); here: a generous cap that
        # never triggers must also be a no-op
        from featurescreening_jl_spark.operators.dedup import (
            ngram_jaccard_pairs_indexed,
        )

        docs = documents.where(F.col("doc_id") < 80)
        a = ngram_jaccard_pairs_indexed(docs, threshold=0.25).toPandas()
        b = ngram_jaccard_pairs_indexed(
            docs, threshold=0.25, max_shingle_df=10**9
        ).toPandas()
        key = lambda p: sorted(
            (int(r.id_a), int(r.id_b), round(float(r.jaccard), 9))
            for r in p.itertuples()
        )
        assert key(a) == key(b)


class TestNgramJaccardIndexed:
    def test_matches_cross_join_implementation(self, spark, documents):
        from featurescreening_jl_spark.operators.dedup import (
            ngram_jaccard_pairs_indexed,
        )

        docs = documents.where(F.col("doc_id") < 150)
        cross = ngram_jaccard_pairs(docs, shingle_n=3, threshold=0.25).toPandas()
        indexed = ngram_jaccard_pairs_indexed(
            docs, shingle_n=3, threshold=0.25
        ).toPandas()
        key = lambda p: sorted(
            (int(r.id_a), int(r.id_b), round(float(r.jaccard), 9))
            for r in p.itertuples()
        )
        assert key(cross) == key(indexed)
        assert len(indexed) > 0  # non-vacuous on this slice

    def test_rejects_zero_threshold(self, spark, documents):
        from featurescreening_jl_spark.operators.dedup import (
            ngram_jaccard_pairs_indexed,
        )

        with pytest.raises(ValueError, match="threshold"):
            ngram_jaccard_pairs_indexed(documents, threshold=0.0)

    def test_hash_collision_pair_not_falsely_emitted(self, spark):
        """Phase-1 candidates join on hash(shingle); a collision between
        DISTINCT shingles may create a candidate pair, but phase 2's exact
        string verification must reject it. Inject a degenerate hash that
        collides EVERYTHING and assert the output still equals the exact
        cross-join result (no false pairs, no inflated jaccard)."""
        from featurescreening_jl_spark.operators.dedup import (
            ngram_jaccard_pairs_indexed,
        )

        df = spark.createDataFrame(
            [
                (1, "alpha beta gamma delta epsilon"),
                (2, "alpha beta gamma delta zeta"),  # 2/6 trigram overlap w/ 1
                (3, "one two three four five"),  # zero overlap with 1 and 2
                (4, "six seven eight nine ten"),  # zero overlap with all
            ],
            ["doc_id", "text"],
        )
        collide_all = lambda s: F.lit(0).cast("bigint")
        exact = ngram_jaccard_pairs(df, shingle_n=3, threshold=0.25).toPandas()
        out = ngram_jaccard_pairs_indexed(
            df, shingle_n=3, threshold=0.25, _hash=collide_all
        ).toPandas()
        key = lambda p: sorted(
            (int(r.id_a), int(r.id_b), round(float(r.jaccard), 9))
            for r in p.itertuples()
        )
        assert key(out) == key(exact)
        # non-vacuous: the collision hash really did make every cross pair
        # a phase-1 candidate, so phase 2 must have rejected (3,4) etc.
        assert len(exact) == 1 and (exact.id_a[0], exact.id_b[0]) == (1, 2)


class TestRobustOutliers:
    def test_matches_numpy_replica(self, spark):
        import numpy as np

        from featurescreening_jl_spark.operators.profiling import (
            robust_outliers,
        )

        vals = [10, 11, 12, 10, 11, 13, 12, 11, 500, 9]
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "id long, x long"
        )
        got = (
            robust_outliers(df, "x")
            .orderBy("id")
            .select("robust_z", "is_outlier")
            .toPandas()
        )
        a = np.array(vals, dtype=float)
        med = np.median(a)
        mad = np.median(np.abs(a - med))
        z = 0.6745 * (a - med) / mad
        np.testing.assert_allclose(
            got["robust_z"].to_numpy(dtype=float), z, rtol=1e-9
        )
        assert got["is_outlier"].tolist() == (np.abs(z) > 3.5).tolist()
        assert got["is_outlier"].sum() == 1  # only the 500

    def test_zero_mad_yields_null_scores(self, spark):
        from featurescreening_jl_spark.operators.profiling import (
            robust_outliers,
        )

        df = spark.createDataFrame(
            [(i, 7) for i in range(6)] + [(6, 1000)], "id long, x long"
        )
        got = robust_outliers(df, "x").orderBy("id").toPandas()
        assert got["robust_z"].isna().all()
        assert not got["is_outlier"].any()

    def test_grouped_matches_per_group_replica(self, spark):
        import numpy as np

        from featurescreening_jl_spark.operators.profiling import (
            robust_outliers,
        )

        rows = (
            [(i, "a", v) for i, v in enumerate([10, 11, 12, 10, 200])]
            + [(i + 5, "b", v) for i, v in enumerate([50, 55, 52, 51, 53])]
        )
        df = spark.createDataFrame(rows, "id long, g string, x long")
        got = (
            robust_outliers(df, "x", by="g")
            .orderBy("id")
            .toPandas()
        )
        for g in ("a", "b"):
            sub = got[got.g == g]
            a = sub["x"].to_numpy(dtype=float)
            med = np.median(a)
            mad = np.median(np.abs(a - med))
            z = 0.6745 * (a - med) / mad
            np.testing.assert_allclose(
                sub["robust_z"].to_numpy(dtype=float), z, rtol=1e-9
            )
        # the 200 is an outlier within group a; nothing in b is
        assert got[got.g == "a"]["is_outlier"].sum() == 1
        assert got[got.g == "b"]["is_outlier"].sum() == 0

    def test_grouped_plan_single_shuffle(self, spark):
        from featurescreening_jl_spark.operators.profiling import (
            robust_outliers,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = (
            robust_outliers(docs, "n_chars", by="lang")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange") == 1, plan
        assert "Join" not in plan, plan


class TestLshParams:
    def test_factorization_and_implied_threshold(self):
        from featurescreening_jl_spark.operators.dedup import lsh_params

        for t in (0.3, 0.5, 0.8, 0.9):
            for n in (64, 128, 256):
                b, r = lsh_params(t, n)
                assert b * r == n
                # the S-curve midpoint (1/b)^(1/r) should land near t
                implied = (1.0 / b) ** (1.0 / r)
                assert abs(implied - t) < 0.2, (t, n, b, r, implied)

    def test_fn_weighting_raises_recall(self):
        from featurescreening_jl_spark.operators.dedup import lsh_params

        b_bal, r_bal = lsh_params(0.8, 128)
        b_rec, r_rec = lsh_params(0.8, 128, fn_weight=10.0)
        # recall-weighted tuning must not use FEWER bands (more bands =
        # higher collision probability at any similarity)
        assert b_rec >= b_bal
        # and the implied threshold shifts down (catch more pairs)
        assert (1 / b_rec) ** (1 / r_rec) <= (1 / b_bal) ** (1 / r_bal)

    def test_validation(self):
        import pytest as _pytest

        from featurescreening_jl_spark.operators.dedup import lsh_params

        with _pytest.raises(ValueError):
            lsh_params(0.0, 128)
        with _pytest.raises(ValueError):
            lsh_params(0.5, 1)


class TestPropagateLabels:
    def _run(self, spark, edges, seeds, rounds=2):
        from featurescreening_jl_spark.operators.graph import propagate_labels

        e = spark.createDataFrame(edges, ["src", "dst"])
        s = spark.createDataFrame(seeds, ["id", "label"])
        return {
            r["id"]: (r["label"], r["is_seed"])
            for r in propagate_labels(e, s, rounds=rounds).collect()
        }

    def test_spreads_through_a_chain(self, spark):
        # seed at node 0; chain 0-1-2-3: round 1 labels node 1, round 2
        # labels node 2; node 3 stays unlabeled after 2 rounds
        got = self._run(
            spark, [(0, 1), (1, 2), (2, 3)], [(0, "good")], rounds=2
        )
        assert got[0] == ("good", True)
        assert got[1] == ("good", False)
        assert got[2] == ("good", False)
        assert 3 not in got

    def test_majority_wins_and_tie_breaks_to_smaller_label(self, spark):
        # node 9 has neighbors: two 'spam' seeds, one 'ham' seed -> spam;
        # node 8 has one of each -> tie -> 'ham' (smaller string)
        edges = [(9, 0), (9, 1), (9, 2), (8, 0), (8, 2)]
        seeds = [(0, "spam"), (1, "spam"), (2, "ham")]
        got = self._run(spark, edges, seeds, rounds=1)
        assert got[9] == ("spam", False)
        assert got[8] == ("ham", False)

    def test_seeds_are_clamped(self, spark):
        # seed 0='good' surrounded by three 'bad' seeds: 0 must stay 'good'
        edges = [(0, 1), (0, 2), (0, 3)]
        seeds = [(0, "good"), (1, "bad"), (2, "bad"), (3, "bad")]
        got = self._run(spark, edges, seeds, rounds=3)
        assert got[0] == ("good", True)

    def test_reciprocal_directed_edges_do_not_double_vote(self, spark):
        # (a,b) AND (b,a) present: b still counts once for node 5, so the
        # single 'ham' neighbor out-tie-breaks... construct: node 5 sees
        # seed 1 ('zz') through a reciprocal pair and seed 2 ('aa') once;
        # without dedup 'zz' would win 2-1, with dedup it ties 1-1 and
        # 'aa' (smaller) wins
        edges = [(5, 1), (1, 5), (5, 2)]
        seeds = [(1, "zz"), (2, "aa")]
        got = self._run(spark, edges, seeds, rounds=1)
        assert got[5] == ("aa", False)

    def test_unlabeled_neighbors_do_not_vote(self, spark):
        got = self._run(spark, [(0, 1)], [(7, "x")], rounds=2)
        assert got == {7: ("x", True)}


class TestDedupExactIncremental:
    def test_drops_index_matches_and_intra_shard_dups(self, spark):
        from featurescreening_jl_spark.operators.dedup import (
            dedup_exact_incremental,
        )

        index = spark.createDataFrame(
            [(0, "known doc"), (1, "other known")], ["doc_id", "text"]
        )
        shard = spark.createDataFrame(
            [
                (10, "fresh one"),
                (11, "known doc"),        # exists in index -> dropped
                (12, "fresh two"),
                (13, "fresh two"),        # intra-shard dup -> 12 kept
                (14, "KNOWN   doc"),      # normalized match -> dropped
            ],
            ["doc_id", "text"],
        )
        got = {
            r["doc_id"]
            for r in dedup_exact_incremental(shard, index).collect()
        }
        assert got == {10, 12}

    def test_normalize_false_is_byte_exact(self, spark):
        from featurescreening_jl_spark.operators.dedup import (
            dedup_exact_incremental,
        )

        index = spark.createDataFrame([(0, "a b")], ["doc_id", "text"])
        shard = spark.createDataFrame(
            [(1, "a  b"), (2, "a b")], ["doc_id", "text"]
        )
        got = {
            r["doc_id"]
            for r in dedup_exact_incremental(
                shard, index, normalize=False
            ).collect()
        }
        assert got == {1}  # whitespace difference survives byte-exact mode

    def test_text_never_enters_the_join_keys(self, spark):
        from featurescreening_jl_spark.operators.dedup import (
            dedup_exact_incremental,
        )

        index = spark.createDataFrame([(0, "x")], ["doc_id", "text"])
        shard = spark.createDataFrame([(1, "y")], ["doc_id", "text"])
        plan = (
            dedup_exact_incremental(shard, index)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        # both join keys are the 8-byte fingerprint / id — the text
        # column appears only below the final representative join's
        # shard-side scan, never as a join key
        assert "xxhash64" in plan

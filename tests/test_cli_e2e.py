"""spark-submit-level CLI smoke test.

Runs ``jobs/screen_job.py --from-transcripts`` as a REAL subprocess (fresh
driver process) with the packaged ``dist/featurescreening_jl_spark.zip`` as
the ONLY way to import the engine — exactly what
``spark-submit --py-files dist/featurescreening_jl_spark.zip`` gives a
cluster executor. Catches entry/job drift (round 2's sample_id divergence)
and packaging regressions by construction: if a module is missing from the
zip or the CLI featurize path diverges from the library, this test fails.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

pytestmark = [pytest.mark.spark, pytest.mark.slow]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestCliSubprocess:
    def test_from_transcripts_end_to_end(self, spark, tmp_path):
        from featurescreening_jl_spark.operators.window_features import (
            turn_features,
            turn_sample_id,
        )
        from featurescreening_jl_spark.sources.transcripts import (
            synthetic_transcripts,
        )

        # 1. build the deployment zip (what tools/package.py ships)
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "package.py")],
            check=True, capture_output=True, text=True,
        )
        zip_path = out.stdout.strip().splitlines()[-1]
        assert zip_path.endswith(".zip") and os.path.exists(zip_path)

        # 2. transcripts input written by the live session
        # 40 conversations ≈ 1k turns: enough signal that the injected
        # noise deterministically loses the tournament at this tree budget
        # (at 10 conversations a noise column survived at seed 1)
        tr = synthetic_transcripts(spark, n_conversations=40, seed=2,
                                   heavy_every=0)
        inp = str(tmp_path / "transcripts.parquet")
        outp = str(tmp_path / "screened.parquet")
        tr.write.parquet(inp)

        # 3. subprocess with ONLY the zip importable (plus jobs/ for the
        #    entry script itself) — NOT the repo source tree
        env = dict(os.environ)
        env["PYTHONPATH"] = zip_path
        env.pop("SPARK_GRAFT_SF_DIR", None)
        proc = subprocess.run(
            [
                sys.executable, os.path.join(REPO, "jobs", "screen_job.py"),
                "--input", inp, "--output", outp, "--from-transcripts",
                "--reduced-size", "2", "--step-size", "3",
                "--n-trees", "60", "--max-depth", "6",
                "--min-samples-leaf", "2", "--min-samples-split", "4",
                "--random-features", "3", "--random-seed", "1",
                "--verbosity", "1",
            ],
            env=env, capture_output=True, text=True, timeout=600,
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        # the noise-survival sanity report must be printed (logging→stderr)
        assert "injected random features survived" in proc.stderr

        # 4. output schema: id + label + reduced_size survivors, and the
        #    ids are byte-identical to the library featurization path
        got = spark.read.parquet(outp)
        feat_cols = [c for c in got.columns if c not in ("sample_id", "label")]
        assert len(feat_cols) == 2
        assert not any(c.startswith("rnd_") for c in feat_cols)
        job_ids = {r["sample_id"] for r in got.select("sample_id").collect()}
        lib_ids = {
            r["sid"]
            for r in turn_features(spark.read.parquet(inp))
            .select(turn_sample_id().alias("sid"))
            .collect()
        }
        assert job_ids == lib_ids


class TestCorpusPrepJob:
    """End-to-end corpus_prep_job: hygiene -> dedup -> split -> parquet +
    metrics, driven through main() exactly as spark-submit would."""

    def test_hard_dedup_run(self, spark, tmp_path):
        import json

        from jobs.corpus_prep_job import main

        src = str(tmp_path / "docs")
        out = str(tmp_path / "out")
        met = str(tmp_path / "metrics.json")
        # disjoint per-doc vocabularies: the ONLY near-dups are injected
        base = [
            (i, " ".join(f"w{i}_{j}" for j in range(40)))
            for i in range(40)
        ]
        # 4 near-copies (last 4 words dropped) and 3 exact copies
        rows = (
            base
            + [(100 + i, " ".join(base[i][1].split()[:36])) for i in range(4)]
            + [(200 + i, base[i][1]) for i in range(3)]
        )
        spark.createDataFrame(rows, ["doc_id", "text"]).write.parquet(src)

        rc = main([
            "--input", src, "--output", out, "--metrics-out", met,
            "--jaccard-threshold", "0.7", "--hashed-verify",
            "--splits", "train=0.8,test=0.2", "--verbosity", "0",
        ])
        assert rc == 0
        m = json.load(open(met))
        assert m["stages"]["ingest"] == 47
        # exact dedup removes the 3 byte-identical copies
        assert m["stages"]["exact_dedup"] == 44
        assert m["near_dup_pairs"] == 4
        # hard dedup: near-copies collapse to their closure representative
        # hard dedup: the 4 near-copy closures each keep ONE representative
        assert m["stages"]["output"] == 40
        assert sum(m["splits"].values()) == 40

        written = spark.read.parquet(out)
        assert written.count() == 40
        # representatives are closure minima: every kept id == its label
        assert (
            written.where("doc_id <> cluster_label").count() == 0
        )

    def test_soft_dedup_keeps_rows_with_weights(self, spark, tmp_path):
        import json

        from jobs.corpus_prep_job import main

        src = str(tmp_path / "docs2")
        out = str(tmp_path / "out2")
        met = str(tmp_path / "m2.json")
        base = [
            (i, " ".join(f"t{i}_{j}" for j in range(40)))
            for i in range(20)
        ]
        rows = base + [
            (100 + i, " ".join(base[i][1].split()[:36])) for i in range(2)
        ]
        spark.createDataFrame(rows, ["doc_id", "text"]).write.parquet(src)
        rc = main([
            "--input", src, "--output", out, "--metrics-out", met,
            "--jaccard-threshold", "0.7", "--soft-dedup",
            "--splits", "train=1.0", "--verbosity", "0",
        ])
        assert rc == 0
        m = json.load(open(met))
        assert m["stages"]["output"] == 22  # nothing dropped
        written = spark.read.parquet(out)
        # near-dup closure members carry weight 1/2; singletons 1.0
        w = {r["doc_id"]: r["weight"] for r in written.collect()}
        assert w[0] == 0.5 and w[100] == 0.5
        assert w[5] == 1.0

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

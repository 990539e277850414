"""Checkpoint/resume tests: lineage records, state atomicity, and
resume-equals-fresh-run equivalence (seed streams replay identically)."""

from __future__ import annotations

import json
import os

import pytest

from featurescreening_jl_spark.operators.screen import screen
from featurescreening_jl_spark.sources.checkpoint import RoundCheckpoint

from conftest import fixture_screen_config

pytestmark = pytest.mark.spark


def _run(ff, ckpt=None, resume=None, stop_after=None):
    calls = {"n": 0}

    def maybe_stop(selected):
        calls["n"] += 1
        if stop_after is not None and calls["n"] >= stop_after:
            raise KeyboardInterrupt  # simulate a mid-job crash

    return screen(
        ff,
        reduced_size=3,
        step_size=3,
        config=fixture_screen_config(),
        rng=7,
        show_progress=False,
        checkpoint=ckpt,
        resume_from=resume,
        after=maybe_stop if stop_after else None,
    )


class TestCheckpoint:
    def test_rounds_and_lineage_written(self, feature_frame, tmp_path, spark):
        root = str(tmp_path / "ckpt")
        ckpt = RoundCheckpoint(root)
        _run(feature_frame, ckpt=ckpt)
        # 11 features / step 3 → 4 rounds
        rounds = sorted(os.listdir(os.path.join(root, "rounds")))
        assert rounds == [f"round={i:04d}" for i in range(4)]
        lineage = ckpt.lineage(spark).collect()
        assert [r["round"] for r in lineage] == [0, 1, 2, 3]
        rec = json.loads(lineage[-1]["record"])
        assert rec["n_rows"] == 25
        assert rec["n_features"] == 3
        assert sum(rec["partition_rows"].values()) == 25
        state = ckpt.load_state()
        assert state["round"] == 3
        assert len(state["selected"]) == 3

    def test_resume_after_crash_matches_fresh_run(self, feature_frame, tmp_path):
        fresh = _run(feature_frame)

        root = str(tmp_path / "ckpt2")
        ckpt = RoundCheckpoint(root)
        with pytest.raises(KeyboardInterrupt):
            _run(feature_frame, ckpt=ckpt, stop_after=2)  # crash after round 2
        assert ckpt.load_state()["round"] == 1  # rounds 0,1 completed

        resumed = _run(feature_frame, ckpt=ckpt, resume=root)
        assert resumed.names == fresh.names

    def test_round_frame_roundtrip(self, feature_frame, tmp_path, spark):
        root = str(tmp_path / "ckpt3")
        ckpt = RoundCheckpoint(root)
        result = _run(feature_frame, ckpt=ckpt)
        restored = ckpt.round_frame(spark, 3)
        assert set(restored.names) == set(result.names)
        assert restored.count() == 25

    def test_resume_requires_checkpoint(self, feature_frame):
        with pytest.raises(ValueError):
            screen(feature_frame, resume_from="/nope", show_progress=False)

    def test_round_frame_parquet_fallback_when_iceberg_table_missing(
        self, feature_frame, tmp_path, spark, monkeypatch
    ):
        """A checkpoint written BEFORE the Iceberg catalog was configured
        (parquet-only rounds) must stay resumable after the jar arrives:
        round_frame falls back to the parquet round dir when the round's
        Iceberg table does not exist."""
        import featurescreening_jl_spark.sources.iceberg as iceberg_mod

        root = str(tmp_path / "ckpt4")
        ckpt = RoundCheckpoint(root)
        _run(feature_frame, ckpt=ckpt)  # parquet-only rounds

        # simulate a later session WITH the catalog active; no such table
        monkeypatch.setattr(iceberg_mod, "iceberg_active", lambda s: True)
        restored = ckpt.round_frame(spark, 3)
        assert restored.count() == 25

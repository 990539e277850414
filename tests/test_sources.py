"""Tests for source/sink integrations: HDF5 shim, Iceberg wiring, the
screen(X, y) convenience entry, and the CLI noise-injection device."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark


class TestScreenXY:
    def test_matches_manual_frame(self, spark):
        from featurescreening_jl_spark import FeatureFrame, screen, screen_xy

        rng = np.random.default_rng(3)
        X = rng.standard_normal((120, 8))
        X[:, 5] += np.repeat([0.0, 4.0], 60)
        y = np.repeat(["p", "q"], 60)
        cfg = {"n_trees": 30, "max_depth": 5}
        a = screen_xy(spark, X, y, reduced_size=2, step_size=3, rng=11,
                      config=cfg, show_progress=False)
        b = screen(FeatureFrame.from_xy(spark, X, y), reduced_size=2,
                   step_size=3, rng=11, config=cfg, show_progress=False)
        assert a.names == b.names
        assert "6" in a.names  # informative column (1-based naming)


class TestHdf5Shim:
    def test_roundtrip_or_informative_error(self, spark, tmp_path):
        from featurescreening_jl_spark import (
            FeatureFrame,
            load_hdf5,
            save_hdf5,
        )

        ff = FeatureFrame.from_arrays(
            spark, ["a", "b"], ["f1", "f2"],
            np.array([[1.0, 2.0], [3.0, 4.0]]),
        )
        path = str(tmp_path / "fs.h5")
        try:
            import h5py  # noqa: F401
        except ImportError:
            with pytest.raises(ImportError, match="h5py"):
                save_hdf5(ff, path)
            with pytest.raises(ImportError, match="h5py"):
                load_hdf5(spark, path)
            return
        save_hdf5(ff, path)
        back = load_hdf5(spark, path)
        assert back.names == ["f1", "f2"]
        assert back.to_pandas()[["f1", "f2"]].to_numpy().tolist() == [
            [1.0, 2.0], [3.0, 4.0],
        ]


class TestIcebergWiring:
    def test_inactive_without_catalog(self, spark):
        from featurescreening_jl_spark.sources.iceberg import iceberg_active

        assert iceberg_active(spark) is False

    def test_configure_is_noop_without_jar(self, monkeypatch):
        from pyspark.sql import SparkSession

        from featurescreening_jl_spark.sources.iceberg import configure_iceberg

        monkeypatch.delenv("SPARK_ICEBERG_JAR", raising=False)
        monkeypatch.delenv("SPARK_HOME", raising=False)
        builder = SparkSession.builder
        out = configure_iceberg(builder, "/tmp/wh")
        assert out is builder  # unchanged: no jar → parquet fallback

    def test_configure_sets_catalog_with_jar(self, monkeypatch, tmp_path):
        from featurescreening_jl_spark.sources.iceberg import (
            configure_iceberg,
            iceberg_jar,
        )

        fake = tmp_path / "iceberg-spark-runtime-3.5_2.12-1.5.0.jar"
        fake.write_bytes(b"PK")  # existence is all that's checked
        monkeypatch.setenv("SPARK_ICEBERG_JAR", str(fake))
        assert iceberg_jar() == str(fake)

        class FakeBuilder:
            def __init__(self):
                self.conf = {}

            def config(self, k, v):
                self.conf[k] = v
                return self

        b = configure_iceberg(FakeBuilder(), "/tmp/wh", catalog="graft")
        assert b.conf["spark.sql.catalog.graft"] == (
            "org.apache.iceberg.spark.SparkCatalog"
        )
        assert b.conf["spark.sql.catalog.graft.type"] == "hadoop"
        assert b.conf["spark.sql.catalog.graft.warehouse"] == "/tmp/wh"
        assert b.conf["spark.jars"] == str(fake)


class TestCliNoiseInjection:
    def test_random_features_added_and_reported(self, spark, tmp_path, caplog):
        # build a tiny feature table, run the job CLI end to end with
        # --random-features; the screen should drop the injected noise
        from featurescreening_jl_spark import FeatureFrame
        from jobs.screen_job import main

        rng = np.random.default_rng(5)
        X = rng.standard_normal((150, 6))
        # 6-sigma separation: the informative column must dominate any
        # forest regardless of bootstrap draws (guards against flakiness)
        X[:, 2] += np.repeat([0.0, 6.0], 75)
        y = np.repeat(["u", "v"], 75)
        ff = FeatureFrame.from_xy(spark, X, y)
        inp = str(tmp_path / "in.parquet")
        outp = str(tmp_path / "out.parquet")
        ff.save(inp)

        main([
            "--input", inp, "--output", outp,
            "--reduced-size", "2", "--step-size", "3",
            "--random-features", "4", "--random-seed", "9",
            "--n-trees", "30", "--max-depth", "5",
            "--min-samples-leaf", "2", "--min-samples-split", "4",
            "--verbosity", "0",
        ])
        out = spark.read.parquet(outp)
        feat_cols = [c for c in out.columns if c not in ("sample_id", "label")]
        assert len(feat_cols) == 2
        # the informative real feature survives; noise columns don't
        assert "3" in feat_cols
        assert not any(c.startswith("rnd_") for c in feat_cols)

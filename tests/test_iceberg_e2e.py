"""Real-runtime Iceberg execution — auto-enabled when a runtime jar exists.

This sandbox has no `iceberg-spark-runtime` jar and no network, so the
Iceberg branch (sources/iceberg.py, RoundCheckpoint's snapshot path) is
otherwise exercised only via monkeypatch. This module closes that gap the
moment an environment CAN run it: if `SPARK_ICEBERG_JAR` points at a jar
(or one sits on SPARK_HOME/jars), these tests spin up a session with the
`graft` Hadoop catalog and execute the full surface for real —
DataFrameWriterV2 round trip, snapshot semantics of createOrReplace, and
RoundCheckpoint save/resume reading back from the Iceberg snapshot rather
than the parquet fallback. With no jar they skip (visibly, not silently).
"""

from __future__ import annotations

import os
import tempfile

import pytest

from featurescreening_jl_spark.sources.iceberg import iceberg_jar

pytestmark = [
    pytest.mark.spark,
    pytest.mark.slow,
    pytest.mark.skipif(
        iceberg_jar() is None,
        reason="no iceberg-spark-runtime jar (SPARK_ICEBERG_JAR unset and "
        "none on SPARK_HOME/jars) — Iceberg e2e needs the real runtime",
    ),
]


@pytest.fixture(scope="module")
def iceberg_spark():
    # a dedicated session: the catalog must be configured at build time
    from pyspark.sql import SparkSession

    from featurescreening_jl_spark.sources.iceberg import configure_iceberg

    wh = tempfile.mkdtemp(prefix="iceberg_wh_")
    builder = (
        SparkSession.builder.master("local[4]")
        .appName("iceberg-e2e")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "4")
    )
    spark = configure_iceberg(builder, wh).getOrCreate()
    yield spark
    spark.stop()


def test_write_read_round_trip(iceberg_spark):
    from featurescreening_jl_spark.sources.iceberg import (
        iceberg_active,
        read_table,
        write_table,
    )

    spark = iceberg_spark
    assert iceberg_active(spark), "catalog must be live with the jar present"
    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    write_table(df, "e2e.t1")
    back = read_table(spark, "e2e.t1")
    assert back.count() == 100
    assert {r["id"]: r["v"] for r in back.collect()}[7] == 14


def test_create_or_replace_is_snapshot_semantics(iceberg_spark):
    from featurescreening_jl_spark.sources.iceberg import (
        read_table,
        write_table,
    )

    spark = iceberg_spark
    write_table(spark.range(5).selectExpr("id", "id AS v"), "e2e.t2")
    write_table(spark.range(3).selectExpr("id", "id + 10 AS v"), "e2e.t2")
    back = read_table(spark, "e2e.t2").collect()
    assert len(back) == 3  # replaced, not appended
    # snapshot history visible through Iceberg metadata tables
    snaps = spark.sql("SELECT * FROM graft.e2e.t2.snapshots").count()
    assert snaps >= 2


def test_round_checkpoint_resumes_from_iceberg_snapshot(iceberg_spark, tmp_path):
    from featurescreening_jl_spark.frame import FeatureFrame
    from featurescreening_jl_spark.sources.checkpoint import RoundCheckpoint

    spark = iceberg_spark
    df = spark.range(50).selectExpr(
        "id AS sample_id",
        "CAST(id % 2 AS STRING) AS label",
        "CAST(id AS DOUBLE) AS f1",
        "CAST(id * id AS DOUBLE) AS f2",
    )
    frame = FeatureFrame(
        df, ["f1", "f2"], label_col="label", id_col="sample_id"
    )
    ckpt = RoundCheckpoint(str(tmp_path / "ckpt"))
    ckpt.save_round(0, frame, [("f1", 10), ("f2", 3)])

    state = ckpt.load_state()
    assert state == {"round": 0, "selected": ["f1", "f2"]}
    # the resume read must come from the Iceberg snapshot (the table
    # exists), not the parquet fallback dir
    table = f"graft.{ckpt.iceberg_namespace}.round_0000_data"
    assert spark.catalog.tableExists(table)
    resumed = ckpt.round_frame(spark, 0)
    assert resumed.n_features == 2
    assert resumed.df.count() == 50


def test_partitioned_transcripts_table_prunes(iceberg_spark):
    """The north-rule layout: transcripts partitioned by days(ts) +
    bucket(conv_id) — verify partition pruning happens for a ts cutoff."""
    from pyspark.sql.functions import partitioning as P

    from featurescreening_jl_spark.sources.transcripts import (
        synthetic_transcripts,
    )

    spark = iceberg_spark
    t = synthetic_transcripts(spark, 200, seed=3)
    t.writeTo("graft.e2e.transcripts").partitionedBy(
        P.days("ts"), P.bucket(4, "conv_id")
    ).createOrReplace()
    pruned = spark.sql(
        "SELECT count(*) AS n FROM graft.e2e.transcripts "
        "WHERE ts < TIMESTAMP '2000-01-01'"
    ).collect()[0]["n"]
    assert pruned == 0
    total = spark.table("graft.e2e.transcripts").count()
    assert total == t.count()

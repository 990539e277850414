"""Iceberg catalog wiring — activated at runtime when the Iceberg Spark
runtime jar is available.

The north_rule targets Iceberg tables of transcripts; the engine treats
Iceberg as what it is to Spark — a catalog + table format the SAME
DataFrame plans read/write through — so every operator here is
format-agnostic and this module is ONLY the wiring:

- ``iceberg_jar()``            — locate the runtime jar
  (``SPARK_ICEBERG_JAR`` env var, or any
  ``iceberg-spark-runtime*.jar`` on ``SPARK_HOME/jars``).
- ``configure_iceberg(builder)`` — attach a Hadoop-catalog Iceberg
  catalog to a SparkSession builder (idempotent; no-op with a warning
  when no jar is found, so parquet-only environments degrade cleanly —
  this sandbox has no jar, which is why the Iceberg branch is exercised
  for config wiring + fallback only).
- ``iceberg_active(spark)``    — is the catalog configured on a live
  session (the switch RoundCheckpoint and loaders consult).
- ``write_table`` / ``read_table`` — DataFrameWriterV2 round trip.

At cluster scale the transcripts table should be partitioned by
``days(ts)`` and ``bucket(N, conv_id)`` with a ``(conv_id, ts)`` sort
order, so the as-of join's range scan prunes partitions and the window
featurization's sort is largely pre-satisfied (SURVEY.md §7.1).
"""

from __future__ import annotations

import glob
import logging
import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "iceberg_jar",
    "configure_iceberg",
    "iceberg_active",
    "write_table",
    "read_table",
]

log = logging.getLogger(__name__)

DEFAULT_CATALOG = "graft"


def iceberg_jar() -> Optional[str]:
    """Path to the Iceberg Spark runtime jar, or None when unavailable."""
    env = os.environ.get("SPARK_ICEBERG_JAR")
    if env and os.path.exists(env):
        return env
    spark_home = os.environ.get("SPARK_HOME")
    if spark_home:
        hits = glob.glob(
            os.path.join(spark_home, "jars", "iceberg-spark-runtime*.jar")
        )
        if hits:
            return sorted(hits)[-1]
    return None


def configure_iceberg(
    builder,
    warehouse: str,
    catalog: str = DEFAULT_CATALOG,
):
    """Attach an Iceberg Hadoop catalog to a SparkSession builder.

    Returns the builder either way; when no runtime jar is found the
    catalog is NOT configured and callers fall back to parquet (logged,
    never silent).
    """
    jar = iceberg_jar()
    if jar is None:
        log.warning(
            "Iceberg runtime jar not found (set SPARK_ICEBERG_JAR or put "
            "iceberg-spark-runtime*.jar on SPARK_HOME/jars) — catalog %r "
            "not configured; falling back to parquet storage",
            catalog,
        )
        return builder
    return (
        builder.config("spark.jars", jar)
        .config(
            f"spark.sql.catalog.{catalog}",
            "org.apache.iceberg.spark.SparkCatalog",
        )
        .config(f"spark.sql.catalog.{catalog}.type", "hadoop")
        .config(f"spark.sql.catalog.{catalog}.warehouse", warehouse)
        .config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        )
    )


def iceberg_active(
    spark: SparkSession, catalog: str = DEFAULT_CATALOG
) -> bool:
    """True when ``catalog`` is configured on the live session."""
    try:
        return bool(spark.conf.get(f"spark.sql.catalog.{catalog}", None))
    except Exception:
        return False


def write_table(
    df: DataFrame,
    table: str,
    *,
    catalog: str = DEFAULT_CATALOG,
    mode: str = "createOrReplace",
) -> None:
    """DataFrameWriterV2 write to ``catalog.table``.

    ``createOrReplace`` maps a screening round's snapshot to one Iceberg
    snapshot — resume = read the last committed snapshot, and Iceberg's
    atomic commit replaces the parquet path's state.json rename dance.
    """
    writer = df.writeTo(f"{catalog}.{table}").using("iceberg")
    if mode == "append":
        writer.append()
    elif mode == "createOrReplace":
        writer.createOrReplace()
    else:
        raise ValueError(f"unknown mode {mode!r}")


def read_table(
    spark: SparkSession, table: str, *, catalog: str = DEFAULT_CATALOG
) -> DataFrame:
    return spark.table(f"{catalog}.{table}")

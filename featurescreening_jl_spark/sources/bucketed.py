"""Bucketed-table storage: pre-shuffled, co-located joins and aggs.

The one storage-layout lever this engine had not yet demonstrated: a
table written ``bucketBy(N, key)`` is hash-partitioned ON DISK, so every
downstream join or aggregation keyed on ``key`` between tables with the
SAME bucket count starts from already-co-located partitions — Catalyst
plans the join with ZERO Exchange on either side (pinned in
tests/test_sources.py). At 100 TB this converts the recurring cost of
the pipeline's dominant shuffle (conv_id for transcripts, doc_id for
corpora) into a one-time write-side cost paid when the table lands:

- repeated per-conversation featurization passes (the screen loop's
  re-reads, SFT-pair extraction, sessionization) read bucket-local;
- the as-of join's build side can be bucketed on the SAME key/count as
  the probe side, removing both Exchanges from the sort-merge plan;
- ``sortBy(key, ts)`` additionally pre-satisfies window/as-of sort
  order within buckets, leaving only a cheap in-partition sort.

This is the parquet-catalog twin of the Iceberg layout recommendation
in sources/iceberg.py (``bucket(N, conv_id)`` partition transform +
``(conv_id, ts)`` sort order); the same plans run against either.

Reference parity: the reference is single-machine in-memory
(src/FeatureScreening.jl:92-100 loads whole HDF5 matrices); storage
layout is part of the graft's scale story, not the reference surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_bucketed", "is_bucketed"]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: str | list[str],
    n_buckets: int,
    *,
    sort_cols: str | list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Write ``df`` as a bucketed managed table.

    ``bucket_cols`` is the co-location key (join/agg key downstream);
    ``sort_cols`` optionally sorts WITHIN each bucket file (pre-satisfies
    window/as-of order). ``n_buckets`` must match between two tables for
    their join to be Exchange-free — size it once per key domain
    (cluster-cores × small multiple) and keep it stable across the lake.
    """
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    w = df.write.mode(mode).format(fmt).bucketBy(n_buckets, *cols)
    if sort_cols is not None:
        s = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        w = w.sortBy(*s)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back. The bucketing metadata lives in the
    session catalog, so reads must go through ``spark.table`` — reading
    the underlying files as plain parquet silently loses the layout (and
    with it the Exchange elimination)."""
    return spark.table(table)


def is_bucketed(spark: SparkSession, table: str) -> bool:
    """True when the catalog records bucketing metadata for ``table``
    (guards plan assumptions before relying on Exchange-free joins)."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    return any(
        r["col_name"].strip().lower().startswith("num buckets") for r in rows
    )

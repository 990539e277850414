"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata structs;
the Spark-side plumbing — schema, partition sizing, Arrow batch shape,
``mapInPandas`` signatures — is real and tested. The codec step is
pluggable via ``decoder=``: the default deterministic fake derives
pseudo-features from the payload bytes (no codec libraries in this
container), and ``operators/media_codecs.py`` provides REAL stdlib-only
decoders (PNG zlib inflate + unfilter, 16-bit PCM WAV) proven through
this seam in tests — swap in a native image/audio model in production.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "MEDIA_SCHEMA",
    "attach_media_metadata",
    "extract_media_features",
    "sample_frames",
]

# canonical media-table schema: opaque payload + typed metadata
MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, duration_ms:int, codec:string>"
)

FEATURE_DIM = 16


def _fake_decode(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in for a real decode+embed step: features are a
    pure function of the payload bytes (stable across runs/partitions)."""
    digest = hashlib.sha256(payload or b"").digest()
    arr = np.frombuffer(digest[: FEATURE_DIM * 2], dtype=np.uint16)
    return (arr.astype(np.float64) / 65535.0).astype(np.float64)


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap JVM-side payload stats (no decode): byte length, content hash
    — the pruning/dedup keys that never need Python."""
    return df.withColumn("payload_bytes", F.length(F.col(payload_col))).withColumn(
        "payload_hash", F.xxhash64(F.col(payload_col))
    )


def extract_media_features(
    df: DataFrame,
    payload_col: str = "payload",
    kind_col: str = "kind",
    id_col: str = "media_id",
    decoder: Callable[[bytes, str], np.ndarray] | None = None,
) -> DataFrame:
    """Decode/feature-extract via Arrow-batched ``mapInPandas``.

    Batches stream through Python in Arrow pages; only (id, kind, payload)
    columns cross the boundary (project before calling at scale). Replace
    ``decoder`` with a real image/audio model in production — the stub
    raises-free deterministic fake keeps the plumbing testable here.
    """
    decode = decoder or _fake_decode
    schema = f"{id_col} long, feature array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            feats = [
                decode(payload, kind).tolist()
                for payload, kind in zip(batch[payload_col], batch[kind_col])
            ]
            yield pd.DataFrame({id_col: batch[id_col].values, "feature": feats})

    return df.select(id_col, kind_col, payload_col).mapInPandas(run, schema=schema)


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    id_col: str = "media_id",
    meta_col: str = "meta",
) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    timestamp (explode over a JVM-generated sequence — the actual frame
    decode is the stubbed step above)."""
    n_frames = F.greatest(
        (F.col(f"{meta_col}.duration_ms") / every_ms).cast("int"), F.lit(1)
    )
    return df.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_frames - 1), lambda i: i * every_ms
            )
        ).alias("frame_ts_ms"),
    )

"""Time helpers.

Spark 4 refuses TIMESTAMP_NTZ → BIGINT casts; routing through TIMESTAMP
(interpreted in the session time zone, pinned to UTC in plans/session.py)
gives identical epoch-second semantics for both timestamp flavors.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["epoch_seconds", "epoch_micros"]


def epoch_seconds(col: Column) -> Column:
    """Truncated epoch seconds from a timestamp / timestamp_ntz column."""
    return col.cast("timestamp").cast("long")


def epoch_micros(col: Column) -> Column:
    """Exact epoch microseconds — the full precision of Spark timestamps.
    Integer, so range-frame arithmetic over it is exact (and matches
    DuckDB's ``epoch_us`` bit-for-bit in oracles); ``epoch_seconds``
    truncates sub-second parts and would mis-place range boundaries."""
    return F.unix_micros(col.cast("timestamp"))

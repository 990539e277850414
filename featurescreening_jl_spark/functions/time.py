"""Time helpers.

Spark 4 refuses TIMESTAMP_NTZ → BIGINT casts; routing through TIMESTAMP
(interpreted in the session time zone, pinned to UTC in plans/session.py)
gives identical epoch-second semantics for both timestamp flavors.
"""

from __future__ import annotations

from pyspark.sql import Column

__all__ = ["epoch_seconds"]


def epoch_seconds(col: Column) -> Column:
    """Truncated epoch seconds from a timestamp / timestamp_ntz column."""
    return col.cast("timestamp").cast("long")

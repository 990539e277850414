"""Deterministic synthetic conversation-transcript generator.

Schema per the graft's input contract (BASELINE.json ``input_hint``):
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)``.

Generation is DISTRIBUTED and per-conversation deterministic: a
``spark.range`` over conversation indices is mapped through
``mapInPandas``, and every conversation's turns derive from
``SeedSequence([seed, conv_idx])`` — so any subset of conversations
regenerates identically at any scale and any partitioning. No driver-side
materialization: at 10^12 turns this generator shape still works (each
executor synthesizes only its partitions).

Skew is built in on purpose: a configurable fraction of conversations are
heavy hitters with ~100× the turns, so skew handling (salting, AQE) is
exercised by tests and bench rather than assumed away.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["synthetic_transcripts", "TRANSCRIPT_SCHEMA"]

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp"
)

_VOCAB = np.array(
    "the a to of and in is for on with run check fix build test query spark "
    "table join scan filter agg window shuffle plan batch stream feature "
    "label model tree forest split rank select merge round screen data row "
    "column value error retry done ok please now then next first last".split()
)

_TOOLS = np.array(["search", "bash", "read_file", "write_file", "browser", "sql"])

_EPOCH_2025 = 1735689600  # 2025-01-01T00:00:00Z


def _gen_conversation(
    conv_idx: int, seed: int, mean_turns: int, heavy_every: int
) -> pd.DataFrame:
    rng = np.random.default_rng(np.random.SeedSequence([seed, conv_idx]))
    heavy = heavy_every > 0 and conv_idx % heavy_every == 0
    n = int(rng.integers(4, 2 * mean_turns))
    if heavy:
        n *= 100
    conv_id = f"conv_{conv_idx:08d}"
    turn_idx = np.arange(n, dtype=np.int32)

    # roles: user/assistant alternation with tool-result interludes
    roles = np.where(turn_idx % 2 == 0, "user", "assistant").astype(object)
    tool_mask = (rng.random(n) < 0.18) & (roles == "assistant")
    roles[tool_mask] = "tool"
    tools = np.full(n, None, dtype=object)
    tools[tool_mask] = rng.choice(_TOOLS, size=int(tool_mask.sum()))

    # timestamps: conversation start staggered by index; gaps mostly short,
    # ~5% long (1-3h) → multi-session conversations for gap-sessionization
    gaps = rng.integers(1, 120, size=n).astype(np.int64)
    long_mask = rng.random(n) < 0.05
    gaps[long_mask] = rng.integers(3600, 3 * 3600, size=int(long_mask.sum()))
    gaps[0] = 0
    start = _EPOCH_2025 + (conv_idx * 997) % (365 * 24 * 3600)
    ts = pd.to_datetime(start + np.cumsum(gaps), unit="s")

    # deterministic word-salad text, varying length
    lens = rng.integers(3, 40, size=n)
    words = rng.choice(_VOCAB, size=int(lens.sum()))
    offsets = np.concatenate([[0], np.cumsum(lens)])
    texts = np.array(
        [" ".join(words[offsets[i] : offsets[i + 1]]) for i in range(n)],
        dtype=object,
    )

    return pd.DataFrame(
        {
            "conv_id": conv_id,
            "turn_idx": turn_idx,
            "role": roles,
            "text": texts,
            "tool": tools,
            "ts": ts,
        }
    )


def synthetic_transcripts(
    spark: SparkSession,
    n_conversations: int = 200,
    *,
    seed: int = 42,
    mean_turns: int = 24,
    heavy_every: int = 97,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic transcripts DataFrame, generated on the executors.

    ``heavy_every``: every k-th conversation is a ~100× heavy hitter
    (0 disables skew).
    """
    parts = num_partitions or spark.sparkContext.defaultParallelism
    idx = spark.range(0, n_conversations, 1, parts)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            for conv_idx in batch["id"].tolist():
                yield _gen_conversation(
                    int(conv_idx), seed, mean_turns, heavy_every
                )

    df = idx.mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)
    return df.withColumn("ts", F.col("ts").cast("timestamp"))

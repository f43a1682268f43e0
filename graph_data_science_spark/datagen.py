"""Deterministic synthetic transcript generator (seed-stable at any scale).

Produces the input table fixed by BASELINE.json's input_hint:

    transcripts(conv_id string, turn_idx int32, role string,
                text string, tool string, ts timestamp)

Design (pattern from the reference's seedable generator,
/root/reference/core/src/main/java/org/neo4j/gds/beta/generator/
RandomGraphGenerator.java and RelationshipDistribution.java:34-76 for
POWER_LAW popularity): all columns are closed-form functions of
(seed, conv_id, turn_idx), computed with vectorized numpy inside
``mapInPandas`` over a ``spark.range`` backbone — no per-row Python,
no driver-side data, reproducible independent of partitioning. At
cluster scale the same code generates 10^12 turns: `spark.range`
splits the id space across executors and each partition derives its
rows locally.

Skew is intentional: tool popularity is zipf-distributed so the
derived role->tool edges contain hub vertices (the skew the engine's
salted reduce / degree-split must handle, BASELINE.json north_star).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)

_ROLES = np.array(["user", "assistant"])
_EPOCH = np.datetime64("2025-01-01T00:00:00")


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — deterministic uint64 hash, vectorized."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(
        0xFFFFFFFFFFFFFFFF
    )
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(
        0xFFFFFFFFFFFFFFFF
    )
    return x ^ (x >> np.uint64(31))


def expected_text(conv_id: str, turn_idx: int, role: str) -> str:
    """Closed form for the text column — the per-turn equality oracle."""
    return f"{conv_id}:{turn_idx}:{role}"


def generate_transcripts(
    spark: SparkSession,
    n_conversations: int,
    n_tools: int = 50,
    seed: int = 42,
    max_turns: int = 20,
    tool_turn_rate: float = 0.10,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic transcript table; ~`n_conversations * avg_turns` rows.

    Turn counts: 2..max_turns, skewed toward short conversations.
    Tool ids: zipf(s=1.2)-like popularity over ``n_tools`` tools so a
    handful of tool vertices collect most invocation edges (hub skew).
    """
    useed = np.uint64(seed)
    max_turns_ = int(max_turns)
    n_tools_ = int(n_tools)
    rate = float(tool_turn_rate)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            conv = pdf["id"].to_numpy(np.uint64)
            h = _mix64(conv ^ useed)
            # turns/conv in 2..max_turns, power-skewed toward 2
            u = (h % np.uint64(1 << 20)).astype(np.float64) / float(1 << 20)
            n_turns = (2 + np.floor((max_turns_ - 1) * u**2.5)).astype(np.int64)
            conv_rep = np.repeat(conv, n_turns)
            turn = np.concatenate([np.arange(k) for k in n_turns]) if len(n_turns) else np.array([], dtype=np.int64)
            th = _mix64(conv_rep * np.uint64(1_000_003) ^ turn.astype(np.uint64) ^ useed)
            role = _ROLES[(turn % 2).astype(np.int64)]
            is_tool = (th % np.uint64(1 << 20)).astype(np.float64) / float(1 << 20) < rate
            # zipf-ish tool popularity: tool k chosen w.p. ∝ 1/(k+1)^1.2
            ranks = np.arange(1, n_tools_ + 1, dtype=np.float64)
            cdf = np.cumsum(ranks**-1.2)
            cdf /= cdf[-1]
            tu = (_mix64(th ^ np.uint64(0xA5A5A5A5)) % np.uint64(1 << 20)).astype(
                np.float64
            ) / float(1 << 20)
            tool_idx = np.searchsorted(cdf, tu, side="left")
            conv_str = np.char.add("c", np.char.zfill(conv_rep.astype("U12"), 9))
            texts = pd.Series(conv_str).str.cat(
                [pd.Series(turn).astype(str), pd.Series(role)], sep=":"
            )
            tools = pd.Series(np.char.add("tool_", tool_idx.astype("U4")))
            tools = tools.where(pd.Series(is_tool), other=None)
            ts = _EPOCH + (conv_rep % np.uint64(86_400)).astype("timedelta64[s]") + (
                turn * np.timedelta64(60, "s")
            )
            yield pd.DataFrame(
                {
                    "conv_id": conv_str,
                    "turn_idx": turn.astype(np.int32),
                    "role": role,
                    "text": texts,
                    "tool": tools,
                    "ts": ts,
                }
            )

    parts = partitions or max(1, min(256, n_conversations // 4096 or 1))
    backbone = spark.range(0, n_conversations, numPartitions=parts)
    return backbone.mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)

"""Random graph generator — gds.beta.graph.generate analog.

Reference: /root/reference/core/src/main/java/org/neo4j/gds/beta/
generator/RandomGraphGenerator.java (339 LoC) with
RelationshipDistribution.java:34-76: UNIFORM (exactly avgDegree
out-edges to uniform targets), RANDOM (gaussian-ish degree), and
POWER_LAW (pareto out-degrees, uniform targets).

Spark realization: closed-form splitmix64 hashes of
(seed, src, edge_index) inside ``mapInPandas`` over a ``spark.range``
backbone — partition-independent, reproducible at any parallelism
and any scale (the same device as datagen.generate_transcripts).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

DISTRIBUTIONS = ("UNIFORM", "POWER_LAW")

_EDGE_SCHEMA = "src long, dst long, rel_type string, weight double"


def _mix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(
        0xFFFFFFFFFFFFFFFF
    )
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(
        0xFFFFFFFFFFFFFFFF
    )
    return x ^ (x >> np.uint64(31))


def _u01(h: np.ndarray) -> np.ndarray:
    return (h % np.uint64(1 << 24)).astype(np.float64) / float(1 << 24)


def generate_graph(
    spark: SparkSession,
    node_count: int,
    average_degree: int = 4,
    distribution: str = "UNIFORM",
    seed: int = 42,
    alpha: float = 2.0,  # POWER_LAW pareto shape
    max_degree: int | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """Canonical edge table (src, dst, rel_type='REL', weight) with
    deterministic pseudo-random topology."""
    dist = distribution.upper()
    if dist not in DISTRIBUTIONS:
        raise ValueError(f"distribution must be one of {DISTRIBUTIONS}")
    useed = np.uint64(seed)
    n = int(node_count)
    avg = int(average_degree)
    cap = int(max_degree) if max_degree else max(avg * 16, 64)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            src = pdf["id"].to_numpy(np.uint64)
            if dist == "UNIFORM":
                deg = np.full(len(src), avg, dtype=np.int64)
            else:  # POWER_LAW: pareto with mean scaled to average_degree
                u = _u01(_mix64(src ^ useed ^ np.uint64(0xDEAD)))
                # inverse-CDF pareto, shape alpha, scaled to hit the mean
                raw = (1.0 - u) ** (-1.0 / alpha)
                scale = avg * (alpha - 1.0) / alpha if alpha > 1 else 1.0
                deg = np.minimum(np.maximum((raw * scale).astype(np.int64), 1), cap)
            src_rep = np.repeat(src, deg)
            idx = np.concatenate([np.arange(k) for k in deg]) if len(deg) else np.array([], dtype=np.int64)
            h = _mix64(src_rep * np.uint64(1_000_003) ^ idx.astype(np.uint64) ^ useed)
            dst = (h % np.uint64(n)).astype(np.int64)
            w = np.round(_u01(_mix64(h ^ np.uint64(0xBEEF))), 6)
            yield pd.DataFrame(
                {
                    "src": src_rep.astype(np.int64),
                    "dst": dst,
                    "rel_type": "REL",
                    "weight": w,
                }
            )

    parts = partitions or max(1, min(512, n // 65536 or 1))
    return spark.range(0, n, numPartitions=parts).mapInPandas(gen, _EDGE_SCHEMA)

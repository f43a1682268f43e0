"""Modularity Optimization — standalone Louvain phase-1 proc.

Reference: /root/reference/algo/src/main/java/org/neo4j/gds/beta/
modularity/ModularityOptimization.java (parallel local-moving per
Lu/Halappanavar/Kalyanaraman 2015 with color-based batching; config
beta/modularity/ModularityOptimizationConfig.java — maxIterations 10,
tolerance 1e-4, optional seedProperty and relationship weights;
result exposes communityId per node plus modularity, ranIterations,
didConverge).

The reference's color-batched asynchronous moves are
scheduling-dependent, so GDS guarantees modularity-level quality
rather than byte-identical communities. This engine reuses the
deterministic parity-sweep local-moving kernel shared with
``louvain.py`` (`_local_moving_full`): iteration k moves only the
(k mod 2)-parity vertices against the frozen other block — the same
move rule (standard modularity gain, ties -> smaller community id),
reproducible at any parallelism. Unlike ``louvain`` it never
coarsens: one level, seeded or singleton-initialized, with
tolerance-based convergence.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark.catalog import Graph
from graph_data_science_spark.algorithms.louvain import (
    _local_moving_full,
    _undirected_weighted,
)


@dataclass
class ModularityOptimizationResult:
    communities: DataFrame  # (id, community)
    modularity: float
    ran_iterations: int
    did_converge: bool


def modularity_optimization(
    spark: SparkSession,
    graph: Graph,
    max_iterations: int = 10,
    tolerance: float = 1e-4,
    seed: DataFrame | None = None,
) -> ModularityOptimizationResult:
    """Move vertices between communities to maximize modularity.

    ``seed``: optional ``(id, community)`` DataFrame (the reference's
    ``seedProperty``); unseeded vertices start as singletons. Isolated
    vertices keep their seed (or themselves) — they carry no edge
    weight, so no move can change Q.
    """
    edges = _undirected_weighted(graph).persist()
    m2 = edges.agg(F.sum("w")).collect()[0][0] or 0.0
    verts = graph.vertices().select("id")
    if m2 == 0:
        base = verts.select("id", F.col("id").alias("community"))
        if seed is not None:
            base = (
                verts.join(
                    seed.select("id", F.col("community").alias("_s")), "id", "left"
                ).select("id", F.coalesce("_s", F.col("id")).alias("community"))
            )
        return ModularityOptimizationResult(base, 0.0, 0, True)

    comm, q, sweeps, converged = _local_moving_full(
        edges, m2, max_iterations, init=seed, tolerance=tolerance
    )
    # _local_moving_full only sees vertices with >=1 edge; re-attach
    # isolated vertices (degree 0) with their seed / singleton id
    iso = verts.join(comm, "id", "left_anti")
    if seed is not None:
        iso = iso.join(
            seed.select("id", F.col("community").alias("_s")), "id", "left"
        ).select("id", F.coalesce("_s", F.col("id")).alias("community"))
    else:
        iso = iso.select("id", F.col("id").alias("community"))
    edges.unpersist()
    return ModularityOptimizationResult(
        communities=comm.unionByName(iso),
        modularity=q,
        ran_iterations=sweeps,
        did_converge=converged,
    )

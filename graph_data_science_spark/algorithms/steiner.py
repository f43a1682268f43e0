"""Approximate Steiner tree — the shortest-path heuristic.

GDS 2.3 ships `gds.steinerTree` (ShortestPathsSteinerAlgorithm): the
tree connecting a source to a set of terminal vertices, approximated
by merging each terminal's shortest path from the source (the classic
2-approximation; GDS's optional rerouting refinement is a quality
knob on the same skeleton). The 2.0-era reference snapshot has only
the spanning-tree family (alpha/alpha-algo/src/main/java/org/neo4j/
gds/impl/spanningTrees/Prim.java:50) — this closes the forward gap.

Spark plan:
1. One SSSP fixpoint from the source (algorithms.paths.sssp — the
   same one-shuffle-per-round relaxation every path operator here
   uses); distances and min-id optimal predecessors per vertex.
2. A distributed predecessor walk: the frontier starts at all
   terminals AT ONCE and follows predecessor pointers in lock-step —
   each round is one join against the distance table, collecting the
   (predecessor, vertex) tree edges; a vertex already visited stops
   expanding (paths merge). Rounds = max hop count of a used path,
   never O(|terminals|) sequential walks.

Edge weights are reconstructed as dist(v) - dist(pred(v)) — exact on
the shortest-path tree, avoiding a join back to the edge table.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark.catalog import Graph
from graph_data_science_spark.algorithms.paths import sssp


@dataclass
class SteinerResult:
    edges: DataFrame          # (src, dst, weight) — src is the parent side
    total_weight: float
    reached_terminals: int


def steiner_tree(
    spark: SparkSession,
    graph: Graph,
    source: int,
    terminals: list[int] | DataFrame,
    weighted: bool = True,
    directed: bool = True,
    max_depth: int = 10_000,
) -> SteinerResult:
    """Union of source->terminal shortest paths. Unreachable
    terminals are skipped (counted via ``reached_terminals``)."""
    from graph_data_science_spark.pregel import _free_local_checkpoint

    dist = sssp(spark, graph, source, weighted=weighted, directed=directed)
    dist = dist.persist()
    if isinstance(terminals, DataFrame):
        term_df = terminals.select(F.col(terminals.columns[0]).alias("id")).distinct()
    else:
        term_df = spark.createDataFrame(
            [(int(t),) for t in terminals], "id long"
        ).distinct()

    reached = term_df.join(dist, "id", "left_semi").localCheckpoint(eager=True)
    n_reached = reached.count()

    cur = reached
    visited = cur
    edges = spark.createDataFrame([], "src long, dst long, weight double")
    for _ in range(max_depth):
        step = (
            cur.join(dist, "id")
            .where(F.col("predecessor").isNotNull())
            .select(
                F.col("predecessor").alias("src"),
                F.col("id").alias("dst"),
                F.col("distance").alias("_dd"),
            )
        )
        if step.isEmpty():
            break
        pd = dist.select(
            F.col("id").alias("src"), F.col("distance").alias("_pd")
        )
        new_edges = step.join(pd, "src", "left").select(
            "src", "dst",
            (F.col("_dd") - F.coalesce(F.col("_pd"), F.lit(0.0))).alias("weight"),
        )
        edges = edges.unionByName(new_edges).localCheckpoint(eager=True)
        nxt = (
            step.select(F.col("src").alias("id"))
            .distinct()
            .join(visited, "id", "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        cur = nxt
    edges = edges.distinct().localCheckpoint(eager=True)
    total = edges.agg(F.sum("weight").alias("w")).collect()[0]["w"]
    dist.unpersist()
    return SteinerResult(
        edges=edges,
        total_weight=float(total or 0.0),
        reached_terminals=n_reached,
    )

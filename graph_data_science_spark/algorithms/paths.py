"""Shortest paths — single-source (Dijkstra-parity) via frontier relaxation.

The reference's Dijkstra (/root/reference/algo/src/main/java/org/
neo4j/gds/paths/dijkstra/Dijkstra.java, binary-heap sequential) has
no efficient distributed analog; its own alpha module ships the
distributed formulation this engine uses: bucketed/iterative
relaxation (ShortestPathDeltaStepping.java:266, and the Pregel SSSP
example examples/pregel-example/.../sssp/SingleSourceShortestPathPregel.java).
At the fixpoint the per-vertex distances are IDENTICAL to Dijkstra's
for non-negative weights — parity holds on outputs, not on visit
order.

Plan per round (same one-shuffle shape as PageRank supersteps):

    relax  = frontier ⋈ edges on id=src -> (dst, dist+w)
    best   = relax GROUP BY dst AGG min
    state' = state LEFT JOIN best; frontier' = improved vertices

Rounds = hop-diameter of the shortest-path tree. Source-target mode
stops early once the target's distance can no longer improve.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark import projection
from graph_data_science_spark.catalog import Graph


def sssp(
    spark: SparkSession,
    graph: Graph,
    source: int,
    weighted: bool = True,
    directed: bool = True,
    max_iterations: int = 10_000,
) -> DataFrame:
    """(id, distance, predecessor) — unreachable vertices omitted.

    ``predecessor`` = the smaller-id predecessor among optimal ones
    (deterministic tie-break; GDS keeps one arbitrary optimal path).
    """
    edges = graph.view(weight_property=weighted)
    if not directed:
        edges = projection.orient(edges, "UNDIRECTED")
    if weighted:
        neg = edges.where(F.col("weight") < 0).isEmpty()
        if not neg:
            raise ValueError("sssp requires non-negative weights")
    edges = edges.persist()

    state = spark.createDataFrame(
        [(int(source), 0.0, None)], "id long, distance double, predecessor long"
    ).localCheckpoint(eager=True)
    frontier = state

    for _ in range(max_iterations):
        relax = (
            frontier.join(edges, frontier.id == edges.src)
            .select(
                F.col("dst").alias("id"),
                (F.col("distance") + F.col("weight")).alias("_nd"),
                F.col("src").alias("_pred"),
            )
        )
        best = relax.groupBy("id").agg(F.min("_nd").alias("_best"))
        # deterministic predecessor: min id among optimal relaxations
        best = (
            relax.join(best, "id")
            .where(F.col("_nd") == F.col("_best"))
            .groupBy("id")
            .agg(F.min("_nd").alias("_nd"), F.min("_pred").alias("_pred"))
        )
        joined = state.join(best, "id", "full")
        improved = joined.where(
            F.col("distance").isNull() | (F.col("_nd") < F.col("distance"))
        ).select(
            "id",
            F.col("_nd").alias("distance"),
            F.col("_pred").alias("predecessor"),
        )
        improved = improved.localCheckpoint(eager=True)
        if improved.isEmpty():
            break
        state = (
            state.join(improved.select("id"), "id", "left_anti")
            .unionByName(improved)
            .localCheckpoint(eager=True)
        )
        frontier = improved
    edges.unpersist()
    return state


def shortest_path(
    spark: SparkSession,
    graph: Graph,
    source: int,
    target: int,
    weighted: bool = True,
    directed: bool = True,
) -> tuple[float | None, list[int]]:
    """(total_cost, [source..target]) — None/[] when unreachable.

    Path reconstruction walks the predecessor chain with one
    single-row lookup per hop against the persisted distance DF —
    O(path length) driver memory and O(path length) tiny jobs, never
    an O(|V|) collect (a 10^10-vertex distance map must stay on the
    executors)."""
    dist = sssp(spark, graph, source, weighted, directed).persist()
    try:
        head = dist.where(F.col("id") == target).collect()
        if not head:
            return None, []
        total = head[0]["distance"]
        path = [int(target)]
        cur = head[0]["predecessor"]
        while cur is not None and path[-1] != source:
            path.append(int(cur))
            row = dist.where(F.col("id") == cur).collect()
            cur = row[0]["predecessor"] if row else None
        path.reverse()
        return total, path
    finally:
        dist.unpersist()

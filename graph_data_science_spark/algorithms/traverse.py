"""DFS / BFS traversal with visit order — the Traverse proc analog.

Reference: /root/reference/alpha/alpha-algo/src/main/java/org/neo4j/
gds/impl/traverse/Traverse.java:38-150 (single-source DFS/BFS with
optional target set and max-depth exit conditions, returning visited
nodes in traversal order).

Scale posture, stated honestly: DFS *visit order* is inherently
sequential — node k+1 depends on the entire stack history — so no
shuffle-parallel formulation exists (the reference's own
implementation is a single-threaded stack walk). The Spark-first
compromise here:

1. REACHABILITY is distributed: a BFS frontier sweep (the same
   one-shuffle-per-level plan as msbfs.bfs_distances) bounds the
   traversal to vertices within ``max_depth`` of the source.
2. Only the induced adjacency of that bounded set is collected —
   guarded by ``max_nodes`` (raise ValueError, never OOM the driver
   silently). On a 10^12-edge graph you traverse a neighborhood, not
   the planet; the guard makes that contract explicit.
3. The stack walk itself runs in-memory, neighbors in ascending-id
   order (deterministic; the reference iterates in relationship
   storage order, which Spark does not preserve — documented
   divergence, same shape as the engine's other tie-breaks).

BFS order from the same machinery: sort the distributed distance
sweep by (dist, id) — no collect bound needed since ordering is by
level, so that path stays fully distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark import projection
from graph_data_science_spark.algorithms.msbfs import bfs_distances
from graph_data_science_spark.catalog import Graph


def bfs(
    spark: SparkSession,
    graph: Graph,
    source: int,
    max_depth: int | None = None,
    target_nodes: list[int] | None = None,
    directed: bool = True,
) -> DataFrame:
    """(id, visit_order) — breadth-first visit order from ``source``.

    Fully distributed: levels come from the frontier sweep, order
    within a level is ascending id (deterministic). ``target_nodes``
    truncates the result after the earliest-reached target's level
    (the reference's exit condition).
    """
    src = spark.createDataFrame([(int(source),)], "id long")
    dist = bfs_distances(
        spark, graph, sources=src, max_depth=max_depth, directed=directed
    ).select("id", "dist")
    if target_nodes:
        hit = (
            dist.where(F.col("id").isin([int(t) for t in target_nodes]))
            .agg(F.min("dist"))
            .collect()[0][0]
        )
        if hit is not None:
            dist = dist.where(F.col("dist") <= hit)
    from pyspark.sql import Window

    w = Window.orderBy("dist", "id")
    # global rank over the visited set: fine for the traversal-sized
    # outputs this proc returns; the window is over (dist, id), the
    # same total order the reference's queue would emit
    return dist.select(
        "id", (F.row_number().over(w) - 1).alias("visit_order")
    )


def dfs(
    spark: SparkSession,
    graph: Graph,
    source: int,
    max_depth: int | None = None,
    target_nodes: list[int] | None = None,
    max_nodes: int = 100_000,
    directed: bool = True,
) -> DataFrame:
    """(id, visit_order) — depth-first visit order from ``source``.

    Distributed reachability bounds the set; the stack walk is
    in-memory over the induced adjacency (<= ``max_nodes`` vertices,
    enforced). ``target_nodes`` stops the walk when any target pops.
    """
    src = spark.createDataFrame([(int(source),)], "id long")
    reach = bfs_distances(
        spark, graph, sources=src, max_depth=max_depth, directed=directed
    ).select("id")
    n_reach = reach.count()
    if n_reach > max_nodes:
        raise ValueError(
            f"DFS traversal would visit {n_reach} vertices (> max_nodes="
            f"{max_nodes}); DFS order is sequential by nature — bound the "
            "walk with max_depth or raise max_nodes explicitly"
        )
    edges = graph.view().select("src", "dst")
    if not directed:
        edges = projection.orient(edges, "UNDIRECTED")
    induced = (
        edges.join(reach.select(F.col("id").alias("src")), "src", "left_semi")
        .join(reach.select(F.col("id").alias("dst")), "dst", "left_semi")
        .select("src", "dst")
        .dropDuplicates(["src", "dst"])
        .collect()
    )
    adj: dict[int, list[int]] = {}
    for r in induced:
        adj.setdefault(r["src"], []).append(r["dst"])
    for nbrs in adj.values():
        # pushed in descending order so the SMALLEST id pops first
        nbrs.sort(reverse=True)

    targets = {int(t) for t in (target_nodes or [])}
    visited: dict[int, int] = {}
    stack = [int(source)]
    while stack:
        v = stack.pop()
        if v in visited:
            continue
        visited[v] = len(visited)
        if v in targets:
            break
        stack.extend(u for u in adj.get(v, ()) if u not in visited)

    return spark.createDataFrame(
        [(k, v) for k, v in visited.items()], "id long, visit_order int"
    )

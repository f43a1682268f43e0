"""Multi-source BFS and the centralities built on it.

Reference blueprint: /root/reference/alpha/alpha-algo/src/main/java/
org/neo4j/gds/impl/msbfs/MultiSourceBFS.java (bit-parallel ANP BFS,
64 sources per long) feeding

* closeness centrality — farness(v) = sum of d(s,v) over sources
  reaching v; component(s) = #nodes reached from s; score =
  component/farness, Wasserman-Faust variant multiplies by
  component/(n-1)  (MSClosenessCentrality.java:129-163)
* harmonic centrality — inverseFarness(v) = sum 1/d(s,v); score =
  inverseFarness/(n-1)  (HarmonicCentrality.java:61-92)

Spark realization: the reference packs 64 sources into a long and
BFSes them simultaneously with bitwise OR frontier merges; the
DataFrame analog keeps a `(src, node, dist)` frontier and lets the
shuffle machinery batch arbitrarily many sources per round — the
bit-packing trick becomes unnecessary because `groupBy(node)` already
aggregates all sources' visits in one pass. Each BFS round is one
join + one anti-join against the visited set:

    frontier' = (frontier ⋈ edges on node=src') \\ visited

Complexity matches the reference: all-pairs BFS is O(n·m) work — at
cluster scale restrict `sources` (the reference's own guidance: its
MSBFS procs are alpha-tier, meant for sampled/bounded use) or bound
``max_depth`` for k-hop queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark import projection
from graph_data_science_spark.algorithms.betweenness import sampling_metadata
from graph_data_science_spark.catalog import Graph


def bfs_distances(
    spark: SparkSession,
    graph: Graph,
    sources: DataFrame | None = None,
    max_depth: int | None = None,
    directed: bool = False,
) -> DataFrame:
    """(source, id, dist) — unweighted hop distances from each source.

    ``sources`` is a DF with column `id`; defaults to all vertices
    (all-pairs). Undirected traversal by default (the closeness /
    harmonic contract); ``directed=True`` follows edge direction.
    """
    edges = graph.view().select("src", "dst")
    if not directed:
        edges = projection.orient(edges, "UNDIRECTED").dropDuplicates(["src", "dst"])
    edges = edges.persist()

    src = (sources or graph.vertices()).select(F.col("id").alias("source"))
    visited = src.select("source", F.col("source").alias("id"), F.lit(0).alias("dist"))
    visited = visited.localCheckpoint(eager=True)
    frontier = visited

    depth = 0
    while True:
        depth += 1
        if max_depth is not None and depth > max_depth:
            break
        nxt = (
            frontier.join(edges, frontier.id == edges.src)
            .select("source", F.col("dst").alias("id"), F.lit(depth).alias("dist"))
            .dropDuplicates(["source", "id"])
            .join(visited.select("source", "id"), ["source", "id"], "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    edges.unpersist()
    return visited


def _auto_sources(
    graph: Graph, sources: DataFrame | None, all_pairs: bool, seed: int, algo: str
) -> tuple[DataFrame | None, float]:
    """All-pairs guard for the MSBFS centralities: returns (sources,
    scale) where scale extrapolates sampled sums to the full source
    set (the SelectionStrategy.java analog)."""
    from graph_data_science_spark.algorithms.betweenness import auto_sample_size

    if sources is not None:
        return sources, 1.0
    n = graph.node_count()
    size = auto_sample_size(n, None, all_pairs, algo)
    if size is None:
        return None, 1.0
    verts = graph.vertices()
    sampled = (
        verts.withColumn("_h", F.xxhash64("id", F.lit(seed)))
        .orderBy("_h")
        .limit(size)
        .select("id")
    )
    return sampled, n / size


def closeness_centrality(
    spark: SparkSession,
    graph: Graph,
    wasserman_faust: bool = False,
    sources: DataFrame | None = None,
    all_pairs: bool = False,
    sampling_seed: int = 42,
) -> DataFrame:
    """(id, centrality) — MSClosenessCentrality.java:153-163 formula.

    farness(v) = sum of distances from sources to v; component(v) =
    #nodes v reaches (on the undirected view both equal per-vertex
    totals). Score: component/farness; Wasserman-Faust multiplies by
    component/(n-1). 0 when farness is 0 (isolated vertex).
    Above AUTO_SAMPLE_THRESHOLD vertices the sweep auto-samples its
    sources unless ``all_pairs=True``. The plain reach/farness ratio
    is self-normalizing under sampling; the Wasserman-Faust factor
    reach/(n-1) is NOT — reach is counted over the sampled source
    set, so it is extrapolated by n/sample_size before dividing by
    n-1 (otherwise WF scores deflate by ~sample/n).
    """
    n = graph.node_count()
    sources, scale = _auto_sources(graph, sources, all_pairs, sampling_seed, "closeness")
    dist = bfs_distances(spark, graph, sources=sources)
    agg = (
        dist.where(F.col("dist") > 0)
        .groupBy(F.col("id"))
        .agg(
            F.sum("dist").alias("farness"),
            F.count(F.lit(1)).alias("reach"),
        )
    )
    score = F.col("reach") / F.col("farness")
    if wasserman_faust:
        score = score * (F.col("reach") * F.lit(scale) / F.lit(float(n - 1)))
    meta = sampling_metadata(round(n / scale) if scale != 1.0 else None, n)
    return (
        graph.vertices()
        .join(agg, "id", "left")
        .select(
            "id",
            F.when(
                F.col("farness").isNull() | (F.col("farness") == 0), F.lit(0.0)
            )
            .otherwise(score)
            .alias("centrality", metadata=meta),
        )
    )


def harmonic_centrality(
    spark: SparkSession,
    graph: Graph,
    sources: DataFrame | None = None,
    all_pairs: bool = False,
    sampling_seed: int = 42,
) -> DataFrame:
    """(id, centrality) = (sum over u of 1/d(u,v)) / (n-1)
    (HarmonicCentrality.java:61-92). Above AUTO_SAMPLE_THRESHOLD
    vertices the sweep auto-samples its sources unless
    ``all_pairs=True``; sampled sums extrapolate by n/samples."""
    n = graph.node_count()
    sources, scale = _auto_sources(graph, sources, all_pairs, sampling_seed, "harmonic")
    dist = bfs_distances(spark, graph, sources=sources)
    agg = (
        dist.where(F.col("dist") > 0)
        .groupBy("id")
        .agg(F.sum(1.0 / F.col("dist")).alias("inv_farness"))
    )
    meta = sampling_metadata(round(n / scale) if scale != 1.0 else None, n)
    return (
        graph.vertices()
        .join(agg, "id", "left")
        .select(
            "id",
            (
                F.coalesce(F.col("inv_farness"), F.lit(0.0))
                * F.lit(scale)
                / F.lit(float(n - 1))
            ).alias("centrality", metadata=meta),
        )
    )


def all_shortest_paths(
    spark: SparkSession,
    graph: Graph,
    sources: DataFrame | None = None,
    weighted: bool = False,
    directed: bool = True,
    max_iterations: int = 10_000,
) -> DataFrame:
    """(source_id, target_id, distance) — `gds.alpha.allShortestPaths`.

    Unweighted mirrors MSBFSAllShortestPaths.java:104-121 (ANP visit
    stream: targets at hop distance >= 1, self rows not emitted);
    weighted mirrors WeightedAllShortestPaths.java:96-152 (per-source
    Dijkstra; every finite pair emitted, including (s, s, 0.0)).
    Unreachable pairs are omitted (the reference filters +Inf).

    ``sources`` (DF with column `id`) bounds the source set — at
    cluster scale the full O(|S|x|V|) result of ``sources=None`` is
    the caller's explicit choice, as in the reference's alpha-tier
    proc. Weighted relaxation is the same one-shuffle-per-round shape
    as :func:`~graph_data_science_spark.algorithms.paths.sssp`, keyed
    on (source, id) so all sources advance together.
    """
    if not weighted:
        dist = bfs_distances(spark, graph, sources=sources, directed=directed)
        return dist.where(F.col("dist") > 0).select(
            F.col("source").alias("source_id"),
            F.col("id").alias("target_id"),
            F.col("dist").cast("double").alias("distance"),
        )

    edges = graph.view(weight_property=True)
    if not directed:
        edges = projection.orient(edges, "UNDIRECTED")
    if not edges.where(F.col("weight") < 0).isEmpty():
        raise ValueError("all_shortest_paths requires non-negative weights")
    edges = edges.persist()

    from graph_data_science_spark.pregel import _free_local_checkpoint

    src = (sources or graph.vertices()).select(F.col("id").alias("source"))
    state = src.select(
        "source", F.col("source").alias("id"), F.lit(0.0).alias("distance")
    ).localCheckpoint(eager=True)
    frontier = state
    for _ in range(max_iterations):
        relax = frontier.join(edges, frontier.id == edges.src).select(
            "source",
            F.col("dst").alias("id"),
            (F.col("distance") + F.col("weight")).alias("_nd"),
        )
        best = relax.groupBy("source", "id").agg(F.min("_nd").alias("_nd"))
        improved = (
            state.join(best, ["source", "id"], "full")
            .where(F.col("distance").isNull() | (F.col("_nd") < F.col("distance")))
            .select("source", "id", F.col("_nd").alias("distance"))
            .localCheckpoint(eager=True)
        )
        if improved.isEmpty():
            break
        prev_state, prev_frontier = state, frontier
        state = (
            state.join(improved.select("source", "id"), ["source", "id"], "left_anti")
            .unionByName(improved)
            .localCheckpoint(eager=True)
        )
        _free_local_checkpoint(prev_state)
        if prev_frontier is not prev_state:
            _free_local_checkpoint(prev_frontier)
        frontier = improved
    edges.unpersist()
    return state.select(
        F.col("source").alias("source_id"),
        F.col("id").alias("target_id"),
        "distance",
    )


def khop_counts(
    spark: SparkSession,
    graph: Graph,
    sources: DataFrame,
    k: int,
    directed: bool = False,
) -> DataFrame:
    """(source, n_reachable) — #vertices within <= k hops (excluding
    the source itself). The bounded-depth MSBFS use case."""
    dist = bfs_distances(spark, graph, sources=sources, max_depth=k, directed=directed)
    return (
        sources.select(F.col("id").alias("source"))
        .join(
            dist.where(F.col("dist") > 0)
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_reachable")),
            "source",
            "left",
        )
        .select("source", F.coalesce(F.col("n_reachable"), F.lit(0)).alias("n_reachable"))
    )

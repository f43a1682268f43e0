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


def _relax(frontier: DataFrame, edges: DataFrame) -> DataFrame:
    """One relaxation step: (id, _nd, _pred) candidates with the
    deterministic min-(distance, predecessor-id) tie-break."""
    relax = frontier.join(edges, frontier.id == edges.src).select(
        F.col("dst").alias("id"),
        (F.col("distance") + F.col("weight")).alias("_nd"),
        F.col("src").alias("_pred"),
    )
    best = relax.groupBy("id").agg(F.min("_nd").alias("_best"))
    return (
        relax.join(best, "id")
        .where(F.col("_nd") == F.col("_best"))
        .groupBy("id")
        .agg(F.min("_nd").alias("_nd"), F.min("_pred").alias("_pred"))
    )


def _improved(state: DataFrame, best: DataFrame) -> DataFrame:
    """Relaxation candidates that beat the current tentative
    (distance, predecessor) LEXICOGRAPHICALLY (full outer join so
    brand-new vertices qualify).

    Accepting equal-distance smaller-predecessor updates makes the
    fixpoint the lexicographic min over optimal predecessors —
    round-order- and parallelism-independent, so SQL oracles can
    replay the tie-break deterministically.  Predecessor-only
    updates never cascade (a vertex's offered candidates depend on
    its distance, not its predecessor), so convergence cost is
    unchanged and the Bellman-Ford |V|-round negative-cycle guard
    stays sound.
    """
    return (
        state.join(best, "id", "full")
        .where(
            F.col("distance").isNull()
            | (F.col("_nd") < F.col("distance"))
            | (
                # NULL predecessor marks the source itself — never
                # replaced at equal distance
                (F.col("_nd") == F.col("distance"))
                & (F.col("_pred") < F.col("predecessor"))
            )
        )
        .select(
            "id",
            F.col("_nd").alias("distance"),
            F.col("_pred").alias("predecessor"),
        )
    )


def sssp(
    spark: SparkSession,
    graph: Graph,
    source: int,
    weighted: bool = True,
    directed: bool = True,
    max_iterations: int = 10_000,
    delta: float | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """(id, distance, predecessor) — unreachable vertices omitted.

    ``predecessor`` = the smaller-id predecessor among optimal ones
    (deterministic tie-break; GDS keeps one arbitrary optimal path).

    ``delta`` switches the weighted traversal to Δ-stepping
    (:func:`delta_stepping`); ``None`` keeps the classic chaotic
    frontier relaxation. Outputs are identical either way (both are
    Dijkstra-parity fixpoints); Δ bounds wasted long-range
    propagation when the distance spread is wide.
    """
    if delta is not None and weighted:
        return delta_stepping(
            spark, graph, source, delta=delta, directed=directed,
            max_iterations=max_iterations, stats=stats,
        )
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

    rounds = 0
    for _ in range(max_iterations):
        improved = _improved(state, _relax(frontier, edges)).localCheckpoint(
            eager=True
        )
        rounds += 1
        if improved.isEmpty():
            break
        prev_state, prev_frontier = state, frontier
        state = (
            state.join(improved.select("id"), "id", "left_anti")
            .unionByName(improved)
            .localCheckpoint(eager=True)
        )
        from graph_data_science_spark.pregel import _free_local_checkpoint

        _free_local_checkpoint(prev_state)
        if prev_frontier is not prev_state:
            _free_local_checkpoint(prev_frontier)
        frontier = improved
    edges.unpersist()
    if stats is not None:
        stats["supersteps"] = rounds
        stats["buckets"] = None
    return state


def delta_stepping(
    spark: SparkSession,
    graph: Graph,
    source: int,
    delta: float,
    directed: bool = True,
    max_iterations: int = 10_000,
    stats: dict | None = None,
) -> DataFrame:
    """Δ-stepping SSSP — (id, distance, predecessor), Dijkstra parity.

    Reference semantics: /root/reference/alpha/alpha-algo/src/main/
    java/org/neo4j/gds/impl/ShortestPathDeltaStepping.java:60-200 —
    tentative distances are binned into buckets of width Δ; buckets
    settle in ascending order, LIGHT edges (w <= Δ) relax iteratively
    inside the open bucket, HEAVY edges (w > Δ) relax exactly once
    per settled vertex when its bucket closes (a heavy relaxation
    lands >= one bucket ahead, so a closed bucket never reopens).

    Spark realization: ``pending`` holds improved-but-unrelaxed
    vertices; each outer step picks bmin = min bucket over pending
    (one scalar aggregate), runs the light inner loop on that bucket,
    then one heavy pass over the vertices the bucket settled.
    Distributed-friendly: the number of OUTER steps is bounded by
    ceil(max_distance / Δ) + 1 regardless of weight spread, while
    chaotic relaxation's round count grows with the hop depth of the
    shortest-path tree weighted by how often long-range improvements
    invalidate earlier work.
    """
    from graph_data_science_spark.pregel import _free_local_checkpoint

    if delta <= 0:
        raise ValueError("delta must be > 0")
    edges = graph.view(weight_property=True)
    if not directed:
        edges = projection.orient(edges, "UNDIRECTED")
    if not edges.where(F.col("weight") < 0).isEmpty():
        raise ValueError("delta_stepping requires non-negative weights")
    light = edges.where(F.col("weight") <= delta).persist()
    heavy = edges.where(F.col("weight") > delta).persist()

    state = spark.createDataFrame(
        [(int(source), 0.0, None)], "id long, distance double, predecessor long"
    ).localCheckpoint(eager=True)
    pending = state
    bucket = F.floor(F.col("distance") / F.lit(float(delta)))

    buckets_processed = 0
    inner_rounds = 0
    garbage: list[DataFrame] = []
    for _ in range(max_iterations):
        head = pending.agg(F.min(bucket).alias("_b")).collect()[0]["_b"]
        if head is None:
            break
        buckets_processed += 1
        settled_ids = spark.createDataFrame([], "id long")
        active = pending.where(bucket == head)
        pending = pending.where(bucket != head).localCheckpoint(eager=True)
        # light inner loop: stays within bucket `head`
        while True:
            inner_rounds += 1
            settled_ids = settled_ids.unionByName(
                active.select("id")
            ).distinct().localCheckpoint(eager=True)
            improved = _improved(state, _relax(active, light)).localCheckpoint(
                eager=True
            )
            if improved.isEmpty():
                break
            garbage.append(state)
            state = (
                state.join(improved.select("id"), "id", "left_anti")
                .unionByName(improved)
                .localCheckpoint(eager=True)
            )
            garbage.append(pending)
            pending = (
                pending.join(improved.select("id"), "id", "left_anti")
                .unionByName(improved.where(bucket > head))
                .localCheckpoint(eager=True)
            )
            active = improved.where(bucket == head)
        # heavy pass: one relaxation from every vertex this bucket
        # settled, at its FINAL in-bucket distance; results land in
        # buckets > head, so `head` never reopens
        settled = state.join(settled_ids, "id", "left_semi")
        improved = _improved(state, _relax(settled, heavy)).localCheckpoint(
            eager=True
        )
        if not improved.isEmpty():
            garbage.append(state)
            state = (
                state.join(improved.select("id"), "id", "left_anti")
                .unionByName(improved)
                .localCheckpoint(eager=True)
            )
            garbage.append(pending)
            pending = (
                pending.join(improved.select("id"), "id", "left_anti")
                .unionByName(improved)
                .localCheckpoint(eager=True)
            )
        for df in garbage:
            _free_local_checkpoint(df)
        garbage.clear()
    light.unpersist()
    heavy.unpersist()
    if stats is not None:
        stats["buckets"] = buckets_processed
        stats["supersteps"] = inner_rounds
    return state


def astar(
    spark: SparkSession,
    graph: Graph,
    source: int,
    target: int,
    heuristic: DataFrame,
    weighted: bool = True,
    directed: bool = True,
    max_iterations: int = 10_000,
) -> tuple[float | None, list[int]]:
    """(total_cost, [source..target]) — A* shortest path.

    Reference: /root/reference/algo/src/main/java/org/neo4j/gds/paths/
    astar/AStar.java (Dijkstra + admissible per-node heuristic; the
    reference derives it from haversine over lat/lon properties —
    here ``heuristic`` is any DF (id, h) of admissible lower bounds,
    which is the same thing one join earlier).

    Distributed realization: frontier relaxation like :func:`sssp`,
    with the A* pruning rule applied per round — a frontier entry
    whose f = dist + h(v) cannot beat the best known target distance
    is dropped. With an admissible heuristic the final (cost, path)
    equals Dijkstra's; the heuristic only shrinks the explored
    frontier (visit ORDER differs from the reference's sequential
    priority queue; outputs match).
    """
    edges = graph.view(weight_property=weighted)
    if not directed:
        edges = projection.orient(edges, "UNDIRECTED")
    edges = edges.persist()
    h = heuristic.select("id", F.col(heuristic.columns[1]).alias("_h"))

    state = spark.createDataFrame(
        [(int(source), 0.0, None)], "id long, distance double, predecessor long"
    ).localCheckpoint(eager=True)
    frontier = state
    best_target = None

    for _ in range(max_iterations):
        relax = frontier.join(edges, frontier.id == edges.src).select(
            F.col("dst").alias("id"),
            (F.col("distance") + F.col("weight")).alias("_nd"),
            F.col("src").alias("_pred"),
        )
        best = relax.groupBy("id").agg(F.min("_nd").alias("_best"))
        best = (
            relax.join(best, "id")
            .where(F.col("_nd") == F.col("_best"))
            .groupBy("id")
            .agg(F.min("_nd").alias("_nd"), F.min("_pred").alias("_pred"))
        )
        improved = (
            state.join(best, "id", "full")
            .where(F.col("distance").isNull() | (F.col("_nd") < F.col("distance")))
            .select(
                "id",
                F.col("_nd").alias("distance"),
                F.col("_pred").alias("predecessor"),
            )
            .localCheckpoint(eager=True)
        )
        if improved.isEmpty():
            break
        state = (
            state.join(improved.select("id"), "id", "left_anti")
            .unionByName(improved)
            .localCheckpoint(eager=True)
        )
        tgt = state.where(F.col("id") == target).collect()
        if tgt:
            best_target = tgt[0]["distance"]
        frontier = improved
        if best_target is not None:
            # A* prune: f(v) = g(v) + h(v) >= best known target cost
            # can never improve the target
            frontier = frontier.join(h, "id", "left").where(
                F.col("distance") + F.coalesce(F.col("_h"), F.lit(0.0))
                < F.lit(best_target)
            ).drop("_h")
    edges.unpersist()

    rows = {
        r["id"]: (r["distance"], r["predecessor"])
        for r in state.where(
            F.col("id").isin([int(source), int(target)])
        ).collect()
    }
    if target not in rows:
        return None, []
    # backtrack via single-row lookups (state is checkpointed)
    path = [int(target)]
    cur = rows[target][1]
    st = state.persist()
    while cur is not None and path[-1] != source:
        path.append(int(cur))
        r = st.where(F.col("id") == int(cur)).collect()
        cur = r[0]["predecessor"] if r else None
    st.unpersist()
    path.reverse()
    return rows[target][0], path


def yens(
    spark: SparkSession,
    graph: Graph,
    source: int,
    target: int,
    k: int,
    weighted: bool = True,
    directed: bool = True,
) -> list[tuple[float, list[int]]]:
    """K shortest LOOPLESS paths, ascending cost — Yen's algorithm.

    Reference: /root/reference/algo/src/main/java/org/neo4j/gds/paths/
    yens/Yens.java (spur-node loop over masked-relationship Dijkstra
    runs). Same structure here: a driver loop of O(k * path-length)
    masked :func:`shortest_path` fixpoints — each inner run is the
    engine's distributed relaxation, the outer loop is inherently
    sequential (as in the reference). Ties break deterministically by
    (cost, path lexicographically).
    """
    first = shortest_path(spark, graph, source, target, weighted, directed)
    if first[0] is None:
        return []
    a_paths: list[tuple[float, list[int]]] = [first]
    candidates: list[tuple[float, list[int]]] = []

    for _ in range(1, k):
        prev_cost, prev_path = a_paths[-1]
        for i in range(len(prev_path) - 1):
            spur = prev_path[i]
            root = prev_path[: i + 1]
            # mask: edges used by any accepted path sharing this root,
            # and all root nodes except the spur
            masked_edges = {
                (p[i], p[i + 1])
                for _, p in a_paths
                if len(p) > i + 1 and p[: i + 1] == root
            }
            masked_nodes = set(root[:-1])
            e = graph.edges
            for u, v in masked_edges:
                cond = (F.col("src") == u) & (F.col("dst") == v)
                if not directed:
                    cond = cond | ((F.col("src") == v) & (F.col("dst") == u))
                e = e.where(~cond)
            if masked_nodes:
                nodes = [int(x) for x in masked_nodes]
                e = e.where(
                    ~F.col("src").isin(nodes) & ~F.col("dst").isin(nodes)
                )
            sub = Graph(name=f"{graph.name}__yen", edges=e, directed=graph.directed)
            spur_cost, spur_path = shortest_path(
                spark, sub, spur, target, weighted, directed
            )
            if spur_cost is None:
                continue
            total = spur_path if i == 0 else root[:-1] + spur_path
            root_cost = 0.0
            if i > 0:
                # cost of the root prefix along prev_path
                pairs = list(zip(prev_path[:i], prev_path[1:i + 1]))
                wsum = _path_cost(graph, pairs, weighted, directed)
                root_cost = wsum
            cand = (root_cost + spur_cost, total)
            if cand not in candidates and cand not in a_paths:
                candidates.append(cand)
        if not candidates:
            break
        candidates.sort(key=lambda cp: (cp[0], cp[1]))
        a_paths.append(candidates.pop(0))
    return a_paths


def _path_cost(
    graph: Graph, pairs: list[tuple[int, int]], weighted: bool, directed: bool
) -> float:
    """Sum of edge weights along explicit (u, v) hops (min-weight
    parallel edge, either direction when undirected)."""
    if not weighted:
        return float(len(pairs))
    edges = graph.view(weight_property=True)
    if not directed:
        edges = projection.orient(edges, "UNDIRECTED")
    cond = None
    for u, v in pairs:
        c = (F.col("src") == u) & (F.col("dst") == v)
        cond = c if cond is None else (cond | c)
    rows = (
        edges.where(cond)
        .groupBy("src", "dst")
        .agg(F.min("weight").alias("w"))
        .collect()
    )
    wmap = {(r["src"], r["dst"]): r["w"] for r in rows}
    return float(sum(wmap[(u, v)] for u, v in pairs))


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


def bellman_ford(
    spark: SparkSession,
    graph: Graph,
    source: int,
    directed: bool = True,
    weighted: bool = True,
    stats: dict | None = None,
) -> DataFrame:
    """Bellman-Ford SSSP with negative weights and negative-cycle
    detection — (id, distance, predecessor, negative_cycle).

    Reference semantics: GDS ``gds.bellmanFord`` (the 2.3-era
    BellmanFord.java; the 2.0-era snapshot ships only the
    non-negative Dijkstra/Δ-stepping pair, this closes that forward
    gap): single-source shortest paths where edge weights may be
    negative; if a negative cycle is reachable from the source, the
    vertices on or downstream of it have no finite shortest path and
    are flagged instead of looping forever.

    Spark plan — the same one-shuffle-per-round frontier relaxation
    as :func:`sssp` (round r captures every walk of <= r edges, so
    the fixpoint equals the Bellman-Ford DP), plus the classic
    n-round guard: a frontier still improving after |V| rounds
    proves a reachable negative cycle.  The affected set is then the
    forward closure (unweighted frontier expansion) of the vertices
    that improved in round |V|; their ``distance`` is -Infinity and
    ``negative_cycle`` true, mirroring the reference's
    NEGATIVE_CYCLE route marking.  Rounds on cycle-free inputs =
    hop depth of the shortest-path tree (early exit on an empty
    frontier), identical cost to :func:`sssp`.
    """
    from graph_data_science_spark.pregel import _free_local_checkpoint

    edges = graph.view(weight_property=weighted)
    if not directed:
        edges = projection.orient(edges, "UNDIRECTED")
    edges = edges.persist()
    n = graph.node_count()

    state = spark.createDataFrame(
        [(int(source), 0.0, None)], "id long, distance double, predecessor long"
    ).localCheckpoint(eager=True)
    frontier = state
    rounds = 0
    cyclic_seed = None
    for _ in range(n):
        improved = _improved(state, _relax(frontier, edges)).localCheckpoint(
            eager=True
        )
        rounds += 1
        if improved.isEmpty():
            break
        prev_state, prev_frontier = state, frontier
        state = (
            state.join(improved.select("id"), "id", "left_anti")
            .unionByName(improved)
            .localCheckpoint(eager=True)
        )
        _free_local_checkpoint(prev_state)
        if prev_frontier is not prev_state:
            _free_local_checkpoint(prev_frontier)
        frontier = improved
    else:
        # |V| rounds without convergence: one full relaxation pass —
        # anything that still improves sits on/behind a negative cycle
        cyclic_seed = _improved(state, _relax(state, edges)).select(
            "id"
        ).localCheckpoint(eager=True)
        if cyclic_seed.isEmpty():
            cyclic_seed = None

    contains = cyclic_seed is not None
    if contains:
        # forward closure of the seed set: distance has no finite value
        closure = cyclic_seed
        frontier = cyclic_seed
        for _ in range(n):
            nxt = (
                frontier.join(edges, frontier.id == edges.src)
                .select(F.col("dst").alias("id"))
                .join(closure, "id", "left_anti")
                .distinct()
                .localCheckpoint(eager=True)
            )
            if nxt.isEmpty():
                break
            closure = closure.unionByName(nxt).localCheckpoint(eager=True)
            frontier = nxt
        state = (
            state.join(closure.withColumn("_neg", F.lit(True)), "id", "left")
            .select(
                "id",
                F.when(F.col("_neg"), F.lit(float("-inf")))
                .otherwise(F.col("distance"))
                .alias("distance"),
                F.when(F.col("_neg"), F.lit(None).cast("long"))
                .otherwise(F.col("predecessor"))
                .alias("predecessor"),
                F.coalesce(F.col("_neg"), F.lit(False)).alias("negative_cycle"),
            )
        )
    else:
        state = state.withColumn("negative_cycle", F.lit(False))
    edges.unpersist()
    if stats is not None:
        stats["supersteps"] = rounds
        stats["contains_negative_cycle"] = contains
    return state

"""Graph sampling — random walk with restart (RWR) subgraph sampler.

Reference analog: `gds.graph.sample.rwr` (GraphSampleProc, Neo4j GDS
2.2 — beyond the 2.0-era reference snapshot at /root/reference),
per Leskovec & Faloutsos 2006 ("Sampling from Large Graphs"): RWR
sampling preserves degree/clustering distributions far better than
uniform node sampling. Defaults mirror the proc: samplingRatio 0.15,
restartProbability 0.1.

Spark realization: a fixed pool of walkers (sized to the target so
the round count stays small) advances ONE step per round — each
round is one frontier ⋈ edges join plus a per-walker top-1 window
using the same deterministic exponential-race pick as
algorithms.randomwalk (hash-uniform in (walker, round, candidate,
seed) — reproducible at any parallelism, no per-row Python). A
walker restarts to its start vertex with probability
``restart_probability``, and always restarts from a sink. Visited
vertices accumulate (distinct-merged per round, lineage-truncated)
until the target count is reached; the induced subgraph keeps
exactly the edges whose BOTH endpoints were sampled. When the
visited set stops growing for 3 rounds (walkers ringing around the
sinks of a directed component), the pool re-seeds at deterministic
UNVISITED start candidates — the GDS RandomWalkWithRestarts
stuck-walk behavior — so the sampler escapes absorbing
neighborhoods and still terminates when every reachable candidate
is sampled.

Scale shape: per round, work is O(walkers + |visited|) rows and one
shuffle; the walker pool bounds round count at ~target/walkers ×
1/(1-restart) rounds. Sampled-set membership joins are left-semi
(AQE broadcasts them while small).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from graph_data_science_spark.catalog import Graph


@dataclass
class RwrSampleResult:
    graph: Graph
    n_nodes: int
    n_edges: int
    rounds: int = 0
    stats: dict = field(default_factory=dict)


def sample_rwr(
    spark: SparkSession,
    graph: Graph,
    sampling_ratio: float = 0.15,
    restart_probability: float = 0.1,
    seed: int = 42,
    start_nodes: DataFrame | None = None,
    walkers: int | None = None,
    max_rounds: int = 1000,
    edge_weights: DataFrame | None = None,
) -> RwrSampleResult:
    """Sample ~``sampling_ratio`` of the vertices by RWR; returns the
    induced subgraph. Deterministic in (graph, config, seed).

    The sampled set is every vertex visited up to and including the
    first round where the target is reached, so
    ``target <= n_nodes < target + walkers`` (when the walks can
    reach that many vertices before ``max_rounds``).
    """
    if not 0 < sampling_ratio <= 1:
        raise ValueError("sampling_ratio must be in (0, 1]")
    if not 0 <= restart_probability < 1:
        raise ValueError("restart_probability must be in [0, 1)")
    from graph_data_science_spark.util import Truncator

    edges_all = graph.edges  # canonical (src, dst, rel_type, weight)
    edges = edges_all.select("src", "dst").dropDuplicates(["src", "dst"]).persist()
    verts = graph.vertices().select("id")
    n = graph.node_count()
    target = max(1, math.ceil(sampling_ratio * n))
    if walkers is None:
        walkers = max(16, target // 8)

    pool = (start_nodes or verts).select("id").persist()
    n_pool = pool.count()

    def _pick_starts(exclude: DataFrame | None, gen: int) -> DataFrame:
        """Deterministic `walkers` starts from the unexplored pool —
        hash-prefilter (order-free, scale-safe) down to ~8x the need,
        then an exact top-k window on that small survivor set."""
        cand = pool if exclude is None else pool.join(exclude, "id", "left_anti")
        frac = min(1.0, 16.0 * walkers / max(1, n_pool))
        m = 1 << 24
        pre = cand.where(
            F.pmod(F.xxhash64("id", F.lit(seed), F.lit(gen)), F.lit(m))
            < F.lit(int(m * frac))
        )
        if pre.limit(walkers).count() < walkers:
            pre = cand  # unlucky prefilter or pool nearly drained
        w = Window.orderBy(F.xxhash64("id", F.lit(seed), F.lit(gen)), F.asc("id"))
        return (
            pre.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") <= walkers)
            .select(F.col("_rk").alias("wid"), F.col("id").alias("start"))
        )

    generation = 0
    starts = _pick_starts(None, generation)
    state = starts.select("wid", "start", F.col("start").alias("cur")).localCheckpoint(
        True
    )
    visited = state.select(F.col("cur").alias("id")).distinct().localCheckpoint(True)
    tr = Truncator(spark, every=4)
    n_visited = visited.count()
    rounds = 0
    stalled = 0

    while n_visited < target and rounds < max_rounds:
        rounds += 1
        if stalled >= 3:
            # the pool's current neighborhoods are exhausted (e.g.
            # walkers ringing around sinks of a directed component) —
            # re-seed at unvisited start candidates, the GDS
            # RandomWalkWithRestarts stuck-walk behavior
            generation += 1
            unexplored = pool.join(visited, "id", "left_anti")
            if unexplored.isEmpty():
                break  # every reachable start candidate is sampled
            starts = _pick_starts(visited, generation).localCheckpoint(True)
            state = starts.select(
                "wid", "start", F.col("start").alias("cur")
            ).localCheckpoint(True)
            visited = tr.cut(
                visited.unionByName(state.select(F.col("cur").alias("id"))).distinct()
            )
            n_visited = visited.count()
            stalled = 0
            continue
        # candidate next hops for every walker
        cand = state.join(edges, state.cur == edges.src).select(
            "wid", "start", F.col("cur").alias("_cur"), F.col("dst").alias("nxt")
        )
        u = (
            F.pmod(
                F.xxhash64("wid", F.lit(rounds), "nxt", F.lit(seed)),
                F.lit(1 << 24),
            )
            / F.lit(float(1 << 24))
        )
        if edge_weights is not None:
            # weighted exponential race (Efraimidis-Spirakis A-Res):
            # key u^(1/w) — compared via ln(u)/w (same order, no
            # overflow); w = 1 rows reduce to the uniform race
            cand = cand.join(
                edge_weights.select(
                    F.col("src").alias("_cur"),
                    F.col("dst").alias("nxt"),
                    F.col("w").alias("_w"),
                ),
                ["_cur", "nxt"],
                "left",
            )
            key = F.log(
                F.greatest(u, F.lit(1e-12))
            ) / F.greatest(F.coalesce(F.col("_w"), F.lit(1.0)), F.lit(1e-9))
            pick_w = Window.partitionBy("wid").orderBy(F.desc(key), F.asc("nxt"))
        else:
            pick_w = Window.partitionBy("wid").orderBy(F.desc(u), F.asc("nxt"))
        stepped = (
            cand.withColumn("_rn", F.row_number().over(pick_w))
            .where(F.col("_rn") == 1)
            .select("wid", "start", F.col("nxt").alias("cur"))
        )
        # restart draw (per walker per round) + sink restart (walkers
        # with no candidate drop out of `stepped` -> left join null)
        ur = (
            F.pmod(
                F.xxhash64(F.col("wid"), F.lit(rounds), F.lit(seed + 1)),
                F.lit(1 << 24),
            )
            / F.lit(float(1 << 24))
        )
        state = tr.cut(
            starts.join(stepped.select("wid", "cur"), "wid", "left").select(
                "wid",
                "start",
                F.when(
                    (ur < F.lit(restart_probability)) | F.col("cur").isNull(),
                    F.col("start"),
                )
                .otherwise(F.col("cur"))
                .alias("cur"),
            )
        )
        visited = tr.cut(
            visited.unionByName(state.select(F.col("cur").alias("id"))).distinct()
        )
        new_count = visited.count()
        stalled = stalled + 1 if new_count == n_visited else 0
        n_visited = new_count

    sampled = visited.localCheckpoint(True)
    induced = (
        edges_all.join(sampled.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(sampled.withColumnRenamed("id", "dst"), "dst", "left_semi")
        .localCheckpoint(True)
    )
    tr.close()
    edges.unpersist()
    pool.unpersist()
    nodes = None
    if graph.nodes is not None:
        nodes = graph.nodes.join(sampled, "id", "left_semi")
    out = Graph(
        name=f"{graph.name}_rwr",
        edges=induced,
        nodes=nodes if nodes is not None else sampled,
        directed=graph.directed,
    )
    return RwrSampleResult(
        graph=out,
        n_nodes=n_visited,
        n_edges=induced.count(),
        rounds=rounds,
        stats={
            "target": target,
            "walkers": walkers,
            "rounds": rounds,
            "n_nodes": n_visited,
        },
    )


def common_neighbor_weights(
    spark: SparkSession,
    graph: Graph,
    max_degree: int = 10_000,
    floor: float = 0.05,
) -> DataFrame:
    """Per-edge CNARW transition weights (src, dst, w):

        w(u, v) = max(1 - |N(u) ∩ N(v)| / min(deg(u), deg(v)), floor)

    — walkers prefer hops with FEW common neighbors, escaping dense
    clusters faster than plain RWR (CNARW, Li et al. 2019; GDS 2.4
    `gds.graph.sample.cnarw`). Directed weights: computed on the
    undirected neighbor sets, emitted for both arc directions.

    Scale: the wedge join is bounded the same way triangle counting
    is — vertices with undirected degree > ``max_degree`` are
    excluded as wedge CENTERS (their common-neighbor contribution is
    skipped, never the edge itself), so hub vertices cannot explode
    the join; skipped centers only under-count |CN|, which raises w
    toward 1 — a bias-toward-uniform fallback, logged non-silently.
    """
    und = (
        graph.view()
        .select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .unionByName(
            graph.view().select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        .dropDuplicates(["src", "dst"])
        .persist()
    )
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    hot = deg.where(F.col("deg") > max_degree).select(F.col("src").alias("id"))
    n_hot = hot.count()
    if n_hot:
        print(
            f"[cnarw] {n_hot} vertices above max_degree={max_degree} "
            "excluded as wedge centers (|CN| under-counted toward uniform)"
        )
    adj = und.join(hot.withColumnRenamed("id", "dst"), "dst", "left_anti")
    # wedge: u - w - v where w is a (non-hot) shared neighbor
    left = adj.select(F.col("src").alias("u"), F.col("dst").alias("wv"))
    right = adj.select(F.col("src").alias("v"), F.col("dst").alias("wv"))
    cn = (
        und.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .join(left, "u")
        .join(right, ["v", "wv"], "left_semi")
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    d1 = deg.select(F.col("src").alias("u"), F.col("deg").alias("_d1"))
    d2 = deg.select(F.col("src").alias("v"), F.col("deg").alias("_d2"))
    out = (
        und.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .join(cn, ["u", "v"], "left")
        .join(d1, "u")
        .join(d2, "v")
        .select(
            F.col("u").alias("src"),
            F.col("v").alias("dst"),
            F.greatest(
                F.lit(1.0)
                - F.coalesce(F.col("cn"), F.lit(0)).cast("double")
                / F.least("_d1", "_d2").cast("double"),
                F.lit(float(floor)),
            ).alias("w"),
        )
        .localCheckpoint(eager=True)
    )
    und.unpersist()
    return out


def sample_cnarw(
    spark: SparkSession,
    graph: Graph,
    sampling_ratio: float = 0.15,
    restart_probability: float = 0.1,
    seed: int = 42,
    start_nodes: DataFrame | None = None,
    walkers: int | None = None,
    max_rounds: int = 1000,
    max_degree: int = 10_000,
) -> RwrSampleResult:
    """Common-neighbor-aware random-walk sampling
    (`gds.graph.sample.cnarw`, GDS 2.4): the RWR sampler with the
    next-hop race weighted by ``common_neighbor_weights`` — one extra
    wedge-join precomputation, then the identical per-round cost."""
    weights = common_neighbor_weights(spark, graph, max_degree=max_degree)
    res = sample_rwr(
        spark, graph,
        sampling_ratio=sampling_ratio,
        restart_probability=restart_probability,
        seed=seed,
        start_nodes=start_nodes,
        walkers=walkers,
        max_rounds=max_rounds,
        edge_weights=weights,
    )
    res.graph.name = f"{graph.name}_cnarw"
    return res

"""CELF greedy influence maximization (Independent Cascade model).

Reference: /root/reference/alpha/alpha-algo/src/main/java/org/neo4j/
gds/impl/influenceMaximization/CELF.java (169 LoC; Leskovec et al.
lazy-forward greedy over Monte-Carlo IC spread estimates; defaults
propagationProbability 0.1, monteCarloSimulations 100).

Spark realization, deterministic end-to-end:

* The R Monte-Carlo worlds are materialized ONCE as a live-edge
  table (sim, src, dst): edge e is live in world s iff
  pmod(xxhash64(src, dst, s, seed), 2^20) < p * 2^20 — the standard
  live-edge formulation of IC (reachability in the live-edge graph
  == cascade outcome), hash-seeded so results are reproducible at
  any parallelism.
* The first greedy round needs spread({v}) for EVERY v — computed in
  ONE batched multi-source BFS over all (world, source) pairs (the
  MSBFS trick again), not |V| sequential cascades.
* Subsequent rounds use the CELF lazy-forward queue on the driver
  (gain bounds from submodularity); each re-evaluation is one
  frontier-BFS of spread(S ∪ {v}) over the persisted live-edge
  table. The queue itself is O(k log n) driver work on scalars.

Scale note: the batched first round materializes O(R * Σ reach(v))
rows; for web-scale graphs bound it with ``candidate_sample`` (top
out-degree candidates — high-degree seeds dominate IC spread).
"""

from __future__ import annotations

import heapq

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark.catalog import Graph

_PREC = 1 << 20


def _live_edges(edges: DataFrame, p: float, sims: int, seed: int) -> DataFrame:
    worlds = edges.sparkSession.range(sims).select(F.col("id").cast("int").alias("sim"))
    return (
        edges.crossJoin(worlds)
        .where(
            F.pmod(F.xxhash64("src", "dst", "sim", F.lit(seed)), F.lit(_PREC))
            < int(p * _PREC)
        )
        .select("sim", "src", "dst")
    )


def _reach_counts(live: DataFrame, frontier: DataFrame) -> DataFrame:
    """frontier (sim, source, id) -> (source, total_reach) summed over
    worlds; level-synchronous BFS with a visited anti-join."""
    visited = frontier.localCheckpoint(eager=True)
    cur = visited
    while True:
        nxt = (
            cur.withColumnRenamed("id", "src")
            .join(live, ["sim", "src"])
            .select("sim", "source", F.col("dst").alias("id"))
            .dropDuplicates(["sim", "source", "id"])
            .join(visited, ["sim", "source", "id"], "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).repartition("sim", "source").localCheckpoint(
            eager=True
        )
        cur = nxt
    return visited.groupBy("source").agg(F.count(F.lit(1)).alias("reach"))


def celf(
    spark: SparkSession,
    graph: Graph,
    k: int = 5,
    propagation_probability: float = 0.1,
    monte_carlo_sims: int = 10,
    seed: int = 42,
    candidate_sample: int | None = 10_000,
) -> list[tuple[int, float]]:
    """[(node, cumulative_spread)] — k seeds in greedy pick order;
    spread = expected influenced vertex count (incl. the seeds) under
    IC, averaged over the Monte-Carlo worlds."""
    edges = graph.view().select("src", "dst").dropDuplicates(["src", "dst"])
    live = _live_edges(edges, propagation_probability, monte_carlo_sims, seed).persist()
    verts = graph.vertices()

    cands = verts
    n = verts.count()
    if candidate_sample is not None and n > candidate_sample:
        # IC spread is dominated by high-out-degree seeds; bound the
        # batched first round by the top-degree candidates (logged)
        print(f"celf: restricting candidates to top {candidate_sample} of {n} by degree")
        deg = edges.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("_d"))
        cands = (
            verts.join(deg, "id", "left")
            .fillna({"_d": 0})
            .orderBy(F.desc("_d"), F.asc("id"))
            .limit(candidate_sample)
            .select("id")
        )

    worlds = spark.range(monte_carlo_sims).select(F.col("id").cast("int").alias("sim"))
    # round 1: spread({v}) for every candidate, one batched MSBFS
    f0 = cands.crossJoin(worlds).select("sim", F.col("id").alias("source"), "id")
    base = _reach_counts(live, f0)
    gains = {
        int(r["source"]): r["reach"] / monte_carlo_sims for r in base.collect()
    }
    if not gains:
        live.unpersist()
        return []

    # CELF lazy-forward queue: (-gain, node, round_when_computed)
    heap = [(-g, v, 0) for v, g in gains.items()]
    heapq.heapify(heap)
    seeds: list[tuple[int, float]] = []
    spread_s = 0.0
    seed_rows: list[int] = []

    while len(seeds) < k and heap:
        neg_g, v, stamp = heapq.heappop(heap)
        if stamp == len(seeds):
            spread_s += -neg_g
            seed_rows.append(v)
            seeds.append((v, round(spread_s, 6)))
            continue
        # stale bound: re-evaluate marginal gain of v against S
        fs = (
            spark.createDataFrame([(s,) for s in seed_rows + [v]], "id long")
            .crossJoin(worlds)
            .select("sim", F.lit(0).alias("source"), "id")
        )
        reach = _reach_counts(live, fs).collect()
        total = (reach[0]["reach"] / monte_carlo_sims) if reach else 0.0
        heapq.heappush(heap, (-(total - spread_s), v, len(seeds)))

    live.unpersist()
    return seeds


def greedy(
    spark: SparkSession,
    graph: Graph,
    k: int = 5,
    propagation_probability: float = 0.1,
    monte_carlo_sims: int = 10,
    seed: int = 42,
    candidate_sample: int | None = 1_000,
) -> list[tuple[int, float]]:
    """gds.alpha.influenceMaximization.greedy analog — plain greedy
    without the CELF lazy queue (reference: alpha/alpha-algo/src/main/
    java/org/neo4j/gds/impl/influenceMaximization/Greedy.java:
    re-evaluate spread(S ∪ {v}) for EVERY remaining candidate each
    round and take the argmax).

    Spark realization: each round is ONE batched MSBFS over all
    (world, candidate) pairs — frontier row (sim, source=v, id) for
    id ∈ S ∪ {v} — so the per-round cost matches CELF's first round,
    not |V| sequential cascades. Over identical Monte-Carlo worlds
    this picks the same seed set as :func:`celf` (CELF is an exact
    lazy-evaluation of the same argmax); the smaller default
    ``candidate_sample`` reflects the O(k·candidates) re-evaluation.
    """
    edges = graph.view().select("src", "dst").dropDuplicates(["src", "dst"])
    live = _live_edges(edges, propagation_probability, monte_carlo_sims, seed).persist()
    verts = graph.vertices()

    cands = verts
    n = verts.count()
    if candidate_sample is not None and n > candidate_sample:
        print(
            f"greedy: restricting candidates to top {candidate_sample} of {n} by degree"
        )
        deg = edges.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("_d"))
        cands = (
            verts.join(deg, "id", "left")
            .fillna({"_d": 0})
            .orderBy(F.desc("_d"), F.asc("id"))
            .limit(candidate_sample)
            .select("id")
        )
    cand_ids = [int(r["id"]) for r in cands.collect()]

    worlds = spark.range(monte_carlo_sims).select(F.col("id").cast("int").alias("sim"))
    seeds: list[tuple[int, float]] = []
    seed_rows: list[int] = []
    spread_s = 0.0

    while len(seeds) < k and len(seed_rows) < len(cand_ids):
        remaining = [v for v in cand_ids if v not in seed_rows]
        # frontier: for every candidate v, the set S ∪ {v} in every world
        rows = [(v, m) for v in remaining for m in seed_rows + [v]]
        f = (
            spark.createDataFrame(rows, "source long, id long")
            .crossJoin(worlds)
            .select("sim", "source", "id")
        )
        reach = _reach_counts(live, f)
        best = reach.orderBy(F.desc("reach"), F.asc("source")).first()
        if best is None:
            break
        v, total = int(best["source"]), best["reach"] / monte_carlo_sims
        seed_rows.append(v)
        spread_s = total
        seeds.append((v, round(spread_s, 6)))

    live.unpersist()
    return seeds

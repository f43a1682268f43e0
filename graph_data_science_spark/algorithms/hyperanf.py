"""HyperANF — approximate neighborhood function + effective diameter.

Boldi, Rosa & Vigna, "HyperANF: Approximating the Neighbourhood
Function of Very Large Graphs on a Budget" (WWW 2011): per-vertex
HyperLogLog counters of the ball B(v, t), advanced one hop per
superstep by unioning each vertex's counter with its in-neighbors'.
N(t) = sum over v of |B(v, t)| estimates; the effective diameter is
the (interpolated) smallest t where N(t) reaches alpha * N(infinity).

This is the canonical web-scale answer to "what is this graph's
diameter" — the exact all-pairs computation is O(n*m) and was the
reason the reference keeps its MSBFS procs alpha-tier/sampled
(/root/reference/alpha/alpha-algo/src/main/java/org/neo4j/gds/impl/
msbfs/MultiSourceBFS.java); HyperANF replaces the per-source frontier
with a fixed 2^lg_k-register sketch per vertex, so each superstep is
ONE join + ONE groupBy regardless of how large the balls grow.

Spark realization: the per-vertex counter is a Datasketches HLL
sketch held in a binary column (`hll_sketch_agg` /`hll_union_agg` /
`hll_sketch_estimate` are built-in JVM aggregates — no Python in the
loop). A superstep is

    state' = union_by_id( state  ∪  (edges ⋈ state on src).(dst, sk) )

i.e. exactly the Pregel message shuffle (groupBy dst) the engine's
other algorithms pay, with the sketch union as the reducer. Register
maxima commute and never decrease, so the state sequence — and
therefore N(t) — is deterministic regardless of partitioning or
arrival order (the one estimator caveat: the composite estimate is
monotone in the registers up to <0.1% estimator jitter, which the
convergence test tolerates explicitly).

100-TB shape: state is (id, 2^lg_k registers ≈ lg_k=12 -> ~2-8 KB)
per vertex — 10^9 vertices at lg_k=12 is a few TB spread across the
cluster, each superstep one co-partitioned join + one combining
aggregate whose map-side partials collapse per id. Nothing is ever
collected except the one N(t) scalar per superstep (the convergence
observation every Pregel loop here already pays).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark import projection
from graph_data_science_spark.catalog import Graph
from graph_data_science_spark.pregel import _free_local_checkpoint


def neighborhood_function(
    spark: SparkSession,
    graph: Graph,
    max_iter: int = 32,
    lg_k: int = 12,
    directed: bool = False,
    rel_tolerance: float = 1e-4,
) -> DataFrame:
    """(t, n_pairs) — estimated number of (source, target) pairs with
    d(source, target) <= t, for t = 0 .. convergence (or max_iter).

    N(0) = n exactly (every ball starts as {self}; a singleton HLL
    estimate is exact). Iteration stops when N(t) grows by less than
    ``rel_tolerance`` relatively — the balls have stopped growing, so
    N(t) ~= the number of connected pairs.
    """
    if not 4 <= lg_k <= 21:
        raise ValueError("lg_k must be in [4, 21] (Datasketches HLL bound)")
    if max_iter < 1:
        raise ValueError("max_iter must be >= 1")
    edges = graph.view().select("src", "dst")
    if not directed:
        edges = projection.orient(edges, "UNDIRECTED").dropDuplicates(["src", "dst"])
    n_parts = spark.sparkContext.defaultParallelism
    edges = edges.repartition(n_parts, "src").persist()

    # one sketch per vertex seeded with itself: groupBy(id) makes
    # hll_sketch_agg a per-vertex aggregate
    state = (
        graph.vertices()
        .groupBy("id")
        .agg(F.hll_sketch_agg("id", F.lit(lg_k)).alias("sk"))
        .repartition(n_parts, "id")
        .localCheckpoint(eager=True)
    )
    n = state.count()
    rows: list[tuple[int, float]] = [(0, float(n))]
    prev = float(n)
    for t in range(1, max_iter + 1):
        msgs = edges.join(state, edges["src"] == state["id"]).select(
            F.col("dst").alias("id"), "sk"
        )
        new = (
            state.unionByName(msgs)
            .groupBy("id")
            .agg(F.hll_union_agg("sk").alias("sk"))
            .localCheckpoint(eager=True)
        )
        est = float(
            new.agg(F.sum(F.hll_sketch_estimate("sk")).alias("s")).first()["s"]
        )
        _free_local_checkpoint(state)
        state = new
        rows.append((t, est))
        if est <= prev * (1.0 + rel_tolerance):
            break
        prev = est
    _free_local_checkpoint(state)
    edges.unpersist()
    return spark.createDataFrame(rows, "t int, n_pairs double")


def effective_diameter(
    spark: SparkSession,
    graph: Graph,
    alpha: float = 0.9,
    max_iter: int = 32,
    lg_k: int = 12,
    directed: bool = False,
) -> DataFrame:
    """One row (effective_diameter, n_connected_pairs, iterations):
    the interpolated smallest t where N(t) >= alpha * N(last), per the
    HyperANF paper's definition. N(last) is the converged pair count —
    on a connected undirected graph ~ n^2."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    nf = neighborhood_function(
        spark, graph, max_iter=max_iter, lg_k=lg_k, directed=directed
    )
    pts = [(r["t"], r["n_pairs"]) for r in nf.orderBy("t").collect()]
    total = pts[-1][1]
    target = alpha * total
    d_eff = float(pts[-1][0])
    for (t0, n0), (t1, n1) in zip(pts, pts[1:]):
        if n1 >= target:
            # linear interpolation inside the step that crosses alpha
            d_eff = t0 + (target - n0) / (n1 - n0) if n1 > n0 else float(t0)
            d_eff = max(0.0, d_eff)
            break
    if pts[0][1] >= target:
        d_eff = 0.0
    return spark.createDataFrame(
        [(round(d_eff, 4), total, len(pts) - 1)],
        "effective_diameter double, n_connected_pairs double, iterations int",
    )
